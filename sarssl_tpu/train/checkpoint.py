"""Checkpointing: latest/best/per-epoch/ensemble files with partial loading.

File-level behavior mirrors the reference Learner
(/root/reference/code/learner.py:344-486): ``latest_model``, ``model{epoch}``,
``best_model`` and ``ensemble_model`` artifacts, partial state-dict loading by
key intersection with an optional prefix rewrite, selective freezing, uniform
parameter ensembling over the last best epochs, and epoch-file pruning.

Storage is flax msgpack of pure state dicts (host numpy), so checkpoints are
framework-portable and contain no pickled code.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

SUFFIX = ".msgpack"


def latest_path(d: str) -> str:
    return os.path.join(d, "latest_model" + SUFFIX)


def best_path(d: str) -> str:
    return os.path.join(d, "best_model" + SUFFIX)


def epoch_path(d: str, epoch: int) -> str:
    return os.path.join(d, f"model{epoch}" + SUFFIX)


def ensemble_path(d: str) -> str:
    return os.path.join(d, "ensemble_model" + SUFFIX)


def save_checkpoint(ckpt_dir: str, state, epoch: int, max_score: float,
                    is_best: bool = False, keep_epoch: bool = True,
                    save_opt: bool = True, extra: Optional[Dict[str, Any]] = None):
    """Write latest (+ epoch, + best) checkpoint files atomically."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "meta": {"epoch": int(epoch), "max_score": float(max_score),
                 **(extra or {})},
        "params": serialization.to_state_dict(jax.device_get(state.params)),
        "batch_stats": serialization.to_state_dict(jax.device_get(state.batch_stats)),
    }
    if save_opt:
        payload["opt_state"] = serialization.to_state_dict(
            jax.device_get(state.opt_state))
    blob = serialization.msgpack_serialize(payload)

    def _write(path):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)

    _write(latest_path(ckpt_dir))
    if keep_epoch:
        _write(epoch_path(ckpt_dir, epoch))
    if is_best:
        _write(best_path(ckpt_dir))


def save_named(ckpt_dir: str, state, name: str, epoch: int = -1,
               max_score: float = 0.0, save_opt: bool = False):
    """Write a single named checkpoint file (e.g. 'ensemble_model')."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "meta": {"epoch": int(epoch), "max_score": float(max_score)},
        "params": serialization.to_state_dict(jax.device_get(state.params)),
        "batch_stats": serialization.to_state_dict(jax.device_get(state.batch_stats)),
    }
    if save_opt:
        payload["opt_state"] = serialization.to_state_dict(
            jax.device_get(state.opt_state))
    blob = serialization.msgpack_serialize(payload)
    path = os.path.join(ckpt_dir, name + SUFFIX)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_state(state, payload: Dict[str, Any], restore_opt: bool = True):
    """Restore a TrainState from a checkpoint payload (shapes must match)."""
    params = serialization.from_state_dict(state.params, payload["params"])
    batch_stats = serialization.from_state_dict(state.batch_stats,
                                                payload["batch_stats"])
    new = state.replace(params=params, batch_stats=batch_stats)
    if restore_opt and "opt_state" in payload:
        opt_state = serialization.from_state_dict(state.opt_state,
                                                  payload["opt_state"])
        new = new.replace(opt_state=opt_state)
    return new


def partial_load(target_params, source_state_dict, ex_prefix: str = "",
                 verbose: bool = False):
    """Copy source values into target for every key path present in both.

    Equivalent of reference ``load_checkpoint_best`` partial matching
    (learner.py:394-446): key intersection with optional prefix stripping on
    source keys; shape-mismatched leaves are skipped. Returns (params, loaded_keys).
    """
    tgt_sd = serialization.to_state_dict(jax.device_get(target_params))
    tgt_flat = flatten_dict(tgt_sd)
    src_flat = flatten_dict(source_state_dict)
    if ex_prefix:
        src_flat = {
            (k[0][len(ex_prefix):],) + k[1:] if k and str(k[0]).startswith(ex_prefix) else k: v
            for k, v in src_flat.items()
        }
    loaded = []
    for k, v in src_flat.items():
        if k in tgt_flat and np.shape(tgt_flat[k]) == np.shape(v):
            tgt_flat[k] = v
            loaded.append("/".join(map(str, k)))
    merged = unflatten_dict(tgt_flat)
    params = serialization.from_state_dict(target_params, merged)
    if verbose:
        print(f"partial_load: {len(loaded)}/{len(tgt_flat)} keys loaded")
    return params, loaded


def trainable_mask_from_loaded(target_params, loaded_keys: Sequence[str],
                               freeze_loaded: bool = True):
    """Boolean pytree: False for params that were loaded (lineareval freezing,
    reference learner.py:427-446 'param_frozen')."""
    loaded = set(loaded_keys)
    tgt_sd = serialization.to_state_dict(jax.device_get(target_params))
    flat = flatten_dict(tgt_sd)
    mask_flat = {k: not (("/".join(map(str, k)) in loaded) and freeze_loaded)
                 for k in flat}
    mask_sd = unflatten_dict(mask_flat)
    return serialization.from_state_dict(
        jax.tree.map(lambda _: True, target_params), mask_sd)


def ensemble_params(param_list: List[Any]):
    """Uniform parameter average (reference ensembling, learner.py:302-331)."""
    n = len(param_list)
    return jax.tree.map(
        lambda *xs: (np.sum([np.asarray(x, np.float64) for x in xs], axis=0) / n)
        .astype(np.asarray(xs[0]).dtype),
        *param_list)


def remove_checkpoint_epochs(ckpt_dir: str, epochs: Sequence[int]):
    for e in epochs:
        p = epoch_path(ckpt_dir, e)
        if os.path.exists(p):
            os.remove(p)
