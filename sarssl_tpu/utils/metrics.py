"""Model introspection: parameter counts, nan/inf detection.

Equivalents of reference get_nparams / detect_infnan
(/root/reference/code/common/utils.py:21-89).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import numpy as np
from flax.traverse_util import flatten_dict
from flax import serialization


def count_params(params, groups: Sequence[str] = ()) -> Dict[str, float]:
    """Parameter counts in millions, total and per top-level group."""
    sd = flatten_dict(serialization.to_state_dict(jax.device_get(params)))
    out: Dict[str, float] = {}
    total = 0
    for k, v in sd.items():
        n = int(np.prod(np.shape(v)))
        total += n
        top = str(k[0])
        for g in groups:
            if top.startswith(g):
                out[g] = out.get(g, 0) + n
    out = {k: v / 1e6 for k, v in out.items()}
    out["total"] = total / 1e6
    return out


def estimate_flops(fn, *args) -> float:
    """Forward-pass FLOPs via XLA cost analysis (equivalent of the
    reference's FlopCounterMode printout, utils.py:75-89). Returns GFLOPs."""
    import jax
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis() or {}
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) / 1e9


def forgetting_norm(x, num_frame_set: int = None):
    """Per-frame 'forgetting' normalizer (reference common/utils.py:142-172,
    "Online Monaural Speech Enhancement using Delayed Subband LSTM"):
    running mean of the per-frame average magnitude with a warm-up smoothing
    factor alpha_t = (t-1)/(t+1) that saturates at (N-1)/(N+1).

    x: (B, C, F, T) magnitude-like array; returns (B, 1, 1, T).
    """
    import jax
    import jax.numpy as jnp

    assert x.ndim == 4, x.shape
    B, C, F, T = x.shape
    N = T if num_frame_set is None else num_frame_set
    frame_mu = jnp.mean(x.reshape(B, C * F, T), axis=1)       # (B, T)
    t = jnp.arange(T)
    alpha = jnp.where(t <= N, (t - 1) / (t + 1), (N - 1) / (N + 1))

    def step(mu, inp):
        a, m = inp
        mu = a * mu + (1 - a) * m
        return mu, mu

    _, mus = jax.lax.scan(step, jnp.zeros((B,), x.dtype),
                          (alpha.astype(x.dtype), frame_mu.T))
    return mus.T.reshape(B, 1, 1, T)


def cross_validation_datadirs(room_dirs: Sequence[str], with_val: bool = False,
                              seed: int = 0):
    """Leave-one-room-out splits (reference cross_validation_datadir,
    utils.py:249-277, used for ACE fine-tuning): yields
    {'train': [...], 'test': [dir]} per held-out room; with ``with_val``
    one of the remaining rooms becomes the val room (the reference draws
    it with the global RNG — here a seeded, process-stable Generator)."""
    rooms = list(room_dirs)
    rng = np.random.default_rng((seed, 0xCF))
    for i, test_room in enumerate(rooms):
        rest = rooms[:i] + rooms[i + 1:]
        if not with_val:
            yield {"train": rest, "test": [test_room]}
            continue
        vi = int(rng.integers(len(rest)))
        yield {"train": rest[:vi] + rest[vi + 1:], "val": [rest[vi]],
               "test": [test_room]}


def detect_nonfinite(tree, name: str = "tensor") -> bool:
    """True if any leaf contains NaN/Inf."""
    import jax.numpy as jnp
    bad = False
    for path, leaf in flatten_dict(
            serialization.to_state_dict(jax.device_get(tree))).items():
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            print(f"nonfinite values in {name}:{'/'.join(map(str, path))}")
            bad = True
    return bad
