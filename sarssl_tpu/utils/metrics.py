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
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) / 1e9


def forgetting_norm(x, num_frames: int = 300):
    """Exponential 'forgetting' normalization over time frames
    (reference utils.py:145-xxx): running mean magnitude with decay
    weight (num_frames-1)/num_frames, applied along the time axis.

    x: (..., nt) magnitude-like array; returns same-shape normalizer.
    """
    import jax.numpy as jnp
    import jax

    alpha = (num_frames - 1) / num_frames

    def step(mu, xt):
        mu = alpha * mu + (1 - alpha) * xt
        return mu, mu

    xt = jnp.moveaxis(x, -1, 0)
    _, mus = jax.lax.scan(step, jnp.zeros_like(xt[0]), xt)
    return jnp.moveaxis(mus, 0, -1)


def cross_validation_datadirs(room_dirs: Sequence[str]):
    """Leave-one-room-out splits (reference cross_validation_datadir,
    utils.py:249-277, used for ACE fine-tuning): yields
    {'train': [...], 'test': [dir]} per held-out room."""
    rooms = list(room_dirs)
    for i, test_room in enumerate(rooms):
        yield {"train": rooms[:i] + rooms[i + 1:], "test": [test_room]}


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
