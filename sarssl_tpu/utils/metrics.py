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
