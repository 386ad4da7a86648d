"""Device meshes and sharding rules.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(/root/reference/code/learner.py:25-31). The TPU-native design replaces it
with a 2-D ``('data', 'model')`` mesh:

  * ``data``  — batch dimension of the waveform batch (pure DP; gradients are
    reduced by XLA-inserted collectives over ICI).
  * ``model`` — Megatron-style tensor parallelism over attention heads and
    feed-forward hidden units: column-parallel qkv/ff-in kernels, row-parallel
    out/ff-out kernels. With ``model=1`` this degenerates to replication.

Sharding is expressed as NamedShardings on the TrainState and batch; GSPMD
propagates through the jitted step and inserts psum/all-gather where needed.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
REPLICA_AXIS = "replica"  # multi-slice axis: gradients reduced over DCN


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              n_replica: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data','model') mesh, or ('replica','data','model') when
    ``n_replica > 1`` for multi-slice scaling: 'replica' maps across slices
    (DCN), 'data'/'model' stay within a slice (ICI).

    With the default device set the grid must tile it EXACTLY: silently
    idling devices breaks the pod contract (global_batch_from_local sizes
    the global batch as local_nb x process_count, which assumes every
    process contributes all its devices). Pass ``devices`` explicitly to
    run on a subset."""
    explicit = devices is not None
    devices = list(devices if explicit else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = n // (n_model * n_replica)
    assert n_data >= 1, (n_replica, n_data, n_model, n)
    used = n_replica * n_data * n_model
    assert used == n or (explicit and used <= n), \
        (f"mesh {n_replica}x{n_data}x{n_model} uses {used} of {n} devices; "
         "pass devices= explicitly to run on a subset")
    shape = ((n_replica, n_data, n_model) if n_replica > 1
             else (n_data, n_model))
    axes = ((REPLICA_AXIS, DATA_AXIS, MODEL_AXIS) if n_replica > 1
            else (DATA_AXIS, MODEL_AXIS))
    try:
        # topology-aware assignment: collectives over 'data'/'model' ride
        # ICI rings instead of whatever order jax.devices() happens to have
        from jax.experimental import mesh_utils
        grid = mesh_utils.create_device_mesh(shape, devices=devices[:used])
    except Exception:
        grid = np.array(devices[:used]).reshape(shape)
    return Mesh(grid, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data' (and 'replica' when present)."""
    if REPLICA_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((REPLICA_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


# --- tensor-parallel rules -------------------------------------------------

_COL_PARALLEL_KERNELS = (  # shard output features over 'model'
    ("mhsa", "query", "kernel"), ("mhsa", "key", "kernel"),
    ("mhsa", "value", "kernel"), ("mhsa", "pos", "kernel"),
    ("ff1", "Dense_0", "kernel"), ("ff2", "Dense_0", "kernel"),
    ("proj0", "kernel"),
)
_ROW_PARALLEL_KERNELS = (  # shard input features over 'model'
    ("mhsa", "out", "kernel"),
    ("ff1", "Dense_1", "kernel"), ("ff2", "Dense_1", "kernel"),
    ("proj1", "kernel"),
)
_COL_PARALLEL_BIASES = (
    ("ff1", "Dense_0", "bias"), ("ff2", "Dense_0", "bias"),
    ("mhsa", "query", "bias"), ("mhsa", "key", "bias"),
    ("mhsa", "value", "bias"), ("proj0", "bias"),
)


def _endswith(path: Tuple[str, ...], suffix: Tuple[str, ...]) -> bool:
    return len(path) >= len(suffix) and tuple(path[-len(suffix):]) == suffix


def param_pspec(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter leaf under ('data','model')."""
    ndim = np.ndim(leaf)
    for suf in _COL_PARALLEL_KERNELS:
        if _endswith(path, suf) and ndim == 2:
            return P(None, MODEL_AXIS)
    for suf in _ROW_PARALLEL_KERNELS:
        if _endswith(path, suf) and ndim == 2:
            return P(MODEL_AXIS, None)
    for suf in _COL_PARALLEL_BIASES:
        if _endswith(path, suf) and ndim == 1:
            return P(MODEL_AXIS)
    return P()  # replicate


def _tree_paths_map(fn, tree):
    """Map fn(path_of_str, leaf) over a pytree with string key paths."""
    def keystr(kp):
        out = []
        for k in kp:
            if hasattr(k, "key"):
                out.append(str(k.key))
            elif hasattr(k, "idx"):
                out.append(str(k.idx))
            elif hasattr(k, "name"):
                out.append(str(k.name))
            else:
                out.append(str(k))
        return tuple(out)

    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: fn(keystr(kp), leaf), tree)


def param_shardings(mesh: Mesh, params):
    """Pytree of NamedShardings for a parameter tree."""
    return _tree_paths_map(
        lambda path, leaf: NamedSharding(mesh, param_pspec(path, leaf)), params)


