"""Durable checkpoint export: cast a training checkpoint to params-only f16.

Full training checkpoints (params + batch_stats + adam moments, f32) are
~200 MB and live in gitignored ``checkpoints/`` trees that machine reboots
have repeatedly wiped (VERDICT r3 weak #4). This tool produces a small,
committable artifact holding everything a downstream run needs:

  export:  read ``best_model.msgpack``, drop ``opt_state``, cast float
           arrays in params/batch_stats to float16 (integer arrays kept),
           write ``<out>`` (~34 MB for the SARSSL flagship).
  restore: read an f16 export and write a float32 params-only
           ``best_model.msgpack`` usable directly as ``--pretrain-ckpt``
           (the downstream CLIs load params via checkpoint.partial_load,
           which preserves source dtypes — so always restore to f32 first;
           feeding the f16 file directly would silently downcast the model).

Counterpart of the reference's ``best_model.tar`` transfer artifact
(/root/reference/code/learner.py:344-374, run_downstream.py:253-256); the
f16 cast is a storage decision with no reference analogue.

Usage:
  python scripts/export_ckpt_f16.py export  exp/.../checkpoints/best_model.msgpack exp/.../best_model_f16.msgpack
  python scripts/export_ckpt_f16.py restore exp/.../best_model_f16.msgpack /tmp/ckpt_dir/best_model.msgpack
"""
from __future__ import annotations

import os
import sys

import numpy as np


def _cast_tree(obj, dtype):
    if isinstance(obj, dict):
        return {k: _cast_tree(v, dtype) for k, v in obj.items()}
    arr = np.asarray(obj)
    if np.issubdtype(arr.dtype, np.floating):
        return arr.astype(dtype)
    return arr


def export_f16(src: str, dst: str) -> None:
    from flax import serialization
    with open(src, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    out = {
        "meta": {**payload.get("meta", {}), "stored_dtype": "float16"},
        "params": _cast_tree(payload["params"], np.float16),
        "batch_stats": _cast_tree(payload.get("batch_stats", {}), np.float16),
    }
    blob = serialization.msgpack_serialize(out)
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, dst)
    print(f"exported {src} ({os.path.getsize(src)/1e6:.1f} MB) -> "
          f"{dst} ({os.path.getsize(dst)/1e6:.1f} MB)")


def restore_f32(src: str, dst: str) -> None:
    from flax import serialization
    with open(src, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = dict(payload.get("meta", {}))
    meta.pop("stored_dtype", None)
    out = {
        "meta": meta,
        "params": _cast_tree(payload["params"], np.float32),
        "batch_stats": _cast_tree(payload.get("batch_stats", {}), np.float32),
    }
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    blob = serialization.msgpack_serialize(out)
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, dst)
    print(f"restored {src} -> {dst} ({os.path.getsize(dst)/1e6:.1f} MB)")


def main(argv):
    if len(argv) != 4 or argv[1] not in ("export", "restore"):
        print(__doc__)
        return 2
    import jax
    jax.config.update("jax_platforms", "cpu")
    if argv[1] == "export":
        export_f16(argv[2], argv[3])
    else:
        restore_f32(argv[2], argv[3])
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
