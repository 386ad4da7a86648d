"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware, and keep compilation deterministic."""
import os
import sys

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The hosting environment may pin JAX_PLATFORMS to a TPU plugin; the config
# update below wins over the env var and forces the 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs (CI, judges, local
# iteration) skip recompiling unchanged programs — the dominant cost of this
# suite on a 1-CPU box. Shared with the CLIs/bench via utils.jaxcache.
from sarssl_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

