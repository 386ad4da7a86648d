"""Persistent XLA compilation cache shared by every entry point.

The axon terminal does the real TPU compile at first execution (~4-8 min
per distinct program).  This mirrors the cache setup in ``tests/conftest.py``
so the CLIs, ``bench.py`` and ``__graft_entry__.py`` all reuse one on-disk
cache (override the base location with ``SARSSL_JAX_CACHE``; a host-CPU
fingerprint subdir is always appended — see ``_host_fingerprint``).

Scope of the benefit: the cache lives under ``~/.cache`` and survives chain
restarts and process exits *within one boot*.  A box reboot that wipes the
filesystem caches also wipes this directory, so the first post-reboot run of
each distinct program still pays the full terminal compile; only programs
re-seen after that are cheap again.

Entry points that intentionally skip this helper: the CPU-only corpus tools
(``cli/gen_simu*``, ``cli/gen_real_rir``, ``cli/gen_sig_from_real_rir``,
``cli/gen_locata``, ``cli/pack_data``) never compile a TPU program worth
caching.

No reference counterpart: torch caches kernels in-process only
(/root/reference/code/run_pretrain.py pays cudnn autotune per run).
"""
from __future__ import annotations

import hashlib
import os
import warnings

_DEFAULT = os.path.expanduser("~/.cache/sarssl_jax_cache")


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU AOT cache entries bake in the machine features of the host that
    compiled them; loading them on a host with FEWER features logs
    'could lead to execution errors such as SIGILL'.  The build box has
    rebooted onto visibly different silicon (amx-fp16 etc. disappeared), so
    CPU-compiled entries are segregated per feature set.  TPU entries are
    unaffected by host microarch, but segregating the whole dir is the
    simple safe choice.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nofp"


def enable_persistent_cache() -> str | None:
    """Point JAX at the shared on-disk compilation cache. Idempotent.

    Call AFTER any ``jax.config.update("jax_platforms", ...)`` the caller
    needs — enabling the cache does not initialize backends, but importing
    jax here is safe either way.  Never raises: on an unwritable cache dir
    it warns and leaves the in-process cache as the only one (so importing
    ``__graft_entry__`` cannot fail on a read-only HOME).
    """
    import jax

    # the fingerprint subdir applies to SARSSL_JAX_CACHE overrides too:
    # a verbatim override would re-expose the stale-AOT/SIGILL hazard the
    # fingerprint exists to prevent when the box reboots onto new silicon
    base = os.environ.get("SARSSL_JAX_CACHE", _DEFAULT)
    cache_dir = os.path.join(base, _host_fingerprint())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except (OSError, RuntimeError) as e:  # unwritable HOME, frozen config
        warnings.warn(f"persistent XLA cache disabled ({e}); compiles will "
                      f"not be reused across processes")
        return None
    return cache_dir
