"""Persistent XLA compilation cache management.

Cold compiles through the shared TPU tunnel are user-hostile: the SAME
fwd+bwd program has measured 37.7 s and 303.6 s back-to-back (BASELINE.md,
"Measurement variance").  The reference pays an analogous cost per shader
recompile but amortizes nothing across runs; we can do better because XLA
supports an on-disk executable cache keyed by program fingerprint.

One hard constraint from this host (documented in tests/conftest.py and the
repo verify notes): the cache must stay OFF for the CPU backend here — the
host's advertised CPU features vary between runs and cached AOT CPU code has
produced silent wrong results and multi-minute hangs.  ``enable()`` therefore
activates the cache only when the default backend is a TPU.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/rvpt_tpu/xla")


def enable(cache_dir: str | None = None) -> bool:
    """Enable the persistent compilation cache on TPU backends.

    Returns True when enabled.  No-ops (returns False) on CPU — see module
    docstring — and when JAX already has a cache dir configured.
    """
    import jax

    if jax.default_backend() != "tpu":
        return False
    if jax.config.jax_compilation_cache_dir:
        return True
    path = cache_dir or os.environ.get("RVPT_TPU_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took noticeable compile time; the tunnel's
    # remote compiler is the cost being amortized, not disk space.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return True
