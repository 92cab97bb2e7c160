"""Persistent XLA compilation cache.

The KBPN back-projection deconvs (k8 s4) autotune slowly on first compile;
with the on-disk cache only the first process ever pays.  Call early, before
the first jit.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "CSBSR_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
