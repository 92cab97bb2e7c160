"""Persistent XLA compilation cache.

The KBPN back-projection deconvs (k8 s4) autotune slowly on first compile;
with the on-disk cache only the first process ever pays.  Call early, before
the first jit.
"""
from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Make CLIs respect an explicit ``JAX_PLATFORMS`` env var.

    Site plugins may force their platform via ``jax.config.update``
    (config beats env in JAX's precedence), so a subprocess launched with
    ``JAX_PLATFORMS=cpu`` can still try to initialise the accelerator
    client — and hang if its transport is unreachable.  Re-asserting the
    env value through the config restores the documented JAX contract.
    Call before the first backend touch (tests/conftest.py does the
    in-process equivalent).
    """
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    honor_platform_env()
    path = path or os.environ.get(
        "CSBSR_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
