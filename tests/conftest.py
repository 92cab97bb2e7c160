"""Test config: run on CPU with 8 virtual devices.

This is the TPU-native answer to "test multi-chip without a cluster"
(SURVEY.md 4): the same `jax.sharding.Mesh` code paths compile and execute
on 8 host-platform devices.
"""
import os

# HARD-set (not setdefault): the boot environment exports
# JAX_PLATFORMS=axon, and utils/cache.honor_platform_env re-asserts the
# env value into the config for every CLI/helper - tests must pin cpu at
# BOTH layers or the first array touch tries to build the TPU client
# (and hangs whenever the device tunnel is unreachable).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the env var; the config flag wins.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the train-step tests compile multi-minute graphs;
# repeated pytest runs reuse them.
from csbsr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1121)
