"""Test configuration: force JAX onto a virtual 8-device CPU platform so
multi-device sharding tests run without TPU hardware (the JAX-native way to
simulate a cluster).

The container's sitecustomize registers the axon TPU plugin at interpreter
startup, so plain env vars are not enough — we must also re-select the
platform through jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU suite: many tests jit the SAME
# programs (every engine test compiles the tiny train step; resume runs
# recompile it verbatim), and the cache is shared across subprocess workers
# (multihost tests) too. Cold suite cost drops accordingly; correctness is
# keyed on HLO+flags by JAX itself — EXCEPT host CPU features, which XLA's
# CPU AOT cache key omits (entries from another machine type load and then
# fail at run time). The dir is therefore keyed by host_cache_tag(): a
# cache carried across a container migration becomes a clean cold miss
# instead of a per-process recompile-skew source (see
# tests/test_multihost_engine.py).
from desenet_tpu.utils.general import host_cache_tag  # noqa: E402

CPU_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    f".jax_cache_cpu-{host_cache_tag()}")
jax.config.update("jax_compilation_cache_dir", CPU_CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: takes minutes on the 1-core host; excluded from the smoke "
        "tier (`pytest -m 'not slow'`, <10 min)")
    config.addinivalue_line(
        "markers",
        "chip: talks to the real TPU chip; never run concurrently with a "
        "measurement (timings corrupt on the shared tunnel)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
