"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual XLA devices (SURVEY.md §4
"Distributed without a cluster"): sharded-matvec / psum paths execute in CI
with no TPU; identical test code runs unmodified on a real slice. Must set the
environment before the first ``import jax`` anywhere in the test process.
"""
import os

# Force CPU even when the ambient environment points JAX at a TPU (the shell
# here exports JAX_PLATFORMS=axon and preloads jax via a .pth hook, so plain
# env vars are too late — but XLA backends initialize lazily, so overriding
# the config before the first jax.devices() call still works). Tests must not
# contend for the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# float64 available for tight oracle comparisons (explicit dtypes only).
jax.config.update("jax_enable_x64", True)

# The suite is compile-dominated (dozens of solver configs, each its own XLA
# program); a persistent on-disk cache makes re-runs near-instant.
jax.config.update("jax_compilation_cache_dir", "/tmp/fos_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
