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

# Persistent compile cache: OPT-IN via FOS_COMPILE_CACHE=1. It makes warm
# re-runs near-instant, but this environment's compile service can move to
# a machine with different CPU features mid-session, after which cached
# XLA:CPU AOT executables carry unsupported instructions and SEGFAULT on
# deserialization (observed 2026-08-21: reproducible crash in
# jax compilation_cache.get_executable_and_time at the lbfgs sweep program,
# preceded by cpu_aot_loader "machine type ... doesn't match" warnings;
# clearing /tmp/fos_tpu_jax_cache did not help — freshly written entries
# crashed too). Correctness of `pytest tests/` must not depend on that
# service's placement, so default OFF.
if os.environ.get("FOS_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/fos_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(session, config, items):
    """Run the compile-heaviest modules first.

    Background: this environment's XLA:CPU compiler reliably
    segfaults/aborts inside ``backend_compile_and_load`` once a process has
    compiled ~265 programs (observed 2026-08-21; independent of the
    persistent cache, the axon plugin, and of WHICH test sits at that
    position — the victim program changes with ordering). The suite runs
    under 5 xdist workers (pyproject addopts) so no process approaches the
    threshold, and the compile-heaviest modules are fronted so their
    programs compile while each worker's in-process count is still low
    (late in round 5, test_routed_mesh — wide-n engines × shard_map ×
    interpret, the densest compile cluster — crashed its worker when suite
    growth pushed it late in the schedule; the same test passes alone and
    when fronted). Fronting the slow fixtures also helps xdist scheduling.
    """
    order = {"test_sweep": 0, "test_routed_mesh": 1}

    def key(it):
        for name, rank in order.items():
            if name in it.nodeid:
                return rank
        return 2

    items.sort(key=key)
