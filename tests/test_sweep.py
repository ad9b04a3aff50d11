"""The 80-scenario benchmark harness (reference notebook reconstruction)."""
import os

import numpy as np

from fastoptsolver_tpu.bench import run_sweep, suboptimality, plot_scenario, build_scenarios
from fastoptsolver_tpu.problems import scenario_grid
import jax.numpy as jnp


def test_scenario_grid_is_the_reference_80():
    grid = scenario_grid()
    assert len(grid) == 80
    # exact reference combinations (figures/ filenames)
    assert (0, 0.5, 0.5, 0.7) in grid
    assert (4, 5.0, 0.8, 0.9) in grid
    seeds = {g[0] for g in grid}
    noises = {g[1] for g in grid}
    assert seeds == {0, 1, 2, 3, 4}
    assert noises == {0.5, 1.0, 2.0, 5.0}


def test_sweep_small_slice(tmp_path):
    grid, results = run_sweep(m=200, max_iter=60, limit=2, dtype=jnp.float64)
    assert len(grid) == 2
    # 6 variants for each first-order solver + 1 L-BFGS config
    assert set(results["ista"]) == set(results["fista"]) == set(results["fista_delta"])
    assert len(results["ista"]) == 6
    assert results["ista"]["lasso-fixed-t1.0"].shape == (2, 60)

    sub = suboptimality(results)
    # suboptimality is nonnegative up to float noise and decreasing overall
    for solver in ("ista", "fista", "fista_delta"):
        for curves in sub[solver].values():
            assert curves.min() >= -1e-6
            assert np.median(curves[:, -1]) <= np.median(curves[:, 0])
    # figures render with the reference naming convention
    base = plot_scenario(0, grid[0], sub, str(tmp_path))
    s, n, r1, r2 = grid[0]
    assert os.path.exists(f"{base}.png")
    assert f"benchmark_s{s}_n{n}_r1{r1}_r2{r2}" in base


def test_build_scenarios_standardized():
    _, data = build_scenarios(m=300, limit=1)
    A, b = data[0]
    np.testing.assert_allclose(A.mean(0), 0.0, atol=1e-10)
    np.testing.assert_allclose(A.std(0), 1.0, rtol=1e-10)
