"""Edge-shape sweep over the routed surface (round 5 hardening).

The routing/padding machinery (lane-tile rounding, sublane padding, ragged
row bricks, engine selection) is exercised at deliberately awkward shapes:
single instances, single features, tiny row counts, and off-by-one
non-multiples around every alignment boundary. Each case solves through
``solve_lasso_batch`` on the kernel route (interpret) AND the XLA driver,
then checks both certify consistently and agree in float64 objective —
the contract that holds across engines regardless of trajectory-level
float drift.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
import pytest

from fastoptsolver_tpu.batch import solve_lasso_batch
from fastoptsolver_tpu.batch.fista_gram import BatchFISTAConfig

CASES = [
    # (B, m, n) — awkward on purpose
    (1, 40, 5),      # single instance
    (2, 16, 1),      # single feature
    (129, 33, 5),    # one past a lane tile; ragged rows
    (127, 9, 8),     # one below a lane tile; m barely above sublane
    (5, 250, 7),     # n at the old fused-tile boundary
    (3, 100, 9),     # n just past a sublane
    (130, 77, 12),   # everything ragged
]


@pytest.mark.parametrize("B,m,n", CASES)
def test_routed_edge_shapes_agree_with_driver(B, m, n):
    rng = np.random.default_rng(B * 1000 + m * 10 + n)
    A = jnp.asarray(rng.normal(size=(B, m, n)) / np.sqrt(n), jnp.float32)
    xt = np.zeros((B, n), np.float32)
    xt[:, : max(n // 2, 1)] = rng.normal(size=(B, max(n // 2, 1)))
    b = jnp.einsum("bmn,bn->bm", A, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", A, b)), axis=1)
    a1 = jnp.maximum(a1, 1e-3)
    cfg = BatchFISTAConfig(max_iter=500, check_every=25, rel_gap_tol=1e-5)
    res_k = solve_lasso_batch(A, b, a1, cfg=cfg, backend="kernel",
                              interpret=True)
    res_d = solve_lasso_batch(A, b, a1, cfg=cfg, backend="xla")
    assert res_k.x.shape == (B, n)
    assert res_d.x.shape == (B, n)
    assert bool(np.asarray(res_k.converged).all()), (B, m, n)
    assert bool(np.asarray(res_d.converged).all()), (B, m, n)

    A64 = np.asarray(A, np.float64)
    b64 = np.asarray(b, np.float64)
    a64 = np.asarray(a1, np.float64)

    def obj(x):
        x64 = np.asarray(x, np.float64)
        r = np.einsum("bmn,bn->bm", A64, x64) - b64
        return 0.5 * np.sum(r * r, axis=1) + a64 * np.abs(x64).sum(axis=1)

    rel = np.abs(obj(res_k.x) - obj(res_d.x)) / np.maximum(obj(res_d.x), 1.0)
    assert rel.max() <= 1e-4, (B, m, n, rel.max())


@pytest.mark.parametrize("kw", [
    dict(adaptive_restart=True),
    dict(momentum="greedy"),
    dict(backtracking=True, rel_gap_tol=1e-3),
])
def test_routed_edge_shapes_config_variants(kw):
    """The awkwardest shape × each per-lane-state config family."""
    B, m, n = 130, 77, 12
    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.normal(size=(B, m, n)) / np.sqrt(n), jnp.float32)
    xt = np.zeros((B, n), np.float32)
    xt[:, :6] = rng.normal(size=(B, 6))
    b = jnp.einsum("bmn,bn->bm", A, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", A, b)), axis=1)
    tol = kw.pop("rel_gap_tol", 1e-5)
    cfg = BatchFISTAConfig(max_iter=500, check_every=25, rel_gap_tol=tol,
                           **kw)
    res = solve_lasso_batch(A, b, a1, cfg=cfg, backend="kernel",
                            interpret=True)
    assert res.x.shape == (B, n)
    assert np.isfinite(np.asarray(res.rel_gap)).all()
    if "backtracking" not in kw:
        assert bool(np.asarray(res.converged).all())
