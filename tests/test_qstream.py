"""Q-streaming wide-n kernel (kernels/qstream.py, round 5 VERDICT item 2).

Past the VMEM-resident ceiling (n ≈ 104) the only batched path was the XLA
driver, measured on chip at ~186-228 GB/s effective while re-reading Q
every iteration. The qstream burst streams Q through a double-buffered
plane-group window at the Pallas rate (measured 742 GB/s at n=128, 3.25×
the driver — RESULTS.md round 5) under the SAME certified outer driver as
the resident kernel. These tests pin routing, parity, and resume in
interpret mode; bench/verify_tpu.py re-checks Mosaic compilation on chip.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from fastoptsolver_tpu.batch.fista_gram import (
    BatchFISTAConfig,
    fista_gram_batch,
    make_gram_batch,
)
from fastoptsolver_tpu.kernels import fista_gram_vmem
from fastoptsolver_tpu.kernels.fista_vmem import plan_gram_solve


def _wide_problem(seed=0, B=160, m=300, n=144):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(B, m, n)) / np.sqrt(n), jnp.float32)
    xt = np.zeros((B, n), np.float32)
    xt[:, : n // 8] = rng.normal(size=(B, n // 8))
    b = jnp.einsum("bmn,bn->bm", A, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", A, b)), axis=1)
    return make_gram_batch(A, b, a1, 0.0)


def test_plan_routes_wide_n():
    cfg = BatchFISTAConfig()
    eng, bt, g = plan_gram_solve(5, cfg)
    assert eng == "vmem" and g == 0
    # the certified mid-range window prefers the single-DMA resident engine
    assert plan_gram_solve(144, cfg)[0] == "resident"
    assert plan_gram_solve(160, cfg)[0] == "resident"
    # fixed-iteration runs (check_every=0) and past-window n stream
    assert plan_gram_solve(144, BatchFISTAConfig(check_every=0))[0] == \
        "qstream"
    eng, bt, g = plan_gram_solve(200, cfg)
    assert eng == "qstream" and g > 0 and (200 + 7) // 8 * 8 % g == 0
    assert plan_gram_solve(512, cfg)[0] == "qstream"
    # armijo: supported in the resident window, refused where Q must stream
    assert plan_gram_solve(144, BatchFISTAConfig(backtracking=True))[0] == \
        "resident"
    import pytest

    with pytest.raises(NotImplementedError, match="driver"):
        plan_gram_solve(512, BatchFISTAConfig(backtracking=True))


def test_qstream_certified_matches_driver():
    # n=200 is past the resident window → the certified path is qstream
    gb = _wide_problem(n=200)
    cfg = BatchFISTAConfig(max_iter=600, check_every=25, rel_gap_tol=5e-6)
    ref = fista_gram_batch(gb, cfg)
    got = fista_gram_vmem(gb, cfg, interpret=True)
    assert bool(np.asarray(got.converged).all())
    assert bool(np.asarray(ref.converged).all())
    # borderline lanes may certify one burst apart (the streamed f32
    # accumulation order differs from the driver's einsum); the cadence
    # itself must agree
    di = np.abs(np.asarray(got.iters, np.int64)
                - np.asarray(ref.iters, np.int64))
    assert (di <= 25).all() and (di == 0).mean() >= 0.9, di.max()
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=2e-4, atol=2e-5)


def test_qstream_momentum_modes_match_driver():
    gb = _wide_problem(seed=3)
    for kw in (dict(), dict(momentum="delta", delta=4.0),
               dict(adaptive_restart=True), dict(momentum="greedy")):
        cfg = BatchFISTAConfig(max_iter=60, check_every=0, **kw)
        ref = fista_gram_batch(gb, cfg)
        got = fista_gram_vmem(gb, cfg, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5,
            err_msg=str(kw),
        )


def test_qstream_resume_is_exact():
    gb = _wide_problem(seed=5, B=130)  # non-multiple of the lane tile
    for kw in (dict(), dict(adaptive_restart=True)):
        full = BatchFISTAConfig(max_iter=100, check_every=0, **kw)
        half = dataclasses.replace(full, max_iter=40)
        straight = fista_gram_vmem(gb, full, interpret=True)
        _, mid = fista_gram_vmem(gb, half, interpret=True, return_state=True)
        resumed = fista_gram_vmem(gb, full, interpret=True, state0=mid)
        np.testing.assert_array_equal(
            np.asarray(resumed.x), np.asarray(straight.x), err_msg=str(kw)
        )


def test_routed_surface_uses_qstream_at_wide_n():
    """solve_gram_batch / solve_lasso_batch now route wide-n configs to the
    kernel instead of silently dropping to the driver (r4 verdict item 2);
    wide-n armijo still falls back (guard-deferred) under 'auto' and raises
    under 'kernel'."""
    import pytest

    from fastoptsolver_tpu.batch import solve_gram_batch

    gb = _wide_problem(seed=7, B=130, n=200)
    cfg = BatchFISTAConfig(max_iter=600, check_every=25, rel_gap_tol=5e-6)
    res = solve_gram_batch(gb, cfg, backend="kernel", interpret=True)
    ref = fista_gram_vmem(gb, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
    bt = BatchFISTAConfig(max_iter=100, check_every=25, backtracking=True)
    with pytest.raises(ValueError, match="armijo search"):
        solve_gram_batch(gb, bt, backend="kernel", interpret=True)
    res_bt = solve_gram_batch(gb, bt, backend="auto", interpret=True)
    assert np.isfinite(np.asarray(res_bt.rel_gap)).all()
