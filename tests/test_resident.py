"""Resident mid-range wide-n engine (kernels/resident.py, round 5).

Between the burst kernel's double-buffered ceiling (~104 features) and the
streaming regime, a lane tile's whole Gram block fits VMEM single-buffered:
this engine copies it with ONE manual DMA and runs the entire certified
solve against it — Q read once per SOLVE. Measured on chip at n=144:
196 ms vs the streaming engine's 2697 ms (13.7×), bit-identical results
(both run kernels/_common.certified_solve_body). These tests pin parity,
armijo-in-the-window (driver-only before), resume, and routing.
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
from fastoptsolver_tpu.kernels import fista_gram_resident, fista_gram_vmem


def _window_problem(seed=0, B=160, m=300, n=144):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(B, m, n)) / np.sqrt(n), jnp.float32)
    xt = np.zeros((B, n), np.float32)
    xt[:, : n // 8] = rng.normal(size=(B, n // 8))
    b = jnp.einsum("bmn,bn->bm", A, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", A, b)), axis=1)
    return make_gram_batch(A, b, a1, 0.0)


def test_resident_certified_matches_driver_and_routed():
    gb = _window_problem()
    cfg = BatchFISTAConfig(max_iter=600, check_every=25, rel_gap_tol=5e-6)
    ref = fista_gram_batch(gb, cfg)
    got = fista_gram_resident(gb, cfg, interpret=True)
    assert bool(np.asarray(got.converged).all())
    di = np.abs(np.asarray(got.iters, np.int64)
                - np.asarray(ref.iters, np.int64))
    assert (di <= 25).all() and (di == 0).mean() >= 0.9
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=2e-4, atol=2e-5)
    # fista_gram_vmem routes the certified window here (plan_gram_solve)
    routed = fista_gram_vmem(gb, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(routed.x), np.asarray(got.x))


def test_resident_momentum_and_armijo_in_window():
    """Every in-kernel mode runs against the manually-DMA'd block —
    including the armijo search, which the streaming engine must reject
    (its trial rounds are free against resident Q)."""
    gb = _window_problem(seed=3)
    gb_low = dataclasses.replace(gb, L=gb.L / 4.0)
    for kw in (dict(momentum="delta", delta=4.0),
               dict(adaptive_restart=True), dict(momentum="greedy")):
        cfg = BatchFISTAConfig(max_iter=50, check_every=50, **kw)
        ref = fista_gram_batch(
            gb, dataclasses.replace(cfg, check_every=0)
        )
        got = fista_gram_resident(gb, cfg, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5,
            err_msg=str(kw),
        )
    # decisive-regime armijo parity (cf. tests/test_kernel_armijo.py)
    acfg = BatchFISTAConfig(max_iter=5, check_every=5, backtracking=True)
    ref_a = fista_gram_batch(gb_low, acfg)
    got_a = fista_gram_resident(gb_low, acfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got_a.x), np.asarray(ref_a.x),
                               rtol=2e-4, atol=5e-4)


def test_resident_resume_is_exact():
    from fastoptsolver_tpu.kernels import ResidentSolveState

    gb = _window_problem(seed=5, B=130)  # non-multiple of the lane tile
    for kw in (dict(), dict(backtracking=True)):
        full = BatchFISTAConfig(max_iter=200, check_every=25,
                                rel_gap_tol=1e-6, **kw)
        half = dataclasses.replace(full, max_iter=75)
        straight = fista_gram_resident(gb, full, interpret=True)
        _, mid = fista_gram_resident(gb, half, interpret=True,
                                     return_state=True)
        assert isinstance(mid, ResidentSolveState)
        resumed = fista_gram_resident(gb, full, interpret=True, state0=mid)
        np.testing.assert_array_equal(
            np.asarray(resumed.x), np.asarray(straight.x), err_msg=str(kw)
        )
        np.testing.assert_array_equal(
            np.asarray(resumed.iters), np.asarray(straight.iters)
        )
    # the routed Gram surface pins a ResidentSolveState back to this engine
    from fastoptsolver_tpu.batch import solve_gram_batch

    res = solve_gram_batch(gb, full, interpret=True, state0=mid)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(straight.x))


def test_resident_state_does_not_resume_elsewhere():
    import pytest

    from fastoptsolver_tpu.batch import solve_gram_batch

    gb = _window_problem(seed=7, B=130)
    cfg = BatchFISTAConfig(max_iter=75, check_every=25, rel_gap_tol=1e-6)
    _, mid = fista_gram_resident(gb, cfg, interpret=True, return_state=True)
    with pytest.raises(ValueError, match="ResidentSolveState"):
        solve_gram_batch(gb, cfg, backend="xla", state0=mid)


def test_routed_resident_estimates_l_in_kernel():
    """solve_lasso_batch at window n builds WITHOUT the XLA power loop
    (make_gram_batch(estimate_l=False) → L sentinel) and estimates L
    in-kernel against the resident block — certified results match the
    external-L driver, and routed resume stays bit-exact (the resume path
    re-derives the identical in-kernel estimate)."""
    import dataclasses

    import jax.numpy as jnp

    from fastoptsolver_tpu.batch import solve_lasso_batch
    from fastoptsolver_tpu.kernels import ResidentSolveState

    rng = np.random.default_rng(11)
    B, m, n = 160, 300, 144
    A = jnp.asarray(rng.normal(size=(B, m, n)) / np.sqrt(n), jnp.float32)
    xt = np.zeros((B, n), np.float32)
    xt[:, :20] = rng.normal(size=(B, 20))
    b = jnp.einsum("bmn,bn->bm", A, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", A, b)), axis=1)
    cfg = BatchFISTAConfig(max_iter=600, check_every=25, rel_gap_tol=5e-6)

    gb_nol = make_gram_batch(A, b, a1, 0.0, estimate_l=False)
    np.testing.assert_array_equal(np.asarray(gb_nol.L), 1.0)  # sentinel

    res = solve_lasso_batch(A, b, a1, cfg=cfg, interpret=True)
    ref = fista_gram_batch(make_gram_batch(A, b, a1, 0.0), cfg)
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=2e-4, atol=2e-5)

    half = dataclasses.replace(cfg, max_iter=75)
    _, mid = solve_lasso_batch(A, b, a1, cfg=half, interpret=True,
                               return_state=True)
    assert isinstance(mid, ResidentSolveState)
    resumed = solve_lasso_batch(A, b, a1, cfg=cfg, interpret=True,
                                state0=mid)
    np.testing.assert_array_equal(np.asarray(resumed.x), np.asarray(res.x))


def test_resident_and_qstream_elastic_net():
    """alpha2 > 0 (elastic net — the smooth fold + plain prox_l1, reference
    iterative_solvers.py:166-167) through both wide-n engines."""
    rng = np.random.default_rng(21)
    for n in (144, 200):  # resident window, then qstream
        B, m = 140, 2 * n
        A = jnp.asarray(rng.normal(size=(B, m, n)) / np.sqrt(n), jnp.float32)
        xt = np.zeros((B, n), np.float32)
        xt[:, : n // 8] = rng.normal(size=(B, n // 8))
        b = jnp.einsum("bmn,bn->bm", A, jnp.asarray(xt))
        a1 = 0.05 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", A, b)), axis=1)
        gb = make_gram_batch(A, b, a1, 0.3)
        cfg = BatchFISTAConfig(max_iter=600, check_every=25, rel_gap_tol=5e-6)
        ref = fista_gram_batch(gb, cfg)
        got = fista_gram_vmem(gb, cfg, interpret=True)  # plan routes
        assert bool(np.asarray(got.converged).all()), n
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   rtol=2e-4, atol=2e-5, err_msg=str(n))
