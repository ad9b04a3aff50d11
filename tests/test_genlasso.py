"""Generalized lasso (fused lasso / TV denoising / trend filtering).

Oracles: (a) D=I reduction → the certified coordinate-descent optimum,
(b) 1D TV → independent dual projected-gradient oracle (oracle_np.tv1d_np),
(c) trend filtering → direct KKT verification, (d) fused-lasso signal
approximator → the Friedman et al. (2007) prox composition identity
soft_threshold(prox_TV(y), λ_sparse).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastoptsolver_tpu.solvers import (
    GenLassoConfig,
    certified_optimum,
    difference_matrix,
    fused_lasso,
    gen_lasso,
    trend_filter,
    tv_denoise,
)
from fastoptsolver_tpu.problems import LeastSquares

from oracle_np import tv1d_np, shrink, objective_np


CFG = GenLassoConfig(abstol=1e-9, reltol=1e-9, max_iter=20000)


def _rand_problem(m=40, n=8, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    x_true = np.where(rng.random(n) < 0.5, 0.0, rng.normal(size=n))
    b = A @ x_true + 0.1 * rng.normal(size=m)
    return A, b


def test_identity_D_reduces_to_lasso():
    A, b = _rand_problem()
    a1 = 3.0
    res = gen_lasso(A, b, np.eye(A.shape[1]), alpha1=a1, config=CFG,
                    dtype=jnp.float64)
    assert bool(res.converged)
    p = LeastSquares.create(A, b, "lasso", a1, 0.0, dtype=jnp.float64)
    x_star, _ = certified_optimum(p)
    f_star = objective_np(np.asarray(x_star), A, b, a1, 0.0)
    f_admm = objective_np(np.asarray(res.x), A, b, a1, 0.0)
    assert f_admm <= f_star + 1e-7 * max(1.0, abs(f_star))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star),
                               atol=1e-5)


def test_identity_D_with_ridge_matches_elasticnet():
    A, b = _rand_problem(seed=3)
    a1, a2 = 2.0, 1.5
    res = gen_lasso(A, b, np.eye(A.shape[1]), alpha1=a1, alpha2=a2,
                    config=CFG, dtype=jnp.float64)
    p = LeastSquares.create(A, b, "elasticnet", a1, a2, dtype=jnp.float64)
    x_star, _ = certified_optimum(p)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star),
                               atol=1e-5)


def test_tv_denoise_matches_dual_oracle():
    rng = np.random.default_rng(1)
    y = np.concatenate(
        [np.full(20, 1.0), np.full(20, -2.0), np.full(20, 0.5)]
    ) + 0.3 * rng.normal(size=60)
    lam = 2.0
    res = tv_denoise(y, lam, config=CFG, dtype=jnp.float64)
    assert bool(res.converged)
    x_oracle = tv1d_np(y, lam)
    np.testing.assert_allclose(np.asarray(res.x), x_oracle, atol=1e-6)
    # z carries the exactly-thresholded differences: zero z rows mean the
    # segment is constant through them in z-space.
    z = np.asarray(res.z)
    assert (np.abs(z) < 1e-12).sum() > 40  # mostly piecewise constant


def test_trend_filter_kkt():
    rng = np.random.default_rng(2)
    n = 50
    t = np.arange(n, dtype=np.float64)
    y = np.where(t < 25, 0.3 * t, 0.3 * 25 - 0.5 * (t - 25))
    y = y + 0.2 * rng.normal(size=n)
    lam = 10.0
    res = trend_filter(y, lam, order=2, config=CFG, dtype=jnp.float64)
    assert bool(res.converged)
    x = np.asarray(res.x)
    D = difference_matrix(n, 2, np.float64)
    # Stationarity: x − y + λ·Dᵀs = 0 with s ∈ ∂‖Dx‖₁. Dᵀ has full column
    # rank, so s is uniquely pinv(Dᵀ)(y − x)/λ; box + sign conditions verify.
    s = np.linalg.pinv(D.T) @ (y - x) / lam
    assert np.abs(s).max() <= 1.0 + 1e-5
    Dx = D @ x
    active = np.abs(Dx) > 1e-6
    assert active.sum() >= 1  # the kink survives
    np.testing.assert_allclose(s[active], np.sign(Dx[active]), atol=1e-5)


def test_fused_lasso_signal_prox_composition():
    """For A = I: argmin ½‖x−y‖² + λf·TV(x) + λs·‖x‖₁ =
    soft_threshold(prox_TV(y, λf), λs) — Friedman et al. 2007, Prop. 1."""
    rng = np.random.default_rng(4)
    y = np.concatenate([np.full(15, 2.0), np.full(15, 0.2), np.full(15, -1.5)])
    y = y + 0.25 * rng.normal(size=45)
    lf, ls = 1.5, 0.3
    res = fused_lasso(np.eye(45), y, alpha_fuse=lf, alpha_sparse=ls,
                      config=CFG, dtype=jnp.float64)
    assert bool(res.converged)
    expected = shrink(tv1d_np(y, lf), ls)
    np.testing.assert_allclose(np.asarray(res.x), expected, atol=1e-6)


def test_fused_lasso_strong_fusion_goes_constant():
    A, b = _rand_problem(m=30, n=6, seed=5)
    res = fused_lasso(A, b, alpha_fuse=1e4, config=CFG, dtype=jnp.float64)
    x = np.asarray(res.x)
    assert np.ptp(x) < 1e-4  # fully fused: one constant level


def test_gen_lasso_vmaps_over_instances():
    rng = np.random.default_rng(6)
    A = rng.normal(size=(30, 6))
    Bs = rng.normal(size=(4, 30))
    D = difference_matrix(6, 1, np.float64)
    cfg = GenLassoConfig(abstol=1e-10, reltol=1e-10, max_iter=4000)
    batched = jax.vmap(
        lambda b: gen_lasso(A, b, D, alpha1=1.0, config=cfg,
                            dtype=jnp.float64).x
    )(jnp.asarray(Bs))
    for i in range(4):
        single = gen_lasso(A, Bs[i], D, alpha1=1.0, config=cfg,
                           dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single.x), atol=1e-6)
