"""Step-for-step trajectory parity of the JAX solvers against the NumPy
oracle (oracle_np.py) implementing the reference recurrences (SURVEY.md §7
contract). Both sides receive the same Lipschitz constant so trajectories are
deterministic and comparable to ~1e-9 in float64."""
import numpy as np
import pytest
import jax.numpy as jnp

from fastoptsolver_tpu.problems import LeastSquares, generate_boston_like, fold_alphas
from fastoptsolver_tpu.solvers import (
    ISTAConfig,
    FISTAConfig,
    fista_delta_config,
    ista,
    ista_with_history,
    fista,
    fista_with_history,
)
from oracle_np import fista_np, ista_np, power_L


def _problem(reg="lasso", a1=0.5, a2=0.3, seed=0, noise=1.0, m=200):
    A, b, _ = generate_boston_like(m=m, seed=seed, noise_std=noise, rho1=0.5, rho2=0.7)
    # standardize columns so alphas are meaningful at O(1)
    A = (A - A.mean(0)) / A.std(0)
    p = LeastSquares.create(A, b, reg, a1, a2, dtype=jnp.float64)
    ea1, ea2, _ = fold_alphas(reg, a1, a2)
    L = power_L(A, np.ones(A.shape[1]))
    return p, A, b, ea1, ea2, L


CASES = [
    dict(reg="lasso", a1=0.5, a2=0.0),
    dict(reg="elasticnet", a1=0.5, a2=0.8),
    dict(reg="ridge", a1=0.0, a2=0.8),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("backtracking,t_factor", [(False, 1.0), (True, 1.0), (True, 2.0)])
def test_fista_trajectory_parity(case, backtracking, t_factor):
    p, A, b, a1, a2, L = _problem(**case)
    K = 60
    cfg = FISTAConfig(max_iter=K, backtracking=backtracking, t_init_factor=t_factor)
    res = fista_with_history(p, cfg, L=jnp.asarray(L))
    x_ref, tr = fista_np(
        A, b, a1, a2, L, backtracking=backtracking, t_init_factor=t_factor, max_iter=K
    )
    # rtol 1e-6: order-of-operations noise accumulates over K iterations
    # (a float-boundary Armijo accept can shift a trajectory by ~1e-8)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.history.obj), tr["obj"], rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(res.history.x), np.asarray(tr["x"]), rtol=1e-6, atol=1e-8
    )
    assert int(res.n_iters) == K
    assert bool(res.history.valid.all())


@pytest.mark.parametrize("case", CASES[:2])
def test_fista_adaptive_restart_parity(case):
    p, A, b, a1, a2, L = _problem(**case)
    K = 80
    cfg = FISTAConfig(max_iter=K, adaptive_restart=True, restart_threshold=1.0)
    res = fista_with_history(p, cfg, L=jnp.asarray(L))
    x_ref, tr = fista_np(A, b, a1, a2, L, adaptive_restart=True, max_iter=K)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.history.obj), tr["obj"], rtol=1e-8)


@pytest.mark.parametrize("delta", [2.5, 4.0, 10.0])
def test_fista_delta_parity(delta):
    p, A, b, a1, a2, L = _problem(reg="lasso", a1=0.5, a2=0.0)
    K = 60
    cfg = fista_delta_config(delta, max_iter=K)
    res = fista_with_history(p, cfg, L=jnp.asarray(L))
    x_ref, tr = fista_np(A, b, a1, a2, L, max_iter=K, delta=delta)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.history.obj), tr["obj"], rtol=1e-8)


def test_fista_delta_guard():
    with pytest.raises(ValueError):
        fista_delta_config(2.0)


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("backtracking", [False, True])
def test_ista_trajectory_parity(case, backtracking):
    p, A, b, a1, a2, L = _problem(**case)
    K = 50
    cfg = ISTAConfig(max_iter=K, backtracking=backtracking)
    res = ista_with_history(p, cfg, L=jnp.asarray(L))
    x_ref, tr = ista_np(A, b, a1, a2, L, backtracking=backtracking, max_iter=K)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.history.obj), tr["obj"], rtol=1e-8)


def test_ista_monotone_descent():
    # ISTA with a valid step is a descent method on the composite objective
    p, A, b, a1, a2, L = _problem(reg="lasso", a1=0.5, a2=0.0)
    res = ista_with_history(p, ISTAConfig(max_iter=100), L=jnp.asarray(L))
    objs = np.asarray(res.history.obj)
    assert np.all(np.diff(objs) <= 1e-10)


def test_stopping_rules_cut_iterations():
    p, A, b, a1, a2, L = _problem(reg="lasso", a1=0.5, a2=0.0)
    full = fista(p, FISTAConfig(max_iter=500), L=jnp.asarray(L))
    stopped = fista(p, FISTAConfig(max_iter=500, tol=1e-6), L=jnp.asarray(L))
    assert int(stopped.n_iters) < int(full.n_iters) == 500
    # oracle agrees on the stopped iterate and iteration count
    x_ref, tr = fista_np(A, b, a1, a2, L, max_iter=500, tol=1e-6)
    assert int(stopped.n_iters) == tr["n_iters"]
    np.testing.assert_allclose(np.asarray(stopped.x), x_ref, rtol=1e-7, atol=1e-9)

    ratio_stop = fista(p, FISTAConfig(max_iter=500, tol_ratio=0.5), L=jnp.asarray(L))
    x_ref2, tr2 = fista_np(A, b, a1, a2, L, max_iter=500, tol_ratio=0.5)
    assert int(ratio_stop.n_iters) == tr2["n_iters"] < 500


def test_while_and_scan_drivers_agree():
    p, A, b, a1, a2, L = _problem(reg="elasticnet", a1=0.4, a2=0.6)
    cfg = FISTAConfig(max_iter=70, backtracking=True)
    r1 = fista(p, cfg, L=jnp.asarray(L))
    r2 = fista_with_history(p, cfg, L=jnp.asarray(L))
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), rtol=1e-12)
    assert int(r1.n_iters) == int(r2.n_iters)
    assert int(r1.metrics.n_grad_evals) == int(r2.metrics.n_grad_evals) == 70


def test_gram_form_solver_matches_dense():
    p, A, b, a1, a2, L = _problem(reg="lasso", a1=0.5, a2=0.0)
    cfg = FISTAConfig(max_iter=100)
    rd = fista(p, cfg, L=jnp.asarray(L))
    rg = fista(p.to_gram(), cfg, L=jnp.asarray(L))
    np.testing.assert_allclose(np.asarray(rd.x), np.asarray(rg.x), rtol=1e-7, atol=1e-9)


def test_metrics_counters():
    p, A, b, a1, a2, L = _problem(reg="lasso", a1=0.5, a2=0.0)
    K = 30
    res = fista(p, FISTAConfig(max_iter=K, backtracking=True), L=jnp.asarray(L))
    assert int(res.metrics.n_grad_evals) == K
    assert int(res.metrics.n_ls_calls) == K
    assert int(res.metrics.ls_iters_total) >= 0


def test_fista_on_l1_logistic_regression():
    """Solver generality: FISTA on L1-regularized logistic regression (a
    problem family the reference cannot express), checked via first-order
    KKT optimality conditions."""
    from fastoptsolver_tpu.problems import LogisticRegression

    rng = np.random.default_rng(3)
    m, n = 150, 8
    A = rng.normal(size=(m, n))
    y = np.sign(A @ rng.normal(size=n) + 0.3 * rng.normal(size=m))
    a1 = 2.0
    p = LogisticRegression.create(A, y, alpha1=a1, alpha2=0.0, dtype=jnp.float64)
    # logistic Hessian bound: L <= ||A||^2 / 4
    L = 0.25 * float(np.linalg.eigvalsh(A.T @ A)[-1])
    res = fista(p, FISTAConfig(max_iter=3000), L=jnp.asarray(L))
    x = np.asarray(res.x)
    g = np.asarray(p.smooth_grad(res.x))
    # KKT for L1: |g_j| <= a1 off-support, g_j = -a1*sign(x_j) on support
    on = np.abs(x) > 1e-10
    assert np.all(np.abs(g[~on]) <= a1 + 1e-6)
    np.testing.assert_allclose(np.abs(g[on]), a1, rtol=1e-5)
