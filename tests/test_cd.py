"""Coordinate-descent oracle: beats FISTA to the optimum, agrees with it."""
import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.problems import LeastSquares, generate_boston_like
from fastoptsolver_tpu.solvers import FISTAConfig, fista
from fastoptsolver_tpu.solvers.cd import CDConfig, cd, certified_optimum
from fastoptsolver_tpu.ops import lasso_duality_gap


def _problem(reg="lasso", a1=0.5, a2=0.0, seed=0):
    A, b, _ = generate_boston_like(m=300, seed=seed, noise_std=1.0, rho1=0.5, rho2=0.7)
    A = (A - A.mean(0)) / A.std(0)
    return LeastSquares.create(A, b, reg, a1, a2, dtype=jnp.float64)


def test_cd_reaches_machine_precision_optimum():
    p = _problem()
    res = cd(p, CDConfig(tol=1e-14))
    gap = float(lasso_duality_gap(p, res.x))
    assert gap <= 1e-10 * float(p.objective(res.x))
    # KKT: |grad_j| == alpha1 on support, <= alpha1 off support
    g = np.asarray(p.smooth_grad(res.x))
    x = np.asarray(res.x)
    on = np.abs(x) > 1e-12
    np.testing.assert_allclose(np.abs(g[on]), 0.5, rtol=1e-9)
    assert np.all(np.abs(g[~on]) <= 0.5 + 1e-9)


def test_cd_agrees_with_long_fista():
    for reg, a1, a2 in [("lasso", 0.5, 0.0), ("elasticnet", 0.4, 0.8), ("ridge", 0.0, 1.5)]:
        p = _problem(reg, a1, a2)
        x_cd, f_cd = certified_optimum(p)
        r_f = fista(p, FISTAConfig(max_iter=5000), key=jax.random.PRNGKey(0))
        assert float(f_cd) <= float(p.objective(r_f.x)) + 1e-9
        np.testing.assert_allclose(np.asarray(x_cd), np.asarray(r_f.x), rtol=1e-5, atol=1e-8)


def test_cd_ridge_closed_form():
    p = _problem("ridge", 0.0, 2.0)
    res = cd(p, CDConfig(tol=1e-14))
    A, b = np.asarray(p.A), np.asarray(p.b)
    x_star = np.linalg.solve(A.T @ A + 2.0 * np.eye(5), A.T @ b)
    np.testing.assert_allclose(np.asarray(res.x), x_star, rtol=1e-10)


def test_cd_vmappable():
    probs = [_problem(seed=s) for s in range(3)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[p.to_gram() for p in probs])
    cfg = CDConfig(tol=1e-13)
    xs = jax.vmap(lambda g: cd(g, cfg).x)(stacked)
    for i, p in enumerate(probs):
        single = cd(p, cfg)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(single.x), rtol=1e-9)
