"""Extended problem families run on the unchanged solvers."""
import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.problems import (
    NonNegativeLeastSquares,
    GroupLassoLeastSquares,
    BoxConstrainedLeastSquares,
)
from fastoptsolver_tpu.solvers import FISTAConfig, ISTAConfig, fista, ista


def _data(rng, m=120, n=12):
    A = rng.normal(size=(m, n))
    x_true = rng.normal(size=n)
    b = A @ x_true + 0.1 * rng.normal(size=m)
    return A, b


def test_nnls_matches_scipy(rng):
    from scipy.optimize import nnls as scipy_nnls

    A, b = _data(rng)
    p = NonNegativeLeastSquares.create(A, b, dtype=jnp.float64)
    res = fista(p, FISTAConfig(max_iter=5000), key=jax.random.PRNGKey(0))
    x_ref, _ = scipy_nnls(A, b)
    x = np.asarray(res.x)
    assert np.all(x >= 0)
    np.testing.assert_allclose(
        float(p.objective(res.x)), 0.5 * np.sum((A @ x_ref - b) ** 2), rtol=1e-8
    )
    np.testing.assert_allclose(x, x_ref, rtol=1e-3, atol=1e-6)


def test_nnls_with_l1_sparser(rng):
    A, b = _data(rng)
    p0 = NonNegativeLeastSquares.create(A, b, alpha1=0.0, dtype=jnp.float64)
    p5 = NonNegativeLeastSquares.create(A, b, alpha1=5.0, dtype=jnp.float64)
    x0 = np.asarray(fista(p0, FISTAConfig(max_iter=3000)).x)
    x5 = np.asarray(fista(p5, FISTAConfig(max_iter=3000)).x)
    assert (np.abs(x5) > 1e-8).sum() <= (np.abs(x0) > 1e-8).sum()
    assert np.all(x5 >= 0)


def test_group_lasso_group_sparsity(rng):
    m, n, gs = 150, 12, 3
    A = rng.normal(size=(m, n))
    x_true = np.zeros(n)
    x_true[0:3] = [2.0, -1.5, 1.0]   # group 0 active
    x_true[6:9] = [0.5, 1.2, -0.8]   # group 2 active
    b = A @ x_true + 0.05 * rng.normal(size=m)
    p = GroupLassoLeastSquares.create(A, b, alpha_g=4.0, group_size=gs, dtype=jnp.float64)
    res = fista(p, FISTAConfig(max_iter=4000), key=jax.random.PRNGKey(0))
    x = np.asarray(res.x).reshape(-1, gs)
    active = np.linalg.norm(x, axis=1) > 1e-6
    # groups die together: a group is either fully zero or fully dense-ish
    assert active[0] and active[2]
    # KKT: for inactive groups, ||A_g^T r|| <= alpha_g
    r = A @ np.asarray(res.x) - b
    for g in np.nonzero(~active)[0]:
        cols = slice(g * gs, (g + 1) * gs)
        assert np.linalg.norm(A[:, cols].T @ r) <= 4.0 + 1e-6


def test_box_constrained(rng):
    A, b = _data(rng)
    p = BoxConstrainedLeastSquares.create(A, b, lower=-0.5, upper=0.5, dtype=jnp.float64)
    res = ista(p, ISTAConfig(max_iter=3000), key=jax.random.PRNGKey(0))
    x = np.asarray(res.x)
    assert np.all(x >= -0.5 - 1e-12) and np.all(x <= 0.5 + 1e-12)
    # KKT: interior coords have zero gradient; boundary coords push outward
    g = np.asarray(p.smooth_grad(res.x))
    interior = (np.abs(x) < 0.5 - 1e-9)
    np.testing.assert_allclose(g[interior], 0.0, atol=1e-5)
    assert np.all(g[x >= 0.5 - 1e-9] <= 1e-9)
    assert np.all(g[x <= -0.5 + 1e-9] >= -1e-9)


def test_weighted_ls_matches_closed_form(rng):
    from fastoptsolver_tpu.problems import WeightedLeastSquares
    from fastoptsolver_tpu.solvers import LBFGSConfig, lbfgs

    A, b = _data(rng)
    w = rng.uniform(0.1, 3.0, size=A.shape[0])
    p = WeightedLeastSquares.create(A, b, w, "ridge", alpha2=0.5, dtype=jnp.float64)
    res = lbfgs(p, LBFGSConfig(max_iter=500, tol=1e-12))
    W = np.diag(w)
    x_ref = np.linalg.solve(A.T @ W @ A + 0.5 * np.eye(A.shape[1]), A.T @ W @ b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-6)


def test_weighted_ls_lasso_gram_consistent(rng):
    from fastoptsolver_tpu.problems import WeightedLeastSquares
    from fastoptsolver_tpu.solvers import CDConfig, certified_optimum

    A, b = _data(rng)
    w = rng.uniform(0.1, 3.0, size=A.shape[0])
    p = WeightedLeastSquares.create(A, b, w, "lasso", alpha1=2.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    # Gram form and direct form agree on the objective at the optimum
    np.testing.assert_allclose(float(p.objective(x_star)), float(f_star), rtol=1e-10)
    res = fista(p, FISTAConfig(max_iter=20000), key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(p.objective(res.x)), float(f_star), rtol=1e-9
    )


def test_huber_equals_ls_for_large_delta(rng):
    from fastoptsolver_tpu.problems import HuberRegression, LeastSquares
    from fastoptsolver_tpu.ops import estimate_lipschitz

    A, b = _data(rng)
    hub = HuberRegression.create(A, b, delta=1e6, alpha1=1.0, dtype=jnp.float64)
    ls = LeastSquares.create(A, b, "lasso", alpha1=1.0, dtype=jnp.float64)
    L = estimate_lipschitz(jnp.asarray(A)) + 0.0
    r_h = fista(hub, FISTAConfig(max_iter=10000), L=L)
    r_l = fista(ls, FISTAConfig(max_iter=10000), L=L)
    np.testing.assert_allclose(np.asarray(r_h.x), np.asarray(r_l.x), atol=1e-8)


def test_huber_robust_to_outliers(rng):
    from fastoptsolver_tpu.problems import HuberRegression, LeastSquares
    from fastoptsolver_tpu.ops import estimate_lipschitz

    m, n = 200, 8
    A = rng.normal(size=(m, n))
    x_true = rng.normal(size=n)
    b = A @ x_true + 0.05 * rng.normal(size=m)
    b[:10] += 50.0 * rng.choice([-1.0, 1.0], size=10)  # gross outliers
    L = estimate_lipschitz(jnp.asarray(A))
    hub = HuberRegression.create(A, b, delta=0.5, dtype=jnp.float64)
    ls = LeastSquares.create(A, b, "lasso", alpha1=0.0, dtype=jnp.float64)
    x_h = np.asarray(fista(hub, FISTAConfig(max_iter=10000), L=L).x)
    x_l = np.asarray(fista(ls, FISTAConfig(max_iter=10000), L=L).x)
    assert np.linalg.norm(x_h - x_true) < 0.3 * np.linalg.norm(x_l - x_true)


def test_huber_gradient_matches_autodiff(rng):
    from fastoptsolver_tpu.problems import HuberRegression

    A, b = _data(rng)
    p = HuberRegression.create(A, b, delta=0.7, alpha2=0.3, dtype=jnp.float64)
    x = jnp.asarray(rng.normal(size=A.shape[1]), jnp.float64)
    g_auto = jax.grad(p.smooth_value)(x)
    np.testing.assert_allclose(np.asarray(p.smooth_grad(x)), np.asarray(g_auto), atol=1e-10)


def test_svrg_via_solve_api(rng):
    from fastoptsolver_tpu import solve
    from fastoptsolver_tpu.problems import LeastSquares
    from fastoptsolver_tpu.solvers import CDConfig, certified_optimum

    A, b = _data(rng, m=300)
    res = solve(A, b, "lasso", alpha1=2.0, method="svrg", dtype=jnp.float64,
                epochs=200, batch=64, tol=0.0, key=jax.random.PRNGKey(0))
    p = LeastSquares.create(A, b, "lasso", alpha1=2.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    assert float(p.objective(res.x)) - float(f_star) < 1e-8
