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
