"""SLOPE (sorted-L1) prox and problem family.

The prox implementation is the dense minimax isotonic projection
(ops/prox.py); the oracle here is an independent sequential
pool-adjacent-violators implementation in NumPy (the textbook stack
algorithm), plus closed-form special cases.
"""
import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.ops import isotonic_regression, prox_slope, slope_norm, soft_threshold
from fastoptsolver_tpu.problems import SlopeLeastSquares, slope_lambda_bh
from fastoptsolver_tpu.solvers import FISTAConfig, fista


def pav_nonincreasing(w):
    """Sequential PAV: project w onto the non-increasing cone (NumPy oracle)."""
    w = np.asarray(w, dtype=np.float64)
    # blocks as (mean, count) stack; merge while increasing
    means, counts = [], []
    for x in w:
        means.append(x)
        counts.append(1)
        while len(means) > 1 and means[-2] < means[-1]:
            m2, c2 = means.pop(), counts.pop()
            m1, c1 = means.pop(), counts.pop()
            means.append((m1 * c1 + m2 * c2) / (c1 + c2))
            counts.append(c1 + c2)
    return np.repeat(means, counts)


def prox_slope_np(v, lam):
    """Reference SLOPE prox (Bogdan et al. 2015) via the PAV oracle."""
    v = np.asarray(v, np.float64)
    lam = np.asarray(lam, np.float64)
    order = np.argsort(-np.abs(v))
    z = np.maximum(pav_nonincreasing(np.abs(v)[order] - lam), 0.0)
    out = np.empty_like(z)
    out[order] = z
    return np.sign(v) * out


def test_isotonic_matches_pav(rng):
    for _ in range(10):
        w = rng.normal(size=31)
        got = np.asarray(isotonic_regression(jnp.asarray(w), increasing=False))
        np.testing.assert_allclose(got, pav_nonincreasing(w), atol=1e-12)
        # non-decreasing = reversed problem
        got_inc = np.asarray(isotonic_regression(jnp.asarray(w), increasing=True))
        np.testing.assert_allclose(got_inc, pav_nonincreasing(w[::-1])[::-1], atol=1e-12)


def test_isotonic_is_projection(rng):
    """Output is feasible and no feasible perturbation is closer."""
    w = rng.normal(size=25)
    z = np.asarray(isotonic_regression(jnp.asarray(w), increasing=False))
    assert np.all(np.diff(z) <= 1e-12)
    base = np.sum((z - w) ** 2)
    for _ in range(50):
        d = rng.normal(size=25) * 0.1
        cand = np.minimum.accumulate(z + d)  # force feasibility
        assert np.sum((cand - w) ** 2) >= base - 1e-9


def test_prox_slope_matches_pav_oracle(rng):
    for n in (5, 16, 40):
        lam = np.sort(rng.uniform(0.0, 1.0, size=n))[::-1]
        for _ in range(5):
            v = rng.normal(size=n) * 3.0
            got = np.asarray(prox_slope(jnp.asarray(v), jnp.asarray(lam)))
            np.testing.assert_allclose(got, prox_slope_np(v, lam), atol=1e-10)


def test_prox_slope_constant_lambda_is_soft_threshold(rng):
    v = rng.normal(size=20)
    tau = 0.37
    got = prox_slope(jnp.asarray(v), jnp.full(20, tau))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(soft_threshold(jnp.asarray(v), tau)), atol=1e-12
    )


def test_prox_slope_prox_inequality(rng):
    """prox optimality: ½‖p−v‖² + h(p) ≤ ½‖y−v‖² + h(y) for random y."""
    n = 15
    lam = jnp.asarray(np.sort(rng.uniform(0.1, 1.0, n))[::-1])
    v = jnp.asarray(rng.normal(size=n) * 2)
    p = prox_slope(v, lam)
    obj = lambda y: 0.5 * float(jnp.sum((y - v) ** 2)) + float(slope_norm(y, lam))
    for _ in range(30):
        y = p + jnp.asarray(rng.normal(size=n) * 0.2)
        assert obj(p) <= obj(y) + 1e-9


def test_prox_slope_vmap(rng):
    n, B = 12, 7
    lam = jnp.asarray(np.sort(rng.uniform(0.1, 1.0, n))[::-1])
    V = jnp.asarray(rng.normal(size=(B, n)))
    batched = jax.vmap(lambda v: prox_slope(v, lam))(V)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(prox_slope(V[i], lam)), atol=1e-12
        )


def test_slope_lambda_bh_monotone():
    lam = np.asarray(slope_lambda_bh(20, q=0.1))
    assert np.all(np.diff(lam) <= 0) and np.all(lam > 0)


def test_slope_fista_fixed_point(rng):
    """FISTA on a SLOPE problem reaches a prox-gradient fixed point
    (the first-order optimality condition for the composite objective)."""
    m, n = 120, 12
    A = rng.normal(size=(m, n))
    x_true = np.zeros(n)
    x_true[:3] = [3.0, -2.0, 1.5]
    b = A @ x_true + 0.1 * rng.normal(size=m)
    lam = np.asarray(slope_lambda_bh(n, q=0.1, sigma=2.0))
    p = SlopeLeastSquares.create(A, b, lam, dtype=jnp.float64)
    res = fista(p, FISTAConfig(max_iter=4000), key=jax.random.PRNGKey(0))
    x = res.x
    L = float(jnp.linalg.norm(jnp.asarray(A).T @ jnp.asarray(A), ord=2))
    tau = 1.0 / L
    fp = p.prox(x - tau * p.smooth_grad(x), tau)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(x), atol=1e-7)
    # objective below the plain-lasso solution with lambda = lam.max()? not
    # required; but objective must beat x_true's (noisy) objective
    assert float(p.objective(x)) <= float(p.objective(jnp.asarray(x_true))) + 1e-9


def test_slope_clusters_correlated_features(rng):
    """SLOPE's signature behavior: highly correlated features get *equal*
    coefficient magnitudes (clustering), which the lasso does not guarantee."""
    m, n = 400, 6
    z = rng.normal(size=m)
    A = np.stack(
        [z + 0.01 * rng.normal(size=m), z + 0.01 * rng.normal(size=m)]
        + [rng.normal(size=m) for _ in range(n - 2)],
        axis=1,
    )
    b = A[:, 0] + A[:, 1] + 0.05 * rng.normal(size=m)
    lam = np.linspace(6.0, 1.0, n)
    p = SlopeLeastSquares.create(A, b, lam, dtype=jnp.float64)
    res = fista(p, FISTAConfig(max_iter=6000), key=jax.random.PRNGKey(1))
    x = np.asarray(res.x)
    assert abs(abs(x[0]) - abs(x[1])) < 1e-4
    assert abs(x[0]) > 0.1


def test_slope_create_validates_ladder(rng):
    A = rng.normal(size=(10, 4))
    b = rng.normal(size=10)
    import pytest

    with pytest.raises(ValueError):
        SlopeLeastSquares.create(A, b, [1.0, 2.0, 0.5, 0.1])
    with pytest.raises(ValueError):
        SlopeLeastSquares.create(A, b, [1.0, 0.5, -0.1, -0.2])
