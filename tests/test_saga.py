"""Prox-SAGA: incremental variance-reduced solver vs oracles (mirrors
tests/test_svrg.py — the two stochastic solvers share one contract)."""
import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu import solve
from fastoptsolver_tpu.problems import LeastSquares, NonNegativeLeastSquares
from fastoptsolver_tpu.solvers import (
    CDConfig,
    SAGAConfig,
    certified_optimum,
    prox_saga,
)


def _data(rng, m=600, n=15):
    A = rng.normal(size=(m, n))
    x_true = np.zeros(n)
    x_true[: n // 3] = rng.normal(size=n // 3) * 2
    b = A @ x_true + 0.1 * rng.normal(size=m)
    return A, b


def test_saga_lasso_matches_cd_oracle(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "lasso", alpha1=3.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    res = prox_saga(p, SAGAConfig(epochs=200, batch=64, tol=0.0), key=jax.random.PRNGKey(0))
    assert float(p.objective(res.x)) - float(f_star) < 1e-9
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star), atol=1e-5)


def test_saga_elasticnet(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "elasticnet", alpha1=2.0, alpha2=1.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    res = prox_saga(p, SAGAConfig(epochs=200, batch=64, tol=0.0), key=jax.random.PRNGKey(1))
    assert float(p.objective(res.x)) - float(f_star) < 1e-9


def test_saga_nonneg_prox_generic(rng):
    from scipy.optimize import nnls as scipy_nnls

    A, b = _data(rng, m=300, n=10)
    p = NonNegativeLeastSquares.create(A, b, dtype=jnp.float64)
    res = prox_saga(p, SAGAConfig(epochs=300, batch=64, tol=0.0), key=jax.random.PRNGKey(2))
    x = np.asarray(res.x)
    x_ref, _ = scipy_nnls(np.asarray(A), np.asarray(b))
    assert np.all(x >= 0)
    np.testing.assert_allclose(
        float(p.objective(res.x)), 0.5 * np.sum((A @ x_ref - b) ** 2), rtol=1e-7
    )


def test_saga_early_stop_freezes(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "lasso", alpha1=3.0, dtype=jnp.float64)
    res = prox_saga(p, SAGAConfig(epochs=400, batch=64, tol=1e-14), key=jax.random.PRNGKey(0))
    assert int(res.n_iters) < 400


def test_saga_deterministic_given_key(rng):
    A, b = _data(rng, m=200, n=8)
    p = LeastSquares.create(A, b, "lasso", alpha1=1.0, dtype=jnp.float64)
    r1 = prox_saga(p, SAGAConfig(epochs=20, batch=32), key=jax.random.PRNGKey(5))
    r2 = prox_saga(p, SAGAConfig(epochs=20, batch=32), key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_saga_via_solve_api(rng):
    A, b = _data(rng, m=400, n=12)
    res = solve(A, b, "lasso", alpha1=2.0, method="saga", dtype=jnp.float64,
                epochs=200, batch=64, tol=0.0, key=jax.random.PRNGKey(3))
    p = LeastSquares.create(A, b, "lasso", alpha1=2.0, dtype=jnp.float64)
    _, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    assert float(p.objective(res.x)) - float(f_star) < 1e-7


def test_saga_vmapped(rng):
    B, m, n = 3, 200, 8
    A = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float64)
    b = jnp.asarray(rng.normal(size=(B, m)), jnp.float64)

    def solve_one(Ai, bi, key):
        p = LeastSquares(
            A=Ai, b=bi,
            alpha1=jnp.asarray(1.0, jnp.float64),
            alpha2=jnp.asarray(0.0, jnp.float64),
        )
        return prox_saga(p, SAGAConfig(epochs=80, batch=50, tol=0.0), key=key).x

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    batched = jax.vmap(solve_one)(A, b, keys)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(solve_one(A[i], b[i], keys[i])),
            atol=1e-7,
        )
