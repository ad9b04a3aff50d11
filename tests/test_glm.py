"""Quantile and Poisson regression families on the unchanged solver stack."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.problems import PoissonRegression, QuantileRegression
from fastoptsolver_tpu.solvers import FISTAConfig, ISTAConfig, fista, ista


# ---------------------------------------------------------------- quantile

def test_quantile_grad_matches_autodiff(rng):
    A = rng.normal(size=(40, 6))
    b = rng.normal(size=40)
    p = QuantileRegression.create(A, b, tau=0.3, mu=0.05, alpha2=0.7,
                                  dtype=jnp.float64)
    x = jnp.asarray(rng.normal(size=6))
    got = p.smooth_grad(x)
    want = jax.grad(p.smooth_value)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)
    v, g = p.smooth_value_and_grad(x)
    np.testing.assert_allclose(float(v), float(p.smooth_value(x)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-10)


@pytest.mark.parametrize("tau", [0.25, 0.5, 0.9])
def test_quantile_intercept_recovers_sample_quantile(rng, tau):
    """With A = a column of ones and no regularization, the minimizer of the
    (smoothed) pinball objective is the sample τ-quantile of b."""
    m = 2001
    b = rng.normal(size=m) ** 3  # skewed: mean far from median
    A = np.ones((m, 1))
    p = QuantileRegression.create(A, b, tau=tau, mu=1e-3, dtype=jnp.float64)
    want = float(np.quantile(b, tau))
    # The global bound L = m/mu is hugely pessimistic (almost no residuals sit
    # in the width-mu quadratic band), so fixed-step FISTA crawls; Armijo
    # backtracking from a large initial step is the designed-for remedy.
    res = fista(
        p,
        FISTAConfig(
            max_iter=3000,
            backtracking=True,
            t_init_factor=1e4,
            adaptive_restart=True,
        ),
        key=jax.random.PRNGKey(0),
    )
    got = float(res.x[0])
    assert abs(got - want) < 0.01, (got, want)


def test_quantile_median_robust_to_outliers(rng):
    """τ=0.5 fit ignores gross outliers that wreck the least-squares fit."""
    m, n = 300, 4
    A = rng.normal(size=(m, n))
    x_true = np.array([1.0, -2.0, 0.5, 3.0])
    b = A @ x_true + 0.05 * rng.normal(size=m)
    b[:20] += 80.0  # corrupt
    p = QuantileRegression.create(A, b, tau=0.5, mu=0.01, dtype=jnp.float64)
    res = fista(p, FISTAConfig(max_iter=5000), key=jax.random.PRNGKey(0))
    assert np.max(np.abs(np.asarray(res.x) - x_true)) < 0.05
    xls = np.linalg.lstsq(A, b, rcond=None)[0]
    assert np.max(np.abs(xls - x_true)) > 0.5  # LS is indeed wrecked


def test_quantile_l1_sparsifies(rng):
    A = rng.normal(size=(200, 10))
    b = A[:, 0] * 2.0 + 0.1 * rng.normal(size=200)
    dense = fista(
        QuantileRegression.create(A, b, 0.5, 0.05, alpha1=0.0, dtype=jnp.float64),
        FISTAConfig(max_iter=3000),
    ).x
    sparse = fista(
        QuantileRegression.create(A, b, 0.5, 0.05, alpha1=20.0, dtype=jnp.float64),
        FISTAConfig(max_iter=3000),
    ).x
    nnz = lambda x: int(np.sum(np.abs(np.asarray(x)) > 1e-8))
    assert nnz(sparse) < nnz(dense)
    assert abs(float(sparse[0])) > 0.5  # true feature survives


def test_quantile_create_validates():
    A = np.ones((5, 2))
    b = np.zeros(5)
    with pytest.raises(ValueError):
        QuantileRegression.create(A, b, tau=0.0)
    with pytest.raises(ValueError):
        QuantileRegression.create(A, b, tau=1.5)
    with pytest.raises(ValueError):
        QuantileRegression.create(A, b, mu=0.0)


# ---------------------------------------------------------------- poisson

def _poisson_data(rng, m=300, n=6):
    A = rng.normal(size=(m, n)) * 0.4
    x_true = np.zeros(n)
    x_true[:3] = [0.8, -0.5, 0.3]
    lam = np.exp(A @ x_true)
    b = rng.poisson(lam).astype(float)
    return A, b, x_true


def test_poisson_grad_matches_autodiff(rng):
    A, b, _ = _poisson_data(rng, m=50)
    p = PoissonRegression.create(A, b, alpha2=0.3, dtype=jnp.float64)
    x = jnp.asarray(rng.normal(size=6) * 0.2)
    np.testing.assert_allclose(
        np.asarray(p.smooth_grad(x)),
        np.asarray(jax.grad(p.smooth_value)(x)),
        rtol=1e-10,
    )


def test_poisson_matches_scipy_mle(rng):
    """Unregularized fit (backtracking FISTA) matches a SciPy BFGS oracle on
    the same NLL to high accuracy."""
    from scipy.optimize import minimize

    A, b, _ = _poisson_data(rng)

    def f_np(x):
        eta = A @ x
        return np.sum(np.exp(eta) - b * eta)

    def g_np(x):
        return A.T @ (np.exp(A @ x) - b)

    ref = minimize(f_np, np.zeros(A.shape[1]), jac=g_np, method="BFGS",
                   options={"gtol": 1e-10})
    p = PoissonRegression.create(A, b, dtype=jnp.float64)
    res = fista(
        p,
        FISTAConfig(max_iter=4000, backtracking=True),
        key=jax.random.PRNGKey(0),
    )
    assert float(p.smooth_value(res.x)) <= ref.fun + 1e-6
    np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-4)


def test_poisson_l1_fixed_point_and_sparsity(rng):
    A, b, x_true = _poisson_data(rng, m=500, n=8)
    p = PoissonRegression.create(A, b, alpha1=6.0, dtype=jnp.float64)
    res = fista(
        p,
        FISTAConfig(max_iter=5000, backtracking=True, adaptive_restart=True),
        key=jax.random.PRNGKey(0),
    )
    x = res.x
    # prox-grad fixed point at a small step => first-order optimality.
    # atol reflects prox-gradient's slow tail on near-degenerate coordinates
    # (|grad_j| ≈ α₁ at the support boundary); the gradient scale here is ~70.
    tau = 1e-3
    fp = p.prox(x - tau * p.smooth_grad(x), tau)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(x), atol=2e-3)
    assert int(np.sum(np.abs(np.asarray(x)) > 1e-8)) < 8


def test_poisson_ista_monotone(rng):
    A, b, _ = _poisson_data(rng, m=200)
    p = PoissonRegression.create(A, b, alpha1=1.0, dtype=jnp.float64)
    res = ista(
        p,
        ISTAConfig(max_iter=200, backtracking=True),
        key=jax.random.PRNGKey(0),
    )
    # ISTA with Armijo backtracking is monotone in the smooth model; check
    # final objective is below start
    assert float(p.objective(res.x)) < float(p.objective(p.x0()))
