"""Multi-task (joint-sparsity) regression: matrix-iterate solvers vs the
scikit-learn coordinate-descent oracle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.estimators import MultiTaskLasso
from fastoptsolver_tpu.problems import MultiTaskLeastSquares
from fastoptsolver_tpu.solvers import FISTAConfig, fista


def _data(rng, m=150, n=12, T=4):
    A = rng.normal(size=(m, n))
    W = np.zeros((n, T))
    W[0] = rng.normal(size=T) + 2.0
    W[3] = rng.normal(size=T) - 1.5
    W[7] = rng.normal(size=T) * 0.5 + 1.0
    B = A @ W + 0.05 * rng.normal(size=(m, T))
    return A, B, W


def test_matrix_fista_kkt(rng):
    """First-order optimality of the matrix iterate: active rows satisfy
    A_jᵀR = −α·x_j/‖x_j‖, inactive rows ‖A_jᵀR‖ ≤ α."""
    A, B, _ = _data(rng)
    alpha = 8.0
    p = MultiTaskLeastSquares.create(A, B, alpha1=alpha, dtype=jnp.float64)
    res = fista(p, FISTAConfig(max_iter=6000), key=jax.random.PRNGKey(0))
    X = np.asarray(res.x)
    G = np.asarray(p.smooth_grad(res.x))  # Aᵀ(AX−B)
    row_norms = np.linalg.norm(X, axis=1)
    for j in range(X.shape[0]):
        if row_norms[j] > 1e-8:
            np.testing.assert_allclose(
                G[j], -alpha * X[j] / row_norms[j], atol=1e-6
            )
        else:
            assert np.linalg.norm(G[j]) <= alpha + 1e-6


def test_rows_die_together(rng):
    A, B, W = _data(rng)
    p = MultiTaskLeastSquares.create(A, B, alpha1=25.0, dtype=jnp.float64)
    res = fista(p, FISTAConfig(max_iter=5000), key=jax.random.PRNGKey(0))
    X = np.asarray(res.x)
    for j in range(X.shape[0]):
        r = np.abs(X[j])
        # whole row zero or whole row nonzero — no per-task partial support
        assert np.all(r < 1e-10) or np.all(r > 1e-12)
    active = np.linalg.norm(X, axis=1) > 1e-8
    assert active[0] and active[3]  # strong true rows survive


def test_estimator_matches_sklearn(rng):
    from sklearn.linear_model import MultiTaskLasso as SkMTL

    A, B, _ = _data(rng, m=200)
    for alpha in (0.05, 0.3):
        ours = MultiTaskLasso(alpha=alpha, max_iter=8000, dtype=jnp.float64).fit(A, B)
        sk = SkMTL(alpha=alpha, max_iter=50000, tol=1e-12).fit(A, B)
        np.testing.assert_allclose(ours.coef_, sk.coef_, atol=2e-4)
        np.testing.assert_allclose(ours.intercept_, sk.intercept_, atol=2e-4)
        assert ours.score(A, B) == pytest.approx(sk.score(A, B), abs=1e-5)


def test_estimator_no_intercept(rng):
    from sklearn.linear_model import MultiTaskLasso as SkMTL

    A, B, _ = _data(rng)
    ours = MultiTaskLasso(alpha=0.1, fit_intercept=False, max_iter=8000,
                          dtype=jnp.float64).fit(A, B)
    sk = SkMTL(alpha=0.1, fit_intercept=False, max_iter=50000, tol=1e-12).fit(A, B)
    np.testing.assert_allclose(ours.coef_, sk.coef_, atol=2e-4)
    assert np.allclose(ours.intercept_, 0.0)


def test_single_task_reduces_to_group_free_lasso(rng):
    """T=1 multi-task lasso == plain lasso with the same α (row norm = |x|)."""
    from fastoptsolver_tpu.problems import LeastSquares

    A, B, _ = _data(rng, T=1)
    alpha = 5.0
    mt = fista(
        MultiTaskLeastSquares.create(A, B, alpha1=alpha, dtype=jnp.float64),
        FISTAConfig(max_iter=6000),
        key=jax.random.PRNGKey(0),
    )
    single = fista(
        LeastSquares.create(A, B[:, 0], "lasso", alpha, dtype=jnp.float64),
        FISTAConfig(max_iter=6000),
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(mt.x)[:, 0], np.asarray(single.x), atol=1e-8
    )


def test_create_validates_shape(rng):
    with pytest.raises(ValueError):
        MultiTaskLeastSquares.create(rng.normal(size=(10, 3)),
                                     rng.normal(size=10))
