"""Sparse (BCOO) design matrices through the unchanged solver stack."""
import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.problems import LeastSquares, SparseLeastSquares
from fastoptsolver_tpu.solvers import (
    CDConfig,
    FISTAConfig,
    OWLQNConfig,
    certified_optimum,
    fista,
    owlqn,
)


def _sparse_data(rng, m=300, n=40, density=0.08):
    A = (rng.random((m, n)) < density) * rng.normal(size=(m, n))
    # ensure no all-zero column (keeps the lasso problem well-posed)
    for j in range(n):
        if not A[:, j].any():
            A[rng.integers(m), j] = rng.normal()
    x_true = np.zeros(n)
    x_true[: n // 4] = rng.normal(size=n // 4) * 2
    b = A @ x_true + 0.05 * rng.normal(size=m)
    return A, b


def test_sparse_matches_dense_fista(rng):
    A, b = _sparse_data(rng)
    sp = SparseLeastSquares.create(A, b, "lasso", alpha1=0.5, dtype=jnp.float64)
    dn = LeastSquares.create(A, b, "lasso", alpha1=0.5, dtype=jnp.float64)
    L = sp.lipschitz()
    r_sp = fista(sp, FISTAConfig(max_iter=5000), L=L)
    r_dn = fista(dn, FISTAConfig(max_iter=5000), L=L)
    np.testing.assert_allclose(np.asarray(r_sp.x), np.asarray(r_dn.x), atol=1e-10)


def test_sparse_gram_matches_cd_oracle(rng):
    A, b = _sparse_data(rng)
    sp = SparseLeastSquares.create(A, b, "elasticnet", alpha1=0.5, alpha2=0.2,
                                   dtype=jnp.float64)
    gram = sp.to_gram()
    dn_gram = LeastSquares.create(A, b, "elasticnet", alpha1=0.5, alpha2=0.2,
                                  dtype=jnp.float64).to_gram()
    np.testing.assert_allclose(np.asarray(gram.Q), np.asarray(dn_gram.Q), atol=1e-12)
    x_star, f_star = certified_optimum(gram, CDConfig(max_sweeps=50000, tol=1e-15))
    np.testing.assert_allclose(
        float(sp.objective(x_star)), float(f_star), rtol=1e-12
    )


def test_sparse_lipschitz_matches_dense_eig(rng):
    A, b = _sparse_data(rng)
    sp = SparseLeastSquares.create(A, b, "lasso", alpha1=0.5, dtype=jnp.float64)
    lmax = float(jnp.linalg.eigvalsh(jnp.asarray(A.T @ A))[-1])
    np.testing.assert_allclose(float(sp.lipschitz(n_iter=500, tol=1e-12)), lmax, rtol=1e-6)


def test_sparse_owlqn(rng):
    A, b = _sparse_data(rng)
    sp = SparseLeastSquares.create(A, b, "lasso", alpha1=1.0, dtype=jnp.float64)
    res = owlqn(sp, OWLQNConfig(max_iter=500, tol=1e-10))
    x_star, f_star = certified_optimum(sp.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    np.testing.assert_allclose(float(sp.objective(res.x)), float(f_star), rtol=1e-9)


def test_sparse_from_scipy(rng):
    import scipy.sparse as ssp

    A, b = _sparse_data(rng)
    sp = SparseLeastSquares.create(ssp.csr_matrix(A), b, "lasso", alpha1=0.5,
                                   dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(sp.A.todense()), A, atol=1e-12)
    assert 0.0 < sp.density < 0.15


def test_sparse_jit_and_solve(rng):
    A, b = _sparse_data(rng)
    sp = SparseLeastSquares.create(A, b, "lasso", alpha1=0.5)
    L = sp.lipschitz()
    solve = jax.jit(lambda p: fista(p, FISTAConfig(max_iter=1000), L=L).x)
    x = solve(sp)  # SparseLeastSquares is a pytree: jits as an argument
    assert np.isfinite(np.asarray(x)).all()
