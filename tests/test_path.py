"""Regularization path solving."""
import numpy as np
import jax.numpy as jnp

from fastoptsolver_tpu.batch import lasso_path, alpha_ladder
from fastoptsolver_tpu.batch.fista_gram import BatchFISTAConfig
from fastoptsolver_tpu.problems import LeastSquares, generate_boston_like
from oracle_np import fista_np


def _problem():
    A, b, _ = generate_boston_like(m=300, seed=0, noise_std=1.0, rho1=0.5, rho2=0.7)
    A = (A - A.mean(0)) / A.std(0)
    return LeastSquares.create(A, b, "lasso", 1.0, 0.0, dtype=jnp.float64), A, b


def test_alpha_ladder():
    al = np.asarray(alpha_ladder(10.0, 5, 1e-2))
    assert al[0] == 10.0
    np.testing.assert_allclose(al[-1], 0.1, rtol=1e-6)
    assert np.all(np.diff(al) < 0)


def test_lasso_path_batched():
    p, A, b = _problem()
    alphas, res = lasso_path(p, n_alphas=12, eps=1e-3,
                             cfg=BatchFISTAConfig(max_iter=3000, check_every=25))
    assert bool(np.asarray(res.converged).all())
    x = np.asarray(res.x)
    # at alpha_max the solution is exactly zero
    np.testing.assert_allclose(x[0], 0.0, atol=1e-10)
    # sparsity decreases (weakly) along the descending path
    nnz = (np.abs(x) > 1e-8).sum(axis=1)
    assert nnz[0] <= nnz[-1]
    assert nnz[-1] >= 4
    # spot-check a middle alpha against the oracle
    k = 6
    L = float(np.linalg.eigvalsh(A.T @ A)[-1])
    x_ref, _ = fista_np(A, b, float(alphas[k]), 0.0, L, max_iter=5000)
    # path certifies 1e-6 rel gap -> ~1e-4-level x accuracy
    np.testing.assert_allclose(x[k], x_ref, rtol=1e-3, atol=1e-5)


def test_lasso_path_warm_start_agrees():
    p, A, b = _problem()
    alphas, batched = lasso_path(p, n_alphas=6,
                                 cfg=BatchFISTAConfig(max_iter=3000, check_every=25))
    _, warm = lasso_path(p, alphas=alphas, warm_start=True,
                         cfg=BatchFISTAConfig(max_iter=3000, check_every=25))
    assert bool(np.asarray(warm.converged).all())
    np.testing.assert_allclose(
        np.asarray(warm.x), np.asarray(batched.x), rtol=1e-3, atol=1e-5
    )
    # warm start should use fewer total iterations than cold per-alpha solving
    assert int(warm.n_iters_total) <= 6 * 3000
