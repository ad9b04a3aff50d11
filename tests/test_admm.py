"""ADMM: single-device vs CD/SciPy oracles, generic prox coverage, vmapped
batching, and the consensus (row-sharded, one-psum-per-iteration) form."""
import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.problems import (
    BoxConstrainedLeastSquares,
    GramLeastSquares,
    LeastSquares,
    NonNegativeLeastSquares,
)
from fastoptsolver_tpu.solvers import ADMMConfig, admm, CDConfig, certified_optimum
from fastoptsolver_tpu.solvers.fista import fista
from fastoptsolver_tpu.solvers import FISTAConfig


def _data(rng, m=200, n=16):
    A = rng.normal(size=(m, n))
    x_true = np.zeros(n)
    x_true[: n // 3] = rng.normal(size=n // 3)
    b = A @ x_true + 0.1 * rng.normal(size=m)
    return A, b


def test_admm_lasso_matches_cd_oracle(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "lasso", alpha1=2.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=20000, tol=1e-14))
    res = admm(p, ADMMConfig(max_iter=2000))
    assert bool(res.converged)
    np.testing.assert_allclose(float(p.objective(res.x)), float(f_star), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star), atol=1e-6)


def test_admm_gram_form_same_answer(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "elasticnet", alpha1=1.0, alpha2=0.5, dtype=jnp.float64)
    r_dense = admm(p, ADMMConfig(max_iter=2000))
    r_gram = admm(p.to_gram(), ADMMConfig(max_iter=2000))
    np.testing.assert_allclose(np.asarray(r_dense.x), np.asarray(r_gram.x), atol=1e-8)


def test_admm_elasticnet_matches_fista(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "elasticnet", alpha1=1.5, alpha2=0.8, dtype=jnp.float64)
    res = admm(p, ADMMConfig(max_iter=2000))
    ref = fista(p, FISTAConfig(max_iter=20000), key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(p.objective(res.x)), float(p.objective(ref.x)), rtol=1e-9
    )


def test_admm_nnls_matches_scipy(rng):
    from scipy.optimize import nnls as scipy_nnls

    A, b = _data(rng)
    p = NonNegativeLeastSquares.create(A, b, dtype=jnp.float64)
    res = admm(p, ADMMConfig(max_iter=3000))
    x = np.asarray(res.x)
    x_ref, _ = scipy_nnls(np.asarray(A), np.asarray(b))
    assert np.all(x >= 0)  # exactly feasible (z is the projected iterate)
    np.testing.assert_allclose(
        float(p.objective(res.x)), 0.5 * np.sum((A @ x_ref - b) ** 2), rtol=1e-8
    )


def test_admm_box_constrained_feasible(rng):
    A, b = _data(rng)
    p = BoxConstrainedLeastSquares.create(A, b, lower=-0.5, upper=0.5, dtype=jnp.float64)
    res = admm(p, ADMMConfig(max_iter=3000))
    ref = fista(p, FISTAConfig(max_iter=20000), key=jax.random.PRNGKey(0))
    x = np.asarray(res.x)
    assert np.all(x >= -0.5 - 1e-12) and np.all(x <= 0.5 + 1e-12)
    np.testing.assert_allclose(
        float(p.objective(res.x)), float(p.objective(ref.x)), rtol=1e-8
    )


def test_admm_adaptive_rho_fixes_bad_rho(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "lasso", alpha1=2.0, dtype=jnp.float64)
    bad = admm(p, ADMMConfig(rho=1e4, adaptive_rho=False, max_iter=300))
    fixed = admm(p, ADMMConfig(rho=1e4, adaptive_rho=True, max_iter=300))
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=20000, tol=1e-14))
    gap_bad = float(p.objective(bad.x)) - float(f_star)
    gap_fixed = float(p.objective(fixed.x)) - float(f_star)
    assert gap_fixed < gap_bad
    assert bool(fixed.converged)


def test_admm_over_relaxation_converges(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "lasso", alpha1=2.0, dtype=jnp.float64)
    res = admm(p, ADMMConfig(over_relaxation=1.6, max_iter=2000))
    x_star, _ = certified_optimum(p.to_gram(), CDConfig(max_sweeps=20000, tol=1e-14))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star), atol=1e-6)


def test_admm_vmapped_batch_matches_serial(rng):
    B, m, n = 6, 80, 8
    A = rng.normal(size=(B, m, n))
    b = rng.normal(size=(B, m))
    a1 = rng.uniform(0.5, 2.0, size=B)

    def solve_one(Ai, bi, a1i):
        p = GramLeastSquares(
            Q=Ai.T @ Ai,
            c=Ai.T @ bi,
            btb=bi @ bi,
            alpha1=a1i,
            alpha2=jnp.zeros((), jnp.float64),
        )
        return admm(p, ADMMConfig(max_iter=1500)).x

    A_j = jnp.asarray(A, jnp.float64)
    b_j = jnp.asarray(b, jnp.float64)
    a1_j = jnp.asarray(a1, jnp.float64)
    batched = jax.vmap(solve_one)(A_j, b_j, a1_j)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(solve_one(A_j[i], b_j[i], a1_j[i])),
            atol=1e-7,
        )


def test_consensus_admm_matches_single_device(rng):
    from fastoptsolver_tpu.parallel import consensus_admm, make_mesh

    mesh = make_mesh(batch=1, model=8)
    A, b = _data(rng, m=240, n=12)
    res = consensus_admm(
        A, b, mesh, "lasso", alpha1=2.0,
        config=ADMMConfig(max_iter=4000, abstol=1e-9, reltol=1e-8),
        dtype=jnp.float64,
    )
    p = LeastSquares.create(A, b, "lasso", alpha1=2.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=20000, tol=1e-14))
    assert bool(res.converged)
    np.testing.assert_allclose(float(p.objective(res.x)), float(f_star), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star), atol=1e-5)
    assert res.x_smooth.shape == (8, 12)  # per-device local iterates


def test_consensus_admm_row_padding(rng):
    from fastoptsolver_tpu.parallel import consensus_admm, make_mesh

    mesh = make_mesh(batch=1, model=8)
    A, b = _data(rng, m=203, n=10)  # 203 % 8 != 0 → zero-pad rows
    res = consensus_admm(
        A, b, mesh, "elasticnet", alpha1=1.0, alpha2=0.5,
        config=ADMMConfig(max_iter=4000, abstol=1e-9, reltol=1e-8),
        dtype=jnp.float64,
    )
    p = LeastSquares.create(A, b, "elasticnet", alpha1=1.0, alpha2=0.5, dtype=jnp.float64)
    ref = fista(p, FISTAConfig(max_iter=20000), key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(p.objective(res.x)), float(p.objective(ref.x)), rtol=1e-8
    )


def test_admm_via_solve_api(rng):
    from fastoptsolver_tpu import solve

    A, b = _data(rng)
    res = solve(A, b, "lasso", alpha1=2.0, method="admm", dtype=jnp.float64,
                max_iter=2000)
    p = LeastSquares.create(A, b, "lasso", alpha1=2.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=20000, tol=1e-14))
    np.testing.assert_allclose(float(p.objective(res.x)), float(f_star), rtol=1e-9)
