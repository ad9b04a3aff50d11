"""OWL-QN: correct L1 quasi-Newton (vs the reference L-BFGS's dropped-L1
quirk), checked against the CD oracle, prox methods, and for exact sparsity."""
import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.problems import LeastSquares
from fastoptsolver_tpu.solvers import (
    CDConfig,
    FISTAConfig,
    LBFGSConfig,
    OWLQNConfig,
    certified_optimum,
    fista,
    lbfgs,
    owlqn,
    owlqn_with_history,
)
from fastoptsolver_tpu.solvers.owlqn import pseudo_gradient


def _data(rng, m=200, n=20):
    A = rng.normal(size=(m, n))
    x_true = np.zeros(n)
    x_true[: n // 4] = rng.normal(size=n // 4) * 3
    b = A @ x_true + 0.1 * rng.normal(size=m)
    return A, b


def test_pseudo_gradient_closed_form():
    x = jnp.asarray([2.0, -3.0, 0.0, 0.0, 0.0], jnp.float64)
    g = jnp.asarray([1.0, 1.0, -2.0, 2.0, 0.3], jnp.float64)
    a1 = jnp.asarray(0.5, jnp.float64)
    v = np.asarray(pseudo_gradient(x, g, a1))
    # x>0: g+a1; x<0: g-a1; at 0: g+a1 if <0, g-a1 if >0, else 0
    np.testing.assert_allclose(v, [1.5, 0.5, -1.5, 1.5, 0.0])


def test_owlqn_lasso_matches_cd_oracle(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "lasso", alpha1=3.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    res = owlqn(p, OWLQNConfig(max_iter=500, tol=1e-10))
    np.testing.assert_allclose(float(p.objective(res.x)), float(f_star), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star), atol=1e-7)


def test_owlqn_iterates_exactly_sparse(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "lasso", alpha1=8.0, dtype=jnp.float64)
    res = owlqn(p, OWLQNConfig(max_iter=500, tol=1e-10))
    x = np.asarray(res.x)
    x_star, _ = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    x_ref = np.asarray(x_star)
    # exact zeros (orthant projection lands on 0, no 1e-12 residue)
    assert set(np.flatnonzero(x == 0.0)) == set(np.flatnonzero(np.abs(x_ref) < 1e-10))


def test_owlqn_beats_smooth_lbfgs_on_l1_objective(rng):
    """The reference-quirk L-BFGS ignores the L1 term; OWL-QN minimizes the
    real composite objective and must end strictly lower on it."""
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "lasso", alpha1=5.0, dtype=jnp.float64)
    res_owl = owlqn(p, OWLQNConfig(max_iter=500, tol=1e-10))
    res_smooth = lbfgs(p, LBFGSConfig(max_iter=500, tol=1e-10))
    f_owl = float(p.objective(res_owl.x))
    f_smooth = float(p.objective(res_smooth.x))
    assert f_owl < f_smooth


def test_owlqn_elasticnet_matches_fista(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "elasticnet", alpha1=2.0, alpha2=1.0, dtype=jnp.float64)
    res = owlqn(p, OWLQNConfig(max_iter=500, tol=1e-10))
    ref = fista(p, FISTAConfig(max_iter=30000), key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(p.objective(res.x)), float(p.objective(ref.x)), rtol=1e-9
    )


def test_owlqn_fewer_iterations_than_fista(rng):
    """Second-order information should pay: OWL-QN reaches 1e-8 suboptimality
    in far fewer iterations than FISTA on a moderately conditioned problem."""
    A, b = _data(rng, m=400, n=40)
    p = LeastSquares.create(A, b, "lasso", alpha1=2.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    res = owlqn(p, OWLQNConfig(max_iter=300, tol=1e-9))
    assert float(p.objective(res.x)) - float(f_star) < 1e-8
    assert int(res.n_iters) < 120


def test_owlqn_history_monotone_tail(rng):
    A, b = _data(rng)
    p = LeastSquares.create(A, b, "lasso", alpha1=3.0, dtype=jnp.float64)
    res = owlqn_with_history(p, OWLQNConfig(max_iter=100, tol=0.0))
    objs = np.asarray(res.history.obj)[np.asarray(res.history.valid)]
    # sufficient-decrease line search ⇒ monotone objective
    assert np.all(np.diff(objs) <= 1e-12)


def test_owlqn_vmapped(rng):
    B, m, n = 4, 100, 10
    A = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float64)
    b = jnp.asarray(rng.normal(size=(B, m)), jnp.float64)

    def solve_one(Ai, bi):
        p = LeastSquares(
            A=Ai, b=bi,
            alpha1=jnp.asarray(1.0, jnp.float64),
            alpha2=jnp.asarray(0.0, jnp.float64),
        )
        return owlqn(p, OWLQNConfig(max_iter=300, tol=1e-10)).x

    batched = jax.vmap(solve_one)(A, b)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(solve_one(A[i], b[i])), atol=1e-8
        )


def test_owlqn_via_solve_api(rng):
    from fastoptsolver_tpu import solve

    A, b = _data(rng)
    res = solve(A, b, "lasso", alpha1=3.0, method="owlqn", dtype=jnp.float64,
                max_iter=500, tol=1e-10)
    p = LeastSquares.create(A, b, "lasso", alpha1=3.0, dtype=jnp.float64)
    x_star, f_star = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    np.testing.assert_allclose(float(p.objective(res.x)), float(f_star), rtol=1e-9)
