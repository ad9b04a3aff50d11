"""The compat layer must be a drop-in for the reference's API surface."""
import numpy as np
import pytest
import jax.numpy as jnp

from fastoptsolver_tpu import compat
from oracle_np import fista_np, ista_np, objective_np, power_L, shrink


def _data(seed=0):
    A, b, _ = compat.generate_correlated_boston_like_data(
        m=150, seed=seed, noise_std=1.0, rho1=0.5, rho2=0.7
    )
    A = (A - A.mean(0)) / A.std(0)
    return A, b


def test_prox_functions():
    v = np.array([-2.0, -0.1, 0.0, 0.4, 3.0])
    np.testing.assert_allclose(compat.prox_l1(v, 0.5), shrink(v, 0.5))
    np.testing.assert_allclose(
        compat.prox_elastic_net(v, 0.5, 0.4, 2.0), shrink(v, 0.2) / 2.0
    )


def test_compute_objective_and_validation():
    A, b = _data()
    x = np.ones(5)
    got = compat.compute_objective(x, A, b, "elasticnet", 0.3, 0.7)
    np.testing.assert_allclose(got, objective_np(x, A, b, 0.3, 0.7), rtol=1e-12)
    with pytest.raises(ValueError):
        compat.compute_objective(x, A, b, "bogus", 0.1, 0.1)


def test_estimate_lipschitz_deterministic():
    A, b = _data()
    L1 = compat.estimate_lipschitz(A)
    L2 = compat.estimate_lipschitz(A)
    assert L1 == L2
    lam = float(np.linalg.eigvalsh(A.T @ A)[-1])
    np.testing.assert_allclose(L1, lam, rtol=1e-4)


def test_fista_signature_and_history():
    A, b = _data()
    L = power_L(A, np.ones(5))
    x, hist = compat.fista(
        A, b, "lasso", 0.5, 0.0, max_iter=40, return_history=True
    )
    assert set(hist) == {"x", "obj"}
    assert len(hist["x"]) == 41  # includes x0 (reference :160)
    assert len(hist["obj"]) == 40
    np.testing.assert_allclose(hist["x"][0], np.zeros(5))
    # close to oracle run with its own (slightly different) L estimate
    x_ref, tr = fista_np(A, b, 0.5, 0.0, compat.estimate_lipschitz(A), max_iter=40)
    np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-8)
    m = compat.get_metrics()
    assert m["grad_num_calls"] == 40
    assert m["grad_time_total"] > 0


def test_fista_delta_history_excludes_x0():
    A, b = _data()
    x, hist = compat.fista_delta(
        A, b, "lasso", 0.5, 0.0, delta=3.0, max_iter=25, return_history=True
    )
    assert len(hist["x"]) == 25  # no x0 (reference :279)
    assert len(hist["obj"]) == 25
    with pytest.raises(AssertionError):
        compat.fista_delta(A, b, "lasso", 0.5, 0.0, delta=2.0)


def test_ista_generic_closures():
    A, b = _data()
    L = compat.estimate_lipschitz(A)
    a1 = 0.5

    def g(x):
        r = A @ x - b
        return 0.5 * r @ r

    def grad_g(x):
        return A.T @ (A @ x - b)

    def prox_h(v, t):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - t * a1, 0.0)

    x0 = np.zeros(5)
    x, log = compat.ista(x0, g, grad_g, prox_h, L, max_iter=30, return_history=True)
    assert set(log) == {"x", "t", "delta"}
    assert len(log["x"]) == 31 and len(log["t"]) == 31 and len(log["delta"]) == 30
    x_ref, tr = ista_np(A, b, a1, 0.0, L, max_iter=30)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)


def test_lbfgs_solver_class():
    A, b = _data()
    # ridge mode
    solver = compat.LBFGSSolver("ridge", 0.0, 1.0, tol=1e-10).fit(A, b)
    x_star = np.linalg.solve(A.T @ A + np.eye(5), A.T @ b)
    # reference defaults (tol=1e-6 + relative-decrease rule) stop near,
    # not at, the optimum — 1e-4 relative x accuracy is the expected regime
    np.testing.assert_allclose(solver.x_, x_star, rtol=1e-4)
    assert len(solver.history_) > 0
    np.testing.assert_allclose(
        solver.final_obj_, objective_np(solver.x_, A, b, 0.0, 1.0), rtol=1e-10
    )
    # elastic-net tiny-alpha reclassification
    assert compat.LBFGSSolver("elasticnet", 1e-12, 1.0).reg_type == "ridge"
    assert compat.LBFGSSolver("elasticnet", 1.0, 1e-12).reg_type == "lasso"
    with pytest.raises(ValueError):
        compat.LBFGSSolver("bogus", 0.1, 0.1)
    # lasso quirk: minimizes smooth part only, history has full objective
    solver = compat.LBFGSSolver("lasso", 5.0, 0.0, tol=1e-10).fit(A, b)
    x_ols = np.linalg.lstsq(A, b, rcond=None)[0]
    np.testing.assert_allclose(solver.x_, x_ols, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        solver.history_[-1], objective_np(solver.x_, A, b, 5.0, 0.0), rtol=1e-8
    )


def test_data_generator_alias():
    A, b, xt = compat.generate_correlated_boston_like_data(m=200, seed=3)
    assert A.shape == (200, 5)
    np.testing.assert_allclose(xt, [5.0, 0.0, -0.02, -0.05, 1.5])
