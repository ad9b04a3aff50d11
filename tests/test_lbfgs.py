"""From-scratch L-BFGS vs. SciPy's Fortran L-BFGS-B (test oracle only).

Parity target is the final objective, not the iterate trajectory
(SURVEY.md §7 'Hard parts' — the line searches differ)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import fmin_l_bfgs_b

from fastoptsolver_tpu.problems import (
    LeastSquares,
    LogisticRegression,
    generate_boston_like,
)
from fastoptsolver_tpu.solvers.lbfgs import (
    LBFGSConfig,
    lbfgs,
    lbfgs_with_history,
    two_loop_direction,
    wolfe_line_search,
)


def _ls_problem(a2=0.5, seed=0, m=300):
    A, b, _ = generate_boston_like(m=m, seed=seed, noise_std=1.0, rho1=0.5, rho2=0.7)
    A = (A - A.mean(0)) / A.std(0)
    return LeastSquares.create(A, b, "ridge", 0.0, a2, dtype=jnp.float64), A, b


def test_two_loop_matches_dense_inverse_hessian(rng):
    """With enough stored pairs on a quadratic, the two-loop direction should
    approximate -H⁻¹g. Check against explicitly accumulated BFGS matrix."""
    n, mem = 6, 8
    H = rng.normal(size=(n, n))
    H = H @ H.T + n * np.eye(n)  # SPD Hessian

    # Build synthetic (s, y) pairs consistent with the quadratic: y = H s.
    S_np = rng.normal(size=(mem, n))
    Y_np = S_np @ H.T
    rho_np = 1.0 / np.einsum("ij,ij->i", S_np, Y_np)
    g = rng.normal(size=n)

    # Dense BFGS recursion oracle: apply updates oldest → newest.
    gamma = float(S_np[-1] @ Y_np[-1] / (Y_np[-1] @ Y_np[-1]))
    Hinv = gamma * np.eye(n)
    for s, y, r in zip(S_np, Y_np, rho_np):
        V = np.eye(n) - r * np.outer(y, s)
        Hinv = V.T @ Hinv @ V + r * np.outer(s, s)
    want = -Hinv @ g

    got = two_loop_direction(
        jnp.asarray(g),
        jnp.asarray(S_np),
        jnp.asarray(Y_np),
        jnp.asarray(rho_np),
        count=jnp.asarray(mem, jnp.int32),
        head=jnp.asarray(0, jnp.int32),  # full buffer, head wraps to oldest
        gamma=jnp.asarray(gamma),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9)


def test_two_loop_partial_buffer():
    # count=0 → plain steepest descent scaled by gamma
    n, mem = 4, 5
    g = jnp.asarray([1.0, -2.0, 3.0, 0.5])
    d = two_loop_direction(
        g,
        jnp.zeros((mem, n)),
        jnp.zeros((mem, n)),
        jnp.zeros((mem,)),
        count=jnp.asarray(0, jnp.int32),
        head=jnp.asarray(0, jnp.int32),
        gamma=jnp.asarray(2.0),
    )
    np.testing.assert_allclose(np.asarray(d), -2.0 * np.asarray(g))


def test_wolfe_line_search_on_quadratic():
    # phi(a) = 0.5*(x+ad)ᵀH(x+ad): exact minimizer along d known
    H = jnp.asarray(np.diag([1.0, 10.0]))

    class Quad:
        def smooth_value_and_grad(self, z):
            return 0.5 * z @ H @ z, H @ z

        def smooth_value(self, z):
            return 0.5 * z @ H @ z

    x = jnp.asarray([1.0, 1.0])
    g = H @ x
    d = -g
    a, f, g_new, n_evals, ok = wolfe_line_search(Quad(), x, 0.5 * x @ H @ x, g, d, LBFGSConfig())
    assert bool(ok)
    # strong Wolfe conditions hold
    dphi0 = float(g @ d)
    assert float(f) <= float(0.5 * x @ H @ x) + 1e-4 * float(a) * dphi0
    assert abs(float(g_new @ d)) <= 0.9 * abs(dphi0)


@pytest.mark.parametrize("a2", [0.1, 1.0, 10.0])
def test_ridge_matches_scipy(a2):
    p, A, b = _ls_problem(a2=a2)

    def fg(x):
        r = A @ x - b
        return 0.5 * r @ r + 0.5 * a2 * x @ x, A.T @ r + a2 * x

    x_sp, f_sp, info = fmin_l_bfgs_b(fg, np.zeros(A.shape[1]), pgtol=1e-10)
    res = lbfgs(p, LBFGSConfig(tol=1e-10, ftol=1e-18))
    f_jax = float(p.smooth_value(res.x))
    # at least as good as scipy (which stops on its default factr rule)
    assert f_jax <= f_sp * (1 + 1e-12) + 1e-9
    # and at the closed-form optimum to high relative accuracy
    x_star = np.linalg.solve(A.T @ A + a2 * np.eye(A.shape[1]), A.T @ b)
    f_star = fg(x_star)[0]
    assert f_jax - f_star <= 1e-12 * max(1.0, abs(f_star))
    np.testing.assert_allclose(np.asarray(res.x), x_star, rtol=1e-4, atol=1e-6)


def test_ridge_matches_closed_form():
    p, A, b = _ls_problem(a2=2.0)
    # tiny ftol disables the relative-decrease rule so pgtol drives to optimum
    res = lbfgs(p, LBFGSConfig(tol=1e-12, ftol=1e-18))
    n = A.shape[1]
    x_star = np.linalg.solve(A.T @ A + 2.0 * np.eye(n), A.T @ b)
    np.testing.assert_allclose(np.asarray(res.x), x_star, rtol=1e-6)


def test_logistic_matches_scipy(rng):
    m, n = 200, 8
    A = rng.normal(size=(m, n))
    x_true = rng.normal(size=n)
    y = np.sign(A @ x_true + 0.3 * rng.normal(size=m))
    a2 = 0.5
    p = LogisticRegression.create(A, y, alpha1=0.0, alpha2=a2, dtype=jnp.float64)

    def fg(x):
        margins = y * (A @ x)
        loss = np.logaddexp(0, -margins).sum() + 0.5 * a2 * x @ x
        w = -y / (1 + np.exp(margins))
        return loss, A.T @ w + a2 * x

    x_sp, f_sp, info = fmin_l_bfgs_b(fg, np.zeros(n), pgtol=1e-10)
    res = lbfgs(p, LBFGSConfig(tol=1e-10))
    np.testing.assert_allclose(float(p.smooth_value(res.x)), f_sp, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res.x), x_sp, rtol=1e-4, atol=1e-7)


def test_lasso_quirk_smooth_only_optimized():
    """Reference quirk (lbfgs.py:43-54 vs :56-61): in lasso mode the solver
    minimizes only the smooth part; the history records the full objective."""
    A, b, _ = generate_boston_like(m=200, seed=1, noise_std=1.0, rho1=0.5, rho2=0.7)
    A = (A - A.mean(0)) / A.std(0)
    p = LeastSquares.create(A, b, "lasso", alpha1=5.0, alpha2=0.0, dtype=jnp.float64)
    res = lbfgs_with_history(p, LBFGSConfig(tol=1e-10, ftol=1e-18))
    # solver ignored alpha1 → solution is the unregularized least-squares one
    x_ols = np.linalg.lstsq(A, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.x), x_ols, rtol=1e-5)
    # but the history records the full objective (smooth + L1)
    k = int(res.n_iters) - 1
    want = float(p.objective(res.x))
    np.testing.assert_allclose(float(res.history.obj[k]), want, rtol=1e-10)
    assert want > float(p.smooth_value(res.x))


def test_convergence_iteration_count_comparable_to_scipy():
    # BASELINE.md: L-BFGS reaches ~1e-7 suboptimality in ~10-13 iterations on
    # the reference scenarios. Ours should be in the same regime.
    p, A, b = _ls_problem(a2=0.0)
    res = lbfgs(p, LBFGSConfig(tol=1e-8))
    assert int(res.n_iters) <= 30
    x_star = np.linalg.lstsq(A, b, rcond=None)[0]
    f_star = float(p.smooth_value(jnp.asarray(x_star)))
    assert float(p.smooth_value(res.x)) - f_star <= 1e-7 * max(1.0, abs(f_star))


def test_vmapped_lbfgs_over_seeds():
    # BASELINE.json config: 'L-BFGS ... batched over seeds'
    problems = [_ls_problem(a2=1.0, seed=s)[0] for s in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)
    cfg = LBFGSConfig(tol=1e-10, max_iter=100)
    batched = jax.vmap(lambda pr: lbfgs(pr, cfg).x)(stacked)
    for i, p in enumerate(problems):
        single = lbfgs(p, cfg).x
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single), rtol=1e-6, atol=1e-9)
