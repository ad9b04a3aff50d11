"""Cross-validated lasso: Gram-subtraction folds vs direct per-fold solves,
MSE bookkeeping vs NumPy, selection rules, intercept handling."""
import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.batch import cv_lasso
from fastoptsolver_tpu.batch.fista_gram import BatchFISTAConfig
from fastoptsolver_tpu.problems import LeastSquares
from fastoptsolver_tpu.solvers import CDConfig, certified_optimum

CFG = BatchFISTAConfig(max_iter=4000, check_every=25, rel_gap_tol=1e-7)


def _data(rng, m=150, n=10, snr=5.0):
    A = rng.normal(size=(m, n))
    x_true = np.zeros(n)
    x_true[: n // 3] = rng.normal(size=n // 3) * 2
    noise = rng.normal(size=m)
    b = A @ x_true + noise * np.linalg.norm(A @ x_true) / (snr * np.linalg.norm(noise))
    return A, b


def test_cv_fold_solutions_match_direct_solves(rng):
    """Fold-train coefficients from the Gram-subtraction batch must match an
    independent f64 CD solve on the explicitly-assembled training rows, at
    the per-fold-scaled penalty ((m − |fold|)/m · α₁ — sklearn's per-sample
    objective semantics)."""
    A, b = _data(rng)
    k = 5
    res = cv_lasso(A, b, k_folds=k, n_alphas=8, cfg=CFG)
    m = A.shape[0]
    f = m // k
    for j in [0, 2, 4]:
        mask = np.ones(m, bool)
        mask[j * f : (j + 1) * f] = False
        for i in [0, 4, 7]:
            a1 = float(res.alphas[i]) * (m - f) / m
            p = LeastSquares.create(A[mask], b[mask], "lasso", alpha1=a1, dtype=jnp.float64)
            x_ref, _ = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
            np.testing.assert_allclose(
                np.asarray(res.coef_folds[j, i]), np.asarray(x_ref), atol=2e-4
            )


def test_cv_mse_bookkeeping_matches_numpy(rng):
    A, b = _data(rng)
    k = 5
    res = cv_lasso(A, b, k_folds=k, n_alphas=12, cfg=CFG)
    m = A.shape[0]
    f = m // k
    coefs = np.asarray(res.coef_folds)
    mse = np.zeros((k, 12))
    for j in range(k):
        Aj = A[j * f : (j + 1) * f]
        bj = b[j * f : (j + 1) * f]
        for i in range(12):
            mse[j, i] = np.mean((Aj @ coefs[j, i] - bj) ** 2)
    np.testing.assert_allclose(np.asarray(res.mse_path), mse, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.mse_mean), mse.mean(0), rtol=1e-5)
    assert int(res.best_idx) == int(np.argmin(mse.mean(0)))
    np.testing.assert_allclose(float(res.best_alpha), float(res.alphas[res.best_idx]))


def test_cv_refit_is_full_data_solution(rng):
    """f64 run: every instance must certify at 1e-7 (f32 hits the gap-
    evaluation floor ~1e-5 at small ladder alphas; see converged_grid)."""
    A, b = _data(rng)
    res = cv_lasso(A, b, k_folds=4, n_alphas=10, cfg=CFG, dtype=jnp.float64)
    a1 = float(res.best_alpha)
    p = LeastSquares.create(A, b, "lasso", alpha1=a1, dtype=jnp.float64)
    x_ref, _ = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    np.testing.assert_allclose(np.asarray(res.coef), np.asarray(x_ref), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.coef_path[res.best_idx]), np.asarray(res.coef)
    )
    assert bool(res.converged)
    assert res.converged_grid.shape == (5, 10) and res.rel_gap.shape == (5, 10)


def test_cv_selects_reasonable_alpha(rng):
    """On a sparse ground truth with noise, CV must not pick the ladder
    endpoints (no-regularization or everything-zero)."""
    A, b = _data(rng, m=300, n=20)
    res = cv_lasso(A, b, k_folds=5, n_alphas=30, cfg=CFG, key=jax.random.PRNGKey(1))
    assert 0 < int(res.best_idx) < 29
    # largest alpha solves to exactly zero coefficients
    assert np.all(np.asarray(res.coef_path[0]) == 0.0)


def test_cv_one_se_rule_sparser(rng):
    A, b = _data(rng, m=300, n=20)
    r_min = cv_lasso(A, b, k_folds=5, n_alphas=30, cfg=CFG)
    r_1se = cv_lasso(A, b, k_folds=5, n_alphas=30, cfg=CFG, one_se_rule=True)
    assert float(r_1se.best_alpha) >= float(r_min.best_alpha)
    nnz_1se = int(np.sum(np.asarray(r_1se.coef) != 0))
    nnz_min = int(np.sum(np.asarray(r_min.coef) != 0))
    assert nnz_1se <= nnz_min


def test_cv_ragged_folds_match_sklearn_kfold(rng):
    """m not divisible by k: fold boundaries must match sklearn's KFold
    (remainder rows spread one each over the first m % k folds), and the
    fold-train solution must reflect the per-fold-scaled penalty."""
    from sklearn.model_selection import KFold

    A, b = _data(rng, m=153, n=8)  # 153 = 5*30 + 3 → sizes [31,31,31,30,30]
    k = 5
    res = cv_lasso(A, b, k_folds=k, n_alphas=6, cfg=CFG)
    m = A.shape[0]
    splits = list(KFold(n_splits=k, shuffle=False).split(A))
    for j in [0, 4]:  # a size-31 fold and a size-30 fold
        train_idx, val_idx = splits[j]
        a1 = float(res.alphas[3]) * len(train_idx) / m
        p = LeastSquares.create(
            A[train_idx], b[train_idx], "lasso", alpha1=a1, dtype=jnp.float64
        )
        x_ref, _ = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
        np.testing.assert_allclose(
            np.asarray(res.coef_folds[j, 3]), np.asarray(x_ref), atol=2e-4
        )
        # validation MSE over exactly sklearn's held-out rows
        mse_ref = float(np.mean((A[val_idx] @ np.asarray(x_ref) - b[val_idx]) ** 2))
        np.testing.assert_allclose(float(res.mse_path[j, 3]), mse_ref, rtol=1e-3)
    assert res.mse_path.shape == (k, 6)


def test_cv_ragged_mse_path_matches_sklearn_lassocv(rng):
    """Property check vs sklearn.LassoCV over (m, k) with m % k != 0: the
    whole mse_path_ grid must agree at sklearn tolerance."""
    from sklearn.linear_model import LassoCV as SkLassoCV

    from fastoptsolver_tpu import LassoCV

    for m, k in [(97, 4), (122, 5)]:
        A, b = _data(rng, m=m, n=6)
        b = b - b.mean()
        alphas = np.geomspace(0.5, 1e-3, 5)
        ours = LassoCV(
            alphas=alphas, cv=k, fit_intercept=False, shuffle_seed=None,
            max_iter=5000, dtype=jnp.float64,
        ).fit(A, b)
        sk = SkLassoCV(
            alphas=alphas, cv=k, fit_intercept=False, max_iter=100000, tol=1e-12
        ).fit(A, b)
        np.testing.assert_allclose(ours.mse_path_, sk.mse_path_, rtol=1e-5)
        np.testing.assert_allclose(ours.alpha_, sk.alpha_, rtol=1e-12)
        np.testing.assert_allclose(ours.coef_, sk.coef_, atol=1e-6)


def test_cv_shuffle_reproducible(rng):
    A, b = _data(rng)
    r1 = cv_lasso(A, b, k_folds=5, n_alphas=8, cfg=CFG, key=jax.random.PRNGKey(7))
    r2 = cv_lasso(A, b, k_folds=5, n_alphas=8, cfg=CFG, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(r1.mse_path), np.asarray(r2.mse_path))


def test_cv_intercept(rng):
    A, b = _data(rng)
    b_shift = b + 10.0
    res = cv_lasso(A, b_shift, k_folds=5, n_alphas=10, cfg=CFG, fit_intercept=True)
    # prediction with intercept recovers the shift level
    pred = np.asarray(A @ np.asarray(res.coef) + float(res.intercept))
    assert abs(pred.mean() - b_shift.mean()) < 0.5
    res0 = cv_lasso(A, b_shift, k_folds=5, n_alphas=10, cfg=CFG)
    assert float(res0.intercept) == 0.0
