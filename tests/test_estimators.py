"""sklearn-style estimators: hyperparameter-semantics parity with
scikit-learn conventions, checked against our own f64 oracles."""
import numpy as np
import jax.numpy as jnp

from fastoptsolver_tpu import ElasticNet, Lasso, LassoCV, Ridge
from fastoptsolver_tpu.problems import LeastSquares
from fastoptsolver_tpu.solvers import CDConfig, certified_optimum


def _data(rng, m=200, n=12):
    X = rng.normal(size=(m, n))
    w = np.zeros(n)
    w[:4] = rng.normal(size=4) * 2
    y = X @ w + 3.0 + 0.1 * rng.normal(size=m)
    return X, y


def test_lasso_alpha_semantics(rng):
    """sklearn's 1/(2m)-scaled objective: our α₁ must be m·alpha."""
    X, y = _data(rng)
    m = X.shape[0]
    est = Lasso(alpha=0.05, fit_intercept=False, max_iter=5000, dtype=jnp.float64).fit(X, y)
    p = LeastSquares.create(X, y, "lasso", alpha1=0.05 * m, dtype=jnp.float64)
    x_ref, _ = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    np.testing.assert_allclose(est.coef_, np.asarray(x_ref), atol=1e-6)


def test_lasso_intercept_and_score(rng):
    X, y = _data(rng)
    est = Lasso(alpha=0.01, max_iter=5000, dtype=jnp.float64).fit(X, y)
    assert abs(est.intercept_ - 3.0) < 0.5
    assert est.score(X, y) > 0.9
    # intercept handling = centered fit
    Xc = X - X.mean(0)
    yc = y - y.mean()
    p = LeastSquares.create(Xc, yc, "lasso", alpha1=0.01 * X.shape[0], dtype=jnp.float64)
    x_ref, _ = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    np.testing.assert_allclose(est.coef_, np.asarray(x_ref), atol=1e-6)


def test_elasticnet_semantics(rng):
    X, y = _data(rng)
    m = X.shape[0]
    est = ElasticNet(alpha=0.05, l1_ratio=0.4, fit_intercept=False,
                     max_iter=8000, dtype=jnp.float64).fit(X, y)
    p = LeastSquares.create(
        X, y, "elasticnet",
        alpha1=0.05 * 0.4 * m, alpha2=0.05 * 0.6 * m, dtype=jnp.float64,
    )
    x_ref, _ = certified_optimum(p.to_gram(), CDConfig(max_sweeps=50000, tol=1e-15))
    np.testing.assert_allclose(est.coef_, np.asarray(x_ref), atol=1e-6)


def test_ridge_closed_form(rng):
    X, y = _data(rng)
    est = Ridge(alpha=2.0, fit_intercept=False, dtype=jnp.float64).fit(X, y)
    w_ref = np.linalg.solve(X.T @ X + 2.0 * np.eye(X.shape[1]), X.T @ y)
    np.testing.assert_allclose(est.coef_, w_ref, atol=1e-4)  # ftol-limited


def test_lasso_cv_estimator(rng):
    X, y = _data(rng, m=300, n=15)
    est = LassoCV(n_alphas=25, cv=5, dtype=jnp.float32).fit(X, y)
    assert est.alphas_.shape == (25,)
    assert est.mse_path_.shape == (25, 5)
    assert est.alpha_ in est.alphas_
    assert est.score(X, y) > 0.9
    # refit equals path at the chosen alpha
    i = int(np.argmin(np.abs(est.alphas_ - est.alpha_)))
    np.testing.assert_allclose(est.coef_, est.coef_path_[i])


def test_lasso_cv_explicit_alphas(rng):
    X, y = _data(rng, m=250, n=10)
    alphas = [0.001, 0.01, 0.1]
    est = LassoCV(alphas=alphas, cv=4, dtype=jnp.float64).fit(X, y)
    np.testing.assert_allclose(sorted(est.alphas_), sorted(alphas), rtol=1e-6)
    assert est.alpha_ in est.alphas_


def test_elasticnet_cv_matches_sklearn(rng):
    """Direct grid parity with sklearn.linear_model.ElasticNetCV: same
    explicit α ladder, same contiguous unshuffled folds → same mse_path_,
    selected α, and refit coefficients."""
    from sklearn.linear_model import ElasticNetCV as SkElasticNetCV

    from fastoptsolver_tpu import ElasticNetCV

    X, y = _data(rng, m=120, n=8)
    y = y - y.mean()  # fit_intercept=False comparison on centered data
    alphas = np.geomspace(1.0, 1e-3, 6)
    l1 = 0.6
    ours = ElasticNetCV(
        l1_ratio=l1, alphas=alphas, cv=4, fit_intercept=False,
        shuffle_seed=None, max_iter=5000, dtype=jnp.float64,
    ).fit(X, y)
    sk = SkElasticNetCV(
        l1_ratio=l1, alphas=alphas, cv=4, fit_intercept=False,
        max_iter=100000, tol=1e-12,
    ).fit(X, y)
    np.testing.assert_allclose(ours.alphas_, sk.alphas_, rtol=1e-12)
    np.testing.assert_allclose(ours.mse_path_, sk.mse_path_, rtol=1e-5)
    assert ours.alpha_ == sk.alpha_
    np.testing.assert_allclose(ours.coef_, sk.coef_, atol=1e-6)


def test_elasticnet_cv_intercept_close_to_sklearn(rng):
    from sklearn.linear_model import ElasticNetCV as SkElasticNetCV

    from fastoptsolver_tpu import ElasticNetCV

    X, y = _data(rng, m=160, n=6)
    alphas = np.geomspace(0.5, 1e-3, 5)
    ours = ElasticNetCV(
        l1_ratio=0.5, alphas=alphas, cv=4, fit_intercept=True,
        shuffle_seed=None, max_iter=5000, dtype=jnp.float64,
    ).fit(X, y)
    sk = SkElasticNetCV(
        l1_ratio=0.5, alphas=alphas, cv=4, fit_intercept=True,
        max_iter=100000, tol=1e-12,
    ).fit(X, y)
    # sklearn centers per training fold, we center once on the full data, so
    # fold MSEs differ slightly; the refit model must still agree.
    np.testing.assert_allclose(ours.coef_, sk.coef_, atol=1e-6)
    np.testing.assert_allclose(ours.intercept_, sk.intercept_, atol=1e-6)


def test_elasticnet_cv_l1_ratio_list_matches_sklearn(rng):
    """sklearn allows l1_ratio as a list, selecting the best (ratio, α) pair
    by mean validation MSE; mse_path_ gains a leading ratio axis."""
    from sklearn.linear_model import ElasticNetCV as SkElasticNetCV

    from fastoptsolver_tpu import ElasticNetCV

    X, y = _data(rng, m=120, n=8)
    y = y - y.mean()
    alphas = np.geomspace(1.0, 1e-3, 5)
    ratios = [0.3, 0.7, 1.0]
    ours = ElasticNetCV(
        l1_ratio=ratios, alphas=alphas, cv=4, fit_intercept=False,
        shuffle_seed=None, max_iter=5000, dtype=jnp.float64,
    ).fit(X, y)
    sk = SkElasticNetCV(
        l1_ratio=ratios, alphas=alphas, cv=4, fit_intercept=False,
        max_iter=100000, tol=1e-12,
    ).fit(X, y)
    assert ours.mse_path_.shape == (3, 5, 4)
    np.testing.assert_allclose(ours.mse_path_, sk.mse_path_, rtol=1e-5)
    assert ours.l1_ratio_ == sk.l1_ratio_
    np.testing.assert_allclose(ours.alpha_, sk.alpha_, rtol=1e-12)
    np.testing.assert_allclose(ours.coef_, sk.coef_, atol=1e-6)
    assert ours.n_iter_ >= 1


def test_lasso_cv_is_elasticnet_cv_at_ratio_one(rng):
    from fastoptsolver_tpu import ElasticNetCV, LassoCV

    X, y = _data(rng, m=100, n=7)
    kw = dict(alphas=np.geomspace(0.5, 1e-3, 4), cv=4, fit_intercept=True,
              shuffle_seed=0, max_iter=3000, dtype=jnp.float64)
    a = LassoCV(**kw).fit(X, y)
    b = ElasticNetCV(l1_ratio=1.0, **kw).fit(X, y)
    np.testing.assert_allclose(a.coef_, b.coef_, atol=1e-10)
    assert a.alpha_ == b.alpha_


def test_lasso_positive_matches_sklearn():
    """positive=True (coefficients constrained >= 0), sklearn semantics."""
    from sklearn.linear_model import Lasso as SkLasso

    from fastoptsolver_tpu.estimators import Lasso

    rng = np.random.default_rng(0)
    X = rng.normal(size=(120, 8))
    w = np.array([2.0, -1.5, 0.0, 3.0, 0.0, -0.5, 1.0, 0.0])
    y = X @ w + 0.1 * rng.normal(size=120)
    ours = Lasso(alpha=0.1, positive=True, max_iter=5000, dtype=jnp.float64).fit(X, y)
    sk = SkLasso(alpha=0.1, positive=True, max_iter=50000, tol=1e-12).fit(X, y)
    assert (ours.coef_ >= 0).all()
    np.testing.assert_allclose(ours.coef_, sk.coef_, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(ours.intercept_, sk.intercept_, rtol=1e-4, atol=1e-6)


def test_elasticnet_positive_matches_sklearn():
    from sklearn.linear_model import ElasticNet as SkEN

    from fastoptsolver_tpu.estimators import ElasticNet

    rng = np.random.default_rng(1)
    X = rng.normal(size=(150, 6))
    w = np.array([1.0, 2.0, -1.0, 0.0, 0.5, -2.0])
    y = X @ w + 0.1 * rng.normal(size=150)
    ours = ElasticNet(alpha=0.05, l1_ratio=0.6, positive=True, max_iter=5000,
                      dtype=jnp.float64).fit(X, y)
    sk = SkEN(alpha=0.05, l1_ratio=0.6, positive=True, max_iter=50000,
              tol=1e-12).fit(X, y)
    assert (ours.coef_ >= 0).all()
    np.testing.assert_allclose(ours.coef_, sk.coef_, rtol=1e-4, atol=1e-6)


def test_lasso_sample_weight_matches_sklearn(rng):
    from sklearn.linear_model import Lasso as SkLasso

    X, y = _data(rng)
    w = rng.uniform(0.2, 3.0, size=X.shape[0])
    sk = SkLasso(alpha=0.05, max_iter=100000, tol=1e-12).fit(X, y, sample_weight=w)
    est = Lasso(alpha=0.05, max_iter=20000, dtype=jnp.float64).fit(
        X, y, sample_weight=w
    )
    np.testing.assert_allclose(est.coef_, sk.coef_, atol=1e-5)
    np.testing.assert_allclose(est.intercept_, sk.intercept_, atol=1e-5)
    # weight invariance under positive rescaling (sklearn property)
    est2 = Lasso(alpha=0.05, max_iter=20000, dtype=jnp.float64).fit(
        X, y, sample_weight=7.3 * w
    )
    np.testing.assert_allclose(est.coef_, est2.coef_, atol=1e-7)


def test_elasticnet_sample_weight_matches_sklearn(rng):
    from sklearn.linear_model import ElasticNet as SkEN

    X, y = _data(rng)
    w = rng.uniform(0.0, 2.0, size=X.shape[0])  # some zero weights
    sk = SkEN(alpha=0.05, l1_ratio=0.6, max_iter=100000, tol=1e-12).fit(
        X, y, sample_weight=w
    )
    est = ElasticNet(alpha=0.05, l1_ratio=0.6, max_iter=20000,
                     dtype=jnp.float64).fit(X, y, sample_weight=w)
    np.testing.assert_allclose(est.coef_, sk.coef_, atol=1e-5)
    np.testing.assert_allclose(est.intercept_, sk.intercept_, atol=1e-5)


def test_sample_weight_validation(rng):
    import pytest

    X, y = _data(rng)
    with pytest.raises(ValueError):
        Lasso().fit(X, y, sample_weight=np.ones(3))
    with pytest.raises(ValueError):
        Lasso().fit(X, y, sample_weight=-np.ones(X.shape[0]))


def test_warm_start_reuses_coefficients(rng):
    """sklearn warm_start semantics: a refit starts from the previous
    coefficients — one extra iteration budget suffices near the optimum."""
    X, y = _data(rng)
    est = Lasso(alpha=0.05, max_iter=20000, dtype=jnp.float64, warm_start=True)
    est.fit(X, y)
    coef_full = est.coef_.copy()
    # refit with a tiny iteration budget: warm start keeps the solution
    est.max_iter = 5
    est.fit(X, y)
    np.testing.assert_allclose(est.coef_, coef_full, atol=1e-6)
    # cold start with the same tiny budget is far away
    cold = Lasso(alpha=0.05, max_iter=5, dtype=jnp.float64).fit(X, y)
    assert np.abs(cold.coef_ - coef_full).max() > 1e-3


def test_warm_start_across_alphas(rng):
    """Homotopy-style use: decreasing alpha with warm starts converges to the
    same solution as cold fits."""
    X, y = _data(rng)
    warm = Lasso(alpha=0.2, max_iter=20000, dtype=jnp.float64, warm_start=True)
    for a in (0.2, 0.1, 0.05):
        warm.alpha = a
        warm.fit(X, y)
    cold = Lasso(alpha=0.05, max_iter=20000, dtype=jnp.float64).fit(X, y)
    np.testing.assert_allclose(warm.coef_, cold.coef_, atol=1e-6)
