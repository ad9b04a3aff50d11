import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.ops import estimate_lipschitz, estimate_lipschitz_gram, lipschitz_for
from fastoptsolver_tpu.problems import LeastSquares


def test_power_iteration_matches_eigvalsh(rng):
    A = jnp.asarray(rng.normal(size=(60, 9)))
    L = float(estimate_lipschitz(A, jax.random.PRNGKey(3)))
    lam = float(jnp.linalg.eigvalsh(A.T @ A)[-1])
    np.testing.assert_allclose(L, lam, rtol=1e-4)


def test_gram_form_agrees(rng):
    A = jnp.asarray(rng.normal(size=(40, 6)))
    Lo = float(estimate_lipschitz(A, jax.random.PRNGKey(5)))
    Lg = float(estimate_lipschitz_gram(A.T @ A, jax.random.PRNGKey(5)))
    np.testing.assert_allclose(Lo, Lg, rtol=1e-5)


def test_lipschitz_for_adds_alpha2(rng):
    A = rng.normal(size=(30, 4))
    b = rng.normal(size=30)
    p0 = LeastSquares.create(A, b, "lasso", 0.1, 0.0, dtype=jnp.float64)
    p2 = LeastSquares.create(A, b, "ridge", 0.0, 2.5, dtype=jnp.float64)
    k = jax.random.PRNGKey(7)
    np.testing.assert_allclose(
        float(lipschitz_for(p2, k)), float(lipschitz_for(p0, k)) + 2.5, rtol=1e-6
    )
    # gram form takes the Q path
    pg = p0.to_gram()
    np.testing.assert_allclose(
        float(lipschitz_for(pg, k)), float(lipschitz_for(p0, k)), rtol=1e-5
    )


def test_deterministic_given_key(rng):
    A = jnp.asarray(rng.normal(size=(25, 5)))
    k = jax.random.PRNGKey(11)
    assert float(estimate_lipschitz(A, k)) == float(estimate_lipschitz(A, k))


def test_vmappable(rng):
    As = jnp.asarray(rng.normal(size=(4, 20, 3)))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    Ls = jax.vmap(estimate_lipschitz)(As, keys)
    for i in range(4):
        lam = float(jnp.linalg.eigvalsh(As[i].T @ As[i])[-1])
        np.testing.assert_allclose(float(Ls[i]), lam, rtol=1e-3)
