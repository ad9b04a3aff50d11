import numpy as np
import jax.numpy as jnp
import jax

from fastoptsolver_tpu.ops import (
    soft_threshold,
    prox_elastic_net,
    prox_group_lasso,
    prox_nonneg,
    prox_box,
)


def test_soft_threshold_closed_form(rng):
    v = rng.normal(size=257)
    tau = 0.3
    got = np.asarray(soft_threshold(jnp.asarray(v), tau))
    want = np.sign(v) * np.maximum(np.abs(v) - tau, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_soft_threshold_properties():
    # zero threshold is identity; large threshold kills everything
    v = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(soft_threshold(v, 0.0), v)
    np.testing.assert_allclose(soft_threshold(v, 10.0), jnp.zeros_like(v))
    # shrinks magnitudes by exactly tau where |v| > tau
    out = soft_threshold(v, 0.5)
    np.testing.assert_allclose(out, jnp.asarray([-1.5, 0.0, 0.0, 0.0, 1.5]))


def test_soft_threshold_batched_thresholds(rng):
    # per-instance tau broadcasting — required for vmapped solves
    v = jnp.asarray(rng.normal(size=(4, 7)))
    tau = jnp.asarray([[0.0], [0.1], [1.0], [10.0]])
    out = soft_threshold(v, tau)
    for i in range(4):
        np.testing.assert_allclose(
            out[i], soft_threshold(v[i], tau[i, 0]), rtol=1e-12
        )


def test_prox_elastic_net_scaling(rng):
    v = jnp.asarray(rng.normal(size=31))
    tau, a1, a2 = 0.7, 0.4, 2.0
    got = prox_elastic_net(v, tau, a1, a2)
    want = soft_threshold(v, tau * a1) / (1 + tau * a2)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # a2=0 reduces to pure soft threshold
    np.testing.assert_allclose(
        prox_elastic_net(v, tau, a1, 0.0), soft_threshold(v, tau * a1), rtol=1e-12
    )


def test_prox_elastic_net_is_prox(rng):
    # verify the prox property by minimizing 0.5||x-v||^2 + tau*h(x) numerically
    v = jnp.asarray(rng.normal(size=9))
    tau, a1, a2 = 0.5, 0.3, 1.1

    def moreau(x):
        return 0.5 * jnp.sum((x - v) ** 2) + tau * (
            a1 * jnp.sum(jnp.abs(x)) + 0.5 * a2 * jnp.sum(x**2)
        )

    x_star = prox_elastic_net(v, tau, a1, a2)
    base = moreau(x_star)
    key = jax.random.PRNGKey(1)
    for k in jax.random.split(key, 16):
        pert = x_star + 1e-3 * jax.random.normal(k, x_star.shape, x_star.dtype)
        assert moreau(pert) >= base - 1e-10


def test_prox_group_lasso(rng):
    v = jnp.asarray(rng.normal(size=(3, 8)))
    tau = 0.5
    out = prox_group_lasso(v, tau, axis=-1)
    norms = jnp.linalg.norm(v, axis=-1)
    for i in range(3):
        scale = max(1 - tau / float(norms[i]), 0.0)
        np.testing.assert_allclose(out[i], v[i] * scale, rtol=1e-6)
    # full kill when tau exceeds the norm
    big = prox_group_lasso(v, 1e6, axis=-1)
    np.testing.assert_allclose(big, jnp.zeros_like(v))


def test_projections():
    v = jnp.asarray([-3.0, -0.2, 0.4, 7.0])
    np.testing.assert_allclose(prox_nonneg(v), jnp.asarray([0.0, 0.0, 0.4, 7.0]))
    np.testing.assert_allclose(
        prox_box(v, lower=-1.0, upper=1.0), jnp.asarray([-1.0, -0.2, 0.4, 1.0])
    )
