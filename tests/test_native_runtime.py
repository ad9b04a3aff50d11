"""Native C++ host runtime: build, correctness vs NumPy, loader pipeline."""
import numpy as np
import pytest

from fastoptsolver_tpu.runtime import (
    ScenarioLoader,
    ensure_built,
    native_available,
    generate_scenarios_host,
    standardize_host,
    gram_batch_host,
)


def test_native_builds_and_loads():
    lib = ensure_built()
    assert lib is not None, "g++ toolchain present in this image — build must work"
    assert lib.fastopt_version() == 1


def test_generate_statistics():
    A, b = generate_scenarios_host(seed=7, batch=64, m=500, noise_std=1.0, rho1=0.8, rho2=0.9)
    assert A.shape == (64, 500, 5) and b.shape == (64, 500)
    flat = A.reshape(-1, 5)
    means = flat.mean(0)
    assert np.all(
        np.abs(means - [6.0, 0.2, 300.0, 60.0, 4.0]) <= [0.02, 0.02, 0.3, 0.3, 0.05]
    ), means
    np.testing.assert_allclose(
        flat.std(0), [0.5, 0.5, 10.0, 10.0, 1.0], rtol=0.05
    )
    assert abs(np.corrcoef(flat[:, 0], flat[:, 1])[0, 1] - 0.8) < 0.02
    assert abs(np.corrcoef(flat[:, 2], flat[:, 3])[0, 1] - 0.9) < 0.02
    # b tracks A @ x_true
    x_true = np.array([5.0, 0.0, -0.02, -0.05, 1.5], np.float32)
    resid = b - A @ x_true
    np.testing.assert_allclose(resid.std(), 1.0, rtol=0.05)
    # deterministic in (seed, instance)
    A2, b2 = generate_scenarios_host(seed=7, batch=64, m=500, noise_std=1.0, rho1=0.8, rho2=0.9)
    np.testing.assert_array_equal(A, A2)


def test_per_instance_hyperparams():
    noise = np.linspace(0.1, 5.0, 8).astype(np.float32)
    A, b = generate_scenarios_host(seed=1, batch=8, m=2000, noise_std=noise, rho1=0.5, rho2=0.7)
    x_true = np.array([5.0, 0.0, -0.02, -0.05, 1.5], np.float32)
    resid_std = (b - A @ x_true).std(axis=1)
    np.testing.assert_allclose(resid_std, noise, rtol=0.1)


def test_standardize_matches_numpy():
    A, _ = generate_scenarios_host(seed=3, batch=4, m=300)
    A64 = A.astype(np.float64)
    ref = (A64 - A64.mean(axis=1, keepdims=True)) / A64.std(axis=1, keepdims=True)
    got = standardize_host(A.copy())
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_gram_matches_numpy():
    A, b = generate_scenarios_host(seed=5, batch=6, m=400)
    A = standardize_host(A)
    Q, c, btb = gram_batch_host(A, b)
    Q_ref = np.einsum("bmi,bmj->bij", A.astype(np.float64), A.astype(np.float64))
    c_ref = np.einsum("bmi,bm->bi", A.astype(np.float64), b.astype(np.float64))
    btb_ref = np.einsum("bm,bm->b", b.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(Q, Q_ref, rtol=1e-5)
    np.testing.assert_allclose(c, c_ref, rtol=1e-4)
    np.testing.assert_allclose(btb, btb_ref, rtol=1e-5)
    # symmetry is exact by construction
    np.testing.assert_array_equal(Q, np.swapaxes(Q, 1, 2))


def test_scenario_loader_pipeline():
    loader = ScenarioLoader(
        seed=0, batch=16, m=200, n_batches=3, standardize=True, gram=True
    )
    batches = list(loader)
    assert len(batches) == 3
    for A, b, Q, c, btb in batches:
        assert A.shape == (16, 200, 5) and Q.shape == (16, 5, 5)
        np.testing.assert_allclose(A.mean(axis=1), 0.0, atol=1e-3)
    # distinct seeds per batch → distinct data
    assert not np.array_equal(batches[0][0], batches[1][0])


def test_native_solve_end_to_end():
    """Host pipeline feeds the device solver: C++ gram → GramBatch →
    batched FISTA, certified."""
    import jax.numpy as jnp

    from fastoptsolver_tpu.batch.fista_gram import (
        BatchFISTAConfig,
        GramBatch,
        _batched_power_L,
        fista_gram_batch,
    )

    A, b = generate_scenarios_host(seed=11, batch=12, m=500, noise_std=1.0)
    A = standardize_host(A)
    Q, c, btb = gram_batch_host(A, b)
    a1 = 0.1 * np.abs(c).max(axis=1).astype(np.float32)
    Qf = jnp.asarray(Q.transpose(1, 2, 0))
    cf = jnp.asarray(c.T)
    import jax

    v0 = jax.random.normal(jax.random.PRNGKey(0), cf.shape, cf.dtype)
    L = _batched_power_L(Qf, v0, 100, 1e-6)
    gb = GramBatch(
        Q=Qf, c=cf, btb=jnp.asarray(btb), alpha1=jnp.asarray(a1),
        alpha2=jnp.zeros(12, jnp.float32), L=L,
    )
    res = fista_gram_batch(gb, BatchFISTAConfig(max_iter=1000, check_every=20, rel_gap_tol=1e-5))
    assert bool(res.converged.all())
