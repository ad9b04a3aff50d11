"""Pallas fused-FISTA kernel vs the XLA batched path and the NumPy oracle.

Runs in interpreter mode on CPU (conftest forces the cpu platform); the same
kernel compiles with Mosaic on a real TPU (exercised by bench.py)."""
import numpy as np
import jax.numpy as jnp

from fastoptsolver_tpu.batch import make_gram_batch, fista_gram_batch
from fastoptsolver_tpu.batch.fista_gram import BatchFISTAConfig
from fastoptsolver_tpu.kernels import fista_gram_vmem, momentum_betas
from fastoptsolver_tpu.problems import generate_boston_like
from oracle_np import fista_np


def _batch(n_inst=8, m=120):
    As, bs = [], []
    for s in range(n_inst):
        A, b, _ = generate_boston_like(m=m, seed=s, noise_std=1.0, rho1=0.5, rho2=0.7)
        A = (A - A.mean(0)) / A.std(0)
        As.append(A)
        bs.append(b)
    return np.stack(As), np.stack(bs)


def test_momentum_betas_match_reference_sequences():
    cfg = BatchFISTAConfig()
    betas, t_out = momentum_betas(0, 5, 1.0, cfg)
    # replicate the Nesterov recurrence directly
    t = 1.0
    for i in range(5):
        t_next = 0.5 * (1 + np.sqrt(1 + 4 * t * t))
        np.testing.assert_allclose(float(betas[i]), (t - 1) / t_next, rtol=1e-6)
        t = t_next
    np.testing.assert_allclose(t_out, t, rtol=1e-12)
    # resuming mid-sequence continues the same sequence
    b01, t1 = momentum_betas(0, 2, 1.0, cfg)
    b23, _ = momentum_betas(2, 3, t1, cfg)
    full, _ = momentum_betas(0, 5, 1.0, cfg)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(b01), np.asarray(b23)]), np.asarray(full), rtol=1e-6
    )
    # delta momentum
    dcfg = BatchFISTAConfig(momentum="delta", delta=4.0)
    bd, _ = momentum_betas(3, 2, 1.0, dcfg)
    np.testing.assert_allclose(np.asarray(bd), [4 / 9, 5 / 10], rtol=1e-6)


def test_kernel_matches_xla_path_fixed_iters():
    A3, b2 = _batch()
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=0.5, alpha2=0.0,
    )
    cfg = BatchFISTAConfig(max_iter=60, check_every=0)
    ref = fista_gram_batch(gb, cfg)
    got = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5
    )


def test_kernel_matches_oracle_float64_ground_truth():
    A3, b2 = _batch(n_inst=4)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=0.5, alpha2=0.3,
    )
    K = 80
    got = fista_gram_vmem(
        gb, BatchFISTAConfig(max_iter=K, check_every=0), b_tile=128, interpret=True
    )
    for i in range(4):
        x_ref, _ = fista_np(A3[i], b2[i], 0.5, 0.3, float(gb.L[i]), max_iter=K)
        np.testing.assert_allclose(np.asarray(got.x[i]), x_ref, rtol=5e-4, atol=5e-5)


def test_kernel_delta_momentum():
    A3, b2 = _batch(n_inst=4)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=0.5, alpha2=0.0,
    )
    cfg = BatchFISTAConfig(max_iter=50, check_every=0, momentum="delta", delta=3.0)
    ref = fista_gram_batch(gb, cfg)
    got = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5)


def test_kernel_certification_loop():
    A3, b2 = _batch(n_inst=8, m=400)
    a1 = 0.1 * np.abs(np.einsum("bmi,bm->bi", A3, b2)).max(axis=1)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=jnp.asarray(a1, jnp.float32), alpha2=0.0,
    )
    cfg = BatchFISTAConfig(max_iter=800, check_every=50, rel_gap_tol=1e-6)
    res = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
    assert bool(np.asarray(res.converged).all())
    assert np.all(np.asarray(res.rel_gap) <= 1e-6)
    # iters recorded at burst boundaries
    assert np.all(np.asarray(res.iters) % 50 == 0)
    assert np.all(np.asarray(res.iters) <= int(res.n_iters_total))


def test_kernel_padding_nonmultiple_batch():
    # B=5 not a multiple of the tile; n=5 padded to 8
    A3, b2 = _batch(n_inst=5)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=0.5, alpha2=0.0,
    )
    cfg = BatchFISTAConfig(max_iter=40, check_every=0)
    ref = fista_gram_batch(gb, cfg)
    got = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
    assert got.x.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5)


def test_kernel_larger_n_auto_tile():
    """n=20 (padded to 24 sublanes) with automatic lane-tile sizing."""
    import jax
    from fastoptsolver_tpu.kernels.fista_vmem import auto_b_tile

    import pytest

    assert auto_b_tile(8) == 1024
    assert auto_b_tile(64) == 384
    assert auto_b_tile(104) == 128
    with pytest.raises(ValueError):  # double-buffered Q exceeds VMEM
        auto_b_tile(128)

    rng = np.random.default_rng(0)
    B, m, n = 12, 300, 20
    A3 = rng.normal(size=(B, m, n)).astype(np.float32)
    x_true = np.zeros(n); x_true[:5] = [3.0, -2.0, 1.5, 0.5, -1.0]
    b2 = (A3 @ x_true + 0.5 * rng.normal(size=(B, m))).astype(np.float32)
    gb = make_gram_batch(jnp.asarray(A3), jnp.asarray(b2), alpha1=5.0, alpha2=0.0)
    cfg = BatchFISTAConfig(max_iter=300, check_every=0)
    ref = fista_gram_batch(gb, cfg)
    got = fista_gram_vmem(gb, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), rtol=2e-3, atol=2e-4)


def test_failure_detection_quarantines_bad_lanes():
    """An instance with corrupt data (NaN) is flagged failed and does not
    stall the batch; healthy instances still certify."""
    A3, b2 = _batch(n_inst=4, m=200)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=0.5, alpha2=0.0,
    )
    Qbad = gb.Q.at[0, 0, 1].set(jnp.nan)  # corrupt instance 1
    gb_bad = gb.__class__(Q=Qbad, c=gb.c, btb=gb.btb, alpha1=gb.alpha1,
                          alpha2=gb.alpha2, L=gb.L)
    cfg = BatchFISTAConfig(max_iter=4000, check_every=20, rel_gap_tol=1e-6)
    res = fista_gram_batch(gb_bad, cfg)
    failed = np.asarray(res.failed)
    conv = np.asarray(res.converged)
    assert failed[1] and not conv[1]
    assert conv[[0, 2, 3]].all() and not failed[[0, 2, 3]].any()
    assert int(res.n_iters_total) < 4000  # quarantine prevented a full spin
    # kernel path agrees
    res_k = fista_gram_vmem(gb_bad, cfg, b_tile=128, interpret=True)
    fk = np.asarray(res_k.failed)
    ck = np.asarray(res_k.converged)
    assert fk[1] and not ck[1] and ck[[0, 2, 3]].all()


def test_sharded_kernel_matches_single_device():
    """shard_map'd VMEM-kernel solve over 4 CPU devices == single-device."""
    import jax
    from fastoptsolver_tpu.kernels import fista_gram_vmem_sharded
    from fastoptsolver_tpu.parallel import make_mesh, BATCH_AXIS

    mesh = make_mesh(batch=4, model=1, devices=jax.devices()[:4])
    A3, b2 = _batch(n_inst=16, m=200)
    a1 = 0.1 * np.abs(np.einsum("bmi,bm->bi", A3, b2)).max(axis=1)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=jnp.asarray(a1, jnp.float32), alpha2=0.0,
    )
    cfg = BatchFISTAConfig(max_iter=400, check_every=50, rel_gap_tol=1e-6)
    single = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
    sharded = fista_gram_vmem_sharded(
        gb, mesh, cfg, axis=BATCH_AXIS, b_tile=128, interpret=True
    )
    assert bool(np.asarray(sharded.converged).all())
    assert np.all(np.asarray(sharded.rel_gap) <= 1e-6)
    # no cross-device early exit: sharded lanes keep iterating after
    # certification, so solutions agree at certification level, not bitwise
    np.testing.assert_allclose(
        np.asarray(sharded.x), np.asarray(single.x), rtol=2e-3, atol=1e-4
    )


# ---------------------------------------------------------------------------
# Fused Gram-build kernel (kernels/gram_build.py)
# ---------------------------------------------------------------------------


def test_fused_build_matches_xla_gram():
    import jax
    from fastoptsolver_tpu.kernels import make_gram_batch_fused

    rng = np.random.default_rng(0)
    n, m, B = 5, 120, 384
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    bfm = jnp.asarray(rng.normal(size=(m, B)), jnp.float32)
    gb = make_gram_batch_fused(Afm, bfm, alpha1=0.5, alpha2=0.1, interpret=True)
    gb0 = make_gram_batch(
        jnp.transpose(Afm, (2, 1, 0)), jnp.transpose(bfm, (1, 0)),
        alpha1=0.5, alpha2=0.1,
    )
    np.testing.assert_allclose(np.asarray(gb.Q), np.asarray(gb0.Q), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb.c), np.asarray(gb0.c), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb.btb), np.asarray(gb0.btb), rtol=1e-5)
    # L: close to the XLA estimate (both are power iterations; random
    # Gaussian Grams are the small-eigengap worst case). Certified
    # convergence with the fused L is the binding check (next test).
    ratio = np.asarray(gb.L) / np.asarray(gb0.L)
    assert np.all(ratio > 0.9) and np.all(ratio < 1.1), (ratio.min(), ratio.max())


def test_fused_build_split_k_matches_plain_and_f64():
    """split_k folds the m-reduction into FMA-shaped chains (the headline
    build-kernel optimization, RESULTS.md round 3); every split must agree
    with the plain tree reduction and with a float64 ground truth, and a
    non-divisible m must silently fall back to split_k=1."""
    from fastoptsolver_tpu.kernels import make_gram_batch_fused

    rng = np.random.default_rng(3)
    n, m, B = 5, 120, 256
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    bfm = jnp.asarray(rng.normal(size=(m, B)), jnp.float32)
    A64 = np.asarray(Afm, np.float64)
    Q64 = np.einsum("imb,jmb->ijb", A64, A64)
    c64 = np.einsum("imb,mb->ib", A64, np.asarray(bfm, np.float64))

    base = make_gram_batch_fused(Afm, bfm, 0.5, 0.1, interpret=True)
    for k in (2, 4, 8):
        gb = make_gram_batch_fused(Afm, bfm, 0.5, 0.1, interpret=True,
                                   split_k=k)
        np.testing.assert_allclose(np.asarray(gb.Q), Q64, rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gb.c), c64, rtol=1e-5, atol=1e-3)
        # L: same power iteration on (rounding-level) different Grams — the
        # estimates may jitter a little; the 1.02 safety margin dwarfs it
        ratio = np.asarray(gb.L) / np.asarray(base.L)
        assert np.all(ratio > 0.999) and np.all(ratio < 1.001)
    # m=120 not divisible by 7: falls back to plain reduction, still exact
    gb7 = make_gram_batch_fused(Afm, bfm, 0.5, 0.1, interpret=True, split_k=7)
    np.testing.assert_allclose(np.asarray(gb7.Q), Q64, rtol=1e-5, atol=1e-3)


def test_fused_build_nonmultiple_batch_and_end_to_end():
    from fastoptsolver_tpu.kernels import make_gram_batch_fused

    rng = np.random.default_rng(1)
    n, m, B = 5, 80, 200  # B not a multiple of the lane tile
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    x_true = np.zeros((n, B), np.float32)
    x_true[:2] = rng.normal(size=(2, B))
    bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(x_true))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    gb = make_gram_batch_fused(Afm, bfm, alpha1=a1, alpha2=0.0, b_tile=128,
                               interpret=True)
    assert gb.Q.shape == (n, n, B)
    # 5e-6: random Gaussian instances sit near the f32 gap-evaluation floor
    # at 1e-6 (a handful of lanes plateau at ~1.3e-6 on the XLA path too)
    cfg = BatchFISTAConfig(max_iter=1000, check_every=25, rel_gap_tol=5e-6)
    res = fista_gram_batch(gb, cfg)
    assert bool(res.converged.all())


def test_fused_build_wide_n_matches_xla_and_rejects_past_ceiling():
    """Round 4: the fused build is generic over n (the old n <= 7 augmented
    tile is gone) — parity vs the XLA einsum precompute at n = 20 and n = 64,
    with the explicit VMEM ceiling (~90 features) still failing loudly."""
    import pytest
    from fastoptsolver_tpu.kernels import make_gram_batch_fused

    rng = np.random.default_rng(7)
    for n, B in ((20, 128), (64, 128)):
        Afm = jnp.asarray(rng.normal(size=(n, 96, B)), jnp.float32)
        bfm = jnp.asarray(rng.normal(size=(96, B)), jnp.float32)
        gb = make_gram_batch_fused(Afm, bfm, alpha1=0.5, alpha2=0.1,
                                   interpret=True)
        gb0 = make_gram_batch(
            jnp.transpose(Afm, (2, 1, 0)), jnp.transpose(bfm, (1, 0)),
            alpha1=0.5, alpha2=0.1,
        )
        np.testing.assert_allclose(np.asarray(gb.Q), np.asarray(gb0.Q),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(gb.c), np.asarray(gb0.c),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(gb.btb), np.asarray(gb0.btb),
                                   rtol=1e-5)
        # power-iteration L vs the XLA estimate (both upper-bound-ish; the
        # fused one carries the 1.02 safety factor)
        np.testing.assert_allclose(np.asarray(gb.L), np.asarray(gb0.L),
                                   rtol=0.05)

    Afm = jnp.zeros((120, 16, 128), jnp.float32)
    bfm = jnp.zeros((16, 128), jnp.float32)
    with pytest.raises(ValueError, match="make_gram_batch"):
        make_gram_batch_fused(Afm, bfm, alpha1=0.1, alpha2=0.0, interpret=True)


def test_feature_major_generator_distribution_parity():
    import jax
    from fastoptsolver_tpu.problems import (
        generate_scenario_batch,
        generate_scenario_batch_fm,
    )

    key = jax.random.PRNGKey(0)
    B, m = 512, 400
    A1, b1, xt1 = generate_scenario_batch(key, B, m=m, noise_std=1.0, rho1=0.5, rho2=0.7)
    A2, b2, xt2 = generate_scenario_batch_fm(key, B, m=m, noise_std=1.0, rho1=0.5, rho2=0.7)
    assert A2.shape == (5, m, B) and b2.shape == (m, B)
    np.testing.assert_array_equal(np.asarray(xt1), np.asarray(xt2))
    # distributional parity: feature means/stds and within-block correlation
    m1 = np.asarray(A1).reshape(-1, 5).mean(0)
    m2 = np.asarray(A2).transpose(1, 2, 0).reshape(-1, 5).mean(0)
    np.testing.assert_allclose(m1, m2, rtol=0.02, atol=0.05)
    s1 = np.asarray(A1).reshape(-1, 5).std(0)
    s2 = np.asarray(A2).transpose(1, 2, 0).reshape(-1, 5).std(0)
    np.testing.assert_allclose(s1, s2, rtol=0.05)
    flat1 = np.asarray(A1).reshape(-1, 5)
    flat2 = np.asarray(A2).transpose(1, 2, 0).reshape(-1, 5)
    c1 = np.corrcoef(flat1[:, 0], flat1[:, 1])[0, 1]
    c2 = np.corrcoef(flat2[:, 0], flat2[:, 1])[0, 1]
    np.testing.assert_allclose(c1, c2, atol=0.05)
    # b = A @ x_true + noise in both layouts
    r2 = np.asarray(b2) - np.einsum("nmb,n->mb", np.asarray(A2), np.asarray(xt2))
    assert abs(r2.std() - 1.0) < 0.05


def test_adaptive_kernel_matches_xla_path():
    from fastoptsolver_tpu.kernels import fista_gram_vmem_adaptive

    rng = np.random.default_rng(0)
    B, m, n = 300, 200, 5
    A = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float32)
    xt = np.zeros((B, n), np.float32)
    xt[:, :2] = rng.normal(size=(B, 2))
    b = jnp.einsum("bmn,bn->bm", A, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", A, b)), axis=1)
    gb = make_gram_batch(A, b, alpha1=a1, alpha2=0.0)
    cfg = BatchFISTAConfig(max_iter=1000, check_every=25, rel_gap_tol=5e-6)
    r0 = fista_gram_batch(gb, cfg)
    r1 = fista_gram_vmem_adaptive(gb, cfg, b_tile=128, interpret=True)
    assert bool(r1.converged.all())
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x), atol=2e-4)
    # same certification cadence ⇒ identical per-instance iteration counts
    np.testing.assert_array_equal(np.asarray(r1.iters), np.asarray(r0.iters))


def test_adaptive_kernel_requires_certification():
    import pytest
    from fastoptsolver_tpu.kernels import fista_gram_vmem_adaptive

    gb = make_gram_batch(
        jnp.ones((8, 16, 5), jnp.float32), jnp.ones((8, 16), jnp.float32),
        alpha1=0.1, alpha2=0.0,
    )
    with pytest.raises(ValueError):
        fista_gram_vmem_adaptive(
            gb, BatchFISTAConfig(max_iter=100, check_every=0), interpret=True
        )


def test_kernel_adaptive_restart_matches_xla_trajectory():
    """In-kernel adaptive restart (per-lane t / prev-step rows) reproduces the
    XLA driver's restart recurrence (batch/fista_gram.py nesterov branch,
    reference iterative_solvers.py:209-217) step-for-step on a fixed run."""
    A3, b2 = _batch(n_inst=6, m=150)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=0.5, alpha2=0.0,
    )
    for K in (15, 60):  # short (restarts in-flight) and long horizons
        cfg = BatchFISTAConfig(max_iter=K, check_every=0, adaptive_restart=True)
        ref = fista_gram_batch(gb, cfg)
        got = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5
        )
        # and it differs from the non-restart trajectory (the test has teeth)
        if K == 60:
            plain = fista_gram_batch(
                gb, BatchFISTAConfig(max_iter=K, check_every=0)
            )
            assert not np.allclose(
                np.asarray(ref.x), np.asarray(plain.x), rtol=1e-6, atol=1e-8
            )


def test_kernel_adaptive_restart_certified():
    """Certified bursts with restart: every instance certifies and the t/ps
    state survives burst boundaries (multi-launch resume)."""
    A3, b2 = _batch(n_inst=8, m=400)
    a1 = 0.1 * np.abs(np.einsum("bmi,bm->bi", A3, b2)).max(axis=1)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=jnp.asarray(a1, jnp.float32), alpha2=0.0,
    )
    cfg = BatchFISTAConfig(
        max_iter=800, check_every=25, rel_gap_tol=1e-6, adaptive_restart=True
    )
    res = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
    assert bool(np.asarray(res.converged).all())
    assert np.all(np.asarray(res.rel_gap) <= 1e-6)
    # per-tile adaptive kernel agrees with the burst driver at the same cadence
    from fastoptsolver_tpu.kernels import fista_gram_vmem_adaptive

    res_a = fista_gram_vmem_adaptive(gb, cfg, b_tile=128, interpret=True)
    assert bool(np.asarray(res_a.converged).all())
    np.testing.assert_array_equal(np.asarray(res_a.iters), np.asarray(res.iters))
    np.testing.assert_allclose(
        np.asarray(res_a.x), np.asarray(res.x), rtol=2e-4, atol=2e-5
    )


def test_kernel_restart_rejects_non_nesterov():
    import pytest

    gb = make_gram_batch(
        jnp.ones((8, 16, 5), jnp.float32), jnp.ones((8, 16), jnp.float32),
        alpha1=0.1, alpha2=0.0,
    )
    cfg = BatchFISTAConfig(
        max_iter=10, momentum="delta", delta=3.0, adaptive_restart=True
    )
    with pytest.raises(ValueError):
        fista_gram_vmem(gb, cfg, interpret=True)


def test_sharded_pipeline_matches_single_device():
    import jax
    from fastoptsolver_tpu.kernels import solve_pipeline_sharded
    from fastoptsolver_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    n, m, B = 5, 150, 500  # B not a multiple of (tile * n_dev) → padding path
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    xt = np.zeros((n, B), np.float32)
    xt[:2] = rng.normal(size=(2, B))
    bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    cfg = BatchFISTAConfig(max_iter=1000, check_every=25, rel_gap_tol=5e-6)

    mesh = make_mesh(batch=8, model=1)
    res = solve_pipeline_sharded(
        Afm, bfm, a1, 0.0, mesh, cfg, b_tile_build=128, b_tile_solve=128,
        interpret=True,
    )
    assert bool(res.converged.all())
    # single-device reference through the XLA path
    gb0 = make_gram_batch(
        jnp.transpose(Afm, (2, 1, 0)), jnp.transpose(bfm, (1, 0)),
        alpha1=a1, alpha2=0.0,
    )
    r0 = fista_gram_batch(gb0, cfg)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(r0.x), atol=3e-4)


# ---------------------------------------------------------------------------
# In-kernel greedy momentum + config guards (VERDICT r2 item 2)
# ---------------------------------------------------------------------------


def test_kernel_greedy_matches_xla_trajectory():
    """In-kernel greedy FISTA (per-lane τ in the t row, unit momentum,
    gradient-mapping restart, safeguard shrink) reproduces the XLA driver's
    greedy branch (batch/fista_gram.py) step-for-step on a fixed run."""
    A3, b2 = _batch(n_inst=6, m=150)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=0.5, alpha2=0.0,
    )
    for K in (15, 60):
        cfg = BatchFISTAConfig(max_iter=K, check_every=0, momentum="greedy")
        ref = fista_gram_batch(gb, cfg)
        got = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5
        )
        # differs from the plain nesterov trajectory (the test has teeth)
        if K == 60:
            plain = fista_gram_batch(
                gb, BatchFISTAConfig(max_iter=K, check_every=0)
            )
            assert not np.allclose(
                np.asarray(ref.x), np.asarray(plain.x), rtol=1e-6, atol=1e-8
            )


def test_kernel_greedy_certified_all_paths():
    """Certified greedy: burst driver, per-tile adaptive kernel, and sharded
    kernel all certify every instance; τ/first-step state survives burst
    boundaries (multi-launch resume)."""
    import jax
    from fastoptsolver_tpu.kernels import (
        fista_gram_vmem_adaptive,
        fista_gram_vmem_sharded,
    )
    from fastoptsolver_tpu.parallel import make_mesh, BATCH_AXIS

    A3, b2 = _batch(n_inst=8, m=400)
    a1 = 0.1 * np.abs(np.einsum("bmi,bm->bi", A3, b2)).max(axis=1)
    gb = make_gram_batch(
        jnp.asarray(A3, jnp.float32), jnp.asarray(b2, jnp.float32),
        alpha1=jnp.asarray(a1, jnp.float32), alpha2=0.0,
    )
    cfg = BatchFISTAConfig(
        max_iter=800, check_every=25, rel_gap_tol=1e-6, momentum="greedy"
    )
    res = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
    assert bool(np.asarray(res.converged).all())
    assert np.all(np.asarray(res.rel_gap) <= 1e-6)

    res_a = fista_gram_vmem_adaptive(gb, cfg, b_tile=128, interpret=True)
    assert bool(np.asarray(res_a.converged).all())
    np.testing.assert_array_equal(np.asarray(res_a.iters), np.asarray(res.iters))
    np.testing.assert_allclose(
        np.asarray(res_a.x), np.asarray(res.x), rtol=2e-4, atol=2e-5
    )

    mesh = make_mesh(batch=4, model=1, devices=jax.devices()[:4])
    res_s = fista_gram_vmem_sharded(
        gb, mesh, cfg, axis=BATCH_AXIS, b_tile=128, interpret=True
    )
    assert bool(np.asarray(res_s.converged).all())
    np.testing.assert_allclose(
        np.asarray(res_s.x), np.asarray(res.x), rtol=2e-3, atol=1e-4
    )


def test_kernel_rejects_backtracking_on_unsupported_variants():
    """Round 5: the burst vmem kernel, the sharded kernel, and the plain
    fused kernel run the masked Armijo search in-kernel
    (tests/test_kernel_armijo.py); the variants that still don't — the
    per-tile adaptive kernel and the software-pipelined overlap kernel —
    must keep failing loudly, never silently run fixed-step (ADVICE r2)."""
    import pytest
    from fastoptsolver_tpu.kernels import fista_gram_vmem_adaptive

    gb = make_gram_batch(
        jnp.ones((8, 16, 5), jnp.float32), jnp.ones((8, 16), jnp.float32),
        alpha1=0.1, alpha2=0.0,
    )
    cfg = BatchFISTAConfig(max_iter=10, backtracking=True)
    with pytest.raises(NotImplementedError):
        fista_gram_vmem_adaptive(gb, cfg, interpret=True)
    # the burst kernel now ACCEPTS it (search runs in-kernel)
    res = fista_gram_vmem(gb, cfg, interpret=True)
    assert res.x.shape == (8, 5)


def test_fused_build_nonmultiple_rows():
    """m not a sublane multiple: zero-row padding leaves the Gram unchanged."""
    from fastoptsolver_tpu.kernels import make_gram_batch_fused

    rng = np.random.default_rng(3)
    n, m, B = 5, 77, 128  # m % 8 = 5
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    bfm = jnp.asarray(rng.normal(size=(m, B)), jnp.float32)
    gb = make_gram_batch_fused(Afm, bfm, alpha1=0.5, alpha2=0.0, interpret=True)
    gb0 = make_gram_batch(
        jnp.transpose(Afm, (2, 1, 0)), jnp.transpose(bfm, (1, 0)),
        alpha1=0.5, alpha2=0.0,
    )
    np.testing.assert_allclose(np.asarray(gb.Q), np.asarray(gb0.Q), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb.c), np.asarray(gb0.c), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb.btb), np.asarray(gb0.btb), rtol=1e-5)


def test_vmem_kernel_resume_is_exact(tmp_path):
    """SURVEY §5 checkpoint obligation on the FAST path (r3 verdict weak #4):
    40 iterations + checkpoint + resume 60 must reproduce a straight
    100-iteration kernel run bit-for-bit, in every momentum mode the kernel
    implements — fixed nesterov (global β table, absolute-k indexed),
    adaptive restart (per-lane t/prev-step rows), and greedy (per-lane τ +
    first-step rows). One case round-trips through utils/checkpoint.py to
    pin the on-disk format."""
    from fastoptsolver_tpu.kernels import VmemSolveState, fista_gram_vmem
    from fastoptsolver_tpu.utils.checkpoint import restore_pytree, save_pytree

    A, b = _batch()
    gb = make_gram_batch(
        jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32), 0.5, 0.0
    )
    for i, kw in enumerate(
        (dict(), dict(adaptive_restart=True), dict(momentum="greedy"))
    ):
        full = BatchFISTAConfig(max_iter=100, check_every=0, **kw)
        half = BatchFISTAConfig(max_iter=40, check_every=0, **kw)
        straight = fista_gram_vmem(gb, full, b_tile=128, interpret=True)
        _, mid = fista_gram_vmem(
            gb, half, b_tile=128, interpret=True, return_state=True
        )
        assert isinstance(mid, VmemSolveState)
        assert int(mid.k) == 40
        if i == 0:  # disk round-trip (atomic npz pytree checkpoint)
            path = save_pytree(str(tmp_path / "kstate"), mid)
            mid = restore_pytree(path, mid)
        resumed = fista_gram_vmem(
            gb, full, b_tile=128, interpret=True, state0=mid
        )
        np.testing.assert_array_equal(
            np.asarray(resumed.x), np.asarray(straight.x)
        )
        assert int(resumed.n_iters_total) == 100


def test_vmem_kernel_resume_certified():
    """Resume also composes with the certification loop: a run cut at 50
    iterations and resumed with check_every=25 certifies every instance and
    matches the XLA driver's certified answers."""
    A, b = _batch()
    gb = make_gram_batch(
        jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32), 0.5, 0.0
    )
    _, mid = fista_gram_vmem(
        gb, BatchFISTAConfig(max_iter=50, check_every=0), b_tile=128,
        interpret=True, return_state=True,
    )
    cfg = BatchFISTAConfig(max_iter=2000, check_every=25, rel_gap_tol=5e-6)
    res = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True, state0=mid)
    assert bool(np.asarray(res.converged).all())
    assert np.asarray(res.rel_gap).max() <= 5e-6
    # two certified solves may stop at different burst boundaries; the
    # contract is objective parity, not raw-x identity (cf. the wide-n
    # verify_tpu convention)
    ref = fista_gram_batch(gb, cfg)

    def obj(x):
        r = np.einsum("bmn,bn->bm", A, x) - b
        return 0.5 * np.sum(r * r, axis=1) + 0.5 * np.abs(x).sum(axis=1)

    np.testing.assert_allclose(
        obj(np.asarray(res.x, np.float64)), obj(np.asarray(ref.x, np.float64)),
        rtol=1e-5,
    )


def test_single_launch_fused_solve_matches_two_kernel_path():
    """Round 4: the single-launch build+solve kernel (Q never in HBM) must
    give the same certified answers as the two-kernel path, at narrow and
    wide n, including non-multiple batch/row shapes (ragged-brick mask)."""
    from fastoptsolver_tpu.kernels import (
        make_gram_batch_fused,
        fista_gram_vmem,
        solve_lasso_fused,
    )

    rng = np.random.default_rng(11)
    for n, m, B in ((5, 250, 200), (20, 96, 160)):
        Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
        xt = np.zeros((n, B), np.float32)
        xt[: max(n // 4, 1)] = rng.normal(size=(max(n // 4, 1), B))
        bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
        a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
        cfg = BatchFISTAConfig(max_iter=2000, check_every=25, rel_gap_tol=5e-6)
        res1 = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cfg, interpret=True)
        gb = make_gram_batch_fused(Afm, bfm, a1, 0.0, interpret=True)
        res2 = fista_gram_vmem(gb, cfg, interpret=True)
        assert bool(np.asarray(res1.converged).all()), (n, "fused not certified")
        assert bool(np.asarray(res2.converged).all()), (n, "2-kernel not certified")
        # same pl_iters/l_safety/beta schedule => same trajectory
        np.testing.assert_allclose(
            np.asarray(res1.x), np.asarray(res2.x), rtol=1e-5, atol=1e-6
        )
        # tau is derived in-kernel here vs XLA-side there: a 1-ulp division
        # difference can flip a gap check riding the tolerance — allow one
        # burst of certification-time skew per lane
        assert (
            np.abs(np.asarray(res1.iters, np.int64)
                   - np.asarray(res2.iters, np.int64)).max()
            <= cfg.check_every
        )


def test_single_launch_fused_solve_guards():
    import pytest
    from fastoptsolver_tpu.kernels import solve_lasso_fused

    A = jnp.ones((5, 16, 128), jnp.float32)
    b = jnp.ones((16, 128), jnp.float32)
    # round 5: backtracking runs on the plain single-launch kernel; only
    # the overlap variant rejects it (tests/test_kernel_armijo.py)
    with pytest.raises(NotImplementedError, match="backtracking"):
        solve_lasso_fused(
            A, b, 0.1,
            cfg=BatchFISTAConfig(max_iter=10, check_every=5,
                                 backtracking=True),
            interpret=True, overlap=True,
        )
    with pytest.raises(ValueError, match="check_every"):
        solve_lasso_fused(
            A, b, 0.1, cfg=BatchFISTAConfig(max_iter=10, check_every=0),
            interpret=True,
        )
    # restart/greedy run on the PLAIN single-launch kernel (round 4); only
    # the software-pipelined overlap variant rejects them
    for stateful in (
        BatchFISTAConfig(max_iter=10, check_every=5, adaptive_restart=True),
        BatchFISTAConfig(max_iter=10, check_every=5, momentum="greedy"),
    ):
        with pytest.raises(NotImplementedError, match="overlap"):
            solve_lasso_fused(A, b, 0.1, cfg=stateful, interpret=True,
                              overlap=True)


def test_single_launch_fused_restart_and_greedy_match_two_kernel():
    """Adaptive restart and greedy momentum on the plain single-launch
    kernel must reproduce the two-kernel path (same per-lane state-row
    recurrences, kernels/_common.fista_general_chunk)."""
    from fastoptsolver_tpu.kernels import (
        fista_gram_vmem,
        make_gram_batch_fused,
        solve_lasso_fused,
    )

    rng = np.random.default_rng(17)
    n, m, B = 5, 250, 200
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    xt = np.zeros((n, B), np.float32)
    xt[:2] = rng.normal(size=(2, B))
    bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    for kw in (dict(adaptive_restart=True), dict(momentum="greedy")):
        cfg = BatchFISTAConfig(max_iter=2000, check_every=25,
                               rel_gap_tol=5e-6, **kw)
        res1 = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cfg, interpret=True)
        gb = make_gram_batch_fused(Afm, bfm, a1, 0.0, interpret=True)
        res2 = fista_gram_vmem(gb, cfg, interpret=True)
        assert bool(np.asarray(res1.converged).all()), (kw, "fused1")
        assert bool(np.asarray(res2.converged).all()), (kw, "2-kernel")
        np.testing.assert_allclose(
            np.asarray(res1.x), np.asarray(res2.x), rtol=1e-5, atol=1e-6
        )
        assert (
            np.abs(np.asarray(res1.iters, np.int64)
                   - np.asarray(res2.iters, np.int64)).max()
            <= cfg.check_every
        )


def test_overlap_fused_matches_plain_fused_multi_tile():
    """The software-pipelined variant (solve of tile i-1 overlapped with
    tile i's bricks, double-buffered scratch, shifted output column) must
    reproduce the plain single-launch kernel across multiple lane tiles,
    momentum modes, and elastic-net configs."""
    from fastoptsolver_tpu.kernels import solve_lasso_fused

    rng = np.random.default_rng(23)
    n, m, B = 5, 250, 390  # b_tile=128 -> 4 tiles incl. a ragged last one
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    xt = np.zeros((n, B), np.float32)
    xt[:2] = rng.normal(size=(2, B))
    bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    for cfg, a2 in (
        (BatchFISTAConfig(max_iter=1500, check_every=25, rel_gap_tol=5e-6), 0.0),
        (BatchFISTAConfig(max_iter=1500, check_every=25, rel_gap_tol=5e-6,
                          momentum="delta", delta=3.0), 0.3),
    ):
        plain = solve_lasso_fused(Afm, bfm, a1, a2, cfg=cfg, b_tile=128,
                                  interpret=True, overlap=False)
        over = solve_lasso_fused(Afm, bfm, a1, a2, cfg=cfg, b_tile=128,
                                 interpret=True, overlap=True)
        assert bool(np.asarray(plain.converged).all())
        assert bool(np.asarray(over.converged).all())
        # same math and burst schedule; the two programs compile separately,
        # so allow ulp-level drift (and one burst of certification skew for
        # tolerance-riding lanes)
        np.testing.assert_allclose(
            np.asarray(over.x), np.asarray(plain.x), rtol=1e-5, atol=1e-6
        )
        assert (
            np.abs(np.asarray(over.iters, np.int64)
                   - np.asarray(plain.iters, np.int64)).max()
            <= cfg.check_every
        )


def test_vmem_kernel_resume_at_budget_reports_truth():
    """Resuming with state0.k >= cfg.max_iter must certify the carried
    iterate post-hoc (r4 review finding: it used to return converged=False,
    rel_gap=inf even for a fully converged checkpoint)."""
    A, b = _batch()
    a1 = 0.1 * np.abs(np.einsum("bmi,bm->bi", A, b)).max(axis=1)
    gb = make_gram_batch(
        jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
        jnp.asarray(a1, jnp.float32), 0.0,
    )
    cfg = BatchFISTAConfig(max_iter=500, check_every=25, rel_gap_tol=5e-6)
    res, fin = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True,
                               return_state=True)
    assert bool(np.asarray(res.converged).all())
    # resume with the budget already spent (the early-exited run stopped at
    # fin.k < 500; cap max_iter there so ZERO bursts remain)
    cfg0 = BatchFISTAConfig(max_iter=int(fin.k), check_every=25,
                            rel_gap_tol=5e-6)
    res2 = fista_gram_vmem(gb, cfg0, b_tile=128, interpret=True, state0=fin)
    assert bool(np.asarray(res2.converged).all())
    assert np.asarray(res2.rel_gap).max() <= 5e-6
    np.testing.assert_array_equal(np.asarray(res2.x), np.asarray(res.x))


def test_overlap_auto_falls_back_on_single_tile():
    """With the whole batch in one lane tile there is nothing to overlap —
    auto must pick the plain kernel (the extra grid column would re-DMA A
    for nothing); an EXPLICIT overlap=True is still honored and correct."""
    from fastoptsolver_tpu.kernels import solve_lasso_fused

    rng = np.random.default_rng(31)
    n, m, B = 5, 120, 96  # B < 128 -> one lane tile
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    bfm = jnp.einsum(
        "nmb,nb->mb", Afm,
        jnp.asarray(rng.normal(size=(n, B)), jnp.float32),
    )
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    cfg = BatchFISTAConfig(max_iter=1500, check_every=25, rel_gap_tol=5e-6)
    auto = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cfg, interpret=True)
    forced = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cfg, interpret=True,
                               overlap=True)
    assert bool(np.asarray(auto.converged).all())
    assert bool(np.asarray(forced.converged).all())
    np.testing.assert_allclose(
        np.asarray(forced.x), np.asarray(auto.x), rtol=1e-5, atol=1e-6
    )


def test_stream_ceiling_kernel_reads_every_brick():
    """bench/stream.py's no-math pass (the bench.py self-calibrating
    roofline, round 5) must traverse the same brick grid as the fused
    solver: its accumulator output pins one row per (row-brick), so a
    skipped DMA would be visible."""
    from fastoptsolver_tpu.bench.stream import _stream_pass

    rng = np.random.default_rng(0)
    n, m, B = 5, 80, 256
    A = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(m, B)), jnp.float32)
    m_tile = 16
    out = _stream_pass(A, b, b_tile=128, m_tile=m_tile, interpret=True)
    expected = sum(
        np.asarray(A)[0, j * m_tile] + np.asarray(b)[j * m_tile]
        for j in range(m // m_tile)
    )
    np.testing.assert_allclose(np.asarray(out)[0], expected, rtol=1e-5,
                               atol=1e-5)
