"""Mesh-routed solve_lasso_batch (round 5, VERDICT item 5).

The round-4 multi-chip surface was hand-picked kernels
(kernels/pipeline.py, kernels/fista_vmem.py sharded variants); a multi-chip
user lost the routing guarantees of the single-chip surface. Round 5 makes
``solve_lasso_batch(..., mesh=)`` run the SAME routed path per shard —
guard-deferred fallbacks, fused-vs-driver choice, ``backend=`` forcing —
via ``shard_map`` over the instance axis.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from fastoptsolver_tpu.batch import solve_lasso_batch
from fastoptsolver_tpu.batch.fista_gram import BatchFISTAConfig


def _problem(seed=0, B=500, m=150, n=5):
    # B=500: not a multiple of 128 * 8 devices → exercises the padding path
    rng = np.random.default_rng(seed)
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    xt = np.zeros((n, B), np.float32)
    xt[:2] = rng.normal(size=(2, B))
    bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    return Afm, bfm, a1


def test_mesh_routed_matches_single_device_kernel_path():
    """Sharded-vs-single parity through the ROUTED surface on the 8-device
    CPU mesh, kernel backend (the fused engine per shard)."""
    from fastoptsolver_tpu.parallel import make_mesh

    Afm, bfm, a1 = _problem()
    cfg = BatchFISTAConfig(max_iter=1000, check_every=25, rel_gap_tol=5e-6)
    mesh = make_mesh(batch=8, model=1)
    res = solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                            interpret=True, mesh=mesh)
    ref = solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                            interpret=True)
    assert bool(np.asarray(res.converged).all())
    # per-lane math is lane-local, so the shard split cannot change it;
    # tiny drift comes only from the per-shard padding of the last tile
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res.iters),
                                  np.asarray(ref.iters))


def test_mesh_routed_driver_backend_and_guards():
    """backend='xla' forces the HBM-streamed driver inside every shard;
    backend='kernel' with an unsupportable config raises the kernel guard's
    message BEFORE any device work; resume with a mesh raises."""
    import pytest

    from fastoptsolver_tpu.parallel import make_mesh

    Afm, bfm, a1 = _problem(seed=1, B=256)
    cfg = BatchFISTAConfig(max_iter=800, check_every=25, rel_gap_tol=5e-6)
    mesh = make_mesh(batch=8, model=1)
    res = solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                            mesh=mesh, backend="xla")
    ref = solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                            backend="xla")
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="backend='kernel'"):
        solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                          mesh=mesh, backend="kernel")  # not on TPU
    # mesh state rides the per-lane-k engines (fused here at n=5); other
    # state types refuse with a pointer to per-shard checkpointing
    from fastoptsolver_tpu.batch.fista_gram import (
        init_batch_state,
        make_gram_batch,
    )

    gb = make_gram_batch(jnp.transpose(Afm, (2, 1, 0)),
                         jnp.transpose(bfm, (1, 0)), a1, 0.0)
    with pytest.raises(NotImplementedError, match="FusedSolveState"):
        solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                          mesh=mesh, interpret=True,
                          state0=init_batch_state(gb))


def test_mesh_routed_resume_round_trip():
    """Checkpoint/resume THROUGH the mesh surface (round 5): the fused
    engine's per-lane k lets shards evolve independently under one SPMD
    program — cut + resume over the mesh equals the straight mesh run, and
    a mesh checkpoint equals the single-chip checkpointed trajectory."""
    import dataclasses

    from fastoptsolver_tpu.kernels import FusedSolveState
    from fastoptsolver_tpu.parallel import make_mesh

    Afm, bfm, a1 = _problem(seed=5, B=512)
    mesh = make_mesh(batch=8, model=1)
    full = BatchFISTAConfig(max_iter=200, check_every=25, rel_gap_tol=1e-6)
    half = dataclasses.replace(full, max_iter=75)
    straight = solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                                 interpret=True, mesh=mesh)
    _, mid = solve_lasso_batch(Afm, bfm, a1, cfg=half, feature_major=True,
                               interpret=True, mesh=mesh, return_state=True)
    assert isinstance(mid, FusedSolveState)
    resumed = solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                                interpret=True, mesh=mesh, state0=mid)
    np.testing.assert_array_equal(np.asarray(resumed.x),
                                  np.asarray(straight.x))
    np.testing.assert_array_equal(np.asarray(resumed.iters),
                                  np.asarray(straight.iters))
    # the mesh checkpoint also resumes on the SINGLE-CHIP surface (and vice
    # versa): state is per-lane, the mesh is just a layout
    single = solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                               interpret=True, state0=mid)
    np.testing.assert_array_equal(np.asarray(single.x),
                                  np.asarray(straight.x))


def test_mesh_routed_armijo_and_instance_major():
    """The round-5 armijo kernel path composes with the mesh routing, and
    instance-major inputs are transposed once up front."""
    from fastoptsolver_tpu.parallel import make_mesh

    Afm, bfm, a1 = _problem(seed=2, B=256)
    cfg = BatchFISTAConfig(max_iter=100, check_every=25, rel_gap_tol=1e-4,
                           backtracking=True)
    mesh = make_mesh(batch=8, model=1)
    res = solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                            interpret=True, mesh=mesh)
    ref = solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-5, atol=1e-6)
    # instance-major layout through the same mesh entry
    A_im = jnp.transpose(Afm, (2, 1, 0))
    b_im = jnp.transpose(bfm, (1, 0))
    cfg2 = BatchFISTAConfig(max_iter=800, check_every=25, rel_gap_tol=5e-6)
    res_im = solve_lasso_batch(A_im, b_im, a1, cfg=cfg2, mesh=mesh,
                               interpret=True)
    ref_im = solve_lasso_batch(Afm, bfm, a1, cfg=cfg2, feature_major=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(res_im.x), np.asarray(ref_im.x),
                               rtol=1e-5, atol=1e-6)


def test_mesh_routed_wide_n_engines_per_shard():
    """Wide n through the mesh surface: each shard's routed call picks the
    right wide-n engine inside shard_map — the resident manual-DMA engine
    at n=144 (the certified window) and the Q-streaming engine at n=200
    (past it; pinned by plan_gram_solve) — and matches the single-device
    result."""
    from fastoptsolver_tpu.kernels.fista_vmem import plan_gram_solve
    from fastoptsolver_tpu.parallel import make_mesh

    mesh = make_mesh(batch=8, model=1)
    for n, expect_engine in ((144, "resident"), (200, "qstream")):
        rng = np.random.default_rng(n)
        m, B = 200, 256
        Afm = jnp.asarray(
            rng.normal(size=(n, m, B)) / np.sqrt(n), jnp.float32
        )
        xt = np.zeros((n, B), np.float32)
        xt[: n // 8] = rng.normal(size=(n // 8, B))
        bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
        a1 = 0.1 * jnp.max(
            jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0
        )
        cfg = BatchFISTAConfig(max_iter=600, check_every=25,
                               rel_gap_tol=5e-6)
        assert plan_gram_solve(n, cfg)[0] == expect_engine
        res = solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                                interpret=True, mesh=mesh,
                                backend="kernel")
        ref = solve_lasso_batch(Afm, bfm, a1, cfg=cfg, feature_major=True,
                                interpret=True, backend="kernel")
        assert bool(np.asarray(res.converged).all()), expect_engine
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                                   rtol=1e-4, atol=5e-6,
                                   err_msg=expect_engine)


def test_mesh_resume_rejects_checkpoint_cut_under_other_grouping():
    """Review r5: a single-chip checkpoint (b_tile=1024 at n=5) whose tiles
    exited at different bursts, resumed over a mesh whose shard-local tiles
    straddle the original tile boundaries, would silently misindex k (the
    in-kernel guard skips for tracers) — the mesh surface must pre-validate
    the CONCRETE state against ITS grouping and refuse."""
    import pytest

    from fastoptsolver_tpu.kernels import solve_lasso_fused
    from fastoptsolver_tpu.parallel import make_mesh

    rng = np.random.default_rng(9)
    n, m, B = 5, 96, 3072
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    xt = np.zeros((n, B), np.float32)
    xt[:2] = rng.normal(size=(2, B))
    bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
    amax = jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    # middle single-chip tile [1024, 2048) hard, outer tiles trivial
    hard = (jnp.arange(B) >= 1024) & (jnp.arange(B) < 2048)
    a1 = jnp.where(hard, 0.1 * amax, 10.0 * amax)
    cut = BatchFISTAConfig(max_iter=150, check_every=25, rel_gap_tol=1e-6)
    # single-chip checkpoint at the auto 1024-lane grouping
    _, mid = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cut, interpret=True,
                               return_state=True)
    import jax

    kvals = sorted(set(np.asarray(mid.k).tolist()))
    assert len(kvals) > 1, kvals  # tiles genuinely diverged
    mesh = make_mesh(batch=2, model=1, devices=jax.devices()[:2])
    full = BatchFISTAConfig(max_iter=300, check_every=25, rel_gap_tol=1e-6)
    with pytest.raises(ValueError, match="not uniform"):
        solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                          interpret=True, mesh=mesh, state0=mid)


def test_mesh_routed_resume_wide_n_resident():
    """Mesh checkpoint/resume in the WIDE window rides the resident engine
    (per-lane k like the fused kernel): cut + resume over the mesh equals
    the straight mesh run; a scalar-k configuration (past-window n) still
    refuses."""
    import dataclasses

    import pytest

    from fastoptsolver_tpu.kernels import ResidentSolveState
    from fastoptsolver_tpu.parallel import make_mesh

    rng = np.random.default_rng(13)
    n, m, B = 144, 200, 256
    Afm = jnp.asarray(rng.normal(size=(n, m, B)) / np.sqrt(n), jnp.float32)
    xt = np.zeros((n, B), np.float32)
    xt[: n // 8] = rng.normal(size=(n // 8, B))
    bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    mesh = make_mesh(batch=8, model=1)
    full = BatchFISTAConfig(max_iter=300, check_every=25, rel_gap_tol=5e-6)
    half = dataclasses.replace(full, max_iter=75)
    straight = solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                                 interpret=True, mesh=mesh)
    _, mid = solve_lasso_batch(Afm, bfm, a1, cfg=half, feature_major=True,
                               interpret=True, mesh=mesh, return_state=True)
    assert isinstance(mid, ResidentSolveState)
    resumed = solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                                interpret=True, mesh=mesh, state0=mid)
    np.testing.assert_array_equal(np.asarray(resumed.x),
                                  np.asarray(straight.x))
    # past the window the engines are scalar-k: mesh state refuses
    rng2 = np.random.default_rng(14)
    n2 = 200
    Af2 = jnp.asarray(rng2.normal(size=(n2, 64, 256)) / 14.0, jnp.float32)
    bf2 = jnp.asarray(rng2.normal(size=(64, 256)), jnp.float32)
    with pytest.raises(NotImplementedError, match="scalar-k"):
        solve_lasso_batch(Af2, bf2, 0.3, cfg=full, feature_major=True,
                          interpret=True, mesh=mesh, return_state=True)
