"""In-kernel Armijo backtracking (round 5, VERDICT item 1).

The masked per-lane sufficient-decrease search of the XLA driver
(batch/fista_gram.py:_iterate_block, reference iterative_solvers.py:183-197)
now runs inside the Pallas kernels (kernels/_common.fista_armijo_chunk): the
burst vmem kernel, the sharded vmem kernel, and the plain single-launch
fused kernel. These tests pin:

- trajectory parity vs the XLA driver in the DECISIVE regime (an
  understated L makes every accept/reject decision non-borderline — the
  search must shrink τ identically on every lane);
- the measured fact that outside that regime the recurrence is chaotic:
  the driver under a 1e-7 input perturbation deviates from itself by the
  same magnitude as the kernel deviates from the driver (τ never grows, so
  one flipped borderline accept halves a lane's step forever — this is the
  reference recurrence's own behavior, cf. the armijo-stall oracle in
  tests/test_sweep.py);
- bit-exact parity between the fused single-launch kernel and the
  two-kernel path (identical in-kernel float sequences);
- bit-exact checkpoint/resume with the per-lane τ row carried across the
  cut;
- the certification record (done/iters/gap) surviving a resume (ADVICE r4).
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from fastoptsolver_tpu.batch.fista_gram import (
    BatchFISTAConfig,
    fista_gram_batch,
    make_gram_batch,
)
from fastoptsolver_tpu.kernels import fista_gram_vmem


def _problem(seed=0, B=256, m=150, n=5, alpha=0.5):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float32)
    xt = np.zeros((B, n), np.float32)
    xt[:, :2] = rng.normal(size=(B, 2))
    b = jnp.einsum("bmn,bn->bm", A, jnp.asarray(xt))
    return A, b, make_gram_batch(A, b, alpha, 0.0)


def test_kernel_armijo_matches_driver_decisive_regime():
    """Understated L (τ₀ = 4/L_true): the first trial robustly fails the
    Armijo test on every lane and the shrink→accept decisions carry real
    margins — the kernel must reproduce the driver's trajectory AND its
    per-lane accepted τ exactly (not just statistically)."""
    _, _, gb = _problem()
    gb_low = dataclasses.replace(gb, L=gb.L / 4.0)
    cfg = BatchFISTAConfig(max_iter=5, check_every=0, backtracking=True)
    ref, rs = fista_gram_batch(gb_low, cfg, return_state=True)
    got, gs = fista_gram_vmem(
        gb_low, cfg, b_tile=128, interpret=True, return_state=True
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=1e-4, atol=1e-5
    )
    # the search fired on every lane (teeth) and both paths agree on τ
    tau0 = 4.0 / np.asarray(gb.L)
    assert np.all(np.asarray(rs.tau) < 0.9 * tau0)
    np.testing.assert_allclose(
        np.asarray(gs.tau)[0], np.asarray(rs.tau), rtol=1e-6
    )
    # and differs from the fixed-step trajectory (which diverges at 4/L)
    plain = fista_gram_vmem(
        gb_low, BatchFISTAConfig(max_iter=5, check_every=0), b_tile=128,
        interpret=True,
    )
    assert not np.allclose(np.asarray(got.x), np.asarray(plain.x), atol=1e-3)


def test_kernel_armijo_momentum_modes_decisive():
    """Armijo composes with every kernel momentum mode the driver composes
    with: table-β nesterov, FISTA-Δ, and nesterov + adaptive restart."""
    _, _, gb = _problem(seed=3)
    gb_low = dataclasses.replace(gb, L=gb.L / 4.0)
    for kw in (
        dict(),
        dict(momentum="delta", delta=5.0),
        dict(adaptive_restart=True),
    ):
        cfg = BatchFISTAConfig(
            max_iter=5, check_every=0, backtracking=True, **kw
        )
        ref = fista_gram_batch(gb_low, cfg)
        got = fista_gram_vmem(gb_low, cfg, b_tile=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got.x), np.asarray(ref.x), rtol=2e-4, atol=2e-4,
            err_msg=str(kw),
        )


def test_armijo_chaos_is_intrinsic_not_kernel_error():
    """Outside the decisive regime the armijo recurrence amplifies ULP-level
    differences into trajectory divergence (τ never grows: one flipped
    borderline accept halves a lane's step permanently). Pin that this is a
    property of the RECURRENCE, not a kernel bug: the driver under a 1e-7
    relative perturbation of c deviates from itself by at least the scale
    the kernel deviates from the driver, while the fixed-step (teeth: same
    perturbation, no search) stays parity-tight."""
    _, _, gb = _problem()
    gb_pert = dataclasses.replace(gb, c=gb.c * (1.0 + 1e-7))
    cfg = BatchFISTAConfig(max_iter=60, check_every=0, backtracking=True)
    ref = fista_gram_batch(gb, cfg)
    pert = fista_gram_batch(gb_pert, cfg)
    got = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
    d_kernel = np.abs(np.asarray(got.x) - np.asarray(ref.x)).max()
    d_self = np.abs(np.asarray(pert.x) - np.asarray(ref.x)).max()
    assert d_kernel <= 10.0 * max(d_self, 1e-6)
    # fixed-step control: no search, no chaos
    cfg_f = BatchFISTAConfig(max_iter=60, check_every=0)
    d_fixed = np.abs(
        np.asarray(fista_gram_batch(gb_pert, cfg_f).x)
        - np.asarray(fista_gram_batch(gb, cfg_f).x)
    ).max()
    assert d_fixed < 1e-5


def test_fused_armijo_matches_two_kernel_bitexact():
    """The single-launch fused kernel's armijo solve must be bit-identical
    to the two-kernel path (fused build + burst vmem solve) — they run the
    same in-kernel float sequence against the same in-kernel Gram. Decisive
    regime via t_init_factor=4; multi-tile (b_tile=128 over B=300) and
    ragged row bricks (m=96 with m_tile from the auto tiler)."""
    from fastoptsolver_tpu.kernels import make_gram_batch_fused
    from fastoptsolver_tpu.kernels.fused_solve import solve_lasso_fused

    rng = np.random.default_rng(1)
    B, m, n = 300, 96, 5
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    xt = np.zeros((n, B), np.float32)
    xt[:2] = rng.normal(size=(2, B))
    bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    for kw in (dict(), dict(adaptive_restart=True)):
        cfg = BatchFISTAConfig(
            max_iter=6, check_every=6, rel_gap_tol=1e-6, backtracking=True,
            t_init_factor=4.0, **kw,
        )
        res = solve_lasso_fused(
            Afm, bfm, a1, 0.0, cfg=cfg, interpret=True, split_k=1,
            b_tile=128,
        )
        gb = make_gram_batch_fused(
            Afm, bfm, a1, 0.0, interpret=True, split_k=1
        )
        ref = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(res.x), np.asarray(ref.x), err_msg=str(kw)
        )
        np.testing.assert_array_equal(
            np.asarray(res.iters), np.asarray(ref.iters)
        )


def test_fused_rejects_armijo_on_overlap_only():
    """backtracking routes to the PLAIN single-launch kernel: overlap=True
    must reject loudly, auto mode must pick the plain variant and solve."""
    import pytest

    from fastoptsolver_tpu.kernels.fused_solve import solve_lasso_fused

    rng = np.random.default_rng(2)
    n, m, B = 5, 64, 256
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    bfm = jnp.asarray(rng.normal(size=(m, B)), jnp.float32)
    cfg = BatchFISTAConfig(max_iter=10, check_every=5, backtracking=True)
    with pytest.raises(NotImplementedError):
        solve_lasso_fused(Afm, bfm, 0.3, 0.0, cfg=cfg, interpret=True,
                          overlap=True)
    res = solve_lasso_fused(Afm, bfm, 0.3, 0.0, cfg=cfg, interpret=True)
    assert res.x.shape == (B, n)


def test_kernel_armijo_resume_is_exact(tmp_path):
    """40 + 60 armijo iterations across a checkpoint equal a straight
    100-iteration run bit-for-bit — the per-lane accepted-τ row survives
    the cut (kernel-vs-kernel, so the chaotic regime is fine: both sides
    run identical float sequences). Includes a disk round-trip."""
    from fastoptsolver_tpu.kernels import VmemSolveState
    from fastoptsolver_tpu.utils.checkpoint import restore_pytree, save_pytree

    _, _, gb = _problem(seed=5, B=192)
    for kw in (dict(), dict(adaptive_restart=True)):
        full = BatchFISTAConfig(
            max_iter=100, check_every=0, backtracking=True,
            t_init_factor=2.0, **kw,
        )
        half = dataclasses.replace(full, max_iter=40)
        straight = fista_gram_vmem(gb, full, b_tile=128, interpret=True)
        _, mid = fista_gram_vmem(
            gb, half, b_tile=128, interpret=True, return_state=True
        )
        assert isinstance(mid, VmemSolveState)
        assert int(mid.k) == 40
        path = save_pytree(str(tmp_path / f"arm{len(kw)}"), mid)
        mid = restore_pytree(path, mid)
        resumed = fista_gram_vmem(
            gb, full, b_tile=128, interpret=True, state0=mid
        )
        np.testing.assert_array_equal(
            np.asarray(resumed.x), np.asarray(straight.x), err_msg=str(kw)
        )


def test_certified_resume_preserves_certification_record():
    """ADVICE r4: a lane certified before the checkpoint must keep its
    burst-boundary iteration count and gap on resume instead of being
    re-detected — straight certified run == cut-and-resumed run on every
    result field."""
    _, _, gb = _problem(seed=7, B=192)
    cfg = BatchFISTAConfig(max_iter=500, check_every=25, rel_gap_tol=1e-5)
    straight = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True)
    assert bool(np.asarray(straight.converged).any())
    # cut AFTER some lanes certified (75 iters, 3 certified bursts)
    cut = dataclasses.replace(cfg, max_iter=75)
    _, mid = fista_gram_vmem(
        gb, cut, b_tile=128, interpret=True, return_state=True
    )
    assert bool(np.asarray(mid.done).any())  # the cut really split the run
    res = fista_gram_vmem(gb, cfg, b_tile=128, interpret=True, state0=mid)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(straight.x))
    np.testing.assert_array_equal(
        np.asarray(res.iters), np.asarray(straight.iters)
    )
    np.testing.assert_array_equal(
        np.asarray(res.rel_gap), np.asarray(straight.rel_gap)
    )
    np.testing.assert_array_equal(
        np.asarray(res.converged), np.asarray(straight.converged)
    )


def test_sharded_kernel_armijo_matches_single_device():
    """The shard_map'd vmem kernel runs the armijo search per shard; every
    per-lane quantity is lane-local, so the sharded result matches the
    single-device kernel run exactly."""
    from fastoptsolver_tpu.kernels import fista_gram_vmem_sharded
    from fastoptsolver_tpu.parallel import make_mesh

    _, _, gb = _problem(seed=9, B=256)
    gb_low = dataclasses.replace(gb, L=gb.L / 4.0)
    cfg = BatchFISTAConfig(
        max_iter=20, check_every=5, rel_gap_tol=1e-6, backtracking=True
    )
    mesh = make_mesh(batch=8, model=1)
    res = fista_gram_vmem_sharded(
        gb_low, mesh, cfg, b_tile=128, interpret=True
    )
    ref = fista_gram_vmem(gb_low, cfg, b_tile=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(res.iters), np.asarray(ref.iters)
    )


def test_routed_surface_runs_armijo_on_kernel():
    """solve_gram_batch/solve_lasso_batch with backtracking now route to the
    Pallas path when the kernel supports the config — backend='kernel' must
    no longer raise (r4 verdict item 1: armijo was the last XLA-only
    configuration)."""
    from fastoptsolver_tpu.batch import solve_gram_batch

    _, _, gb = _problem(seed=11, B=128)
    gb_low = dataclasses.replace(gb, L=gb.L / 4.0)
    cfg = BatchFISTAConfig(
        max_iter=10, check_every=5, rel_gap_tol=1e-6, backtracking=True
    )
    res = solve_gram_batch(gb_low, cfg, backend="kernel", interpret=True)
    ref = fista_gram_vmem(gb_low, cfg, b_tile=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(ref.x), rtol=1e-5, atol=1e-6
    )


def test_wide_n_armijo_stall_matches_reference_oracle():
    """Wide-n finding (RESULTS.md round 5): on the wide-n bench scenarios
    the reference's armijo recurrence stalls OUTRIGHT — the C·gradᵀΔ accept
    test at this conditioning collapses the never-growing per-lane τ — while
    fixed-step FISTA certifies on the same instances. Pinned here against
    the independent NumPy oracle of the reference recurrence (f64), so the
    measured converged=0 rows in bench/wide_n.py --backtracking are the
    recurrence's own behavior, not a framework defect."""
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).parent))
    from oracle_np import fista_np

    from fastoptsolver_tpu.bench.wide_n import _build_problems

    B, m, n, iters = 8, 256, 128, 400
    A, b, a1 = _build_problems(jax.random.PRNGKey(0), B, m, n)

    def relgap64(Ai, bi, alpha, x):
        r = Ai @ x - bi
        g = Ai.T @ r
        s = max(1.0, np.max(np.abs(g)) / alpha)
        u = r / s
        primal = 0.5 * r @ r + alpha * np.sum(np.abs(x))
        dual = -0.5 * u @ u - u @ bi
        return (primal - dual) / max(1.0, abs(primal))

    # oracle, one instance, f64: armijo stalls where fixed-step certifies
    Ai = np.asarray(A[0], np.float64)
    bi = np.asarray(b[0], np.float64)
    alpha = float(a1[0])
    L = float(np.linalg.eigvalsh(Ai.T @ Ai)[-1])
    x_bt, _ = fista_np(Ai, bi, alpha, 0.0, L, backtracking=True,
                       max_iter=iters)
    x_fx, _ = fista_np(Ai, bi, alpha, 0.0, L, backtracking=False,
                       max_iter=iters)
    g_bt = relgap64(Ai, bi, alpha, x_bt)
    g_fx = relgap64(Ai, bi, alpha, x_fx)
    assert g_bt > 0.05, g_bt       # stalled far from optimal
    assert g_fx < 1e-3, g_fx       # same instance, fixed step: certified

    # the driver reproduces the stall on the full batch (qualitative pin:
    # the trajectory itself is chaotic at accept/reject boundaries — see
    # test_armijo_chaos_is_intrinsic_not_kernel_error)
    gb = make_gram_batch(A, b, a1, 0.0)
    cfg = BatchFISTAConfig(max_iter=iters, check_every=50,
                           rel_gap_tol=1e-4, backtracking=True)
    res = fista_gram_batch(gb, cfg)
    assert int(jnp.sum(res.converged)) == 0
    assert float(jnp.median(res.rel_gap)) > 0.05
    cfg_fx = dataclasses.replace(cfg, backtracking=False)
    res_fx = fista_gram_batch(gb, cfg_fx)
    assert int(jnp.sum(res_fx.converged)) == B
