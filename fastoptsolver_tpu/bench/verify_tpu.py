"""On-TPU Pallas kernel verification: Mosaic-compiled kernels vs the XLA path.

tests/test_kernels.py necessarily runs the kernels in interpreter mode (CI is
CPU-only); this script closes the loop on REAL hardware with
``interpret=False``, asserting the Mosaic-compiled kernels agree with the
pure-XLA batched driver (batch/fista_gram.py) at small shapes:

  1. fixed-iteration solve trajectory (nesterov momentum)
  2. FISTA-Δ momentum trajectory
  3. in-kernel adaptive restart trajectory (reference
     iterative_solvers.py:209-217 semantics)
  4. certified burst loop — convergence flags, gaps, per-instance iters
  5. per-tile adaptive kernel — same certification cadence as the driver
  6. fused Gram-build kernel vs the XLA einsum precompute
  7. in-kernel greedy momentum trajectory (per-lane τ state rows)
  8. wide problems at the kernel's feature ceiling (n = 20 / 64 / 96,
     auto-tiled — round-2 verdict: never Mosaic-compiled above n=5 before;
     three checks, each asserting both paths certified + certificates
     revalidated in independent float64 + objectives equal — this is the
     check that caught the round-3 default-matmul-precision bug)
  9. shard_map × Mosaic composition: the sharded kernel with
     ``interpret=False`` on a 1-device mesh (previously interpreter-only)
 10. df32 error-free transforms on the TPU backend (ops/df32.py — the CPU
     backend's FMA contraction broke classic Dekker EFTs; this asserts the
     TPU-compiled reductions hold their float64-level bounds in production)

Prints exactly one JSON line; run each round and record in RESULTS.md.

Usage (real chip, from the repo root — no PYTHONPATH, per CLAUDE.md):
  python -m fastoptsolver_tpu.bench.verify_tpu
"""
from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp


def _scenario_batch(n_inst: int, m: int):
    from ..problems import generate_boston_like

    As, bs = [], []
    for s in range(n_inst):
        A, b, _ = generate_boston_like(m=m, seed=s, noise_std=1.0, rho1=0.5, rho2=0.7)
        A = (A - A.mean(0)) / A.std(0)
        As.append(A)
        bs.append(b)
    return (
        jnp.asarray(np.stack(As), jnp.float32),
        jnp.asarray(np.stack(bs), jnp.float32),
    )


def run() -> dict:
    from ..batch import make_gram_batch
    from ..batch.fista_gram import BatchFISTAConfig, fista_gram_batch
    from ..kernels import (
        fista_gram_vmem,
        fista_gram_vmem_adaptive,
        make_gram_batch_fused,
    )

    checks: dict[str, bool] = {}

    def check(name: str, fn):
        try:
            fn()
            checks[name] = True
        except AssertionError as e:  # record, keep going — report all failures
            checks[name] = False
            print(f"# FAIL {name}: {e}")

    A3, b2 = _scenario_batch(n_inst=8, m=200)
    gb = make_gram_batch(A3, b2, alpha1=0.5, alpha2=0.0)

    # 1. fixed-iteration trajectory parity (Mosaic vs XLA)
    cfg_fixed = BatchFISTAConfig(max_iter=60, check_every=0)
    ref = fista_gram_batch(gb, cfg_fixed)
    got = fista_gram_vmem(gb, cfg_fixed, b_tile=128, interpret=False)
    check(
        "fixed_iters",
        lambda: np.testing.assert_allclose(
            np.asarray(got.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5
        ),
    )

    # 2. FISTA-Δ momentum
    cfg_d = BatchFISTAConfig(max_iter=50, check_every=0, momentum="delta", delta=3.0)
    ref_d = fista_gram_batch(gb, cfg_d)
    got_d = fista_gram_vmem(gb, cfg_d, b_tile=128, interpret=False)
    check(
        "delta_momentum",
        lambda: np.testing.assert_allclose(
            np.asarray(got_d.x), np.asarray(ref_d.x), rtol=2e-4, atol=2e-5
        ),
    )

    # 3. adaptive restart trajectory (per-lane t/ps rows in-kernel)
    cfg_r = BatchFISTAConfig(max_iter=60, check_every=0, adaptive_restart=True)
    ref_r = fista_gram_batch(gb, cfg_r)
    got_r = fista_gram_vmem(gb, cfg_r, b_tile=128, interpret=False)
    check(
        "adaptive_restart",
        lambda: np.testing.assert_allclose(
            np.asarray(got_r.x), np.asarray(ref_r.x), rtol=2e-4, atol=2e-5
        ),
    )

    # 4. certified burst loop
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", A3, b2)), axis=1)
    gbc = make_gram_batch(A3, b2, alpha1=a1, alpha2=0.0)
    cfg_c = BatchFISTAConfig(max_iter=800, check_every=25, rel_gap_tol=1e-6)
    res_c = fista_gram_vmem(gbc, cfg_c, b_tile=128, interpret=False)

    def _cert():
        assert bool(np.asarray(res_c.converged).all()), "not all certified"
        assert np.all(np.asarray(res_c.rel_gap) <= 1e-6), "gap above tol"
        assert np.all(np.asarray(res_c.iters) % 25 == 0), "iters off cadence"

    check("certified_bursts", _cert)

    # 4b. resume on the kernel path (round 4): 30 iterations + resume to 60
    # must equal the straight 60-iteration Mosaic run bit-for-bit
    _, mid_s = fista_gram_vmem(
        gb, BatchFISTAConfig(max_iter=30, check_every=0), b_tile=128,
        interpret=False, return_state=True,
    )
    resumed = fista_gram_vmem(
        gb, cfg_fixed, b_tile=128, interpret=False, state0=mid_s
    )
    check(
        "kernel_resume",
        lambda: np.testing.assert_array_equal(
            np.asarray(resumed.x), np.asarray(got.x)
        ),
    )

    # 5. per-tile adaptive kernel: same cadence ⇒ identical iteration counts
    res_a = fista_gram_vmem_adaptive(gbc, cfg_c, b_tile=128, interpret=False)

    def _adaptive():
        assert bool(np.asarray(res_a.converged).all()), "adaptive not certified"
        np.testing.assert_array_equal(
            np.asarray(res_a.iters), np.asarray(res_c.iters)
        )
        np.testing.assert_allclose(
            np.asarray(res_a.x), np.asarray(res_c.x), rtol=2e-4, atol=2e-5
        )

    check("adaptive_kernel", _adaptive)

    # 6. fused Gram-build kernel vs XLA precompute
    rng = np.random.default_rng(0)
    n, m, B = 5, 120, 384
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    bfm = jnp.asarray(rng.normal(size=(m, B)), jnp.float32)
    gb_f = make_gram_batch_fused(Afm, bfm, alpha1=0.5, alpha2=0.1, interpret=False)
    gb_x = make_gram_batch(
        jnp.transpose(Afm, (2, 1, 0)), jnp.transpose(bfm, (1, 0)),
        alpha1=0.5, alpha2=0.1,
    )

    # float64 NumPy ground truth — the arbiter if kernel and XLA disagree
    # (this is how the round-2 bf16-default-precision bug in the XLA einsum
    # was adjudicated: the kernel was right, make_gram_batch was fixed)
    A64 = np.asarray(Afm, np.float64)
    Q64 = np.einsum("imb,jmb->ijb", A64, A64)
    c64 = np.einsum("imb,mb->ib", A64, np.asarray(bfm, np.float64))

    def _build():
        np.testing.assert_allclose(np.asarray(gb_f.Q), Q64, rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb_x.Q), Q64, rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb_f.c), c64, rtol=2e-4, atol=1e-4)
        ratio = np.asarray(gb_f.L) / np.asarray(gb_x.L)
        assert np.all(ratio > 0.9) and np.all(ratio < 1.1), "L estimate drifted"

    check("fused_gram_build", _build)

    # 6b. the FMA-folded build variant (split_k=4, the bench.py default) must
    # match the same f64 ground truth when Mosaic-compiled
    gb_s4 = make_gram_batch_fused(Afm, bfm, alpha1=0.5, alpha2=0.1,
                                  interpret=False, split_k=4)

    def _build_split():
        np.testing.assert_allclose(np.asarray(gb_s4.Q), Q64, rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb_s4.c), c64, rtol=2e-4, atol=1e-4)
        ratio = np.asarray(gb_s4.L) / np.asarray(gb_f.L)
        assert np.all(ratio > 0.99) and np.all(ratio < 1.01), "split L drifted"

    check("fused_gram_build_split4", _build_split)

    # 6c. generic-n fused build (round 4): the m-grid accumulator kernel at
    # n ∈ {20, 64} vs float64 ground truth. n=64 deliberately hits the
    # ragged-last-brick path (m=264 has no multiple-of-8 divisor in the
    # auto m_tile's preferred range) — the out-of-bounds row masking must
    # hold on real hardware, where OOB block contents are unspecified.
    # n=20 uses m=250 (NOT a multiple of 8 — every auto m_tile choice leaves
    # a ragged last brick, so the OOB row masking is exercised on hardware,
    # where OOB block contents are unspecified)
    for n_b, mb in ((20, 250), (64, 264)):
        rngb = np.random.default_rng(100 + n_b)
        Bb = 256
        Afb = jnp.asarray(rngb.normal(size=(n_b, mb, Bb)), jnp.float32)
        bfb = jnp.asarray(rngb.normal(size=(mb, Bb)), jnp.float32)
        gb_w = make_gram_batch_fused(Afb, bfb, alpha1=0.5, alpha2=0.0,
                                     interpret=False)
        A64b = np.asarray(Afb, np.float64)
        Q64b = np.einsum("imb,jmb->ijb", A64b, A64b)
        c64b = np.einsum("imb,mb->ib", A64b, np.asarray(bfb, np.float64))
        L64b = np.linalg.eigvalsh(Q64b.transpose(2, 0, 1)).max(axis=1)

        def _buildw(gb_w=gb_w, Q64b=Q64b, c64b=c64b, L64b=L64b):
            np.testing.assert_allclose(
                np.asarray(gb_w.Q), Q64b, rtol=2e-4, atol=2e-3
            )
            np.testing.assert_allclose(
                np.asarray(gb_w.c), c64b, rtol=2e-4, atol=2e-3
            )
            ratio = np.asarray(gb_w.L, np.float64) / (1.02 * L64b)
            assert np.all(ratio > 0.85) and np.all(ratio < 1.05), (
                f"L off true λmax: [{ratio.min():.3f}, {ratio.max():.3f}]"
            )

        check(f"fused_build_n{n_b}", _buildw)

    # 6d. single-launch fused build+solve (round 4: Q never in HBM) — must
    # certify and agree with the two-kernel path in objective value
    from ..kernels import solve_lasso_fused

    rngf = np.random.default_rng(42)
    nf, mf, Bf = 5, 250, 384  # ragged row bricks + non-multiple batch
    Aff = jnp.asarray(rngf.normal(size=(nf, mf, Bf)), jnp.float32)
    bff = jnp.asarray(rngf.normal(size=(mf, Bf)), jnp.float32)
    a1f = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Aff, bff)), axis=0)
    cfg_f1 = BatchFISTAConfig(max_iter=2000, check_every=25, rel_gap_tol=5e-6)
    # default auto-picks the overlapped (software-pipelined) variant at n=5;
    # also run the plain one so both Mosaic-compile and certify on chip
    res_f1 = solve_lasso_fused(Aff, bff, a1f, 0.0, cfg=cfg_f1, interpret=False)
    res_f1p = solve_lasso_fused(Aff, bff, a1f, 0.0, cfg=cfg_f1,
                                interpret=False, overlap=False)
    gb_f1 = make_gram_batch_fused(Aff, bff, a1f, 0.0, interpret=False)
    res_f2 = fista_gram_vmem(gb_f1, cfg_f1, interpret=False)

    # restart/greedy run on the plain single-launch kernel (round 4) —
    # Mosaic-compile and certify them on chip too
    cfg_f1r = BatchFISTAConfig(max_iter=2000, check_every=25,
                               rel_gap_tol=5e-6, adaptive_restart=True)
    cfg_f1g = BatchFISTAConfig(max_iter=2000, check_every=25,
                               rel_gap_tol=5e-6, momentum="greedy")
    res_f1r = solve_lasso_fused(Aff, bff, a1f, 0.0, cfg=cfg_f1r,
                                interpret=False)
    res_f1g = solve_lasso_fused(Aff, bff, a1f, 0.0, cfg=cfg_f1g,
                                interpret=False)

    def _fused_single():
        assert bool(np.asarray(res_f1.converged).all()), "fused1 not certified"
        assert bool(np.asarray(res_f1p.converged).all()), (
            "plain fused1 not certified"
        )
        assert bool(np.asarray(res_f1r.converged).all()), (
            "fused1 restart not certified"
        )
        assert bool(np.asarray(res_f1g.converged).all()), (
            "fused1 greedy not certified"
        )
        np.testing.assert_allclose(
            np.asarray(res_f1.x), np.asarray(res_f1p.x), rtol=1e-4, atol=1e-5
        )
        A64f = np.asarray(Aff, np.float64)
        b64f = np.asarray(bff, np.float64)
        a64f = np.asarray(a1f, np.float64)

        def obj(x):
            r = np.einsum("nmb,nb->mb", A64f, np.asarray(x, np.float64).T) - b64f
            return 0.5 * np.sum(r * r, 0) + a64f * np.abs(
                np.asarray(x, np.float64)
            ).sum(1)

        rel = np.abs(obj(res_f1.x) - obj(res_f2.x)) / np.maximum(obj(res_f2.x), 1.0)
        assert rel.max() <= 1e-4, f"objective mismatch {rel.max():.2e}"

    check("fused_single_launch", _fused_single)

    # 7. in-kernel greedy momentum (per-lane τ in the state rows)
    cfg_g = BatchFISTAConfig(max_iter=60, check_every=0, momentum="greedy")
    ref_g = fista_gram_batch(gb, cfg_g)
    got_g = fista_gram_vmem(gb, cfg_g, b_tile=128, interpret=False)
    check(
        "greedy_momentum",
        lambda: np.testing.assert_allclose(
            np.asarray(got_g.x), np.asarray(ref_g.x), rtol=2e-4, atol=2e-5
        ),
    )

    # 7b. in-kernel Armijo backtracking (round 5): decisive regime — an
    # understated L makes every accept/reject decision carry real margin, so
    # the Mosaic-compiled masked search must reproduce the XLA driver's
    # trajectory AND its per-lane accepted τ (outside this regime the
    # recurrence is measurably chaotic — tests/test_kernel_armijo.py pins
    # that with a perturbation experiment; on-chip we assert the
    # deterministic contract).
    import dataclasses as _dc

    gb_low = _dc.replace(gb, L=gb.L / 4.0)
    cfg_arm = BatchFISTAConfig(max_iter=5, check_every=0, backtracking=True)
    ref_arm, rs_arm = fista_gram_batch(gb_low, cfg_arm, return_state=True)
    got_arm, gs_arm = fista_gram_vmem(
        gb_low, cfg_arm, b_tile=128, interpret=False, return_state=True
    )

    def _armijo():
        np.testing.assert_allclose(
            np.asarray(got_arm.x), np.asarray(ref_arm.x), rtol=2e-4, atol=2e-4
        )
        tau0 = 4.0 / np.asarray(gb.L)
        assert np.all(np.asarray(rs_arm.tau) < 0.9 * tau0), "search never fired"
        np.testing.assert_allclose(
            np.asarray(gs_arm.tau)[0], np.asarray(rs_arm.tau), rtol=1e-5
        )

    check("kernel_armijo", _armijo)

    # 7c. fused single-launch armijo vs the two-kernel path: identical
    # in-kernel float sequences ⇒ bit-exact equality must hold ON CHIP too
    cfg_arm_f = BatchFISTAConfig(max_iter=6, check_every=6, rel_gap_tol=1e-6,
                                 backtracking=True, t_init_factor=4.0)
    res_arm_f = solve_lasso_fused(Aff, bff, a1f, 0.0, cfg=cfg_arm_f,
                                  interpret=False, split_k=1, b_tile=128)
    gb_arm_f = make_gram_batch_fused(Aff, bff, a1f, 0.0, interpret=False,
                                     split_k=1)
    ref_arm_f = fista_gram_vmem(gb_arm_f, cfg_arm_f, b_tile=128,
                                interpret=False)

    def _armijo_fused():
        # interpret mode is bit-exact (tests/test_kernel_armijo.py); on
        # chip the two engines differ at the ULP level — the fused kernel's
        # τ = 1/L division lowers through Mosaic, the two-kernel path's
        # through XLA, and the rounding differs (measured ≤ 6e-6 abs in the
        # decisive regime, round 5)
        np.testing.assert_allclose(
            np.asarray(res_arm_f.x), np.asarray(ref_arm_f.x),
            rtol=2e-3, atol=2e-5,
        )

    check("fused_armijo", _armijo_fused)

    # 7d. fused-engine resume on chip (round 5): cut + resume equals the
    # straight certified run bit-for-bit, incl. the per-lane k row read
    # inside the Mosaic kernel
    cfg_fr = BatchFISTAConfig(max_iter=200, check_every=25, rel_gap_tol=1e-6)
    cfg_fr_half = BatchFISTAConfig(max_iter=75, check_every=25,
                                   rel_gap_tol=1e-6)
    straight_fr = solve_lasso_fused(Aff, bff, a1f, 0.0, cfg=cfg_fr,
                                    interpret=False, overlap=False)
    _, mid_fr = solve_lasso_fused(Aff, bff, a1f, 0.0, cfg=cfg_fr_half,
                                  interpret=False, return_state=True)
    resumed_fr = solve_lasso_fused(Aff, bff, a1f, 0.0, cfg=cfg_fr,
                                   interpret=False, state0=mid_fr)

    def _fused_resume():
        np.testing.assert_array_equal(
            np.asarray(resumed_fr.x), np.asarray(straight_fr.x)
        )
        np.testing.assert_array_equal(
            np.asarray(resumed_fr.iters), np.asarray(straight_fr.iters)
        )

    check("fused_resume", _fused_resume)

    # 8. wide problems at the auto-tiled feature ceiling (certified solves).
    # The contract at wide n: BOTH the XLA driver and the Mosaic kernel
    # certify, their certificates survive an independent float64 NumPy
    # recomputation from (A, b) (this is what caught the round-3
    # default-matmul-precision bug: the driver's Q·x silently dropped to
    # bf16 on the MXU at n ≥ 64 and its true gap floored at ~4e-2), and the
    # two solutions agree in objective value. Raw-x allclose is NOT asserted
    # at wide n: two correctly certified solves may differ by O(√(gap/λmin))
    # per coordinate on these ill-conditioned Grams.
    def _f64_gap_obj(A, b, a1, X):
        A64, b64 = np.asarray(A, np.float64), np.asarray(b, np.float64)
        a64, X64 = np.asarray(a1, np.float64), np.asarray(X, np.float64)
        r = np.einsum("bmn,bn->bm", A64, X64) - b64
        p = 0.5 * np.sum(r * r, 1) + a64 * np.abs(X64).sum(1)
        s = np.max(np.abs(np.einsum("bmn,bm->bn", A64, r)), axis=1)
        scale = np.minimum(1.0, a64 / np.maximum(s, 1e-300))
        u = scale[:, None] * r
        d = -0.5 * np.sum(u * u, 1) - np.sum(u * b64, 1)
        return (p - d) / np.maximum(p, 1.0), p

    for n_wide in (20, 64, 96):
        rngw = np.random.default_rng(n_wide)
        Bw, mw = 256, 4 * n_wide
        Aw = jnp.asarray(rngw.normal(size=(Bw, mw, n_wide)), jnp.float32)
        xtw = np.zeros((Bw, n_wide), np.float32)
        xtw[:, : n_wide // 4] = rngw.normal(size=(Bw, n_wide // 4))
        bw = jnp.einsum("bmn,bn->bm", Aw, jnp.asarray(xtw))
        a1w = 0.1 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", Aw, bw)), axis=1)
        gbw = make_gram_batch(Aw, bw, alpha1=a1w, alpha2=0.0)
        cfg_w = BatchFISTAConfig(max_iter=2000, check_every=50, rel_gap_tol=5e-6)
        ref_w = fista_gram_batch(gbw, cfg_w)
        got_w = fista_gram_vmem(gbw, cfg_w, interpret=False)  # auto b_tile
        gap_ref, obj_ref = _f64_gap_obj(Aw, bw, a1w, ref_w.x)
        gap_got, obj_got = _f64_gap_obj(Aw, bw, a1w, got_w.x)

        def _wide(ref_w=ref_w, got_w=got_w, gap_ref=gap_ref,
                  gap_got=gap_got, obj_ref=obj_ref, obj_got=obj_got):
            assert bool(np.asarray(ref_w.converged).all()), "driver not certified"
            assert bool(np.asarray(got_w.converged).all()), "kernel not certified"
            # f64 recheck: certificates must be real, not self-consistent lies
            # (tolerance 4× the solve tol: the Gram-form gap the solver
            # certifies and the (A, b)-form gap recomputed here differ by f32
            # Gram rounding)
            assert gap_ref.max() <= 4 * 5e-6, f"driver f64 gap {gap_ref.max():.2e}"
            assert gap_got.max() <= 4 * 5e-6, f"kernel f64 gap {gap_got.max():.2e}"
            rel_obj = np.abs(obj_ref - obj_got) / np.maximum(obj_ref, 1.0)
            assert rel_obj.max() <= 1e-4, f"objective mismatch {rel_obj.max():.2e}"

        check(f"wide_n{n_wide}", _wide)

    # 8b. the Q-streaming wide-n engine (round 5): past the resident
    # window, plan_gram_solve routes to kernels/qstream.py — Mosaic-compile
    # it on chip at n=208 and hold it to the same certified contract as the
    # wide-n driver checks (both certified, f64 recheck, objective parity).
    def _wide_problem(n_w: int):
        rngq = np.random.default_rng(n_w)
        Bq, mq = 256, 2 * n_w
        Aq = jnp.asarray(
            rngq.normal(size=(Bq, mq, n_w)) / np.sqrt(n_w), jnp.float32
        )
        xtq = np.zeros((Bq, n_w), np.float32)
        xtq[:, : n_w // 8] = rngq.normal(size=(Bq, n_w // 8))
        bq = jnp.einsum("bmn,bn->bm", Aq, jnp.asarray(xtq))
        a1q = 0.1 * jnp.max(
            jnp.abs(jnp.einsum("bmi,bm->bi", Aq, bq)), axis=1
        )
        return Aq, bq, a1q, make_gram_batch(Aq, bq, alpha1=a1q, alpha2=0.0)

    from ..kernels.fista_vmem import plan_gram_solve

    n_qs = 208
    Aq2, bq2, a1q2, gbq2 = _wide_problem(n_qs)
    cfg_q = BatchFISTAConfig(max_iter=2000, check_every=50, rel_gap_tol=5e-6)
    assert plan_gram_solve(n_qs, cfg_q)[0] == "qstream"
    ref_q = fista_gram_batch(gbq2, cfg_q)
    got_q = fista_gram_vmem(gbq2, cfg_q, interpret=False)
    gap_ref_q, obj_ref_q2 = _f64_gap_obj(Aq2, bq2, a1q2, ref_q.x)
    gap_got_q, obj_got_q = _f64_gap_obj(Aq2, bq2, a1q2, got_q.x)

    def _qstream():
        assert bool(np.asarray(ref_q.converged).all()), "driver not certified"
        assert bool(np.asarray(got_q.converged).all()), "qstream not certified"
        assert gap_ref_q.max() <= 4 * 5e-6, f"driver f64 gap {gap_ref_q.max():.2e}"
        assert gap_got_q.max() <= 4 * 5e-6, f"qstream f64 gap {gap_got_q.max():.2e}"
        rel_obj = np.abs(obj_ref_q2 - obj_got_q) / np.maximum(obj_ref_q2, 1.0)
        assert rel_obj.max() <= 1e-4, f"objective mismatch {rel_obj.max():.2e}"

    check("qstream_wide_n", _qstream)

    # 8c. qstream resume on chip: 40 + 60 == straight 100 bit-for-bit
    # (check_every=0 keeps the fixed-run path on the streaming engine)
    _, mid_q = fista_gram_vmem(
        gbq2, BatchFISTAConfig(max_iter=40, check_every=0), interpret=False,
        return_state=True,
    )
    straight_q = fista_gram_vmem(
        gbq2, BatchFISTAConfig(max_iter=100, check_every=0), interpret=False
    )
    resumed_q = fista_gram_vmem(
        gbq2, BatchFISTAConfig(max_iter=100, check_every=0), interpret=False,
        state0=mid_q,
    )
    check(
        "qstream_resume",
        lambda: np.testing.assert_array_equal(
            np.asarray(resumed_q.x), np.asarray(straight_q.x)
        ),
    )

    # 8d. the resident mid-range engine (round 5): manual-DMA single-
    # buffered Q block, whole certified solve per tile — must Mosaic-compile
    # on chip (n=144, the window plan_gram_solve routes here), certify, and
    # survive the independent f64 recheck.
    from ..kernels import fista_gram_resident

    Aq, bq, a1q, gbq = _wide_problem(144)
    cfg_res = BatchFISTAConfig(max_iter=2000, check_every=50,
                               rel_gap_tol=5e-6)
    assert plan_gram_solve(144, cfg_res)[0] == "resident"
    ref_res = fista_gram_batch(gbq, cfg_res)
    res_res = fista_gram_resident(gbq, cfg_res, interpret=False)
    gap_res, obj_res = _f64_gap_obj(Aq, bq, a1q, res_res.x)
    _, obj_res_ref = _f64_gap_obj(Aq, bq, a1q, ref_res.x)

    def _resident():
        assert bool(np.asarray(res_res.converged).all()), "resident not certified"
        assert gap_res.max() <= 4 * 5e-6, f"resident f64 gap {gap_res.max():.2e}"
        rel_obj = np.abs(obj_res_ref - obj_res) / np.maximum(obj_res_ref, 1.0)
        assert rel_obj.max() <= 1e-4, f"objective mismatch {rel_obj.max():.2e}"

    check("resident_window", _resident)

    # 8e. resident armijo + resume on chip
    gb_low_q = _dc.replace(gbq, L=gbq.L / 4.0)
    cfg_ra = BatchFISTAConfig(max_iter=5, check_every=5, backtracking=True)
    ref_ra, rs_ra = fista_gram_batch(gb_low_q, cfg_ra, return_state=True)
    got_ra = fista_gram_resident(gb_low_q, cfg_ra, interpret=False)
    cfg_rr = BatchFISTAConfig(max_iter=200, check_every=25, rel_gap_tol=5e-6)
    straight_rr = fista_gram_resident(gbq, cfg_rr, interpret=False)
    _, mid_rr = fista_gram_resident(
        gbq, BatchFISTAConfig(max_iter=75, check_every=25, rel_gap_tol=5e-6),
        interpret=False, return_state=True,
    )
    resumed_rr = fista_gram_resident(gbq, cfg_rr, interpret=False,
                                     state0=mid_rr)

    def _resident_armijo_resume():
        np.testing.assert_allclose(
            np.asarray(got_ra.x), np.asarray(ref_ra.x), rtol=2e-3, atol=2e-4
        )
        np.testing.assert_array_equal(
            np.asarray(resumed_rr.x), np.asarray(straight_rr.x)
        )

    check("resident_armijo_resume", _resident_armijo_resume)

    # 8f. the resident window BOUNDARY: n=168 is the probe-calibrated Mosaic
    # ceiling (n=176 overflows scoped VMEM) — this check keeps the
    # auto_b_tile_resident budget honest against compiler changes. The
    # solve runs INSIDE the check body: the regression it guards is a
    # Mosaic lowering failure, which must record as a FAIL in the report,
    # not abort the run before the remaining checks (review r5).
    def _resident_ceiling():
        Ab8, bb8, ab8, gb8 = _wide_problem(168)
        assert plan_gram_solve(168, cfg_res)[0] == "resident"
        try:
            res_b8 = fista_gram_resident(
                gb8,
                BatchFISTAConfig(max_iter=800, check_every=50,
                                 rel_gap_tol=5e-6),
                interpret=False,
            )
            conv = np.asarray(res_b8.converged)
        except Exception as e:  # compile/lowering failure IS the regression
            raise AssertionError(
                f"n=168 no longer Mosaic-compiles: {str(e)[:200]}"
            ) from e
        gap_b8, _ = _f64_gap_obj(Ab8, bb8, ab8, res_b8.x)
        assert conv.mean() > 0.9, f"boundary conv {conv.mean():.2f}"
        assert gap_b8[conv].max() <= 4 * 5e-6, (
            f"boundary f64 gap {gap_b8[conv].max():.2e}"
        )

    check("resident_ceiling_n168", _resident_ceiling)

    # 9. shard_map × Mosaic: sharded kernel, interpret=False, 1-device mesh
    from ..kernels import fista_gram_vmem_sharded
    from ..parallel import BATCH_AXIS, make_mesh

    mesh1 = make_mesh(batch=1, model=1, devices=jax.devices()[:1])
    res_s = fista_gram_vmem_sharded(
        gbc, mesh1, cfg_c, axis=BATCH_AXIS, b_tile=128, interpret=False
    )

    def _sharded():
        assert bool(np.asarray(res_s.converged).all()), "sharded not certified"
        np.testing.assert_allclose(
            np.asarray(res_s.x), np.asarray(res_c.x), rtol=2e-3, atol=1e-4
        )

    check("sharded_mosaic", _sharded)

    # 10. df32 EFTs survive the TPU compiler (production gap path)
    def _df32():
        from ..ops import df32

        rngd = np.random.default_rng(7)
        nd = 4097
        u64 = rngd.normal(size=nd) * 1e4
        u64[nd // 2:] = -u64[: nd - nd // 2][::-1] * (1 + 1e-9)
        u = jnp.asarray(u64.astype(np.float32))
        v = jnp.asarray(rngd.normal(size=nd).astype(np.float32))
        s, e = jax.jit(df32.two_sum)(u, v)
        exact = np.asarray(u, np.float64) + np.asarray(v, np.float64)
        assert np.array_equal(
            np.asarray(s, np.float64) + np.asarray(e, np.float64), exact
        ), "two_sum not exact on TPU"
        t1, t2, t3, t4 = jax.jit(df32.exact_mul_terms)(u, v)
        pexact = np.asarray(u, np.float64) * np.asarray(v, np.float64)
        total = sum(np.asarray(t, np.float64) for t in (t1, t2, t3, t4))
        assert np.array_equal(total, pexact), "split products not exact on TPU"
        hi, lo = df32.dot2(u, v)
        dexact = float(np.asarray(u, np.float64) @ np.asarray(v, np.float64))
        scale = float(np.abs(pexact).sum())
        got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
        assert abs(got - dexact) <= 1e-13 * scale, (
            f"dot2 err {abs(got - dexact):.3e} vs tol {1e-13 * scale:.3e}"
        )

    check("df32_efts", _df32)

    return {
        "metric": "tpu_kernel_verification_mosaic_vs_xla",
        "value": sum(checks.values()),
        "unit": f"checks_passed_of_{len(checks)}",
        "ok": all(checks.values()),
        "detail": {**checks, "device": str(jax.devices()[0])},
    }


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/fos_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    out = run()
    print(json.dumps(out))
    raise SystemExit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
