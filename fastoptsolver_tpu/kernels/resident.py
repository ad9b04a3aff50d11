"""Pallas TPU kernel: mid-range wide-n certified FISTA, Q resident via
manual DMA.

Between the burst kernel's double-buffered ceiling (n ≈ 104 — Pallas
allocates TWO copies of every BlockSpec'd input, so half of VMEM is gone
before the solve starts) and the streaming regime (kernels/qstream.py,
which re-reads Q every iteration) there is a window, roughly
104 < n ≤ 168 (probe-calibrated on chip), where a lane tile's whole Gram block FITS in VMEM
single-buffered. This kernel claims it: Q stays in HBM
(``memory_space=ANY``) and each grid step copies ITS tile's
(n_pad, n_pad, b_tile) block into a VMEM scratch with ONE explicit
``make_async_copy``, then runs the entire certified solve against the
resident block — the same shared body as the single-launch fused kernel
(kernels/_common.certified_solve_body), so every momentum mode INCLUDING
the masked Armijo search runs here (the search's data-dependent trial
matvecs are free against resident Q, where the streaming kernel must
reject them).

Traffic: Q is read from HBM exactly ONCE per solve (the copy), vs once per
burst (resident burst kernel) or once per iteration + one per check
(qstream / the XLA driver) — at 1000 iterations and check_every=25 that is
1040× less Q traffic than the streaming paths; the solve becomes
VPU-compute-bound. The copy itself (~13 MB per tile at n=160) amortizes
over the tile's whole solve, so losing Pallas's automatic double-buffered
prefetch costs ~nothing here — unlike the small-n adaptive kernel, where
the same single-launch structure lost to the burst driver because the
solve per tile was comparable to the DMA (RESULTS.md round 2).

Each tile exits its in-kernel certification loop at its own convergence
point (per-lane k in the state — resume semantics identical to the fused
engine, including the tile-regrouping guard). Routed by
``kernels.fista_vmem.plan_gram_solve`` when the window applies.

Reference parity: the same recurrences as kernels/fista_vmem.py
(iterative_solvers.py:170-221, :183-197); parity-tested against the
qstream engine and the XLA driver in tests/test_resident.py and on chip by
bench/verify_tpu.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..batch.fista_gram import BatchFISTAConfig, BatchResult, GramBatch
from ._common import (
    SUBLANE,
    certified_solve_body,
    make_matvec,
    power_lambda_max,
)
from .fista_vmem import (
    LANE,
    _armijo_static,
    _check_kernel_cfg,
    _round_up,
    momentum_betas,
)


def auto_b_tile_resident(n_pad: int,
                         vmem_budget_bytes: int = 15 * 1024 * 1024) -> int:
    """Lane tile for the single-buffered resident block. The scratch block
    plus ~6 live (n_pad, b_tile) planes of solve state must fit; raises
    outside the window — the streaming kernel takes over. The budget is
    probe-calibrated on chip (round 5): n_pad=168 Mosaic-compiles and
    certifies, n_pad=176 overflows scoped VMEM, so the window is exactly
    n ≤ 168."""
    bt = LANE
    need = (n_pad * n_pad + 8 * n_pad + 4 * SUBLANE) * bt * 4
    if need > vmem_budget_bytes:
        raise ValueError(
            f"resident kernel: n_pad={n_pad} needs {need / 2**20:.1f} MiB "
            "single-buffered — past the probe-calibrated 168-feature window; the Q-streaming "
            "kernel (kernels/qstream.py) covers wider problems."
        )
    return bt


class ResidentSolveState(NamedTuple):
    """Checkpointable state of the resident mid-range engine — same
    per-lane layout as ``FusedSolveState`` (including per-lane ``k``: each
    tile exits at its own burst boundary), but pinned to THIS engine: it
    solves a caller-supplied ``GramBatch`` (external L), which the fused
    engine's in-kernel build does not reproduce bit-for-bit."""

    X: Array
    Y: Array
    t: Array
    ps: Array
    tau: Array
    k: Array  # (B,) int32 — per-lane, uniform within a lane tile
    done: Array
    iters: Array
    gap: Array


def _resident_tile_kernel(beta_ref, Q_any, c_ref, tau_ref, thr_ref, a2_ref,
                          a1_ref, btb_ref, taumin_ref, *rest,
                          b_tile: int, chunk: int, k_end: int, tol: float,
                          restart_threshold, greedy, armijo,
                          n_true: int, resume: bool, with_state: bool,
                          est_l_iters=None, l_safety: float = 1.02,
                          t_init_factor: float = 1.0):
    if resume:
        (X0_ref, Y0_ref, t0_ref, ps0_ref, tv0_ref, k0_ref, d0_ref, it0_ref,
         g0_ref) = rest[:9]
        rest = rest[9:]
    nouts = 9 if with_state else 4
    out_refs = rest[:nouts]
    q_vmem, sem = rest[nouts:]

    # one explicit DMA: this tile's whole Gram block, single-buffered
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        Q_any.at[:, :, pl.ds(i * b_tile, b_tile)], q_vmem, sem
    )
    cp.start()
    cp.wait()

    matvec = make_matvec(q_vmem, n_true)
    a1 = a1_ref[:]
    a2 = a2_ref[:]
    if est_l_iters is not None:
        # Lipschitz estimation against the RESIDENT block (the fused
        # kernel's recipe: safety-scaled power iteration started from c,
        # degenerate lanes guarded, + alpha2 fold) — skipping the XLA power
        # loop that re-reads Q from HBM every step, which dominated the
        # wide-n build stage (measured ~75% of it, RESULTS.md round 5)
        L = power_lambda_max(matvec, c_ref[:], est_l_iters)
        L = jnp.where(L > 0.0, l_safety * L, 1.0) + a2
        tau = t_init_factor / L
        thr = tau * a1
        taumin = 1.0 / L
    else:
        tau = tau_ref[:]
        thr = thr_ref[:]
        taumin = taumin_ref[:]
    if resume:
        init = (X0_ref[:], Y0_ref[:], t0_ref[:], ps0_ref[:], tv0_ref[:],
                k0_ref[0, 0], d0_ref[:], it0_ref[:], g0_ref[:])
    else:
        init = None
    certified_solve_body(
        matvec, beta_ref, c_ref[:], tau, thr, a1, a2, btb_ref[:], taumin,
        out_refs, init,
        chunk=chunk, k_end=k_end, tol=tol,
        restart_threshold=restart_threshold, greedy=greedy, armijo=armijo,
        with_state=with_state,
    )


@functools.partial(
    jax.jit,
    static_argnames=("pn", "pB", "n_pad", "b_tile", "chunk", "k_end", "tol",
                     "interpret", "t_init_factor", "restart_threshold",
                     "greedy", "armijo", "with_state", "est_l_iters",
                     "l_safety"),
)
def _run_resident(betas, Q, c, btb, alpha1, alpha2, L, state0=None, *,
                  pn, pB, n_pad, b_tile, chunk, k_end, tol, interpret,
                  t_init_factor, restart_threshold=None, greedy=None,
                  armijo=None, with_state=False, est_l_iters=None,
                  l_safety=1.02):
    n, B_orig = c.shape
    if pn or pB:
        Q = jnp.pad(Q, ((0, pn), (0, pn), (0, pB)))
        c = jnp.pad(c, ((0, pn), (0, pB)))
        btb = jnp.pad(btb, (0, pB))
        alpha1 = jnp.pad(alpha1, (0, pB))
        alpha2 = jnp.pad(alpha2, (0, pB))
        L = jnp.pad(L, (0, pB), constant_values=1.0)
    B = B_orig + pB
    dtype = c.dtype
    tau = (t_init_factor / L).astype(dtype)[None, :]
    thr = tau * alpha1[None, :]
    a2 = alpha2[None, :].astype(dtype)
    a1 = alpha1[None, :].astype(dtype)
    btbrow = btb[None, :].astype(dtype)
    taumin = (1.0 / L).astype(dtype)[None, :]

    resume = state0 is not None
    state_in = []
    if resume:
        pad2 = lambda x, v=0.0: (
            jnp.pad(x, ((0, 0), (0, pB)), constant_values=v) if pB else x
        )
        X0 = jnp.pad(state0.X, ((0, n_pad - n), (0, 0)))
        Y0 = jnp.pad(state0.Y, ((0, n_pad - n), (0, 0)))
        state_in = [
            pad2(X0), pad2(Y0), pad2(state0.t, 1.0), pad2(state0.ps),
            pad2(state0.tau, 1.0),
            pad2(state0.k[None, :].astype(jnp.int32)),
            pad2(state0.done[None, :].astype(dtype), 1.0),
            pad2(state0.iters[None, :].astype(dtype)),
            pad2(state0.gap[None, :].astype(dtype)),
        ]

    kern = functools.partial(
        _resident_tile_kernel, b_tile=b_tile, chunk=chunk, k_end=k_end,
        tol=tol, restart_threshold=restart_threshold, greedy=greedy,
        armijo=armijo, n_true=n, resume=resume, with_state=with_state,
        est_l_iters=est_l_iters, l_safety=l_safety,
        t_init_factor=t_init_factor,
    )
    vec = lambda r: pl.BlockSpec(
        (r, b_tile), lambda i, *pf: (0, i), memory_space=pltpu.VMEM
    )
    state_in_specs = (
        [vec(n_pad), vec(n_pad)] + [vec(1)] * 7 if resume else []
    )
    state_out_specs = [vec(n_pad)] + [vec(1)] * 4 if with_state else []
    state_out_shapes = (
        [
            jax.ShapeDtypeStruct((n_pad, B), dtype),  # Y
            jax.ShapeDtypeStruct((1, B), dtype),  # t
            jax.ShapeDtypeStruct((1, B), dtype),  # ps
            jax.ShapeDtypeStruct((1, B), dtype),  # tau
            jax.ShapeDtypeStruct((1, B), jnp.int32),  # k
        ]
        if with_state else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # betas
        grid=(B // b_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # Q stays in HBM
            vec(n_pad),  # c
            vec(1), vec(1), vec(1), vec(1), vec(1), vec(1),
            *state_in_specs,
        ],
        out_specs=[vec(n_pad), vec(1), vec(1), vec(1), *state_out_specs],
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad, b_tile), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, B), dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            *state_out_shapes,
        ],
        interpret=interpret,
    )(betas, Q, c, tau, thr, a2, a1, btbrow, taumin, *state_in)
    X, iters, gap, done = out[:4]
    sl = slice(0, B_orig)
    failed = ~jnp.all(jnp.isfinite(X[:, sl]), axis=0)
    result = BatchResult(
        x=X[:n, sl].T,
        iters=iters[0, sl],
        rel_gap=gap[0, sl],
        n_iters_total=jnp.max(iters[0, sl]),
        converged=(done[0, sl] > 0) & (gap[0, sl] <= tol) & ~failed,
        failed=failed,
    )
    if not with_state:
        return result
    Yf, tf, psf, tvf, kf = out[4:]
    fin = ResidentSolveState(
        X=X[:n, sl], Y=Yf[:n, sl], t=tf[:, sl], ps=psf[:, sl],
        tau=tvf[:, sl], k=kf[0, sl],
        done=done[0, sl] > 0, iters=iters[0, sl], gap=gap[0, sl],
    )
    return result, fin


def fista_gram_resident(
    gb: GramBatch,
    cfg: BatchFISTAConfig = BatchFISTAConfig(max_iter=1000, check_every=25,
                                             rel_gap_tol=1e-6),
    interpret: bool = False,
    state0: ResidentSolveState | None = None,
    return_state: bool = False,
    est_l_iters: int | None = None,
    l_safety: float = 1.02,
):
    """Certified solve with Q copied ONCE per lane tile into VMEM (manual
    DMA) and the whole certification loop in-kernel — the mid-range wide-n
    engine (104 < n ≤ 168, probe-calibrated). Every in-kernel momentum mode runs here,
    including Armijo backtracking. ``state0``/``return_state`` follow the
    fused engine's semantics (per-lane k; resume must keep the tile
    grouping that produced the checkpoint).

    ``est_l_iters``: estimate the Lipschitz constant IN-KERNEL against the
    resident block (``gb.L`` is then ignored — build the batch with
    ``make_gram_batch(..., estimate_l=False)`` to skip the XLA power loop,
    which re-reads Q from HBM every step and dominated the wide-n build
    stage). A resumed state must use the same ``est_l_iters`` as the run
    that produced it (τ derives from the in-kernel estimate)."""
    _check_kernel_cfg(cfg)
    if cfg.check_every <= 0:
        raise ValueError(
            "the resident kernel certifies in-kernel and needs "
            "check_every > 0; for fixed-iteration runs use fista_gram_vmem"
        )
    n, B_orig = gb.c.shape
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    b_tile = auto_b_tile_resident(n_pad)
    b_tile = min(b_tile, _round_up(B_orig, LANE))
    B = _round_up(B_orig, b_tile)
    chunk = cfg.check_every
    k_end = -(-cfg.max_iter // chunk) * chunk
    betas, _ = momentum_betas(0, max(k_end, 1), 1.0, cfg)
    greedy = (
        (cfg.greedy_S, cfg.greedy_shrink) if cfg.momentum == "greedy" else None
    )
    armijo = _armijo_static(cfg)
    step_factor = cfg.greedy_xi if greedy is not None else cfg.t_init_factor

    if state0 is not None:
        # per-tile k uniformity (same hazard + shared guard as the fused
        # engine — kernels/_common.assert_tile_k_uniform)
        from ._common import assert_tile_k_uniform

        assert_tile_k_uniform(state0.k, B, b_tile)

    result = _run_resident(
        betas, gb.Q, gb.c, gb.btb, gb.alpha1, gb.alpha2, gb.L, state0,
        pn=n_pad - n, pB=B - B_orig, n_pad=n_pad, b_tile=b_tile,
        chunk=chunk, k_end=k_end, tol=cfg.rel_gap_tol, interpret=interpret,
        t_init_factor=step_factor,
        restart_threshold=(
            cfg.restart_threshold if cfg.adaptive_restart else None
        ),
        greedy=greedy, armijo=armijo, with_state=return_state,
        est_l_iters=est_l_iters, l_safety=l_safety,
    )
    return result
