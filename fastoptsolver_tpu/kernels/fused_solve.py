"""Pallas TPU kernel: the ENTIRE batched-lasso pipeline in one launch.

The two-kernel flagship path (kernels/gram_build.py → kernels/fista_vmem.py)
writes the (n_pad, n_pad, B) Gram tensor to HBM once and reads it back
``n_bursts`` times, and pays a kernel-launch + grid prologue per burst —
measured at B=65k that solve stage costs ~0.9 ms against a ~0.25 ms
streaming bound (RESULTS.md round 4). This kernel removes both terms
structurally: **Q never exists in HBM at all.**

Grid ``(B/b_tile, ⌈m/m_tile⌉)``, row axis innermost — identical streaming
structure to the build kernel (within ~3% of a no-math pure-streaming pass):

- row steps accumulate the symmetric augmented Gram pairs of the tile into a
  VMEM scratch (ragged last brick masked — OOB contents are unspecified);
- the LAST row step assembles Q into a second VMEM scratch, runs the
  Lipschitz power iteration, derives the per-lane step/threshold rows, and
  then runs the whole certified FISTA solve for this tile — the
  burst-and-gap-check while loop of kernels/fista_vmem.py's adaptive
  variant — against the VMEM-resident Q, writing only ``x / iters /
  rel_gap / converged`` back out.

HBM traffic: A + b read exactly once, O(n·B) outputs. The solve arithmetic
(~100 iterations × n planes of (8, b_tile) FMAs per tile) is an order of
magnitude below the tile's own A-brick DMA, so it hides behind the next
tile's stream the same way the build pairs do.

Per the framework's kernel-guard contract, configurations this kernel does
not implement are rejected loudly at entry: the software-pipelined overlap
variant is fixed-momentum only — adaptive restart, greedy momentum, and
(round 5) Armijo backtracking run on the plain single-launch kernel via
kernels/_common.fista_general_chunk / fista_armijo_chunk — same per-lane
state-row recurrences as kernels/fista_vmem.py.

Reference parity: the fixed-step FISTA recurrence of
``/root/reference/iterative_solvers.py:170-221`` with the same Gram-form
certification as batch/fista_gram.py; tested against the two-kernel path in
tests/test_kernels.py and Mosaic-verified on chip by bench/verify_tpu.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..batch.fista_gram import BatchFISTAConfig, BatchResult
from ._common import (
    acc_entry,
    accumulate_pairs,
    assemble_c,
    certified_solve_body,
    fista_fixed_chunk,
    gram_rel_gap,
    make_matvec,
    masked_cols,
    power_lambda_max,
    write_q_planes,
)
from .fista_vmem import _armijo_static, _check_kernel_cfg, momentum_betas
from .gram_build import _pairs, _round_up

LANE = 128
SUBLANE = 8


def _check_fused_cfg(cfg: BatchFISTAConfig, overlap: bool = False) -> None:
    # rejects restart-with-non-nesterov; backtracking is supported on the
    # plain single-launch variant (in-kernel masked Armijo) but not overlap
    _check_kernel_cfg(cfg, backtracking_ok=not overlap)
    if overlap and (cfg.adaptive_restart or cfg.momentum == "greedy"):
        raise NotImplementedError(
            "the software-pipelined (overlap) variant implements fixed "
            "momentum only; adaptive restart, greedy momentum, and Armijo "
            "backtracking run on the plain single-launch kernel "
            "(overlap=False)"
        )
    if cfg.check_every <= 0:
        raise ValueError(
            "the single-launch fused kernel certifies in-kernel and needs "
            "check_every > 0; for fixed-iteration runs use the two-kernel path"
        )


def auto_tiles_fused(n: int, m: int,
                     vmem_budget_bytes: int = 11 * 1024 * 1024):
    """(b_tile, m_tile) so input bricks (double-buffered), the pair
    accumulator, AND the assembled VMEM Gram all fit. The Gram scratch is
    the extra term vs the build kernel's tiler; the ceiling lands around
    n ≈ 72 features — wider problems use the two-kernel path."""
    na = n + 1
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    npairs_pad = _round_up(na * (na + 1) // 2, SUBLANE)
    for bt in (1024, 512, 256, 128):
        q_bytes = n_pad * n_pad * bt * 4  # assembled Gram scratch
        acc_bytes = npairs_pad * bt * 4
        state_bytes = 8 * n_pad * bt * 4  # X/Y/grad/… live rows in the solve
        fixed = q_bytes + acc_bytes + state_bytes
        if fixed >= vmem_budget_bytes:
            continue
        mt_fit = (vmem_budget_bytes - fixed) // (2 * na * bt * 4)
        if m <= max(mt_fit, 0):
            return bt, m
        mt = min((mt_fit // SUBLANE) * SUBLANE, 256)
        if mt >= 4 * SUBLANE:
            for d in range(mt, max(SUBLANE, mt // 2) - 1, -SUBLANE):
                if m % d == 0:
                    return bt, d
            return bt, int(mt)
    raise ValueError(
        f"fused build+solve kernel: n={n} exceeds the VMEM budget; use the "
        "two-kernel path (make_gram_batch_fused + fista_gram_vmem) or, past "
        "its ceiling, the XLA driver."
    )


def _fused_kernel(beta_ref, a1_ref, a2in_ref, A_ref, b_ref, *rest,
                  n: int, n_pad: int, m: int, m_tile: int,
                  pl_iters: int, l_safety: float, t_init_factor: float,
                  chunk: int, k_end: int, tol: float, split_k: int,
                  restart_threshold=None, greedy=None, armijo=None,
                  resume: bool = False, with_state: bool = False):
    """``resume``: nine extra input rows/planes carry a checkpointed
    :class:`FusedSolveState` (per-lane k is uniform within a lane tile —
    each tile exits at its own burst boundary — so ``k0_ref[0, 0]`` is
    exact for the whole tile). ``with_state``: five extra outputs emit the
    final state for checkpointing. Both exist ONLY when requested — the
    fresh fast path keeps its lean ref list."""
    if resume:
        (X0_ref, Y0_ref, t0_ref, ps0_ref, tv0_ref, k0_ref, d0_ref, it0_ref,
         g0_ref) = rest[:9]
        rest = rest[9:]
    X_ref, iters_ref, gap_ref, done_ref = rest[:4]
    rest = rest[4:]
    if with_state:
        Yo_ref, to_ref, pso_ref, tvo_ref, ko_ref = rest[:5]
        rest = rest[5:]
    acc_ref, Q_ref = rest
    j = pl.program_id(1)
    nm = pl.num_programs(1)
    na = n + 1
    pairs = _pairs(na)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cols = masked_cols(A_ref, b_ref, j, n=n, m=m, m_tile=m_tile)
    accumulate_pairs(acc_ref, cols, pairs, split_k)

    @pl.when(j == nm - 1)
    def _():
        g = acc_entry(acc_ref, na)
        write_q_planes(Q_ref, g, n=n, n_pad=n_pad)
        c_vec = assemble_c(g, n=n, n_pad=n_pad)
        btb = g(n, n)
        matvec = make_matvec(Q_ref, n)
        L = power_lambda_max(matvec, c_vec, pl_iters)

        # per-lane solver rows, derived in-register (gram_build.py semantics:
        # safety-scaled L, degenerate lanes guarded, + alpha2 fold;
        # t_init_factor is the greedy overshoot xi in greedy mode)
        a1 = a1_ref[:]
        a2 = a2in_ref[:]
        L = jnp.where(L > 0.0, l_safety * L, 1.0) + a2
        tau = t_init_factor / L
        thr = tau * a1
        taumin = 1.0 / L

        # ---- certified FISTA solve against the VMEM-resident Gram ----
        # (shared body — kernels/_common.certified_solve_body — so this
        # engine and the resident wide-n engine run the identical floats)
        if resume:
            init = (X0_ref[:], Y0_ref[:], t0_ref[:], ps0_ref[:], tv0_ref[:],
                    k0_ref[0, 0], d0_ref[:], it0_ref[:], g0_ref[:])
        else:
            init = None
        out_refs = (X_ref, iters_ref, gap_ref, done_ref)
        if with_state:
            out_refs = out_refs + (Yo_ref, to_ref, pso_ref, tvo_ref, ko_ref)
        certified_solve_body(
            matvec, beta_ref, c_vec, tau, thr, a1, a2, btb, taumin,
            out_refs, init, chunk=chunk, k_end=k_end, tol=tol,
            restart_threshold=restart_threshold, greedy=greedy,
            armijo=armijo, with_state=with_state,
        )


class FusedSolveState(NamedTuple):
    """Checkpointable state of the plain single-launch fused engine
    (``solve_lasso_fused(..., return_state=True)`` → ``state0=``). Same
    per-lane rows as :class:`~..kernels.fista_vmem.VmemSolveState` plus a
    per-lane ``k`` (iterations completed — uniform within each lane tile,
    since each tile's in-kernel certification loop exits at its own burst
    boundary). The state pins resume to THIS engine: its trajectory depends
    on the in-kernel Gram/Lipschitz build, which the other engines don't
    reproduce bit-for-bit. Resume recomputes the Gram from the same
    ``(A, b)`` deterministically, reinjects the rows, and continues the
    absolute-iteration β table from ``k`` — bit-identical to an
    uninterrupted run (tests/test_kernel_armijo.py / test_kernels.py)."""

    X: Array  # (n, B)
    Y: Array  # (n, B)
    t: Array  # (1, B) — Nesterov scalar / greedy τ row
    ps: Array  # (1, B) — previous step norm / greedy first-step row
    tau: Array  # (1, B) — per-lane Armijo step row
    k: Array  # (B,) int32 — per-lane iterations completed
    done: Array  # (B,) bool
    iters: Array  # (B,) int32
    gap: Array  # (B,)


@functools.partial(
    jax.jit,
    static_argnames=("b_tile", "m_tile", "pl_iters", "l_safety",
                     "t_init_factor", "chunk", "k_end", "tol", "split_k",
                     "interpret", "pB", "restart_threshold", "greedy",
                     "armijo", "with_state"),
)
def _run(betas, A, b, a1, a2, state0=None, *, b_tile, m_tile, pl_iters,
         l_safety, t_init_factor, chunk, k_end, tol, split_k, interpret, pB,
         restart_threshold=None, greedy=None, armijo=None,
         with_state=False):
    n, m, B_orig = A.shape
    if pB:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, pB)))
        b = jnp.pad(b, ((0, 0), (0, pB)))
        a1 = jnp.pad(a1, (0, pB))
        a2 = jnp.pad(a2, (0, pB))
    B = B_orig + pB
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    na = n + 1
    npairs_pad = _round_up(na * (na + 1) // 2, SUBLANE)
    a1r = a1[None, :].astype(A.dtype)
    a2r = a2[None, :].astype(A.dtype)
    resume = state0 is not None
    state_in = []
    if resume:
        dtype = A.dtype
        pad2 = lambda x, v=0.0: (
            jnp.pad(x, ((0, 0), (0, pB)), constant_values=v) if pB else x
        )
        X0 = jnp.pad(state0.X, ((0, n_pad - n), (0, 0)))
        Y0 = jnp.pad(state0.Y, ((0, n_pad - n), (0, 0)))
        state_in = [
            pad2(X0), pad2(Y0),
            pad2(state0.t, 1.0), pad2(state0.ps),
            pad2(state0.tau, 1.0),
            pad2(state0.k[None, :].astype(jnp.int32)),
            # done/iters/gap ride as f32 rows (the kernel's carry dtype);
            # padded lanes are done (zero-Q instances)
            pad2(state0.done[None, :].astype(dtype), 1.0),
            pad2(state0.iters[None, :].astype(dtype)),
            pad2(state0.gap[None, :].astype(dtype)),
        ]
    kern = functools.partial(
        _fused_kernel, n=n, n_pad=n_pad, m=m, m_tile=m_tile,
        pl_iters=pl_iters, l_safety=l_safety, t_init_factor=t_init_factor,
        chunk=chunk, k_end=k_end, tol=tol, split_k=split_k,
        restart_threshold=restart_threshold, greedy=greedy, armijo=armijo,
        resume=resume, with_state=with_state,
    )
    vec = lambda r: pl.BlockSpec(
        (r, b_tile), lambda i, j, *pf: (0, i), memory_space=pltpu.VMEM
    )
    state_in_specs = (
        [vec(n_pad), vec(n_pad)] + [vec(1)] * 7 if resume else []
    )
    state_out_specs = (
        [vec(n_pad)] + [vec(1)] * 4 if with_state else []
    )
    state_out_shapes = (
        [
            jax.ShapeDtypeStruct((n_pad, B), A.dtype),  # Y
            jax.ShapeDtypeStruct((1, B), A.dtype),  # t
            jax.ShapeDtypeStruct((1, B), A.dtype),  # ps
            jax.ShapeDtypeStruct((1, B), A.dtype),  # tau
            jax.ShapeDtypeStruct((1, B), jnp.int32),  # k
        ]
        if with_state else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # betas
        grid=(B // b_tile, pl.cdiv(m, m_tile)),
        in_specs=[
            vec(1),  # alpha1
            vec(1),  # alpha2
            pl.BlockSpec((n, m_tile, b_tile), lambda i, j, *pf: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, b_tile), lambda i, j, *pf: (j, i),
                         memory_space=pltpu.VMEM),
            *state_in_specs,
        ],
        out_specs=[vec(n_pad), vec(1), vec(1), vec(1), *state_out_specs],
        scratch_shapes=[
            pltpu.VMEM((npairs_pad, b_tile), A.dtype),
            pltpu.VMEM((n_pad, n_pad, b_tile), A.dtype),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, B), A.dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), A.dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            *state_out_shapes,
        ],
        interpret=interpret,
    )(betas, a1r, a2r, A, b, *state_in)
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
    fin = FusedSolveState(
        X=X[:n, sl], Y=Yf[:n, sl], t=tf[:, sl], ps=psf[:, sl],
        tau=tvf[:, sl], k=kf[0, sl],
        done=done[0, sl] > 0, iters=iters[0, sl], gap=gap[0, sl],
    )
    return result, fin


def solve_lasso_fused(
    A: Array,  # (n, m, B) feature-leading
    b: Array,  # (m, B)
    alpha1,
    alpha2=0.0,
    cfg: BatchFISTAConfig = BatchFISTAConfig(max_iter=1000, check_every=25,
                                             rel_gap_tol=1e-6),
    pl_iters: int | None = None,
    l_safety: float = 1.02,
    b_tile: int | None = None,
    m_tile: int | None = None,
    split_k: int = 1,
    interpret: bool = False,
    overlap: bool | None = None,
    state0: FusedSolveState | None = None,
    return_state: bool = False,
):
    """Certified batched lasso, raw ``(A, b, α)`` to solutions, ONE kernel
    launch — the Gram never exists in HBM. Any momentum mode with in-kernel
    certification, including (round 5) reference-semantics Armijo
    backtracking on the plain variant (the masked per-lane search of
    kernels/_common.fista_armijo_chunk).

    ``overlap`` selects the software-pipelined variant (solve of tile i-1
    overlapped with tile i's DMA — see the module-bottom section); ``None``
    auto-picks it whenever the config is fixed-momentum (the overlap
    variant's state scratch does not carry the restart/greedy rows — those
    modes run on the plain kernel), its (double-buffered) VMEM budget fits,
    AND the batch spans more than one lane tile (with a single tile there
    is no concurrent build to overlap — the extra grid column would just
    re-DMA every A brick for nothing).

    ``state0``/``return_state`` (round 5): checkpoint/resume on the PLAIN
    single-launch engine — a :class:`FusedSolveState` produced by
    ``return_state=True`` resumes bit-exactly (``max_iter`` counts total
    iterations including the resumed ones; the Gram is rebuilt from the
    same ``(A, b)`` deterministically). The overlap variant cannot carry
    the state (its solver scratch is consumed per column): requesting
    state with ``overlap=True`` raises; auto mode drops to plain."""
    _check_fused_cfg(cfg, overlap=bool(overlap))
    want_state = (state0 is not None) or return_state
    if want_state:
        if overlap:
            raise NotImplementedError(
                "checkpoint/resume runs on the plain single-launch kernel; "
                "the overlap variant's solver state lives in per-column "
                "scratch and cannot round-trip (pass overlap=False/None)"
            )
        overlap = False  # auto mode: state forces the plain variant
    n, m, B = A.shape
    if m_tile is not None and m_tile < m and m_tile % SUBLANE:
        raise ValueError(f"m_tile must be a multiple of {SUBLANE} (or >= m)")
    restart_threshold = cfg.restart_threshold if cfg.adaptive_restart else None
    greedy = (
        (cfg.greedy_S, cfg.greedy_shrink) if cfg.momentum == "greedy" else None
    )
    armijo = _armijo_static(cfg)
    step_factor = cfg.greedy_xi if greedy is not None else cfg.t_init_factor
    stateful = (
        (restart_threshold is not None) or (greedy is not None)
        or (armijo is not None)
    )
    overlap_auto = overlap is None
    if overlap is None and stateful:
        overlap = False  # plain kernel carries the per-lane momentum rows
    if overlap is None or overlap:
        try:
            auto_bt_o, auto_mt_o = auto_tiles_overlap(n, m)
        except ValueError:
            if overlap:
                raise
            overlap = False
        else:
            overlap = True
    if overlap and overlap_auto:
        bt_probe = min(b_tile if b_tile is not None else auto_bt_o,
                       _round_up(B, LANE))
        if _round_up(B, bt_probe) // bt_probe <= 1:
            overlap = False  # single lane tile: nothing to overlap
    if overlap:
        bt = min(b_tile if b_tile is not None else auto_bt_o,
                 _round_up(B, LANE))
        mt = min(m_tile if m_tile is not None else auto_mt_o, m)
        if pl_iters is None:
            pl_iters = 32 if n <= 7 else 96
        chunk = cfg.check_every
        n_bursts = -(-cfg.max_iter // chunk)
        betas, _ = momentum_betas(0, n_bursts * chunk, 1.0, cfg)
        dtype = A.dtype
        a1 = jnp.broadcast_to(jnp.asarray(alpha1, dtype), (B,))
        a2 = jnp.broadcast_to(jnp.asarray(alpha2, dtype), (B,))
        pB = _round_up(B, bt) - B
        return _run_overlap(
            betas, A, b, a1, a2, b_tile=bt, m_tile=mt, pl_iters=pl_iters,
            l_safety=l_safety, t_init_factor=cfg.t_init_factor, chunk=chunk,
            n_bursts=n_bursts, tol=cfg.rel_gap_tol, split_k=split_k,
            interpret=interpret, pB=pB,
        )
    auto_bt, auto_mt = auto_tiles_fused(n, m)
    if b_tile is None:
        b_tile = auto_bt
    b_tile = min(b_tile, _round_up(B, LANE))
    if m_tile is None:
        m_tile = auto_mt
    m_tile = min(m_tile, m)
    if pl_iters is None:
        pl_iters = 32 if n <= 7 else 96
    chunk = cfg.check_every
    if state0 is not None:
        # per-lane k is read once per lane tile (uniform by construction
        # when the checkpoint and the resume share a tile grouping) —
        # detect regrouped checkpoints here (one small host fetch, like
        # the vmem engine's k read) instead of silently resuming a whole
        # tile from its first lane's k. Inside shard_map the state is a
        # tracer and the helper skips; the mesh surface pre-validates the
        # concrete state against ITS per-shard grouping before dispatch.
        from ._common import assert_tile_k_uniform

        assert_tile_k_uniform(state0.k, B, b_tile)
    # k_end is the absolute iteration ceiling (max_iter rounded up to a
    # burst multiple); a resumed tile continues from its own carried k and
    # the β table is indexed absolutely, so one table serves both.
    k_end = -(-cfg.max_iter // chunk) * chunk
    betas, _ = momentum_betas(0, max(k_end, 1), 1.0, cfg)
    dtype = A.dtype
    a1 = jnp.broadcast_to(jnp.asarray(alpha1, dtype), (B,))
    a2 = jnp.broadcast_to(jnp.asarray(alpha2, dtype), (B,))
    pB = _round_up(B, b_tile) - B
    return _run(
        betas, A, b, a1, a2, state0, b_tile=b_tile, m_tile=m_tile,
        pl_iters=pl_iters, l_safety=l_safety,
        t_init_factor=step_factor, chunk=chunk, k_end=k_end,
        tol=cfg.rel_gap_tol, split_k=split_k, interpret=interpret, pB=pB,
        restart_threshold=restart_threshold, greedy=greedy, armijo=armijo,
        with_state=return_state,
    )


# ---------------------------------------------------------------------------
# Software-pipelined variant: solve tile i-1 WHILE streaming tile i's bricks
# ---------------------------------------------------------------------------
#
# The plain kernel above runs the whole solve on a tile's LAST row step;
# Pallas prefetches only ONE block ahead, so those ~3 µs/tile of solve
# serialize against the next tile's DMA — measured as the entire remaining
# ~7% gap to the pure-stream bound at the headline batch (RESULTS.md r04).
# Here the grid gains one extra lane column and the solve of tile i-1 is cut
# into ⌈n_bursts/nm⌉-burst slices executed one per row step of column i —
# genuine compute/DMA overlap expressed in the grid structure itself.
# Double-buffered Gram/c/row scratches (parity-predicated: Mosaic's support
# for dynamic leading-index scratch addressing is not relied on) carry tile
# i's assembly while tile i-1 still solves; the solver state (X/Y planes,
# done/iters/gap rows, the global iteration counter in SMEM) persists across
# the column's steps.


def auto_tiles_overlap(n: int, m: int,
                       vmem_budget_bytes: int = 11 * 1024 * 1024):
    """(b_tile, m_tile) for the overlapped kernel — the double-buffered
    Gram scratch roughly halves the plain fused kernel's feature ceiling
    (~n ≤ 56); beyond it the plain single-launch kernel takes over."""
    na = n + 1
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    npairs_pad = _round_up(na * (na + 1) // 2, SUBLANE)
    for bt in (1024, 512, 256, 128):
        dbl = 2 * (n_pad * n_pad + n_pad + SUBLANE) * bt * 4  # Q/c/rows ×2
        state = (2 * n_pad + 3) * bt * 4
        out_bytes = 2 * (n_pad + 3) * bt * 4
        slack = 3 * n_pad * bt * 4
        fixed = npairs_pad * bt * 4 + dbl + state + out_bytes + slack
        if fixed >= vmem_budget_bytes:
            continue
        mt_fit = (vmem_budget_bytes - fixed) // (2 * na * bt * 4)
        if m <= max(mt_fit, 0):
            return bt, m
        mt = min((mt_fit // SUBLANE) * SUBLANE, 256)
        if mt >= 4 * SUBLANE:
            for d in range(mt, max(SUBLANE, mt // 2) - 1, -SUBLANE):
                if m % d == 0:
                    return bt, d
            return bt, int(mt)
    raise ValueError(
        f"overlapped fused kernel: n={n} exceeds the VMEM budget; the plain "
        "single-launch kernel (overlap=False) covers wider problems."
    )


def _overlap_kernel(beta_ref, a1_ref, a2in_ref, A_ref, b_ref,
                    X_ref, iters_ref, gap_ref, done_ref,
                    acc_ref, QA_ref, QB_ref, cA_ref, cB_ref,
                    rA_ref, rB_ref, Xs_ref, Ys_ref, st_ref, k_ref, *,
                    n: int, n_pad: int, m: int, m_tile: int, nt: int,
                    pl_iters: int, l_safety: float, t_init_factor: float,
                    chunk: int, n_bursts: int, tol: float, split_k: int):
    i = pl.program_id(0)  # lane column: tile being BUILT (i < nt) — the
    j = pl.program_id(1)  # extra column i == nt only finishes tile nt-1
    nm = pl.num_programs(1)
    na = n + 1
    pairs = _pairs(na)
    even = jax.lax.rem(i, jnp.int32(2)) == 0  # tile i buffers: A when even, B when odd

    # ---------------- build phase: accumulate tile i's bricks ----------------
    @pl.when((i < nt) & (j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i < nt)
    def _():
        cols = masked_cols(A_ref, b_ref, j, n=n, m=m, m_tile=m_tile)
        accumulate_pairs(acc_ref, cols, pairs, split_k)

    def assemble(Q_ref, c_ref, r_ref):
        """acc → Q planes + c + [tau, thr, a1, a2, btb] rows for tile i."""
        g = acc_entry(acc_ref, na)
        write_q_planes(Q_ref, g, n=n, n_pad=n_pad)
        c_vec = assemble_c(g, n=n, n_pad=n_pad)
        c_ref[:] = c_vec
        btb = g(n, n)
        matvec = make_matvec(Q_ref, n)
        L = power_lambda_max(matvec, c_vec, pl_iters)
        a1 = a1_ref[:]
        a2 = a2in_ref[:]
        L = jnp.where(L > 0.0, l_safety * L, 1.0) + a2
        tau = t_init_factor / L
        r_ref[0:1, :] = tau
        r_ref[1:2, :] = tau * a1
        r_ref[2:3, :] = a1
        r_ref[3:4, :] = a2
        r_ref[4:5, :] = btb

    @pl.when((i < nt) & (j == nm - 1) & even)
    def _():
        assemble(QA_ref, cA_ref, rA_ref)

    @pl.when((i < nt) & (j == nm - 1) & ~even)
    def _():
        assemble(QB_ref, cB_ref, rB_ref)

    # ---------------- solve phase: one slice of tile i-1 ----------------
    def solve_slice(Q_ref, c_ref, r_ref):
        tau = r_ref[0:1, :]
        thr = r_ref[1:2, :]
        a1 = r_ref[2:3, :]
        a2 = r_ref[3:4, :]
        btb = r_ref[4:5, :]
        c_vec = c_ref[:]
        matvec = make_matvec(Q_ref, n)
        rel_gap = lambda X: gram_rel_gap(X, matvec, c_vec, a1, a2, btb)
        fista_chunk = fista_fixed_chunk(
            matvec, beta_ref, c_vec, tau, thr, a2, chunk
        )

        bursts_per_step = -(-n_bursts // nm)
        k0 = k_ref[0]

        def cond(carry):
            bl, k, X, Y, done, iters, gap = carry
            return (
                (bl < bursts_per_step)
                & (k < n_bursts * chunk)
                & ~jnp.all(done > 0.0)
            )

        def body(carry):
            bl, k, X, Y, done, iters, gap = carry
            X, Y = fista_chunk(k, X, Y)
            k = k + chunk
            gp = rel_gap(X)
            finite = jnp.all(jnp.isfinite(X), axis=0, keepdims=True)
            gp = jnp.where(finite, gp, jnp.inf)
            newly = (done == 0.0) & ((gp <= tol) | ~finite)
            done = jnp.where(newly, 1.0, done)
            iters = jnp.where(
                done == 0.0, jnp.float32(k),
                jnp.where(newly, jnp.float32(k), iters),
            )
            gap = jnp.where(newly | (done == 0.0), gp, gap)
            return bl + 1, k, X, Y, done, iters, gap

        bl, k, X, Y, done, iters, gap = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), k0, Xs_ref[:], Ys_ref[:],
             st_ref[0:1, :], st_ref[1:2, :], st_ref[2:3, :]),
        )
        Xs_ref[:] = X
        Ys_ref[:] = Y
        st_ref[0:1, :] = done
        st_ref[1:2, :] = iters
        st_ref[2:3, :] = gap
        k_ref[0] = k

    # tile i-1 uses the OTHER parity's buffers
    @pl.when((i > 0) & ~even)
    def _():
        solve_slice(QA_ref, cA_ref, rA_ref)

    @pl.when((i > 0) & even)
    def _():
        solve_slice(QB_ref, cB_ref, rB_ref)

    # column's last step: emit tile i-1's results, reset state for tile i
    @pl.when((i > 0) & (j == nm - 1))
    def _():
        X_ref[:] = Xs_ref[:]
        iters_ref[:] = st_ref[1:2, :].astype(jnp.int32)
        gap_ref[:] = st_ref[2:3, :]
        done_ref[:] = st_ref[0:1, :].astype(jnp.int32)
        Xs_ref[:] = jnp.zeros_like(Xs_ref)
        Ys_ref[:] = jnp.zeros_like(Ys_ref)
        st_ref[0:1, :] = jnp.zeros_like(st_ref[0:1, :])
        st_ref[1:2, :] = jnp.zeros_like(st_ref[1:2, :])
        st_ref[2:3, :] = jnp.full_like(st_ref[2:3, :], jnp.inf)
        k_ref[0] = 0

    # very first step: the state scratch starts uninitialized
    @pl.when((i == 0) & (j == 0))
    def _():
        Xs_ref[:] = jnp.zeros_like(Xs_ref)
        Ys_ref[:] = jnp.zeros_like(Ys_ref)
        st_ref[0:1, :] = jnp.zeros_like(st_ref[0:1, :])
        st_ref[1:2, :] = jnp.zeros_like(st_ref[1:2, :])
        st_ref[2:3, :] = jnp.full_like(st_ref[2:3, :], jnp.inf)
        k_ref[0] = 0


@functools.partial(
    jax.jit,
    static_argnames=("b_tile", "m_tile", "pl_iters", "l_safety",
                     "t_init_factor", "chunk", "n_bursts", "tol", "split_k",
                     "interpret", "pB"),
)
def _run_overlap(betas, A, b, a1, a2, *, b_tile, m_tile, pl_iters, l_safety,
                 t_init_factor, chunk, n_bursts, tol, split_k, interpret, pB):
    n, m, B_orig = A.shape
    if pB:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, pB)))
        b = jnp.pad(b, ((0, 0), (0, pB)))
        a1 = jnp.pad(a1, (0, pB))
        a2 = jnp.pad(a2, (0, pB))
    B = B_orig + pB
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    na = n + 1
    npairs_pad = _round_up(na * (na + 1) // 2, SUBLANE)
    nt = B // b_tile
    nm = pl.cdiv(m, m_tile)
    a1r = a1[None, :].astype(A.dtype)
    a2r = a2[None, :].astype(A.dtype)
    kern = functools.partial(
        _overlap_kernel, n=n, n_pad=n_pad, m=m, m_tile=m_tile, nt=nt,
        pl_iters=pl_iters, l_safety=l_safety, t_init_factor=t_init_factor,
        chunk=chunk, n_bursts=n_bursts, tol=tol, split_k=split_k,
    )
    # inputs follow the tile being BUILT (clamped on the extra column);
    # outputs lag one column (tile i-1), revisited across the row steps
    bi = lambda i, j, *pf: (0, jnp.minimum(i, nt - 1))
    oi = lambda i, j, *pf: (0, jnp.maximum(i - 1, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # betas
        grid=(nt + 1, nm),
        in_specs=[
            pl.BlockSpec((1, b_tile), bi, memory_space=pltpu.VMEM),  # alpha1
            pl.BlockSpec((1, b_tile), bi, memory_space=pltpu.VMEM),  # alpha2
            pl.BlockSpec((n, m_tile, b_tile),
                         lambda i, j, *pf: (0, j, jnp.minimum(i, nt - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, b_tile),
                         lambda i, j, *pf: (j, jnp.minimum(i, nt - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_pad, b_tile), oi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile), oi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile), oi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile), oi, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((npairs_pad, b_tile), A.dtype),        # acc
            pltpu.VMEM((n_pad, n_pad, b_tile), A.dtype),      # QA
            pltpu.VMEM((n_pad, n_pad, b_tile), A.dtype),      # QB
            pltpu.VMEM((n_pad, b_tile), A.dtype),             # cA
            pltpu.VMEM((n_pad, b_tile), A.dtype),             # cB
            pltpu.VMEM((SUBLANE, b_tile), A.dtype),           # rows A
            pltpu.VMEM((SUBLANE, b_tile), A.dtype),           # rows B
            pltpu.VMEM((n_pad, b_tile), A.dtype),             # Xs
            pltpu.VMEM((n_pad, b_tile), A.dtype),             # Ys
            pltpu.VMEM((3, b_tile), A.dtype),                 # done/iters/gap
            pltpu.SMEM((1,), jnp.int32),                      # k
        ],
    )
    X, iters, gap, done = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, B), A.dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), A.dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(betas, a1r, a2r, A, b)
    sl = slice(0, B_orig)
    failed = ~jnp.all(jnp.isfinite(X[:, sl]), axis=0)
    return BatchResult(
        x=X[:n, sl].T,
        iters=iters[0, sl],
        rel_gap=gap[0, sl],
        n_iters_total=jnp.max(iters[0, sl]),
        converged=(done[0, sl] > 0) & (gap[0, sl] <= tol) & ~failed,
        failed=failed,
    )
