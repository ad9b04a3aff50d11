"""Pallas TPU kernel: wide-n certified FISTA with Q STREAMED from HBM.

The VMEM-resident burst kernel (kernels/fista_vmem.py) holds each lane
tile's whole (n_pad, n_pad, b_tile) Gram block in VMEM for a burst — which
caps the feature count near n ≈ 104 (double-buffered Q exceeds the 16 MiB
core budget beyond that). Past the ceiling the only batched path was the
XLA driver, measured (bench/wide_n.py, round 5) at a fraction of the
machine's streaming rate AND paying one full Q read per iteration plus one
per certification check.

This kernel removes the ceiling structurally: the burst's grid gains a
third, innermost axis over PLANE GROUPS of Q —

    grid = (B/b_tile, n_steps [+1], n_pad/g_planes)

so each iteration step streams Q through a double-buffered
(g_planes, n_pad, b_tile) window (Pallas pipelines the next group's DMA
behind the current group's FMAs; Q is never resident), accumulating the
Gram matvec into a VMEM scratch. On a step's last group the FISTA update
runs (soft-threshold + momentum — fixed table-β, adaptive restart, or
greedy; the per-lane state rows live in scratch across the whole burst).
When certifying, ONE extra grid step re-streams Q to accumulate Q·X for
the in-kernel duality gap — (chunk+1)/chunk traffic, ~4% at the default
cadence, instead of the driver's separate certification pass.

Per burst the traffic is ``n_steps + 1`` passes over the tile's Q — the
same asymptotic traffic as the XLA driver but at the Pallas streaming rate
(the r4 finding: the no-math grid ceiling is ~515 GB/s where the driver's
einsum achieves far less), with every elementwise op fused into the
stream. The outer certified loop (early exit, resume, failure quarantine)
is SHARED with the resident kernel: kernels/fista_vmem.py's
``_solve_on_device`` dispatches to this burst when the feature count is
past the resident ceiling.

Armijo backtracking is rejected here (guard): each trial round would cost
a data-dependent number of full Q streams, which a static Pallas grid
cannot express — wide armijo configs run on the XLA driver.

Reference parity: the same recurrences as kernels/fista_vmem.py
(iterative_solvers.py:170-221); trajectory-parity tested against the
resident kernel and the XLA driver in tests/test_qstream.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import gram_rel_gap_from_qx

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def auto_tiles_qstream(n_pad: int, vmem_budget_bytes: int = 10 * 1024 * 1024):
    """(b_tile, g_planes) for the streaming kernel: the double-buffered
    plane-group window (2 · g · n_pad · b_tile · 4) plus the persistent
    state scratches (X, Y, acc, state rows ≈ 4 planes) must fit. Prefers
    the widest group that divides n_pad (fewer grid steps, chunkier DMA).
    Raises when even the minimum window cannot fit (n_pad ≳ 2000)."""
    for bt in (256, 128):
        state = (4 * n_pad + 4 * SUBLANE) * bt * 4
        avail = vmem_budget_bytes - state
        gmax = avail // (2 * n_pad * bt * 4)
        if gmax < SUBLANE:
            continue
        # largest multiple-of-8 divisor of n_pad that fits
        g = None
        for cand in range(min((gmax // SUBLANE) * SUBLANE, n_pad), 0,
                          -SUBLANE):
            if n_pad % cand == 0:
                g = cand
                break
        if g is not None:
            return bt, g
    raise ValueError(
        f"qstream kernel: n_pad={n_pad} leaves no room for even an 8-plane "
        "double-buffered window in VMEM; use the XLA driver "
        "(batch.fista_gram.fista_gram_batch)."
    )


def _qstream_tile_kernel(beta_ref, k0_ref, Qb_ref, c_ref, tau_ref, thr_ref,
                         a2_ref, a1_ref, btb_ref, X_ref, Y_ref, *rest,
                         n_pad: int, g_planes: int, n_steps: int,
                         with_gap: bool, restart_threshold,
                         greedy):
    """One (i, s, j) grid point: accumulate plane group ``j`` of the Gram
    matvec for iteration step ``s`` of lane tile ``i``; on a step's last
    group apply the FISTA update; on the extra gap step emit outputs.

    ``rest`` mirrors kernels/fista_vmem._fista_tile_kernel: with greedy the
    inputs gain (t, ps, taumin) and outputs (to, pso); with restart (t, ps)
    → (to, pso); fixed momentum has no state rows. Then outputs
    (Xo, Yo, [to, pso], gap) and scratches (Xs, Ys, acc, st)."""
    stateful = (restart_threshold is not None) or (greedy is not None)
    idx = 0
    if stateful:
        t_ref, ps_ref = rest[idx], rest[idx + 1]
        idx += 2
    if greedy is not None:
        taumin_ref = rest[idx]
        idx += 1
    Xo_ref, Yo_ref = rest[idx], rest[idx + 1]
    idx += 2
    if stateful:
        to_ref, pso_ref = rest[idx], rest[idx + 1]
        idx += 2
    gap_ref = rest[idx]
    Xs, Ys, acc, st = rest[idx + 1:]

    s = pl.program_id(1)
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    base = j * g_planes
    k0 = k0_ref[0]

    # ---- burst entry: stage the carried state into scratch ----
    @pl.when((s == 0) & (j == 0))
    def _():
        Xs[...] = X_ref[...]
        Ys[...] = Y_ref[...]
        if stateful:
            st[0:1, :] = t_ref[...]
            st[1:2, :] = ps_ref[...]

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    # ---- stream: accumulate this plane group's matvec contribution ----
    # (Q planes past n_true are zero padding: they contribute nothing, and
    # the group index is a grid value, so no static skip is possible — at
    # most 7 zero rows of overhead on the last group)
    @pl.when(s < n_steps)
    def _():
        a = acc[...]
        Q = Qb_ref[...]
        # one aligned dynamic slice (base is a multiple of the 8-sublane
        # group), then static rows of the block
        Yblk = Ys[pl.ds(base, g_planes), :]
        for p in range(g_planes):
            a = a + Q[p] * Yblk[p:p + 1, :]
        acc[...] = a

    if with_gap:
        @pl.when(s == n_steps)
        def _():
            a = acc[...]
            Q = Qb_ref[...]
            Xblk = Xs[pl.ds(base, g_planes), :]
            for p in range(g_planes):
                a = a + Q[p] * Xblk[p:p + 1, :]
            acc[...] = a

    # ---- step complete: the FISTA update (mirrors fista_vmem's modes) ----
    @pl.when((s < n_steps) & (j == nj - 1))
    def _():
        tau = tau_ref[...]
        thr = thr_ref[...]
        a2 = a2_ref[...]
        a1 = a1_ref[...]
        X = Xs[...]
        Y = Ys[...]
        grad = acc[...] + a2 * Y - c_ref[...]
        if greedy is not None:
            S_val, shrink = greedy
            t = st[0:1, :]  # per-lane τ
            fs = st[1:2, :]
            V = Y - t * grad
            Xn = jnp.sign(V) * jnp.maximum(jnp.abs(V) - t * a1, 0.0)
            this = jnp.sqrt(jnp.sum((Xn - X) ** 2, axis=0, keepdims=True))
            Yn = Xn + (Xn - X)
            restart = jnp.sum((Y - Xn) * (Xn - X), axis=0, keepdims=True) >= 0.0
            Yn = jnp.where(restart, Xn, Yn)
            fs = jnp.where(fs == 0.0, this, fs)
            grow = this > S_val * fs
            t = jnp.where(
                grow | restart,
                jnp.maximum(shrink * t, taumin_ref[...]), t,
            )
            st[0:1, :] = t
            st[1:2, :] = fs
        elif restart_threshold is None:
            V = Y - tau * grad
            Xn = jnp.sign(V) * jnp.maximum(jnp.abs(V) - thr, 0.0)
            beta = beta_ref[k0 + s]
            Yn = Xn + beta * (Xn - X)
        else:
            V = Y - tau * grad
            Xn = jnp.sign(V) * jnp.maximum(jnp.abs(V) - thr, 0.0)
            t = st[0:1, :]
            ps = st[1:2, :]
            this = jnp.sqrt(jnp.sum((Xn - X) ** 2, axis=0, keepdims=True))
            t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            beta = (t - 1.0) / t_next
            Yn = Xn + beta * (Xn - X)
            ratio = jnp.where(ps > 0.0, this / jnp.maximum(ps, 1e-30), jnp.inf)
            restart = ratio > restart_threshold
            t_next = jnp.where(restart, 1.0, t_next)
            Yn = jnp.where(restart, Xn, Yn)
            st[0:1, :] = t_next
            st[1:2, :] = this
        Xs[...] = Xn
        Ys[...] = Yn

    # ---- burst exit: emit outputs (and the gap, from the extra pass) ----
    last_s = n_steps if with_gap else n_steps - 1

    @pl.when((s == last_s) & (j == nj - 1))
    def _():
        Xo_ref[...] = Xs[...]
        Yo_ref[...] = Ys[...]
        if stateful:
            to_ref[...] = st[0:1, :]
            pso_ref[...] = st[1:2, :]
        if with_gap:
            gap_ref[...] = gram_rel_gap_from_qx(
                Xs[...], acc[...], c_ref[...], a1_ref[...], a2_ref[...],
                btb_ref[...],
            )
        else:
            gap_ref[...] = jnp.zeros_like(gap_ref)


def qstream_burst(betas, k0, Q, c, tau, thr, a2, a1, btb, X, Y, t, ps,
                  taumin=None, tauv=None, *, n_pad, b_tile, g_planes,
                  n_steps, interpret, with_gap=False,
                  restart_threshold=None, greedy=None, n_true=None,
                  armijo=None):
    """Drop-in sibling of kernels/fista_vmem._burst with Q streamed from
    HBM: one launch advancing every tile by ``n_steps`` iterations, Q read
    ``n_steps (+1 with certification)`` times per burst at the Pallas
    streaming rate. Returns ``(X, Y, t, ps, tauv, gap)`` with ``tauv``
    passed through (the armijo search cannot run here — its trial rounds
    would need a data-dependent number of Q streams)."""
    if armijo is not None:
        raise NotImplementedError(
            "armijo backtracking needs a data-dependent number of Q streams "
            "per iteration; wide-n armijo runs on the XLA driver"
        )
    B = Q.shape[-1]
    stateful = (restart_threshold is not None) or (greedy is not None)
    ns = n_steps + 1 if with_gap else n_steps
    nj = n_pad // g_planes
    dtype = Q.dtype
    kern = functools.partial(
        _qstream_tile_kernel, n_pad=n_pad, g_planes=g_planes,
        n_steps=n_steps, with_gap=with_gap,
        restart_threshold=restart_threshold, greedy=greedy,
    )
    vec = lambda r: pl.BlockSpec(
        (r, b_tile), lambda i, s, j, *pf: (0, i), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # (betas, k0)
        grid=(B // b_tile, ns, nj),
        in_specs=[
            # the streamed plane-group window of Q
            pl.BlockSpec((g_planes, n_pad, b_tile),
                         lambda i, s, j, *pf: (j, 0, i),
                         memory_space=pltpu.VMEM),
            vec(n_pad),  # c
            vec(1), vec(1), vec(1), vec(1), vec(1),  # tau thr a2 a1 btb
            vec(n_pad),  # X in
            vec(n_pad),  # Y in
            *([vec(1), vec(1)] if stateful else []),  # t, ps
            *([vec(1)] if greedy is not None else []),  # taumin
        ],
        out_specs=[
            vec(n_pad), vec(n_pad),
            *([vec(1), vec(1)] if stateful else []),
            vec(1),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, b_tile), dtype),  # Xs
            pltpu.VMEM((n_pad, b_tile), dtype),  # Ys
            pltpu.VMEM((n_pad, b_tile), dtype),  # matvec accumulator
            pltpu.VMEM((2, b_tile), dtype),  # state rows (t/τ, ps/fs)
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, B), dtype),
            jax.ShapeDtypeStruct((n_pad, B), dtype),
            *([jax.ShapeDtypeStruct((1, B), dtype)] * (2 if stateful else 0)),
            jax.ShapeDtypeStruct((1, B), dtype),
        ],
        interpret=interpret,
    )(betas, k0, Q, c, tau, thr, a2, a1, btb, X, Y,
      *([t, ps] if stateful else []),
      *([taumin] if greedy is not None else []))
    if stateful:
        Xo, Yo, to, pso, gap = out
        return Xo, Yo, to, pso, tauv, gap
    Xo, Yo, gap = out
    return Xo, Yo, t, ps, tauv, gap
