"""Pallas TPU kernel: the whole batched FISTA solve resident in VMEM.

Why a kernel: the batched Gram iteration is n² fused multiply-adds of
(B,)-wide lanes. XLA's fori_loop version already keeps small batches
VMEM-resident, but the Pallas tile loop guarantees it at any batch size: each
B_TILE-instance tile's Gram tensor is loaded into VMEM **once per burst** and
K iterations run against it before the next tile streams in — HBM traffic is
O(n²·B) per burst instead of O(K·n²·B).

Layout (identical to the XLA path, batch/fista_gram.py): feature-major,
instances on lanes.
  Q: (n_pad, n_pad, B)   — per-instance Gram tensors, n padded to 8 sublanes
  c, X, Y: (n_pad, B)    — B padded to a multiple of the 128-lane tile
  tau, thr, a2: (1, B)   — per-instance step, L1 threshold τ·α₁, ridge α₂

Per tile, one iteration is
  grad[f] = Σ_j Q[j, f] ⊙ Y[j] + a2 ⊙ Y[f]   (Q symmetric ⇒ slice the
            *leading*, untiled dim of Q — a free plane select — and
            broadcast one sublane row of Y; n_pad unrolled (8, BT) FMAs)
  X⁺ = soft_threshold(Y − τ·grad, thr)
  Y⁺ = X⁺ + β_k (X⁺ − X)

The β_k momentum sequence depends only on the global iteration index, so the
host precomputes one (max_iter,) table; each launch gets its burst offset via
a scalar-prefetch argument. The **entire certification loop is one jit**: a
``lax.while_loop`` alternates K-iteration kernel bursts with an on-device
duality-gap check (batch/fista_gram.py's ``_rel_gap``) — no host round-trip
until the final result fetch (the axon TPU tunnel charges ~35 ms per sync,
measured; this design took the certified 16k-instance solve from 105 ms to
single-digit ms).

Reference parity: computes exactly the fixed-step FISTA recurrence of
``/root/reference/iterative_solvers.py:170-221``, including the adaptive
restart of ``:209-217`` (per-lane t/prev-step rows, β computed in-register)
and — round 5 — the masked per-lane Armijo backtracking of ``:183-197``
(kernels/_common.fista_armijo_chunk, one extra Gram matvec per trial round,
per-lane accepted-τ row persisted across bursts), verified against the
NumPy oracle and the XLA path in tests/test_kernels.py and
tests/test_kernel_armijo.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..batch.fista_gram import BatchFISTAConfig, BatchResult, GramBatch, _rel_gap
from ._common import fista_armijo_chunk, gram_rel_gap

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _check_kernel_cfg(cfg: BatchFISTAConfig, backtracking_ok: bool = True) -> None:
    """Entry guard shared by every vmem kernel path: a config option the
    kernel does not implement must fail loudly, never silently degrade to a
    different algorithm (the XLA driver, batch/fista_gram.py, implements
    everything). Round 5: the burst kernel, the sharded kernel, and the
    plain single-launch fused kernel run the masked per-lane Armijo search
    in-kernel (kernels/_common.fista_armijo_chunk); the per-tile adaptive
    kernel and the software-pipelined overlap variant still reject it
    (``backtracking_ok=False``)."""
    if cfg.backtracking and not backtracking_ok:
        raise NotImplementedError(
            "backtracking runs on the burst vmem kernel, the plain "
            "single-launch fused kernel, or the XLA driver "
            "(batch.fista_gram.fista_gram_batch) — not on this variant"
        )
    if cfg.adaptive_restart and cfg.momentum != "nesterov":
        raise ValueError("adaptive restart applies to nesterov momentum only")


def _armijo_static(cfg: BatchFISTAConfig):
    """Static (C, η, max_backtracks) triple for the in-kernel Armijo search,
    or None when the config doesn't backtrack."""
    if not cfg.backtracking:
        return None
    return (cfg.armijo_c, cfg.ls_eta, cfg.max_backtracks)


def _fista_tile_kernel(beta_ref, k0_ref, Q_ref, c_ref, tau_ref, thr_ref, a2_ref,
                       a1_ref, btb_ref, X_ref, Y_ref, *rest,
                       n_pad: int, n_steps: int, with_gap: bool,
                       restart_threshold: float | None,
                       greedy: tuple | None = None, n_true: int | None = None,
                       armijo: tuple | None = None):
    """Run ``n_steps`` FISTA iterations for one (n_pad, B_TILE) tile.

    ``beta_ref``: scalar-prefetched (max_iter,) momentum table; ``k0_ref``:
    (1,) burst offset into it. Everything else is VMEM-resident for the burst.
    With ``with_gap`` the per-lane relative duality gap (ops/gap.py math) is
    computed in-kernel against the already-resident Q — the certification
    needs no separate pass over HBM.

    ``restart_threshold`` is not None ⇒ adaptive restart
    (iterative_solvers.py:209-217): the β table cannot be used because the
    Nesterov sequence becomes per-lane data-dependent, so the kernel carries a
    (1, BT) Nesterov scalar ``t_ref`` and previous step-norm ``ps_ref`` and
    computes β on the fly, resetting ``t=1, Y=X`` on lanes whose step-norm
    ratio exceeds the threshold (ratio = ∞ when the previous step was 0).

    ``greedy`` is not None ⇒ greedy FISTA (batch/fista_gram.py greedy branch:
    unit momentum, gradient-mapping restart, τ-safeguard). The two state rows
    are reinterpreted: ``t_ref`` carries the per-lane step τ (the overshot
    ξ/L, shrunk toward the safe 1/L), ``ps_ref`` the first-step norm the
    safeguard compares against; an extra ``taumin_ref`` row (1/L) gives the
    shrink floor. ``greedy`` is the static pair (S, shrink).

    ``armijo`` is not None ⇒ the masked per-lane Armijo backtracking search
    runs in-kernel (kernels/_common.fista_armijo_chunk — reference
    iterative_solvers.py:183-197 semantics, one extra Gram matvec per trial
    round). A third state row carries the per-lane τ (accepted τ persists
    across bursts and never grows); ``t``/``ps`` are the Nesterov scalar and
    previous step-norm exactly as on the restart path (pass-through under
    table-β momentum). ``armijo`` is the static (C, η, max_backtracks).

    The state rows (and their outputs) exist ONLY on the
    restart/greedy/armijo paths — the fixed-momentum fast path keeps its
    lean ref list (no extra DMAs). ``rest`` is (t, ps, Xo, Yo, to, pso, gap)
    with restart, (t, ps, taumin, Xo, Yo, to, pso, gap) with greedy,
    (t, ps, tauv, Xo, Yo, to, pso, tauvo, gap) with armijo, else
    (Xo, Yo, gap).
    """
    if armijo is not None:
        (t_ref, ps_ref, tauv_ref, Xo_ref, Yo_ref, to_ref, pso_ref,
         tauvo_ref, gap_ref) = rest
    elif greedy is not None:
        t_ref, ps_ref, taumin_ref, Xo_ref, Yo_ref, to_ref, pso_ref, gap_ref = rest
    elif restart_threshold is not None:
        t_ref, ps_ref, Xo_ref, Yo_ref, to_ref, pso_ref, gap_ref = rest
    else:
        Xo_ref, Yo_ref, gap_ref = rest
    tau = tau_ref[:]  # (1, BT) — broadcasts over the feature sublanes
    thr = thr_ref[:]
    a2 = a2_ref[:]
    a1 = a1_ref[:]
    Q = Q_ref[:]
    c = c_ref[:]
    k0 = k0_ref[0]

    n_mv = n_pad if n_true is None else n_true

    def matvec(V):
        # static unroll over the TRUE feature count: Q's padded planes are
        # zero, so skipping them drops 1 - n/n_pad of the hot-loop FMAs
        # (37% at the bench's n=5 / n_pad=8)
        out = jnp.zeros_like(V)
        for j in range(n_mv):
            out += Q[j] * V[j : j + 1, :]
        return out

    if armijo is not None:
        arm = fista_armijo_chunk(
            matvec, beta_ref, c, a1, a2, btb_ref[:], n_steps,
            restart_threshold, armijo,
        )
        X, Y, t, ps, tv = arm(
            k0, X_ref[:], Y_ref[:], t_ref[:], ps_ref[:], tauv_ref[:]
        )
        to_ref[:] = t
        pso_ref[:] = ps
        tauvo_ref[:] = tv
    elif greedy is not None:
        S_val, shrink = greedy
        taumin = taumin_ref[:]

        def step(k, carry):
            # mirrors batch/fista_gram.py:_iterate_block greedy branch
            X, Y, tau, fs = carry
            grad = matvec(Y) + a2 * Y - c
            V = Y - tau * grad
            Xn = jnp.sign(V) * jnp.maximum(jnp.abs(V) - tau * a1, 0.0)
            this = jnp.sqrt(jnp.sum((Xn - X) ** 2, axis=0, keepdims=True))
            Yn = Xn + (Xn - X)  # unit momentum
            restart = jnp.sum((Y - Xn) * (Xn - X), axis=0, keepdims=True) >= 0.0
            Yn = jnp.where(restart, Xn, Yn)
            fs = jnp.where(fs == 0.0, this, fs)
            grow = this > S_val * fs
            tau = jnp.where(
                grow | restart, jnp.maximum(shrink * tau, taumin), tau
            )
            return Xn, Yn, tau, fs

        X, Y, t, ps = jax.lax.fori_loop(
            0, n_steps, step, (X_ref[:], Y_ref[:], t_ref[:], ps_ref[:])
        )
        to_ref[:] = t
        pso_ref[:] = ps
    elif restart_threshold is None:
        def step(k, carry):
            X, Y = carry
            grad = matvec(Y) + a2 * Y - c
            V = Y - tau * grad
            Xn = jnp.sign(V) * jnp.maximum(jnp.abs(V) - thr, 0.0)
            beta = beta_ref[k0 + k]
            Yn = Xn + beta * (Xn - X)
            return Xn, Yn

        X, Y = jax.lax.fori_loop(0, n_steps, step, (X_ref[:], Y_ref[:]))
    else:
        def step(k, carry):
            X, Y, t, ps = carry
            grad = matvec(Y) + a2 * Y - c
            V = Y - tau * grad
            Xn = jnp.sign(V) * jnp.maximum(jnp.abs(V) - thr, 0.0)
            # mirrors batch/fista_gram.py:_iterate_block nesterov+restart
            this = jnp.sqrt(jnp.sum((Xn - X) ** 2, axis=0, keepdims=True))
            t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            beta = (t - 1.0) / t_next
            Yn = Xn + beta * (Xn - X)
            ratio = jnp.where(ps > 0.0, this / jnp.maximum(ps, 1e-30), jnp.inf)
            restart = ratio > restart_threshold
            t_next = jnp.where(restart, 1.0, t_next)
            Yn = jnp.where(restart, Xn, Yn)
            return Xn, Yn, t_next, this

        X, Y, t, ps = jax.lax.fori_loop(
            0, n_steps, step, (X_ref[:], Y_ref[:], t_ref[:], ps_ref[:])
        )
        to_ref[:] = t
        pso_ref[:] = ps
    Xo_ref[:] = X
    Yo_ref[:] = Y

    if with_gap:
        # the shared kernel-layout twin of batch/fista_gram._rel_gap
        gap_ref[:] = gram_rel_gap(X, matvec, c, a1_ref[:], a2, btb_ref[:])
    else:
        gap_ref[:] = jnp.zeros_like(gap_ref)


def momentum_betas(k0: int, n_steps: int, t0: float, cfg: BatchFISTAConfig):
    """Host-side β_k table for global iterations k0..k0+n_steps-1 plus the
    Nesterov scalar to resume from. Matches the reference recurrences
    (iterative_solvers.py:219-221 / :330)."""
    betas = np.empty(n_steps, np.float32)
    t = t0
    if cfg.momentum == "delta":
        for i in range(n_steps):
            k_ref = k0 + i + 1  # reference counts from 1
            betas[i] = k_ref / (k_ref + 1.0 + cfg.delta)
    else:
        for i in range(n_steps):
            t_next = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t * t))
            betas[i] = (t - 1.0) / t_next
            t = t_next
    return jnp.asarray(betas), t


def _burst(betas, k0, Q, c, tau, thr, a2, a1, btb, X, Y, t, ps, taumin=None,
           tauv=None, *, n_pad, b_tile, n_steps, interpret, with_gap=False,
           restart_threshold=None, greedy=None, n_true=None, armijo=None):
    """One kernel launch advancing every tile by ``n_steps`` iterations.

    Returns ``(X, Y, t, ps, tauv, gap)`` — ``t``/``ps`` are the per-lane
    state rows (Nesterov scalar + previous step-norm under adaptive restart;
    per-lane τ + first-step norm under greedy; passed through otherwise);
    ``tauv`` is the per-lane Armijo step row (shrunk in-kernel under
    ``armijo``, passed through otherwise); ``gap`` is the in-kernel per-lane
    relative duality gap when ``with_gap``, else zeros."""
    B = Q.shape[-1]
    grid = (B // b_tile,)
    stateful = (
        (restart_threshold is not None) or (greedy is not None)
        or (armijo is not None)
    )
    n_state_out = 3 if armijo is not None else (2 if stateful else 0)
    kern = functools.partial(
        _fista_tile_kernel, n_pad=n_pad, n_steps=n_steps, with_gap=with_gap,
        restart_threshold=restart_threshold, greedy=greedy, n_true=n_true,
        armijo=armijo,
    )
    vec = lambda r: pl.BlockSpec(
        (r, b_tile), lambda i, *prefetch: (0, i), memory_space=pltpu.VMEM
    )
    state_vec = lambda n: jax.ShapeDtypeStruct((n, B), Q.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # (betas, k0)
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_pad, n_pad, b_tile),
                lambda i, *prefetch: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            vec(n_pad),  # c
            vec(1),  # tau
            vec(1),  # thr
            vec(1),  # a2
            vec(1),  # a1
            vec(1),  # btb
            vec(n_pad),  # X
            vec(n_pad),  # Y
            # per-lane state rows: restart (t, ps) / greedy (t, fs, taumin)
            # / armijo (t, ps, tauv) only
            *([vec(1)] * (2 if stateful else 0)),
            *([vec(1)] if greedy is not None or armijo is not None else []),
        ],
        out_specs=[
            vec(n_pad), vec(n_pad),
            *([vec(1)] * n_state_out),
            vec(1),
        ],
    )
    extra_in = []
    if stateful:
        extra_in += [t, ps]
    if greedy is not None:
        extra_in.append(taumin)  # greedy shrink floor (1/L)
    elif armijo is not None:
        extra_in.append(tauv)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            state_vec(n_pad), state_vec(n_pad),
            *([state_vec(1)] * n_state_out),
            state_vec(1),
        ],
        interpret=interpret,
    )(betas, k0, Q, c, tau, thr, a2, a1, btb, X, Y, *extra_in)
    if armijo is not None:
        Xo, Yo, to, pso, tauvo, gap = out
        return Xo, Yo, to, pso, tauvo, gap
    if stateful:
        Xo, Yo, to, pso, gap = out
        return Xo, Yo, to, pso, tauv, gap  # tauv passed through untouched
    Xo, Yo, gap = out
    return Xo, Yo, t, ps, tauv, gap  # state rows passed through untouched


def _pad_batch(gb: GramBatch, b_tile: int) -> tuple[GramBatch, int]:
    """Zero-pad instances to a b_tile multiple (zero Q/c keep X at 0) and
    features to the 8-sublane boundary."""
    n, B = gb.c.shape
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    B_pad = _round_up(B, b_tile)
    if n_pad == n and B_pad == B:
        return gb, B
    pn, pB = n_pad - n, B_pad - B
    return (
        GramBatch(
            Q=jnp.pad(gb.Q, ((0, pn), (0, pn), (0, pB))),
            c=jnp.pad(gb.c, ((0, pn), (0, pB))),
            btb=jnp.pad(gb.btb, (0, pB)),
            alpha1=jnp.pad(gb.alpha1, (0, pB)),
            alpha2=jnp.pad(gb.alpha2, (0, pB)),
            L=jnp.pad(gb.L, (0, pB), constant_values=1.0),
        ),
        B,
    )


class _VmemState(NamedTuple):
    X: Array
    Y: Array
    t: Array  # (1, B) per-lane Nesterov scalar (restart path)
    ps: Array  # (1, B) per-lane previous step norm (restart path)
    tau: Array  # (1, B) per-lane Armijo step row (pass-through otherwise)
    k: Array  # scalar iterations completed
    done: Array  # (B,)
    iters: Array  # (B,)
    gap: Array  # (B,)


class VmemSolveState(NamedTuple):
    """Checkpointable kernel-path solver state (see utils/checkpoint.py — a
    plain pytree). Feature-major like ``GramBatch``; ``t``/``ps`` are the
    per-lane momentum rows (Nesterov scalar + previous step norm; per-lane τ
    + first-step norm under greedy; the fixed-momentum modes resume via the
    global β table indexed by ``k``); ``tau`` is the per-lane Armijo step
    (accepted τ persists across a checkpoint and never grows). ``done`` /
    ``iters`` / ``gap`` carry the certification record, so lanes certified
    before the checkpoint keep their burst-boundary iteration counts and
    gaps on resume (ADVICE r4: without them a certified resume re-detected
    convergence and the greedy stuck-lane safeguard compared against a gap
    reset to inf). Produced by ``fista_gram_vmem(..., return_state=True)``
    and fed back as ``state0`` — the continued trajectory and certification
    record are bit-identical to an uninterrupted run
    (tests/test_kernels.py::test_vmem_kernel_resume_is_exact)."""

    X: Array  # (n, B)
    Y: Array  # (n, B)
    t: Array  # (1, B)
    ps: Array  # (1, B)
    tau: Array  # (1, B) — per-lane Armijo step row
    k: Array  # scalar int32 — iterations completed (host-read on resume)
    done: Array  # (B,) bool — certified-by-checkpoint mask
    iters: Array  # (B,) int32 — burst-boundary certification counts
    gap: Array  # (B,) — last certified per-lane relative gap


@functools.partial(
    jax.jit,
    static_argnames=("n_pad", "b_tile", "chunk", "n_bursts", "tol",
                     "interpret", "certify", "restart_threshold", "greedy",
                     "n_true", "k0", "armijo", "engine", "g_planes"),
)
def _solve_on_device(betas, Q, c, btb, alpha1, a2v, tau, thr, a2, taumin,
                     X0=None, Y0=None, t0=None, ps0=None, tauv0=None,
                     done0=None, iters0=None, gap0=None, *,
                     n_pad, b_tile, chunk, n_bursts, tol, interpret, certify,
                     restart_threshold=None, greedy=None, n_true=None,
                     k0: int = 0, armijo=None, engine: str = "vmem",
                     g_planes: int = 0):
    """The full certified solve as one device program (single host sync).

    ``X0/Y0/t0/ps0/tauv0`` (padded, feature-major) with static ``k0`` resume
    a previous run: the burst offsets index the global β table at absolute
    iteration counts, so fixed-momentum sequences continue exactly; the
    restart/greedy/armijo paths continue from their carried per-lane rows.
    ``done0/iters0/gap0`` seed the certification record so
    already-certified lanes keep their counts (ADVICE r4)."""
    B = Q.shape[-1]
    dtype = Q.dtype
    a1row = alpha1[None, :].astype(dtype)
    btbrow = btb[None, :].astype(dtype)

    if engine == "qstream":
        from .qstream import qstream_burst as _burst_fn
        burst_kw = dict(g_planes=g_planes)
    else:
        _burst_fn = _burst
        burst_kw = {}

    def burst(state: _VmemState) -> _VmemState:
        X, Y, t, ps, tv, gvec = _burst_fn(
            betas, state.k[None].astype(jnp.int32), Q, c, tau, thr, a2,
            a1row, btbrow, state.X, state.Y, state.t, state.ps, taumin,
            state.tau,
            n_pad=n_pad, b_tile=b_tile, n_steps=chunk, interpret=interpret,
            with_gap=certify, restart_threshold=restart_threshold,
            greedy=greedy, n_true=n_true, armijo=armijo, **burst_kw,
        )
        k = state.k + chunk
        if not certify:
            return _VmemState(X, Y, t, ps, tv, k,
                              state.done, state.iters, state.gap)
        g = gvec[0]  # in-kernel per-lane relative duality gap
        # quarantine non-finite lanes (failure detection) so the loop exits
        failed = ~jnp.all(jnp.isfinite(X), axis=0) | jnp.isnan(g)
        g = jnp.where(failed, jnp.inf, g)
        newly = (~state.done) & ((g <= tol) | failed)
        if greedy is not None:
            # Outer safeguard (batch/fista_gram.py burst body): a live lane
            # whose certified gap did not improve over a whole check window
            # gets its τ halved toward 1/L — stuck overshoot lanes provably
            # degrade into plain FISTA.
            stuck = (~state.done) & ~newly & (g > 0.9 * state.gap)
            t = jnp.where(
                stuck[None, :], jnp.maximum(0.5 * t, taumin), t
            )
        return _VmemState(
            X=X,
            Y=Y,
            t=t,
            ps=ps,
            tau=tv,
            k=k,
            done=state.done | newly,
            iters=jnp.where(newly, k, jnp.where(state.done, state.iters, k)),
            gap=jnp.where(state.done, state.gap, g),
        )

    state = _VmemState(
        X=jnp.zeros((n_pad, B), dtype) if X0 is None else X0,
        # greedy reinterprets (t, ps) as (per-lane τ, first-step norm)
        Y=jnp.zeros((n_pad, B), dtype) if Y0 is None else Y0,
        t=(tau if greedy is not None else jnp.ones((1, B), dtype))
        if t0 is None else t0,
        ps=jnp.zeros((1, B), dtype) if ps0 is None else ps0,
        tau=tau if tauv0 is None else tauv0,
        k=jnp.full((), k0, jnp.int32),
        done=jnp.zeros((B,), bool) if done0 is None else done0,
        iters=jnp.zeros((B,), jnp.int32) if iters0 is None else iters0,
        gap=jnp.full((B,), jnp.inf, dtype) if gap0 is None else gap0,
    )
    if certify and n_bursts > 0:
        state = jax.lax.while_loop(
            lambda s: (s.k < k0 + n_bursts * chunk) & ~jnp.all(s.done),
            burst, state,
        )
        gap = state.gap
    else:
        # fixed-iteration runs AND zero-burst resumes (state0.k >= max_iter):
        # certify the carried iterate post-hoc — a resume at/past the budget
        # must still report the true gap/convergence of X, not inf/False
        state = jax.lax.fori_loop(0, n_bursts, lambda i, s: burst(s), state)
        gb = GramBatch(Q=Q, c=c, btb=btb, alpha1=alpha1, alpha2=a2v, L=alpha1)
        gap = _rel_gap(gb, state.X)
        state = state._replace(
            gap=gap, done=gap <= tol, iters=jnp.full((B,), state.k, jnp.int32)
        )
    return state


def plan_gram_solve(n: int, cfg: BatchFISTAConfig) -> tuple[str, int, int]:
    """Pick the kernel engine for a Gram-form solve at feature count ``n``,
    in measured-preference order (RESULTS.md round 5):

    - ``("vmem", b_tile, 0)`` while the double-buffered Q tile fits the
      burst kernel (n ≲ 104; 49× the XLA driver at n=96);
    - ``("resident", b_tile, 0)`` for the single-buffered manual-DMA window
      (n ≤ 168, certified configs — kernels/resident.py; Q read once per
      SOLVE, 13.7× the streaming engine at n=144, every momentum mode incl.
      armijo);
    - ``("qstream", b_tile, g_planes)`` beyond (kernels/qstream.py — Q
      streamed per iteration at ~750 GB/s, 3.2-3.4× the driver; no
      practical ceiling).

    Raises when no kernel engine supports the configuration (past-window
    armijo: the trial rounds would need a data-dependent number of Q
    streams) — the router falls back to the XLA driver on exactly these
    errors, so routing can never drift from the kernels' real envelopes."""
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    try:
        return "vmem", auto_b_tile(n_pad), 0
    except ValueError as vmem_err:
        if cfg.check_every > 0:
            from .resident import auto_b_tile_resident

            try:
                return "resident", auto_b_tile_resident(n_pad), 0
            except ValueError:
                pass
        if cfg.backtracking:
            raise NotImplementedError(
                "at this width the armijo search needs the resident engine "
                "(a VMEM-resident Q for its data-dependent trial matvecs), "
                "which covers n ≤ 168 for CERTIFIED configs "
                "(check_every > 0); past the window — or with "
                "check_every <= 0 — backtracking runs on the XLA driver "
                "(batch.fista_gram.fista_gram_batch)"
            ) from vmem_err
        from .qstream import auto_tiles_qstream

        bt, g = auto_tiles_qstream(n_pad)
        return "qstream", bt, g


def auto_b_tile(n_pad: int, vmem_budget_bytes: int = 12 * 1024 * 1024) -> int:
    """Largest lane tile whose **double-buffered** Q stream
    (2 · n_pad² · b_tile · 4 B — Pallas pipelines the next tile's DMA while
    the current one computes) fits the budget, clamped to [128, 1024] lanes.
    Budget default leaves ~4 MB of the 16 MB/core VMEM for state rows and
    outputs.

    Raises when even the minimum 128-lane tile cannot fit (n_pad ≳ 112): the
    VMEM-resident design caps at n ≈ 104 features; wider problems route to
    the Q-streaming kernel (kernels/qstream.py, round 5 — see
    ``plan_gram_solve``), with the XLA driver
    (batch.fista_gram.fista_gram_batch) as the armijo/ultra-wide fallback
    and solvers/gram_dense.py for single instances. The round-2 verdict
    flagged that the old clamp silently emitted 128-lane tiles whose Q
    blocks exceeded VMEM at n_pad ≥ 112."""
    fit = vmem_budget_bytes // (2 * n_pad * n_pad * 4)
    if fit < LANE:
        raise ValueError(
            f"n_pad={n_pad} needs {2 * n_pad * n_pad * 4 * LANE / 2**20:.1f} "
            "MiB of VMEM for the minimum 128-lane double-buffered Q tile — "
            "beyond the ~16 MiB/core budget. Use the XLA driver "
            "(batch.fista_gram.fista_gram_batch) for n > ~104 features."
        )
    return int(max(LANE, min(1024, (fit // LANE) * LANE)))


def fista_gram_vmem(
    gb: GramBatch,
    cfg: BatchFISTAConfig = BatchFISTAConfig(),
    b_tile: int | None = None,
    interpret: bool = False,
    state0: VmemSolveState | None = None,
    return_state: bool = False,
):
    """Solve the batch with VMEM-resident kernel bursts, entirely on device.

    Past the burst kernel's double-buffered ceiling (n ≈ 104) this entry
    point still covers every feature count the kernels support
    (``plan_gram_solve`` picks, round 5): certified configs in the
    single-DMA window (n ≤ 168) DELEGATE to the resident engine
    (kernels/resident.py — whole solve per tile, per-lane-k
    ``ResidentSolveState``), and wider problems run the Q-streaming burst
    engine (kernels/qstream.py) under the SAME certified driver as the
    resident-burst path — resume, early exit, and failure quarantine behave
    identically there. A ``VmemSolveState`` checkpoint in the window pins
    the qstream engine (the state type records the engine that produced
    it).

    ``cfg.check_every > 0``: bursts of that many iterations with an on-device
    duality-gap certification between bursts, early-exiting when every
    instance is certified (``max_iter`` is rounded up to a burst multiple).
    ``check_every <= 0``: one fixed run of ``max_iter`` iterations.

    Unlike the XLA driver, converged lanes are not frozen — they keep
    iterating at zero extra cost; ``iters`` records the burst boundary at
    which each instance was first certified.

    Adaptive restart (reference iterative_solvers.py:209-217) is supported
    for nesterov momentum: the kernel carries per-lane (t, prev-step-norm)
    rows and computes β in-register, restarting lanes independently.

    Greedy momentum (``cfg.momentum == "greedy"``) runs fully in-kernel too:
    per-lane τ starts at ξ/L, unit momentum with the gradient-mapping restart
    test, the in-step safeguard, and the burst-boundary stuck-lane shrink —
    the same recurrence as batch/fista_gram.py's greedy branch.

    Armijo backtracking (``cfg.backtracking``, round 5) runs in-kernel as
    well: the masked per-lane sufficient-decrease search of the XLA driver
    (reference iterative_solvers.py:183-197 — C=1e-2, η=0.5, accepted τ
    persists and never grows), one extra Gram matvec per trial round against
    the VMEM-resident Q, with the per-lane τ row carried across bursts and
    checkpoints.

    ``state0`` resumes a previous run exactly (the SURVEY §5 checkpoint
    obligation on the fast path — no drop to the XLA driver needed):
    ``max_iter`` counts total iterations including the resumed ones, matching
    ``fista_gram_batch``. ``state0.k`` is read on the host (one sync) to size
    the static burst schedule. With ``return_state`` the final
    :class:`VmemSolveState` is returned alongside the result.
    """
    _check_kernel_cfg(cfg)
    n, B_orig = gb.c.shape
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    engine, auto_bt, g_planes = plan_gram_solve(n, cfg)
    if engine == "resident":
        from .resident import ResidentSolveState, fista_gram_resident

        if state0 is None or isinstance(state0, ResidentSolveState):
            return fista_gram_resident(
                gb, cfg, interpret=interpret, state0=state0,
                return_state=return_state,
            )
        # a VmemSolveState checkpoint pins the engine that produced it —
        # in the resident window that is the qstream burst driver
        from .qstream import auto_tiles_qstream

        engine = "qstream"
        auto_bt, g_planes = auto_tiles_qstream(n_pad)
    if engine == "qstream":
        # the (b_tile, g_planes) pair is coupled by the VMEM budget — the
        # qstream tiler owns it; an explicit b_tile applies to vmem only
        b_tile = auto_bt
    elif b_tile is None:
        b_tile = auto_bt
    b_tile = min(b_tile, _round_up(B_orig, LANE))
    B = _round_up(B_orig, b_tile)

    k0 = int(state0.k) if state0 is not None else 0
    certify = cfg.check_every > 0
    remaining = max(cfg.max_iter - k0, 0)
    chunk = cfg.check_every if certify else max(remaining, 1)
    n_bursts = -(-remaining // chunk)
    betas, _ = momentum_betas(0, max(k0 + n_bursts * chunk, 1), 1.0, cfg)
    greedy = (
        (cfg.greedy_S, cfg.greedy_shrink) if cfg.momentum == "greedy" else None
    )
    armijo = _armijo_static(cfg)
    step_factor = cfg.greedy_xi if greedy is not None else cfg.t_init_factor

    # Everything from padding to the final slice is ONE jitted program: each
    # eager op here would cost a full dispatch round-trip over the TPU tunnel.
    result, fin = _pad_and_solve(
        betas, gb.Q, gb.c, gb.btb, gb.alpha1, gb.alpha2, gb.L,
        X0=None if state0 is None else state0.X,
        Y0=None if state0 is None else state0.Y,
        t0=None if state0 is None else state0.t,
        ps0=None if state0 is None else state0.ps,
        tauv0=None if state0 is None else state0.tau,
        done0=None if state0 is None else state0.done,
        iters0=None if state0 is None else state0.iters,
        gap0=None if state0 is None else state0.gap,
        pn=n_pad - n, pB=B - B_orig, n_pad=n_pad, b_tile=b_tile, chunk=chunk,
        n_bursts=n_bursts, tol=cfg.rel_gap_tol, interpret=interpret,
        certify=certify, t_init_factor=step_factor,
        restart_threshold=(
            cfg.restart_threshold if cfg.adaptive_restart else None
        ),
        greedy=greedy, k0=k0, armijo=armijo, engine=engine,
        g_planes=g_planes,
    )
    return (result, fin) if return_state else result


@functools.partial(
    jax.jit,
    static_argnames=(
        "pn", "pB", "n_pad", "b_tile", "chunk", "n_bursts", "tol",
        "interpret", "certify", "t_init_factor", "restart_threshold",
        "greedy", "k0", "armijo", "engine", "g_planes",
    ),
)  # n_true derived from pn inside (n = n_pad - pn)
def _pad_and_solve(betas, Q, c, btb, alpha1, alpha2, L,
                   X0=None, Y0=None, t0=None, ps0=None, tauv0=None,
                   done0=None, iters0=None, gap0=None, *, pn, pB, n_pad,
                   b_tile, chunk, n_bursts, tol, interpret, certify,
                   t_init_factor, restart_threshold=None,
                   greedy=None, k0: int = 0, armijo=None,
                   engine: str = "vmem", g_planes: int = 0):
    n, B_orig = c.shape
    if pn or pB:
        Q = jnp.pad(Q, ((0, pn), (0, pn), (0, pB)))
        c = jnp.pad(c, ((0, pn), (0, pB)))
        btb = jnp.pad(btb, (0, pB))
        alpha1 = jnp.pad(alpha1, (0, pB))
        alpha2 = jnp.pad(alpha2, (0, pB))
        L = jnp.pad(L, (0, pB), constant_values=1.0)
        if X0 is not None:
            # padded lanes are zero-Q instances whose trajectory is X = 0
            # from any of these fills — values there are don't-care (done
            # padded True so a fully-certified resume exits immediately)
            X0 = jnp.pad(X0, ((0, pn), (0, pB)))
            Y0 = jnp.pad(Y0, ((0, pn), (0, pB)))
            t0 = jnp.pad(t0, ((0, 0), (0, pB)), constant_values=1.0)
            ps0 = jnp.pad(ps0, ((0, 0), (0, pB)))
            tauv0 = jnp.pad(tauv0, ((0, 0), (0, pB)), constant_values=1.0)
            done0 = jnp.pad(done0, (0, pB), constant_values=True)
            iters0 = jnp.pad(iters0, (0, pB))
            gap0 = jnp.pad(gap0, (0, pB))
    dtype = c.dtype
    tau = (t_init_factor / L).astype(dtype)[None, :]
    thr = tau * alpha1[None, :]
    a2 = alpha2[None, :].astype(dtype)
    taumin = (1.0 / L).astype(dtype)[None, :]

    state = _solve_on_device(
        betas, Q, c, btb, alpha1, alpha2, tau, thr, a2, taumin,
        X0, Y0, t0, ps0, tauv0, done0, iters0, gap0,
        n_pad=n_pad, b_tile=b_tile, chunk=chunk, n_bursts=n_bursts,
        tol=tol, interpret=interpret, certify=certify,
        restart_threshold=restart_threshold, greedy=greedy, n_true=n, k0=k0,
        armijo=armijo, engine=engine, g_planes=g_planes,
    )
    sl = slice(0, B_orig)
    failed = ~jnp.all(jnp.isfinite(state.X[:, sl]), axis=0)
    result = BatchResult(
        x=state.X[:n, sl].T,
        iters=state.iters[sl],
        rel_gap=state.gap[sl],
        n_iters_total=state.k,
        converged=state.done[sl] & ~failed,
        failed=failed,
    )
    fin = VmemSolveState(
        X=state.X[:n, sl], Y=state.Y[:n, sl], t=state.t[:, sl],
        ps=state.ps[:, sl], tau=state.tau[:, sl], k=state.k,
        done=state.done[sl], iters=state.iters[sl], gap=state.gap[sl],
    )
    return result, fin


def fista_gram_vmem_sharded(
    gb: GramBatch,
    mesh,
    cfg: BatchFISTAConfig = BatchFISTAConfig(),
    axis: str = "batch",
    b_tile: int | None = None,
    interpret: bool = False,
) -> BatchResult:
    """Instance-parallel multi-chip variant: the VMEM-kernel solve runs
    per-device on its shard of the instance axis via ``shard_map`` — pure
    data parallelism, zero inter-chip communication during the solve (each
    device owns complete instances; XLA cannot auto-partition a pallas_call,
    hence the explicit shard_map rather than GSPMD annotations).

    Unlike the single-chip driver there is no cross-device early exit: every
    device runs the full static burst schedule (an early exit would need a
    collective in the while predicate every burst, costing more than the
    wasted bursts for typical workloads). Certification is still per
    instance. ``max_iter`` is rounded up to a burst multiple.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    _check_kernel_cfg(cfg)
    restart_threshold = cfg.restart_threshold if cfg.adaptive_restart else None
    greedy = (
        (cfg.greedy_S, cfg.greedy_shrink) if cfg.momentum == "greedy" else None
    )
    armijo = _armijo_static(cfg)
    step_factor = cfg.greedy_xi if greedy is not None else cfg.t_init_factor
    n_dev = mesh.shape[axis]
    if b_tile is None:
        b_tile = auto_b_tile(_round_up(max(gb.c.shape[0], SUBLANE), SUBLANE))
    # pad so every device's shard is a whole number of lane tiles
    n_true = gb.c.shape[0]
    gbp, B_orig = _pad_batch(gb, min(b_tile, LANE) * n_dev)
    n_pad, B = gbp.c.shape
    b_tile = min(b_tile, B // n_dev)
    dtype = gbp.c.dtype

    certify = cfg.check_every > 0
    chunk = cfg.check_every if certify else cfg.max_iter
    n_bursts = -(-cfg.max_iter // chunk)
    betas, _ = momentum_betas(0, n_bursts * chunk, 1.0, cfg)
    tau = (step_factor / gbp.L).astype(dtype)[None, :]
    thr = tau * gbp.alpha1[None, :]
    a2 = gbp.alpha2[None, :].astype(dtype)
    taumin = (1.0 / gbp.L).astype(dtype)[None, :]

    def local_solve(betas, Q, c, btb, alpha1, a2v, tau, thr, a2, taumin):
        Bl = Q.shape[-1]
        a1row = alpha1[None, :].astype(Q.dtype)
        btbrow = btb[None, :].astype(Q.dtype)

        def burst(i, s):
            X, Y, t, ps, tv, gvec = _burst(
                betas, s.k[None].astype(jnp.int32), Q, c, tau, thr, a2,
                a1row, btbrow, s.X, s.Y, s.t, s.ps, taumin, s.tau,
                n_pad=n_pad, b_tile=b_tile, n_steps=chunk, interpret=interpret,
                with_gap=True, restart_threshold=restart_threshold,
                greedy=greedy, n_true=n_true, armijo=armijo,
            )
            k = s.k + chunk
            g = gvec[0]
            failed = ~jnp.all(jnp.isfinite(X), axis=0) | jnp.isnan(g)
            g = jnp.where(failed, jnp.inf, g)
            newly = (~s.done) & ((g <= cfg.rel_gap_tol) | failed)
            if greedy is not None:
                stuck = (~s.done) & ~newly & (g > 0.9 * s.gap)
                t = jnp.where(
                    stuck[None, :], jnp.maximum(0.5 * t, taumin), t
                )
            return _VmemState(
                X=X, Y=Y, t=t, ps=ps, tau=tv, k=k,
                done=s.done | newly,
                iters=jnp.where(newly, k, jnp.where(s.done, s.iters, k)),
                gap=jnp.where(s.done, s.gap, g),
            )

        init = _VmemState(
            X=jnp.zeros((n_pad, Bl), dtype),
            Y=jnp.zeros((n_pad, Bl), dtype),
            t=tau if greedy is not None else jnp.ones((1, Bl), dtype),
            ps=jnp.zeros((1, Bl), dtype),
            tau=tau,
            k=jnp.zeros((), jnp.int32),
            done=jnp.zeros((Bl,), bool),
            iters=jnp.zeros((Bl,), jnp.int32),
            gap=jnp.full((Bl,), jnp.inf, dtype),
        )
        s = jax.lax.fori_loop(0, n_bursts, burst, init)
        return s.X, s.done, s.iters, s.gap

    shard = P(None, axis)
    vec = P(axis)
    fn = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis), shard, vec, vec, vec, shard,
                  shard, shard, shard),
        out_specs=(shard, vec, vec, vec),
        # pallas_call's out_shape carries no varying-mesh-axes info; skip the
        # vma check (the kernel is purely local — no collectives inside)
        check_vma=False,
    )
    # lay inputs out across the mesh
    dev = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    X, done, iters, gap = fn(
        betas,
        dev(gbp.Q, P(None, None, axis)),
        dev(gbp.c, shard),
        dev(gbp.btb, vec),
        dev(gbp.alpha1, vec),
        dev(gbp.alpha2, vec),
        dev(tau, shard),
        dev(thr, shard),
        dev(a2, shard),
        dev(taumin, shard),
    )
    sl = slice(0, B_orig)
    failed = ~jnp.all(jnp.isfinite(X[:, sl]), axis=0)
    return BatchResult(
        x=X[: gb.c.shape[0], sl].T,
        iters=iters[sl],
        rel_gap=gap[sl],
        n_iters_total=jnp.asarray(n_bursts * chunk, jnp.int32),
        converged=done[sl] & ~failed,
        failed=failed,
    )


# ---------------------------------------------------------------------------
# Fully in-kernel certification: per-tile adaptive iteration counts
# ---------------------------------------------------------------------------


def _fista_tile_kernel_adaptive(beta_ref, Q_ref, c_ref, tau_ref, thr_ref,
                                a2_ref, a1_ref, btb_ref, *rest,
                                n_pad: int, chunk: int,
                                n_bursts: int, tol: float,
                                restart_threshold: float | None,
                                greedy: tuple | None = None,
                                n_true: int | None = None):
    """The ENTIRE certified solve for one (n_pad, B_TILE) tile in one kernel
    launch: a while loop alternates ``chunk``-iteration bursts with the
    in-kernel duality-gap check, exiting as soon as THIS TILE's lanes are all
    certified (or quarantined non-finite). Where the burst driver
    (_solve_on_device) runs every tile to the global max lane's iteration
    count, each tile here pays only its own — and the X/Y round-trips to HBM
    between bursts disappear.

    ``greedy`` = static (S, shrink) runs the greedy-FISTA recurrence
    (per-lane τ from the carried t row, unit momentum, gradient-mapping
    restart, safeguards incl. the per-check stuck-lane shrink); ``rest`` is
    then (taumin_ref, Xo, gap, iters, done), else (Xo, gap, iters, done)."""
    if greedy is not None:
        taumin_ref, Xo_ref, gap_ref, iters_ref, done_ref = rest
        taumin = taumin_ref[:]
    else:
        Xo_ref, gap_ref, iters_ref, done_ref = rest
    tau = tau_ref[:]
    thr = thr_ref[:]
    a2 = a2_ref[:]
    a1 = a1_ref[:]
    btb = btb_ref[:]
    Q = Q_ref[:]
    c = c_ref[:]

    n_mv = n_pad if n_true is None else n_true

    def matvec(V):
        out = jnp.zeros_like(V)
        for j in range(n_mv):  # true feature count — padded planes are zero
            out += Q[j] * V[j : j + 1, :]
        return out

    def rel_gap(X):
        # the shared kernel-layout twin of batch/fista_gram._rel_gap
        return gram_rel_gap(X, matvec, c, a1, a2, btb)

    def fista_steps(k0, X, Y, t, ps):
        def step(i, carry):
            X, Y, t, ps = carry
            if greedy is not None:
                # batch/fista_gram.py greedy branch, per-lane τ in t
                S_val, shrink = greedy
                grad = matvec(Y) + a2 * Y - c
                V = Y - t * grad
                Xn = jnp.sign(V) * jnp.maximum(jnp.abs(V) - t * a1, 0.0)
                this = jnp.sqrt(jnp.sum((Xn - X) ** 2, axis=0, keepdims=True))
                Yn = Xn + (Xn - X)  # unit momentum
                restart = (
                    jnp.sum((Y - Xn) * (Xn - X), axis=0, keepdims=True) >= 0.0
                )
                Yn = jnp.where(restart, Xn, Yn)
                ps = jnp.where(ps == 0.0, this, ps)
                grow = this > S_val * ps
                t = jnp.where(
                    grow | restart, jnp.maximum(shrink * t, taumin), t
                )
                return Xn, Yn, t, ps
            grad = matvec(Y) + a2 * Y - c
            V = Y - tau * grad
            Xn = jnp.sign(V) * jnp.maximum(jnp.abs(V) - thr, 0.0)
            if restart_threshold is None:
                beta = beta_ref[k0 + i]
                return Xn, Xn + beta * (Xn - X), t, ps
            this = jnp.sqrt(jnp.sum((Xn - X) ** 2, axis=0, keepdims=True))
            t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            beta = (t - 1.0) / t_next
            Yn = Xn + beta * (Xn - X)
            ratio = jnp.where(ps > 0.0, this / jnp.maximum(ps, 1e-30), jnp.inf)
            restart = ratio > restart_threshold
            t_next = jnp.where(restart, 1.0, t_next)
            Yn = jnp.where(restart, Xn, Yn)
            return Xn, Yn, t_next, this
        return jax.lax.fori_loop(0, chunk, step, (X, Y, t, ps))

    def cond(carry):
        X, Y, t, ps, k, done, iters, gap = carry
        return (k < n_bursts * chunk) & ~jnp.all(done > 0.0)

    def body(carry):
        X, Y, t, ps, k, done, iters, gap = carry
        X, Y, t, ps = fista_steps(k, X, Y, t, ps)
        k = k + chunk
        g = rel_gap(X)
        finite = jnp.all(jnp.isfinite(X), axis=0, keepdims=True)
        g = jnp.where(finite, g, jnp.inf)
        newly = (done == 0.0) & ((g <= tol) | ~finite)
        if greedy is not None:
            # stuck-lane safeguard at the check boundary (τ → toward 1/L)
            stuck = (done == 0.0) & ~newly & (g > 0.9 * gap)
            t = jnp.where(stuck, jnp.maximum(0.5 * t, taumin), t)
        done = jnp.where(newly, 1.0, done)
        iters = jnp.where(done == 0.0, jnp.float32(k), jnp.where(newly, jnp.float32(k), iters))
        gap = jnp.where(newly | (done == 0.0), g, gap)
        return X, Y, t, ps, k, done, iters, gap

    zero = jnp.zeros_like(c)
    onerow = jnp.zeros_like(tau)
    t0row = tau if greedy is not None else jnp.ones_like(tau)
    X, Y, t, ps, k, done, iters, gap = jax.lax.while_loop(
        cond,
        body,
        (zero, zero, t0row, onerow, jnp.zeros((), jnp.int32),
         onerow, onerow, jnp.full_like(tau, jnp.inf)),
    )
    Xo_ref[:] = X
    gap_ref[:] = gap
    iters_ref[:] = iters.astype(jnp.int32)
    done_ref[:] = done.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("pn", "pB", "n_pad", "b_tile", "chunk", "n_bursts",
                     "tol", "interpret", "restart_threshold", "greedy"),
)
def _solve_adaptive(betas, Q, c, btb, alpha1, alpha2, L, *, pn, pB, n_pad,
                    b_tile, chunk, n_bursts, tol, interpret,
                    t_init_factor, restart_threshold=None,
                    greedy=None) -> BatchResult:
    # true feature count (pre-pad) drives the kernels' matvec unroll
    n, B_orig = c.shape
    if pn or pB:
        Q = jnp.pad(Q, ((0, pn), (0, pn), (0, pB)))
        c = jnp.pad(c, ((0, pn), (0, pB)))
        btb = jnp.pad(btb, (0, pB))
        alpha1 = jnp.pad(alpha1, (0, pB))
        alpha2 = jnp.pad(alpha2, (0, pB))
        L = jnp.pad(L, (0, pB), constant_values=1.0)
    dtype = c.dtype
    B = B_orig + pB
    tau = (t_init_factor / L).astype(dtype)[None, :]
    thr = tau * alpha1[None, :]
    a2 = alpha2[None, :].astype(dtype)
    a1 = alpha1[None, :].astype(dtype)
    btbrow = btb[None, :].astype(dtype)
    taumin = (1.0 / L).astype(dtype)[None, :]

    kern = functools.partial(
        _fista_tile_kernel_adaptive, n_pad=n_pad, chunk=chunk,
        n_bursts=n_bursts, tol=tol, restart_threshold=restart_threshold,
        greedy=greedy, n_true=n,
    )
    vec = lambda r: pl.BlockSpec(
        (r, b_tile), lambda i, *prefetch: (0, i), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # betas
        grid=(B // b_tile,),
        in_specs=[
            pl.BlockSpec((n_pad, n_pad, b_tile), lambda i, *prefetch: (0, 0, i),
                         memory_space=pltpu.VMEM),
            vec(n_pad),  # c
            vec(1), vec(1), vec(1), vec(1), vec(1),  # tau, thr, a2, a1, btb
            *([vec(1)] if greedy is not None else []),  # taumin
        ],
        out_specs=[vec(n_pad), vec(1), vec(1), vec(1)],
    )
    X, gap, iters, done = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(betas, Q, c, tau, thr, a2, a1, btbrow,
      *([taumin] if greedy is not None else []))
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


def fista_gram_vmem_adaptive(
    gb: GramBatch,
    cfg: BatchFISTAConfig = BatchFISTAConfig(),
    b_tile: int | None = None,
    interpret: bool = False,
) -> BatchResult:
    """Per-tile adaptive variant of :func:`fista_gram_vmem`: the certification
    while-loop lives INSIDE the kernel, so each lane tile exits at its own
    convergence point instead of the batch's global max. Fresh solves only
    (no resume state); ``check_every`` must be > 0. Adaptive restart
    (nesterov momentum) and greedy momentum run fully in-kernel as in
    :func:`fista_gram_vmem`. Backtracking stays off this variant (the burst
    kernel and the plain single-launch fused kernel run it in-kernel)."""
    _check_kernel_cfg(cfg, backtracking_ok=False)
    if cfg.check_every <= 0:
        raise ValueError("adaptive kernel needs check_every > 0")
    greedy = (
        (cfg.greedy_S, cfg.greedy_shrink) if cfg.momentum == "greedy" else None
    )
    step_factor = cfg.greedy_xi if greedy is not None else cfg.t_init_factor
    n, B_orig = gb.c.shape
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    if b_tile is None:
        b_tile = auto_b_tile(n_pad)
    b_tile = min(b_tile, _round_up(B_orig, LANE))
    B = _round_up(B_orig, b_tile)
    chunk = cfg.check_every
    n_bursts = -(-cfg.max_iter // chunk)
    betas, _ = momentum_betas(0, n_bursts * chunk, 1.0, cfg)
    return _solve_adaptive(
        betas, gb.Q, gb.c, gb.btb, gb.alpha1, gb.alpha2, gb.L,
        pn=n_pad - n, pB=B - B_orig, n_pad=n_pad, b_tile=b_tile, chunk=chunk,
        n_bursts=n_bursts, tol=cfg.rel_gap_tol, interpret=interpret,
        t_init_factor=step_factor,
        restart_threshold=(
            cfg.restart_threshold if cfg.adaptive_restart else None
        ),
        greedy=greedy,
    )
