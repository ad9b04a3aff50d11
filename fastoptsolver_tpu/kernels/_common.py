"""Shared in-kernel building blocks for the Pallas TPU kernels.

One source of truth for the pieces that previously existed as per-kernel
copies (r4 review finding): the ragged-brick column masking, the symmetric
augmented-Gram pair accumulation, the Q-plane assembly from the pair
accumulator, the in-kernel power iteration, the Gram-form matvec, the
relative-duality-gap evaluation (the kernel-layout twin of
batch/fista_gram._rel_gap — any semantics change there must land here too,
per the CLAUDE.md oracle-sync rule), and the fixed-momentum FISTA chunk.

All helpers are pure functions of refs/arrays, traced inside kernel bodies;
they must keep producing the exact op sequences the kernels were verified
with (tests/test_kernels.py trajectory parity; bench/verify_tpu.py on chip).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SUBLANE = 8


def masked_cols(A_ref, b_ref, j, *, n: int, m: int, m_tile: int):
    """The brick's n feature planes + b as (m_tile, BT) columns, with rows
    past ``m`` zeroed on the ragged last brick (out-of-bounds block contents
    are unspecified on hardware; ``where`` also kills NaN/Inf)."""
    cols = [A_ref[i] for i in range(n)] + [b_ref[:]]
    if m % m_tile:
        valid = m - j * m_tile  # > m_tile except on the last row step
        row_ok = (
            jax.lax.broadcasted_iota(jnp.int32, cols[0].shape, 0) < valid
        )
        cols = [jnp.where(row_ok, col, 0.0) for col in cols]
    return cols


def accumulate_pairs(acc_ref, cols, pairs, split_k: int):
    """Accumulate the distinct augmented-Gram pair sums of this brick into
    ``acc_ref`` (one row per upper-triangle pair, SUBLANE-aligned grouped
    writes). Pair rows are computed INSIDE the group loop so at most SUBLANE
    are live at once — a fully materialized row list blows Mosaic's
    scoped-vmem stack at wide n (measured 19-24 MB at n=64).

    ``split_k > 1`` folds the row axis before the tree reduction — an
    FMA-shaped expression (r3 tuning; measured at noise level after the r4
    m-grid redesign)."""
    mt = cols[0].shape[0]
    if split_k > 1 and mt % split_k == 0:
        part = mt // split_k

        def pair_sum(a, b):
            acc = a[:part] * b[:part]
            for k in range(1, split_k):
                acc = acc + a[k * part:(k + 1) * part] * b[k * part:(k + 1) * part]
            return jnp.sum(acc, axis=0, keepdims=True)  # (1, BT)
    else:
        def pair_sum(a, b):
            return jnp.sum(a * b, axis=0, keepdims=True)  # (1, BT)

    zero = jnp.zeros((1,) + cols[0].shape[1:], cols[0].dtype)
    npairs_pad = acc_ref.shape[0]
    for gstart in range(0, npairs_pad, SUBLANE):
        grp = [
            pair_sum(cols[pairs[p][0]], cols[pairs[p][1]])
            if p < len(pairs) else zero
            for p in range(gstart, gstart + SUBLANE)
        ]
        chunk_rows = jnp.concatenate(grp, axis=0)
        acc_ref[gstart:gstart + SUBLANE, :] = (
            acc_ref[gstart:gstart + SUBLANE, :] + chunk_rows
        )


def acc_entry(acc_ref, na: int):
    """Reader for the pair accumulator: ``g(i, k)`` returns the (1, BT) row
    of upper-triangle pair (i, k), straight from the scratch so no
    persistent value dict inflates the vmem stack."""
    def g(i, k):
        i, k = min(i, k), max(i, k)
        p = i * na - (i * (i - 1)) // 2 + (k - i)
        return acc_ref[p:p + 1, :]

    return g


def write_q_planes(Q_ref, g, *, n: int, n_pad: int):
    """Assemble the symmetric Gram into ``Q_ref`` ONE PLANE AT A TIME
    (padded rows/cols zero) — a register-resident full-Q copy at wide n
    would blow the Mosaic scoped-vmem stack."""
    zrow = jnp.zeros_like(g(0, 0))
    for i in range(n_pad):
        if i < n:
            Q_ref[i] = jnp.concatenate(
                [g(i, k) if k < n else zrow for k in range(n_pad)], axis=0
            )
        else:
            Q_ref[i] = jnp.zeros((n_pad,) + zrow.shape[1:], zrow.dtype)


def assemble_c(g, *, n: int, n_pad: int):
    """The augmented column ``c = Aᵀb`` as an (n_pad, BT) plane."""
    zrow = jnp.zeros_like(g(0, 0))
    return jnp.concatenate(
        [g(i, n) if i < n else zrow for i in range(n_pad)], axis=0
    )


def make_matvec(Q_ref, n: int):
    """Gram matvec against the (VMEM-resident) Q planes, unrolled over the
    TRUE feature count — planes k >= n are zero padding, so skipping them
    drops 1 − n/n_pad of the hot-loop FMAs."""
    def matvec(v):
        out = jnp.zeros_like(v)
        for k in range(n):
            out += Q_ref[k] * v[k:k + 1, :]
        return out

    return matvec


def power_lambda_max(matvec, c_vec, pl_iters: int):
    """In-kernel power iteration for λ_max, started from c (deterministic,
    generically non-orthogonal to the dominant eigenvector; its padded rows
    are zero so the iteration stays in the genuine n-subspace). Returns the
    per-lane (1, BT) estimate."""
    def norm(v):
        return jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))

    v0 = c_vec / jnp.maximum(norm(c_vec), 1e-30)

    def step(_, carry):
        v, _ = carry
        w = matvec(v)
        L = norm(w)
        return w / jnp.maximum(L, 1e-30), L

    _, L = jax.lax.fori_loop(
        0, pl_iters, step, (v0, jnp.zeros_like(c_vec[0:1, :]))
    )
    return L


def gram_rel_gap(X, matvec, c_vec, a1, a2, btb):
    """Per-lane relative duality gap in the kernel layout (feature rows on
    sublanes, instances on lanes; all reductions keepdims). Mirrors
    batch/fista_gram._rel_gap exactly — keep the two in sync."""
    return gram_rel_gap_from_qx(X, matvec(X), c_vec, a1, a2, btb)


def gram_rel_gap_from_qx(X, QX, c_vec, a1, a2, btb):
    """:func:`gram_rel_gap` with the Gram matvec ``QX`` precomputed — for
    kernels that stream Q from HBM and accumulate Q·X during the stream
    (kernels/qstream.py) rather than holding Q resident."""
    red = lambda v: jnp.sum(v, axis=0, keepdims=True)
    xQx = red(X * QX)
    cx = red(c_vec * X)
    xx = red(X * X)
    l1 = red(jnp.abs(X))
    u = QX - c_vec + a2 * X
    u_inf = jnp.max(jnp.abs(u), axis=0, keepdims=True)
    uu = red(u * u)
    rr = jnp.maximum(xQx - 2.0 * cx + btb, 0.0)
    rb = cx - btb
    f = 0.5 * rr + 0.5 * a2 * xx + a1 * l1
    s = jnp.where(u_inf > a1, a1 / jnp.maximum(u_inf, 1e-30), 1.0)
    dual_neg = 0.5 * (s * s) * rr + s * rb + 0.5 * a2 * (s * s) * xx
    l1_gap = jnp.maximum(f + dual_neg, 0.0)
    smooth_gap = uu / jnp.where(a2 > 0, 2.0 * a2, 1.0)
    gap = jnp.where(a1 > 0, l1_gap, smooth_gap)
    return gap / jnp.maximum(f, 1.0)


def assert_tile_k_uniform(k, B: int, b_tile: int, offset: int = 0) -> None:
    """Host-side resume guard shared by the per-lane-k engines (fused,
    resident) and the mesh surface: ``k`` must be uniform within every
    ``b_tile`` lane group starting at ``offset`` — a checkpoint cut under a
    different tile grouping (other b_tile, or a mesh layout whose shard
    boundaries split the original tiles) would interleave lanes at
    different absolute iterations into one lockstep tile, which the kernels
    cannot represent. Skips silently for tracers: callers that trace
    (shard_map locals) must pre-validate the CONCRETE state against their
    own grouping before dispatch (batch/api._solve_lasso_batch_sharded
    does)."""
    import numpy as _np

    if isinstance(k, jax.core.Tracer):
        return
    kh = _np.asarray(jax.device_get(k))
    for s0 in range(offset, offset + B, b_tile):
        seg = kh[s0:min(s0 + b_tile, offset + B)]
        if seg.size and (seg != seg[0]).any():
            raise ValueError(
                f"state0.k is not uniform within lane tile "
                f"[{s0}, {s0 + b_tile}) — the checkpoint was taken under a "
                "different tile grouping (b_tile / mesh layout); resume "
                "with the grouping that produced it"
            )


def certified_solve_body(matvec, beta_ref, c_vec, tau, thr, a1, a2, btb,
                         taumin, out_refs, state_init, *, chunk: int,
                         k_end: int, tol: float, restart_threshold, greedy,
                         armijo, with_state: bool):
    """The whole certified FISTA solve of one lane tile against a
    VMEM-resident Gram ``matvec``: the burst-and-gap-check while loop with
    every in-kernel momentum mode (fixed table-β, adaptive restart, greedy,
    Armijo), early exit when the tile's lanes are all certified, failure
    quarantine, and optional resume/state emission. ONE implementation
    shared by the single-launch fused kernel (kernels/fused_solve.py) and
    the resident wide-n kernel (kernels/resident.py) — the two engines must
    run the identical float sequence.

    ``out_refs`` is ``(X, iters, gap, done)`` plus ``(Yo, to, pso, tvo,
    ko)`` when ``with_state``; ``state_init`` is None (fresh start) or the
    9-tuple of carried VALUES ``(X0, Y0, t0, ps0, tv0, k0, d0, it0, g0)``.
    The carry always holds a per-lane τ row (tv): the Armijo mode shrinks
    it per lane (accepted τ persists, never grows); every other mode passes
    it through untouched."""
    if with_state:
        X_ref, iters_ref, gap_ref, done_ref, Yo_ref, to_ref, pso_ref, \
            tvo_ref, ko_ref = out_refs
    else:
        X_ref, iters_ref, gap_ref, done_ref = out_refs
    rel_gap = lambda X: gram_rel_gap(X, matvec, c_vec, a1, a2, btb)
    stateful = (restart_threshold is not None) or (greedy is not None)
    if armijo is not None:
        fista_steps = fista_armijo_chunk(
            matvec, beta_ref, c_vec, a1, a2, btb, chunk,
            restart_threshold, armijo,
        )
    elif stateful:
        gen_steps = fista_general_chunk(
            matvec, beta_ref, c_vec, tau, thr, a1, a2, chunk,
            restart_threshold, greedy, taumin,
        )

        def fista_steps(k0, X, Y, t, ps, tv):
            X, Y, t, ps = gen_steps(k0, X, Y, t, ps)
            return X, Y, t, ps, tv
    else:
        # the fixed-momentum hot path keeps its lean 2-plane carry
        fixed_steps = fista_fixed_chunk(
            matvec, beta_ref, c_vec, tau, thr, a2, chunk
        )

        def fista_steps(k0, X, Y, t, ps, tv):
            X, Y = fixed_steps(k0, X, Y)
            return X, Y, t, ps, tv

    def cond(carry):
        X, Y, t, ps, tv, k, done, iters, gap = carry
        return (k < k_end) & ~jnp.all(done > 0.0)

    def body(carry):
        X, Y, t, ps, tv, k, done, iters, gap = carry
        X, Y, t, ps, tv = fista_steps(k, X, Y, t, ps, tv)
        k = k + chunk
        gp = rel_gap(X)
        finite = jnp.all(jnp.isfinite(X), axis=0, keepdims=True)
        gp = jnp.where(finite, gp, jnp.inf)
        newly = (done == 0.0) & ((gp <= tol) | ~finite)
        if greedy is not None:
            # stuck-lane safeguard at the check boundary (tau toward 1/L)
            # — mirrors kernels/fista_vmem.py's adaptive kernel body
            stuck = (done == 0.0) & ~newly & (gp > 0.9 * gap)
            t = jnp.where(stuck, jnp.maximum(0.5 * t, taumin), t)
        done = jnp.where(newly, 1.0, done)
        iters = jnp.where(
            done == 0.0, jnp.float32(k), jnp.where(newly, jnp.float32(k), iters)
        )
        gap = jnp.where(newly | (done == 0.0), gp, gap)
        return X, Y, t, ps, tv, k, done, iters, gap

    if state_init is None:
        zstate = jnp.zeros_like(c_vec)
        zrow1 = jnp.zeros_like(tau)
        t0row = tau if greedy is not None else jnp.ones_like(tau)
        state_init = (zstate, zstate, t0row, zrow1, tau,
                      jnp.zeros((), jnp.int32), zrow1, zrow1,
                      jnp.full_like(tau, jnp.inf))
    X, Y, t, ps, tv, k, done, iters, gap = jax.lax.while_loop(
        cond, body, state_init,
    )
    X_ref[:] = X
    gap_ref[:] = gap
    iters_ref[:] = iters.astype(jnp.int32)
    done_ref[:] = done.astype(jnp.int32)
    if with_state:
        Yo_ref[:] = Y
        to_ref[:] = t
        pso_ref[:] = ps
        tvo_ref[:] = tv
        ko_ref[:] = jnp.broadcast_to(k, ko_ref.shape).astype(jnp.int32)


def fista_fixed_chunk(matvec, beta_ref, c_vec, tau, thr, a2, chunk: int):
    """``chunk`` fixed-momentum FISTA iterations (β from the scalar-prefetch
    table at ABSOLUTE iteration indices): ``(k0, X, Y) -> (X, Y)``."""
    def run(k0, X, Y):
        def step(i, carry):
            X, Y = carry
            grad = matvec(Y) + a2 * Y - c_vec
            V = Y - tau * grad
            Xn = jnp.sign(V) * jnp.maximum(jnp.abs(V) - thr, 0.0)
            beta = beta_ref[k0 + i]
            return Xn, Xn + beta * (Xn - X)

        return jax.lax.fori_loop(0, chunk, step, (X, Y))

    return run


def fista_armijo_chunk(matvec, beta_ref, c_vec, a1, a2, btb, chunk: int,
                       restart_threshold, armijo):
    """``chunk`` FISTA iterations with the reference-semantics masked
    per-lane Armijo backtracking line search run IN-KERNEL:
    ``(k0, X, Y, t, ps, tau) -> (X, Y, t, ps, tau)`` where ``tau`` is the
    per-lane (1, BT) step row — a lane's accepted τ persists across
    iterations and never grows (reference iterative_solvers.py:183-197,
    C=1e-2, shrink η=0.5; the sufficient-decrease test, NOT the
    Beck–Teboulle quadratic bound).

    Mirrors batch/fista_gram._iterate_block's backtracking branch exactly in
    the kernel layout (feature rows on sublanes, instances on lanes, all
    reductions keepdims): one Gram matvec for the gradient, then a bounded
    ``lax.while_loop`` of trial rounds — ONE extra Gram matvec per round,
    all lanes in lockstep, lanes accepting independently via masks. The
    smooth value g(·) includes the ½·bᵀb term like the driver's (it cancels
    in the Armijo inequality but keeps the two float paths aligned).

    ``armijo`` is the static triple ``(C, eta, max_backtracks)``;
    ``restart_threshold is None`` selects table-β momentum (nesterov
    without restart, or FISTA-Δ), else the per-lane Nesterov/adaptive-restart
    recurrence of :func:`fista_general_chunk`."""
    C, eta, max_bt = armijo
    red = lambda v: jnp.sum(v, axis=0, keepdims=True)

    def run(k0, X, Y, t, ps, tau):
        def step(i, carry):
            X, Y, t, ps, tau = carry
            QY = matvec(Y)
            grad = QY + a2 * Y - c_vec
            g_y = (
                0.5 * red(Y * QY) - red(c_vec * Y) + 0.5 * btb
                + 0.5 * a2 * red(Y * Y)
            )

            def trial(tv):
                V = Y - tv * grad
                Xc = jnp.sign(V) * jnp.maximum(jnp.abs(V) - tv * a1, 0.0)
                QX = matvec(Xc)
                g_x = (
                    0.5 * red(Xc * QX) - red(c_vec * Xc) + 0.5 * btb
                    + 0.5 * a2 * red(Xc * Xc)
                )
                ok = g_x <= g_y + C * red(grad * (Xc - Y))
                return Xc, ok

            X0t, ok0 = trial(tau)

            # the accept mask rides the while carry as FLOAT 0/1 rows —
            # Mosaic fails to legalize while-loops carrying i1 vectors
            # (scf.yield), the same reason the adaptive kernel's done row
            # is float (measured on chip, round 5)
            def bt_cond(cr):
                tv, Xc, accf, kbt = cr
                return jnp.any(accf == 0.0) & (kbt < max_bt)

            def bt_body(cr):
                tv, Xc, accf, kbt = cr
                acc = accf > 0.0
                tv_n = jnp.where(acc, tv, eta * tv)
                Xt, ok = trial(tv_n)
                accf_n = jnp.maximum(accf, ok.astype(accf.dtype))
                return tv_n, jnp.where(acc, Xc, Xt), accf_n, kbt + 1

            tau_n, Xn, _, _ = jax.lax.while_loop(
                bt_cond, bt_body,
                (tau, X0t, ok0.astype(tau.dtype), jnp.zeros((), jnp.int32)),
            )
            if restart_threshold is None:
                beta = beta_ref[k0 + i]
                return Xn, Xn + beta * (Xn - X), t, ps, tau_n
            this = jnp.sqrt(jnp.sum((Xn - X) ** 2, axis=0, keepdims=True))
            t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            beta = (t - 1.0) / t_next
            Yn = Xn + beta * (Xn - X)
            ratio = jnp.where(ps > 0.0, this / jnp.maximum(ps, 1e-30), jnp.inf)
            restart = ratio > restart_threshold
            t_next = jnp.where(restart, 1.0, t_next)
            Yn = jnp.where(restart, Xn, Yn)
            return Xn, Yn, t_next, this, tau_n

        return jax.lax.fori_loop(0, chunk, step, (X, Y, t, ps, tau))

    return run


def fista_general_chunk(matvec, beta_ref, c_vec, tau, thr, a1, a2,
                        chunk: int, restart_threshold, greedy, taumin):
    """``chunk`` FISTA iterations in any of the kernel momentum modes,
    carrying the per-lane state rows: ``(k0, X, Y, t, ps) -> (X, Y, t, ps)``.

    - fixed (``restart_threshold is None and greedy is None``): β from the
      scalar-prefetch table at absolute indices; t/ps pass through.
    - adaptive restart: per-lane Nesterov scalar ``t`` + previous step-norm
      ``ps``; β computed in-register, lanes reset independently
      (reference iterative_solvers.py:209-217).
    - greedy (static ``(S, shrink)``): ``t`` carries the per-lane τ, ``ps``
      the first-step norm; unit momentum, gradient-mapping restart, τ
      safeguards with floor ``taumin`` (batch/fista_gram.py greedy branch).

    Mirrors kernels/fista_vmem.py's in-kernel step logic exactly.
    """
    def run(k0, X, Y, t, ps):
        def step(i, carry):
            X, Y, t, ps = carry
            if greedy is not None:
                S_val, shrink = greedy
                grad = matvec(Y) + a2 * Y - c_vec
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
            grad = matvec(Y) + a2 * Y - c_vec
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

    return run
