"""Headline-bench ablation harness (real TPU).

Round-2 verdict asked for (a) an explanation of the r01→r02 headline
regression, (b) the per-tile adaptive kernel as the headline path with
difficulty-sorted lane tiles. This CLI measures one pipeline variant per
invocation (ONE TPU process at a time — see CLAUDE.md):

  python -m fastoptsolver_tpu.bench.ablate --mode burst --check-every 25
  python -m fastoptsolver_tpu.bench.ablate --mode adaptive --sort gap1
  python -m fastoptsolver_tpu.bench.ablate --mode build-only

Modes
-----
- ``burst``     — the r01/r02 headline: fused Gram build + burst-driver
                  certified solve (kernels/fista_vmem.fista_gram_vmem).
- ``adaptive``  — fused build + per-tile adaptive kernel
                  (fista_gram_vmem_adaptive): each 128-lane tile exits at its
                  own convergence point instead of the global max.
- ``build-only``— fused Gram build alone (pipeline stage split).
- ``greedy``/``delta`` — momentum-mode variants of ``burst``.

Sorting (``--sort``), adaptive mode only: instances are difficulty-ordered
on device before the solve so each tile's lanes converge together and the
per-tile early exit converts the median-vs-max iteration slack into
wall-clock. Proxies:
- ``gap1``  — relative duality gap after one ``check_every``-iteration burst
              (one extra kernel launch; near-perfect difficulty ordering);
- ``L``     — per-instance Lipschitz estimate (free, from the build);
- ``alpha`` — per-instance ℓ₁ weight (free);
- ``none``  — natural order (each tile's max ≈ global max: no win expected).
The permutation gather (Q is n_pad²·B·4 B ≈ 16 MB at B=64k) and the proxy
burst are INCLUDED in the timed path — a real user solves once.

Timing follows bench.py's tunnel methodology: dispatch ``reps`` back-to-back
solves, force completion with one terminal value fetch, min over trials.
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _build(batch, m, sort_gen=False):
    from bench import _build_problems  # repo-root bench.py (run from root)

    key = jax.random.PRNGKey(0)
    if sort_gen:
        A, b, alpha1 = _build_problems_sorted(key, batch, m)
    else:
        A, b, alpha1 = _build_problems(key, batch, m)
    A.block_until_ready()
    return A, b, alpha1


@functools.partial(jax.jit, static_argnames=("batch", "m"))
def _build_problems_sorted(key, batch: int, m: int):
    """bench._build_problems with the per-instance noise level SORTED before
    generation: instances with similar difficulty land in the same lane
    tiles, so the per-tile adaptive kernel's early exit bites — at ZERO
    permutation cost (sorting a (B,) parameter vector; a data-side gather of
    the built Gram costs ~25 ms at B=64k because the instance axis is the
    minormost/lane dim). The marginals are unchanged (independent draws)."""
    from fastoptsolver_tpu.problems import generate_scenario_batch_fm

    knoise, kr1, kr2, kgen = jax.random.split(key, 4)
    noise = jnp.sort(
        jax.random.choice(knoise, jnp.asarray([0.5, 1.0, 2.0, 5.0]), (batch,))
    )
    rho1 = jax.random.choice(kr1, jnp.asarray([0.5, 0.8]), (batch,))
    rho2 = jax.random.choice(kr2, jnp.asarray([0.7, 0.9]), (batch,))
    A, b, _ = generate_scenario_batch_fm(
        kgen, batch, m=m, noise_std=noise, rho1=rho1, rho2=rho2,
        dtype=jnp.float32,
    )
    mu = A.mean(axis=1, keepdims=True)
    sd = A.std(axis=1, keepdims=True)
    A = (A - mu) / sd
    alpha1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", A, b)), axis=0)
    return A, b, alpha1


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _gap_after_one_burst(gb, *, chunk: int, interpret: bool = False):
    """Difficulty proxy: per-lane relative gap after one fixed burst."""
    from ..batch.fista_gram import BatchFISTAConfig
    from ..kernels.fista_vmem import fista_gram_vmem

    # one burst, no certification loop: check_every=0 & max_iter=chunk, then
    # the driver's post-hoc gap — a single kernel launch + one gap pass
    cfg = BatchFISTAConfig(max_iter=chunk, check_every=0)
    res = fista_gram_vmem(gb, cfg, interpret=interpret)
    return res.rel_gap


def _permute(gb, order):
    from ..batch.fista_gram import GramBatch

    # Gather on a MAJOR axis: indexing the minormost (lane) axis directly
    # costs a cross-lane shuffle per element (measured ~37 ms for the 16 MB
    # Q at B=64k); moveaxis → row-gather → moveaxis is ~3 copies instead.
    Qb = jnp.moveaxis(gb.Q, -1, 0)[order]
    cb = gb.c.T[order]
    return GramBatch(
        Q=jnp.moveaxis(Qb, 0, -1), c=cb.T, btb=gb.btb[order],
        alpha1=gb.alpha1[order], alpha2=gb.alpha2[order], L=gb.L[order],
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="burst",
                    help="one of burst|adaptive|build-only|greedy|delta|"
                         "routed|fused1|fused1-plain (single-launch fused kernel, "
                         "auto-overlap / forced plain)|driver (fused build + "
                         "XLA fista_gram_batch solve), or "
                         "a comma list to interleave MODES within "
                         "one process (e.g. 'routed,burst' for the "
                         "routed-vs-hand-wired parity check, or "
                         "'burst,driver --backtracking' for the "
                         "kernel-armijo vs driver-armijo A/B)")
    ap.add_argument("--sort", default="none",
                    choices=["none", "gap1", "L", "alpha", "gen"])
    ap.add_argument("--check-every", type=int, default=25)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--m", type=int, default=1000)
    ap.add_argument("--b-tile", type=int, default=None)
    ap.add_argument("--pl-iters", type=str, default="96",
                    help="power-iteration depth, 'pl[:build_tile[:split_k]]' "
                         "pairs; a comma list interleaves the configs within "
                         "ONE process (A/B/A/B trials) — separate processes "
                         "differ by ±25% on this tunnel")
    ap.add_argument("--reps", type=int, default=25)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--restart", action="store_true",
                    help="nesterov + in-kernel adaptive restart")
    ap.add_argument("--backtracking", action="store_true",
                    help="reference-semantics Armijo line search (round 5: "
                         "runs in-kernel on burst/fused1-plain/routed; on "
                         "the XLA driver in 'driver' mode)")
    ap.add_argument("--max-iter", type=int, default=1000,
                    help="iteration budget (armijo configs stall above the "
                         "reference's ~1e-4 suboptimality and never certify "
                         "at 1e-6 — cap the budget for A/Bs)")
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fos_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ..batch.fista_gram import BatchFISTAConfig
    from ..kernels import (
        fista_gram_vmem,
        fista_gram_vmem_adaptive,
        make_gram_batch_fused,
    )

    A, b, alpha1 = _build(args.batch, args.m, sort_gen=args.sort == "gen")

    modes = args.mode.split(",")
    known = {"burst", "adaptive", "build-only", "greedy", "delta", "routed",
             "fused1", "fused1-plain", "driver"}
    bad = set(modes) - known
    if bad:
        raise SystemExit(
            f"unknown mode(s) {sorted(bad)}; want subset of {sorted(known)}"
        )

    def make_cfg(mode):
        kw = {}
        if mode == "delta":
            kw = dict(momentum="delta", delta=10.0)
        elif mode == "greedy":
            kw = dict(momentum="greedy")
        if args.restart:
            kw["adaptive_restart"] = True
        if args.backtracking:
            kw["backtracking"] = True
        return BatchFISTAConfig(max_iter=args.max_iter,
                                check_every=args.check_every,
                                rel_gap_tol=args.tol, **kw)

    def make_solve(mode, plcfg):
        cfg = make_cfg(mode)
        pl_iters, build_tile, split_k = plcfg

        def solve():
            if mode in ("fused1", "fused1-plain"):
                # single-launch build+solve kernel: Q never exists in HBM;
                # 'fused1' auto-picks the software-pipelined overlap
                # variant, 'fused1-plain' forces the solve-on-last-brick one
                from ..kernels import solve_lasso_fused

                res = solve_lasso_fused(
                    A, b, alpha1, 0.0, cfg=cfg, pl_iters=pl_iters,
                    split_k=split_k,
                    overlap=None if mode == "fused1" else False,
                )
                return res.converged, res.iters
            if mode == "routed":
                # the public one-call surface (batch/api.py) — pl/tile/split
                # knobs are ignored (the routed path uses the kernel
                # defaults); interleave 'routed,burst' for the
                # routed-vs-hand-wired parity check
                from ..batch import solve_lasso_batch

                res = solve_lasso_batch(A, b, alpha1, 0.0, cfg=cfg,
                                        feature_major=True)
                return res.converged, res.iters
            gb = make_gram_batch_fused(A, b, alpha1, 0.0, pl_iters=pl_iters,
                                       b_tile=build_tile, split_k=split_k)
            if mode == "build-only":
                return gb.Q, None
            if mode == "driver":
                # HBM-streamed XLA solve (batch/fista_gram.py) after the
                # fused build — the fallback path an armijo config used to
                # silently take; its headline-scale cost was unmeasured
                # before round 5 (r4 verdict item 1)
                from ..batch.fista_gram import fista_gram_batch

                res = fista_gram_batch(gb, cfg)
                return res.converged, res.iters
            if mode == "adaptive":
                if args.sort not in ("none", "gen"):  # gen sorts at generation
                    if args.sort == "gap1":
                        key = _gap_after_one_burst(gb, chunk=args.check_every)
                    elif args.sort == "L":
                        key = gb.L
                    else:
                        key = gb.alpha1
                    order = jnp.argsort(key)
                    gbs = _permute(gb, order)
                    res = fista_gram_vmem_adaptive(gbs, cfg, b_tile=args.b_tile)
                    # un-permute converged/iters for accounting (x unused)
                    inv = jnp.argsort(order)
                    return res.converged[inv], res.iters[inv]
                res = fista_gram_vmem_adaptive(gb, cfg, b_tile=args.b_tile)
                return res.converged, res.iters
            res = fista_gram_vmem(gb, cfg, b_tile=args.b_tile)
            return res.converged, res.iters
        return solve

    def parse(v):
        parts = [int(x) for x in v.split(":")]
        # pl_iters[:build_tile[:split_k]] — defaults 256 / 1
        return (parts[0],
                parts[1] if len(parts) > 1 else 256,
                parts[2] if len(parts) > 2 else 1)
    pl_list = [parse(v) for v in args.pl_iters.split(",")]
    keys = [(mode, pl) for mode in modes for pl in pl_list]
    solvers = {k: make_solve(*k) for k in keys}
    for s in solvers.values():  # warm/compile every config first
        jax.block_until_ready(s())

    results = {k: [] for k in keys}
    finals = {}
    for _ in range(args.trials):
        for k, s in solvers.items():  # interleaved A/B trials
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = s()
            conv, iters = out
            # terminal VALUE fetch forces completion of the dispatched
            # stream (bench.py tunnel methodology — block_until_ready alone
            # returns early before any value transfer)
            if iters is None:
                n_conv = args.batch
                float(conv[0, 0, 0])
            else:
                n_conv = int(jnp.sum(conv))
            results[k].append(time.perf_counter() - t0)
            finals[k] = (n_conv, iters)

    for k in keys:
        mode, pl = k
        dt = min(results[k]) / args.reps
        n_conv, iters = finals[k]
        rec = {
            "mode": mode,
            "sort": args.sort,
            "check_every": args.check_every,
            "pl_iters": pl[0],
            "build_tile": pl[1],
            "split_k": pl[2],
            "batch": args.batch,
            "converged": n_conv,
            "ms": round(dt * 1e3, 3),
            "inst_per_s_M": round(n_conv / dt / 1e6, 2),
        }
        if mode != "build-only" and iters is not None:
            it = np.asarray(iters)
            rec["iters_median"] = int(np.median(it))
            rec["iters_mean"] = round(float(it.mean()), 1)
            rec["iters_max"] = int(it.max())
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
