"""Wide-n batched lasso throughput (round 5, VERDICT item 2).

The Pallas solve kernels cap near n ≈ 104 features (VMEM-resident Q);
beyond that the routed surface falls back to the XLA driver
(batch/fista_gram.py), whose *batched* wide-n throughput had never been
measured. This CLI measures, per feature count, IN ONE PROCESS (the only
comparison that repeats on this tunnel — RESULTS.md variance finding):

- the XLA pure-read rate of the (n, n, B) Gram tensor (``jnp.sum(Q)``) —
  the in-process ceiling for anything that must stream Q once per
  iteration;
- the driver's certified solve: instances/s and effective Q-stream GB/s
  (iterations × n²·B·4 bytes), as a percentage of that read rate;
- for n inside the kernel envelope, the burst vmem kernel on the same Gram
  (interleaved A/B);
- the Gram build (einsum precompute + power iteration) cost, separately —
  at wide n the 100-step power iteration re-reads Q from HBM every step
  and dominates the pipeline.

B is sized to an HBM budget for Q (default 2 GB) and rounded to lane
tiles. One JSON line per n.

``--backtracking`` runs every arm with the reference's armijo search
(iterative_solvers.py:183-197 semantics): inside the kernel envelope
(vmem ≤ ~104, resident ≤ 168) the in-kernel masked search is A/B'd
against the driver; past the window the kernel arm is absent by design
(``plan_gram_solve`` raises — a trial search needs a data-dependent
number of Q streams) and the row records the driver fallback's honest
cost, the r4 verdict's alternative demand.

Usage (real chip, repo root):
  python -m fastoptsolver_tpu.bench.wide_n --n 96 128 256 512
  python -m fastoptsolver_tpu.bench.wide_n --n 128 160 256 --backtracking
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("B", "m", "n"))
def _build_problems(key, B: int, m: int, n: int):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    A = jax.random.normal(k1, (B, m, n), jnp.float32) / np.sqrt(n)
    x_true = jnp.where(
        jax.random.uniform(k2, (B, n)) < 0.1,
        3.0 * jax.random.normal(k3, (B, n), jnp.float32),
        0.0,
    )
    b = jnp.einsum("bmn,bn->bm", A, x_true)
    b = b + 0.1 * jax.random.normal(k4, (B, m), jnp.float32)
    alpha1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("bmi,bm->bi", A, b)), axis=1)
    return A, b, alpha1


def _timed(fn, fetch, reps: int, trials: int) -> float:
    """bench.py tunnel methodology: reps back-to-back dispatches, ONE
    terminal value fetch, min over trials."""
    out = fn()
    jax.block_until_ready(out)
    totals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        fetch(out)
        totals.append(time.perf_counter() - t0)
    return min(totals) / reps, out


def run_one(n: int, hbm_gb: float, max_iter: int, check_every: int,
            tol: float, reps: int, trials: int, seed: int = 0,
            backtracking: bool = False) -> dict:
    from ..batch.fista_gram import (
        BatchFISTAConfig,
        fista_gram_batch,
        make_gram_batch,
    )

    m = 2 * n
    B = max(int(hbm_gb * 1e9 / (n * n * 4)) // 128 * 128, 128)
    key = jax.random.PRNGKey(seed)
    A, b, alpha1 = _build_problems(key, B, m, n)
    A.block_until_ready()

    cfg = BatchFISTAConfig(max_iter=max_iter, check_every=check_every,
                           rel_gap_tol=tol, backtracking=backtracking)

    # --- Gram build (einsum + 100-step power iteration), timed alone ------
    build = jax.jit(lambda A, b, a1: make_gram_batch(A, b, a1, 0.0))
    dt_build, gb = _timed(
        lambda: build(A, b, alpha1), lambda g: float(g.L[0]),
        max(reps // 5, 1), trials,
    )

    # --- in-process XLA read ceiling of this exact Q tensor ---------------
    read = jax.jit(lambda Q: jnp.sum(Q))
    dt_read, _ = _timed(lambda: read(gb.Q), float, reps, trials)
    read_gbps = gb.Q.size * 4 / dt_read / 1e9

    # --- one bare einsum matvec (the driver's per-iteration op) ------------
    mv = jax.jit(lambda Q, Y: jnp.einsum(
        "ijb,jb->ib", Q, Y, precision=jax.lax.Precision.HIGHEST
    ))
    Y0 = jnp.ones((n, B), jnp.float32)
    dt_mv, _ = _timed(lambda: mv(gb.Q, Y0), lambda r: float(r[0, 0]),
                      reps, trials)
    mv_gbps = gb.Q.size * 4 / dt_mv / 1e9

    # --- driver certified solve -------------------------------------------
    solve_d = jax.jit(lambda g: fista_gram_batch(g, cfg))
    dt_d, res_d = _timed(
        lambda: solve_d(gb), lambda r: int(jnp.sum(r.converged)),
        reps, trials,
    )
    conv_d = int(jnp.sum(res_d.converged))
    iters_total = int(res_d.n_iters_total)
    checks = -(-iters_total // check_every)
    q_bytes = (iters_total + checks) * gb.Q.size * 4.0
    out = {
        "n": n,
        "m": m,
        "B": B,
        "backtracking": backtracking,
        "q_gb": round(gb.Q.size * 4 / 1e9, 2),
        "build_s": round(dt_build, 4),
        "xla_q_read_gbps": round(read_gbps, 1),
        "xla_matvec_gbps": round(mv_gbps, 1),
        "driver": {
            "solve_s": round(dt_d, 4),
            "converged": conv_d,
            "inst_per_s": round(conv_d / dt_d, 1),
            "iters_total": iters_total,
            "median_iters": int(np.median(np.asarray(res_d.iters))),
            # Under armijo these two are LOWER bounds: every trial round
            # adds one Q matvec that iters_total does not count.
            "eff_q_stream_gbps": round(q_bytes / dt_d / 1e9, 1),
            "pct_of_xla_read": round(
                100.0 * q_bytes / dt_d / 1e9 / read_gbps, 1
            ),
        },
    }

    # --- kernel path on the same Gram: the VMEM-resident burst engine
    # inside its envelope, the Q-streaming engine (round 5) beyond it ------
    from ..kernels.fista_vmem import plan_gram_solve

    try:
        engine, _, _ = plan_gram_solve(n, cfg)
        kernel_ok = True
    except (ValueError, NotImplementedError):
        kernel_ok = False
    if kernel_ok:
        from ..kernels import fista_gram_vmem

        solve_k = lambda g: fista_gram_vmem(g, cfg)
        dt_k, res_k = _timed(
            lambda: solve_k(gb), lambda r: int(jnp.sum(r.converged)),
            reps, trials,
        )
        conv_k = int(jnp.sum(res_k.converged))
        it_k = int(res_k.n_iters_total)
        bursts = -(-it_k // check_every)
        # vmem reads Q once per BURST; the resident engine once per SOLVE;
        # qstream streams it once per iteration plus one certification
        # pass per burst
        if engine == "vmem":
            kq_passes = bursts
        elif engine == "resident":
            kq_passes = 1
        else:
            kq_passes = it_k + bursts
        kq_bytes = kq_passes * gb.Q.size * 4.0
        out["kernel"] = {
            "engine": engine,
            "solve_s": round(dt_k, 4),
            "converged": conv_k,
            "inst_per_s": round(conv_k / dt_k, 1),
            "iters_total": it_k,
            "q_stream_gbps": round(kq_bytes / dt_k / 1e9, 1),
            "speedup_vs_driver": round(dt_d / dt_k, 2),
        }

    # --- routed end-to-end from raw (A, b): build + solve through the
    # public surface. In the resident window this skips the XLA power loop
    # entirely and estimates L in-kernel against the resident block. -------
    from ..batch import solve_lasso_batch

    try:
        dt_r, res_r = _timed(
            lambda: solve_lasso_batch(A, b, alpha1, 0.0, cfg=cfg),
            lambda r: int(jnp.sum(r.converged)), reps, trials,
        )
    except jax.errors.JaxRuntimeError as e:
        # raw A + its feature-major transpose + Q can exceed HBM at big
        # budgets; the arm is additive — record and move on
        out["routed_end_to_end"] = {"skipped": f"oom: {str(e)[:80]}"}
        return out
    conv_r = int(jnp.sum(res_r.converged))
    out["routed_end_to_end"] = {
        "total_s": round(dt_r, 4),
        "converged": conv_r,
        "inst_per_s": round(conv_r / dt_r, 1),
        "vs_build_plus_driver": round((dt_build + dt_d) / dt_r, 2),
    }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, nargs="+", default=[96, 128, 256, 512])
    ap.add_argument("--hbm-gb", type=float, default=2.0,
                    help="HBM budget for the Gram tensor (sizes B per n)")
    ap.add_argument("--max-iter", type=int, default=1000)
    ap.add_argument("--check-every", type=int, default=25)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--backtracking", action="store_true",
                    help="reference-semantics armijo on every arm; past the "
                         "resident window (n > 168) the kernel arm is absent "
                         "by design and the row prices the driver fallback "
                         "(r4 verdict item 1's honest-measurement branch)")
    args = ap.parse_args(argv)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fos_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    for n in args.n:
        print(json.dumps(run_one(
            n, args.hbm_gb, args.max_iter, args.check_every, args.tol,
            args.reps, args.trials, backtracking=args.backtracking,
        )))


if __name__ == "__main__":
    main()
