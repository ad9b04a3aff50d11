"""Headline benchmark: batched lasso instances solved to 1e-6 relative gap
per second on one chip (BASELINE.json north star; target ≥ 1e4/s).

Generates a large batch of Boston-like lasso scenarios on device
(problems/generators.py), precomputes the Gram form, solves all instances with
the batched FISTA path, certifies convergence with the per-instance duality
gap, and reports instances/s over the full pipeline *excluding* data
generation but *including* the Gram precompute, Lipschitz estimation, and the
solve itself (i.e. everything a user must run to go from (A, b, α) to
certified solutions).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "instances/s", "vs_baseline": N/1e4}
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


import functools


@functools.partial(jax.jit, static_argnames=("batch", "m"))
def _build_problems(key, batch: int, m: int):
    """Scenario batch with per-instance noise/correlations spanning the
    reference grid, standardized columns, alpha1 = 0.1·‖Aᵀb‖∞ per instance.
    Emits the framework's native feature-leading layout (n, m, B) directly —
    no transpose pass over the GB-scale design tensor. One compiled program —
    eager op-by-op dispatch over the TPU tunnel costs ~35 ms/op and made this
    stage look minutes-slow."""
    from fastoptsolver_tpu.problems import generate_scenario_batch_fm

    knoise, kr1, kr2, kgen = jax.random.split(key, 4)
    noise = jax.random.choice(knoise, jnp.asarray([0.5, 1.0, 2.0, 5.0]), (batch,))
    rho1 = jax.random.choice(kr1, jnp.asarray([0.5, 0.8]), (batch,))
    rho2 = jax.random.choice(kr2, jnp.asarray([0.7, 0.9]), (batch,))
    A, b, _ = generate_scenario_batch_fm(
        kgen, batch, m=m, noise_std=noise, rho1=rho1, rho2=rho2, dtype=jnp.float32
    )
    # standardize features per instance (benchmark-standard lasso setup)
    mu = A.mean(axis=1, keepdims=True)
    sd = A.std(axis=1, keepdims=True)
    A = (A - mu) / sd
    alpha1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", A, b)), axis=0)
    return A, b, alpha1


def _make_solver(max_iter: int, tol: float):
    """Full pipeline, two Pallas kernels in one jit per call: the fused
    Gram-build kernel (one streaming pass over A computing the symmetric
    Gram + c + bᵀb with the Lipschitz power iteration in-kernel —
    kernels/gram_build.py) feeding the VMEM-resident FISTA solve with
    on-device gap certification (kernels/fista_vmem.py). No host round-trips
    until the final result fetch."""
    from fastoptsolver_tpu.batch.fista_gram import BatchFISTAConfig
    from fastoptsolver_tpu.kernels import fista_gram_vmem, make_gram_batch_fused

    cfg = BatchFISTAConfig(max_iter=max_iter, check_every=25, rel_gap_tol=tol)

    def solve(A, b, alpha1):
        # pl_iters=32: interleaved A/B ablation (bench/ablate.py, RESULTS.md)
        # shows 96→32 power iterations saves ~2% wall-clock with every
        # instance still certified (v0=c warm start + 1.02 L safety margin).
        # split_k=4: fold the m-reduction 4-ways into FMA-shaped chains
        # before the tree sum — the build stage's multiply+reduce is the
        # measured binding resource; every split ∈ {2,4,5,8} beat split=1 in
        # interleaved A/B (best observed −36%; see RESULTS.md round 3).
        return fista_gram_vmem(
            make_gram_batch_fused(A, b, alpha1, 0.0, pl_iters=32, split_k=4),
            cfg,
        )

    return solve, cfg


def main():
    # Persistent compile cache: bench programs are large (Pallas kernel +
    # while_loop certification); re-runs skip the multi-minute compile.
    jax.config.update("jax_compilation_cache_dir", "/tmp/fos_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    batch = int(__import__("os").environ.get("BENCH_BATCH", 65536))
    m = 1000
    max_iter, tol = 1000, 1e-6

    key = jax.random.PRNGKey(0)
    A, b, alpha1 = _build_problems(key, batch, m)
    A.block_until_ready()

    solve, cfg = _make_solver(max_iter, tol)

    # warmup/compile
    res = solve(A, b, alpha1)
    res.x.block_until_ready()

    # Timing methodology (the axon tunnel makes naive loops lie in BOTH
    # directions, verified by experiment):
    #  - block_until_ready() after each rep *before* any device→host value
    #    transfer returns early (per-solve ≈2 ms at batch 64k — physically
    #    impossible: the Gram build alone must read 1.3 GB of A);
    #  - after the first value transfer every sync pays a ~36 ms round-trip,
    #    taxing per-rep timing with a constant that vanishes on co-located
    #    hosts.
    # So: dispatch `reps` back-to-back solves (the single TPU core serializes
    # them — total time grows linearly in reps, which rules out elision) and
    # force completion of the whole stream with ONE terminal value fetch.
    # total/reps slightly overstates per-solve cost (it amortizes the one
    # round-trip) — conservative. Trials are repeated and the minimum taken
    # to shed transient tunnel stalls.
    reps, trials = 25, 3
    totals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            res = solve(A, b, alpha1)
        n_conv = int(jnp.sum(res.converged))
        totals.append(time.perf_counter() - t0)
    dt = min(totals) / reps

    value = n_conv / dt

    # HBM-traffic roofline (BASELINE.md "memory-bandwidth-bound" row): the
    # pipeline reads A and b exactly once (fused Gram-build kernel), then the
    # solve kernel streams Q + state per certification burst. n=5 pads to
    # n_pad=8 sublanes.
    PEAK_HBM_GBPS = 819.0  # TPU v5e (v5 lite) HBM2 peak
    n = A.shape[0]  # feature-leading (n, m, B) layout
    n_pad = -(-max(n, 8) // 8) * 8  # 8-sublane padding (kernels/fista_vmem.py)
    bursts = max(1, int(res.n_iters_total) // cfg.check_every)
    bytes_build = (n * m + m) * batch * 4
    bytes_solve = bursts * (n_pad * n_pad + 6 * n_pad + 8) * batch * 4
    gbps = (bytes_build + bytes_solve) / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "batched_lasso_instances_solved_to_1e-6_rel_gap_per_s",
                "value": round(value, 1),
                "unit": "instances/s",
                "vs_baseline": round(value / 1e4, 3),
                "detail": {
                    "batch": batch,
                    "m": m,
                    "converged": n_conv,
                    "lockstep_iters": int(res.n_iters_total),
                    "median_iters": int(np.median(np.asarray(res.iters))),
                    "solve_s": round(dt, 4),
                    "achieved_hbm_gbps": round(gbps, 1),
                    "roofline_pct": round(100.0 * gbps / PEAK_HBM_GBPS, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
