"""Large dense-matrix lasso benchmark (single chip): matvec-bound FISTA.

The complement of bench.py's many-small-instances path: ONE large design
matrix (default 131072×2048, 1 GB f32), solved by dense FISTA — each
iteration is the reference's two matvecs ``A@y`` and ``Aᵀr``
(iterative_solvers.py:173) as MXU matmuls streaming A from HBM. Reports
iterations/s plus achieved FLOP/s and HBM bandwidth against the streaming
roofline (A read twice per iteration), which is the honest
"speed-of-light" measure for this shape (BASELINE.md: prox-grad step should
be memory-bandwidth-bound).

The same problem sharded over a mesh is the multi-chip config
(BASELINE.json config 4); on this one-chip environment run
``bench/scaling.py --mode model`` for the sharded-path measurement.

CLI:  python -m fastoptsolver_tpu.bench.large_lasso [--m 131072] [--n 2048]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def run(m: int, n: int, iters: int, alpha1_scale: float = 0.1, seed: int = 0):
    from ..problems import LeastSquares
    from ..solvers import FISTAConfig, fista

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)

    @jax.jit
    def build():
        A = jax.random.normal(k1, (m, n), jnp.float32) / np.sqrt(n)
        x_true = jnp.where(
            jax.random.uniform(k2, (n,)) < 0.05,
            jax.random.normal(k3, (n,), jnp.float32) * 3.0,
            0.0,
        )
        b = A @ x_true + 0.1 * jax.random.normal(key, (m,), jnp.float32)
        alpha1 = alpha1_scale * jnp.max(jnp.abs(A.T @ b))
        return A, b, alpha1

    A, b, alpha1 = jax.block_until_ready(build())
    problem = LeastSquares(A=A, b=b, alpha1=alpha1, alpha2=jnp.float32(0.0))
    cfg = FISTAConfig(max_iter=iters)
    # rows/n normalization puts λ_max(AᵀA) ≈ (√m+√n)²/n — power-iterate anyway
    solve = jax.jit(lambda p, k: fista(p, cfg, key=k).x)

    x = jax.block_until_ready(solve(problem, key))  # compile + L estimation
    # Force completion with a VALUE fetch, not block_until_ready: before the
    # process's first device→host transfer the tunnel's block_until_ready
    # returns early (see bench.py's methodology note). The one ~36 ms fetch
    # round-trip is included in dt — conservative at ~1 s solve times.
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        x = solve(problem, key)
        float(jnp.sum(x))
        best = min(best, time.perf_counter() - t0)
    dt = best

    # L estimation (≤100 power iters, 2 matvecs each) is included in dt;
    # count it toward the matvec totals for honest bandwidth accounting.
    total_iters = iters
    matvecs = 2 * (total_iters + 100)
    flops = matvecs * 2.0 * m * n
    bytes_streamed = matvecs * (m * n * 4.0)
    return {
        "m": m,
        "n": n,
        "iters": iters,
        "seconds": round(dt, 4),
        "iters_per_s": round(iters / dt, 1),
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "achieved_hbm_gbps": round(bytes_streamed / dt / 1e9, 1),
        "nnz_frac": round(float(jnp.mean(jnp.abs(x) > 0)), 4),
        "device": str(jax.devices()[0]),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--m", type=int, default=131072)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args(argv)
    print(json.dumps(run(args.m, args.n, args.iters)))


if __name__ == "__main__":
    main()
