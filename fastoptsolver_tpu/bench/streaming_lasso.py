"""Beyond-HBM lasso benchmark: one-pass streamed Gram + on-device solve.

Demonstrates the north-star scale (SURVEY.md §5: A up to 1e6×1e4, 40 GB f32 —
larger than one chip's 16 GB HBM) on a single chip: host-generated row chunks
stream through the device exactly once, reduced to Q = AᵀA / c = Aᵀb on the
MXU (problems/streaming.py), then the certified FISTA runs entirely on-device
at O(n²)/iteration (solvers/gram_dense.py). A is never resident — peak HBM is
Q + ``prefetch`` chunks. Reports the streamed volume, effective host→device GB/s during
the pass, and solve iterations/s.

Per-iteration re-streaming (the CUDA-style chunked matvec) would pay the host
link every iteration (~1 GB/s here over the tunnel; ~tens of GB/s PCIe on a
real host — both ≪ 800 GB/s HBM); the one-pass reduction pays it once.

Default: m=2²¹, n=1280 → A = 10.7 GB streamed, Q = 6.6 MB solved.
Beyond-HBM demo: --m 2097152 --n 2560 (21.5 GB > 16 GB HBM).
North-star shape: --m 1000000 --n 10000 (40 GB; ~45 s of streaming at tunnel
bandwidth, dominated by generation on this 2-vCPU host).

CLI: python -m fastoptsolver_tpu.bench.streaming_lasso [--m M] [--n N]
     [--chunk-rows R] [--tol 1e-6]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def run(m: int, n: int, chunk_rows_n: int, tol: float, seed: int = 0) -> dict:
    from concurrent.futures import ThreadPoolExecutor

    from ..problems import stream_gram
    from ..solvers import DenseGramConfig, fista_gram_dense

    n_chunks = -(-m // chunk_rows_n)
    x_true = np.zeros(n, np.float32)
    rng0 = np.random.default_rng(seed)
    idx = rng0.choice(n, size=max(1, n // 20), replace=False)
    x_true[idx] = (rng0.normal(size=idx.size) * 3.0).astype(np.float32)
    scale = np.float32(1.0 / np.sqrt(n))

    def make_chunk(i: int):
        rows = min(chunk_rows_n, m - i * chunk_rows_n)
        # SFC64: fastest numpy bit generator; chunk-seeded → reproducible
        rng = np.random.Generator(np.random.SFC64(seed * 1_000_003 + i))
        A_i = rng.standard_normal((rows, n), dtype=np.float32)
        A_i *= scale
        b_i = A_i @ x_true + 0.1 * rng.standard_normal(rows, dtype=np.float32)
        return A_i, b_i

    # Pre-generate into host RAM (UNTIMED, threaded — same convention as
    # bench.py, which excludes data generation; a real deployment reads A
    # from storage). Host RAM holds A; HBM never does.
    with ThreadPoolExecutor(max_workers=2) as ex:
        chunks = list(ex.map(make_chunk, range(n_chunks)))

    # warm the accumulate program (compile outside the timed pass)
    _ = jax.block_until_ready(stream_gram(chunks[:1], n=n))

    t0 = time.perf_counter()
    gram = stream_gram(iter(chunks), n=n)
    gram.Q.block_until_ready()
    stream_s = time.perf_counter() - t0

    a1 = 0.1 * float(jnp.max(jnp.abs(gram.c)))
    cfg = DenseGramConfig(max_iter=3000, check_every=100, rel_gap_tol=tol)
    res = fista_gram_dense(gram, a1, 0.0, cfg)
    nnz = float(jnp.mean(jnp.abs(res.x) > 0))  # compile + converge
    t0 = time.perf_counter()
    res = fista_gram_dense(gram, a1, 0.0, cfg)
    iters = int(res.iters)  # value fetch forces completion (tunnel semantics)
    solve_s = time.perf_counter() - t0

    a_bytes = m * n * 4.0
    # stream_gbps is host→device link-bound (~1 GB/s over this tunnel; tens
    # of GB/s PCIe on a co-located host) — the one-pass design pays it once,
    # vs once PER ITERATION for a chunked-matvec design
    return {
        "m": m,
        "n": n,
        "a_gb": round(a_bytes / 1e9, 2),
        "exceeds_hbm": a_bytes > 16e9,
        "chunks": n_chunks,
        "stream_s": round(stream_s, 2),
        "stream_gbps": round(a_bytes / stream_s / 1e9, 2),
        "solve_s": round(solve_s, 3),
        "solve_iters": iters,
        "iters_per_s": round(iters / solve_s, 1),
        "rel_gap": float(res.rel_gap),
        "converged": bool(res.converged),
        "nnz_frac": round(nnz, 4),
        "device": str(jax.devices()[0]),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--m", type=int, default=2**21)
    ap.add_argument("--n", type=int, default=1280)
    ap.add_argument("--chunk-rows", type=int, default=65536)
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args(argv)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fos_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(json.dumps(run(args.m, args.n, args.chunk_rows, args.tol)))


if __name__ == "__main__":
    main()
