import sys, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fos_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import bench as B
from fastoptsolver_tpu.batch.fista_gram import BatchFISTAConfig
from fastoptsolver_tpu.kernels import fista_gram_vmem, make_gram_batch_fused

mode, ce = sys.argv[1], int(sys.argv[2])
batch, m = 65536, 1000
A, b, alpha1 = B._build_problems(jax.random.PRNGKey(0), batch, m)
A.block_until_ready(); print("built", flush=True)
kw = dict(momentum="delta", delta=10.0) if mode == "delta" else {}
cfg = BatchFISTAConfig(max_iter=1000, check_every=ce, rel_gap_tol=1e-6, **kw)
solve = lambda: fista_gram_vmem(make_gram_batch_fused(A, b, alpha1, 0.0), cfg)
res = solve(); res.x.block_until_ready(); print("compiled", flush=True)
reps, trials = 25, 3
totals = []
for _ in range(trials):
    t0 = time.perf_counter()
    for _ in range(reps):
        res = solve()
    n_conv = int(jnp.sum(res.converged))
    totals.append(time.perf_counter() - t0)
dt = min(totals) / reps
print(f"{mode}/c{ce}: {n_conv}/{batch} lockstep={int(res.n_iters_total)} dt={dt*1e3:.2f}ms inst/s={n_conv/dt/1e6:.2f}M", flush=True)
