"""Multi-chip fused lasso pipeline: build kernel + solve kernel per shard.

The single-chip flagship path is two Pallas kernels (kernels/gram_build.py →
kernels/fista_vmem.py). This module runs that whole pipeline **per device**
over the instance axis of a ``jax.sharding.Mesh`` — pure data parallelism
with ZERO inter-chip communication (each device owns complete instances, so
distribution is embarrassing; XLA cannot auto-partition a pallas_call, hence
the explicit ``shard_map``). Instance throughput scales linearly with chips
by construction; the scaling bench (bench/scaling.py) measures the realized
efficiency.

Single entry point::

    res = solve_pipeline_sharded(A, b, alpha1, alpha2, mesh, cfg)

with feature-leading ``A (n, m, B)`` / ``b (m, B)`` sharded (or shardable)
along B.

Round 5: the USER-FACING multi-chip entry is now
``batch.solve_lasso_batch(..., mesh=...)`` — it applies the full
single-chip routing (guard-deferred fallbacks, fused-vs-driver choice,
``backend=`` forcing) inside each shard. This module keeps the hand-wired
two-kernel pipeline for ablation comparison and the restart/greedy
fallback structure.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch.fista_gram import BatchFISTAConfig, BatchResult
from ..parallel.mesh import BATCH_AXIS
from .fista_vmem import LANE, fista_gram_vmem_adaptive
from .gram_build import make_gram_batch_fused


def solve_pipeline_sharded(
    A: Array,  # (n, m, B) feature-leading
    b: Array,  # (m, B)
    alpha1,
    alpha2,
    mesh: Mesh,
    cfg: BatchFISTAConfig = BatchFISTAConfig(max_iter=1000, check_every=25),
    axis: str = BATCH_AXIS,
    b_tile_build: int = 256,
    b_tile_solve: int | None = None,
    interpret: bool = False,
) -> BatchResult:
    """Certified batched lasso over a device mesh: per-shard fused Gram build
    + one-launch adaptive solve. Instances are zero-padded so each device's
    shard is a whole number of lane tiles (padded lanes have Q = c = 0 and
    certify immediately; they are sliced off before returning)."""
    n, m, B_orig = A.shape
    n_dev = mesh.shape[axis]
    dtype = A.dtype
    a1 = jnp.broadcast_to(jnp.asarray(alpha1, dtype), (B_orig,))
    a2 = jnp.broadcast_to(jnp.asarray(alpha2, dtype), (B_orig,))

    quantum = max(b_tile_build, LANE) * n_dev
    pB = (-B_orig) % quantum
    if pB:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, pB)))
        b = jnp.pad(b, ((0, 0), (0, pB)))
        a1 = jnp.pad(a1, (0, pB))
        a2 = jnp.pad(a2, (0, pB))

    # Prefer the single-launch fused kernel per shard (round 4: Q never in
    # HBM, one launch per device); configs it rejects (restart/greedy) run
    # the two-kernel build + adaptive-solve path as before.
    from .fused_solve import _check_fused_cfg, auto_tiles_fused, solve_lasso_fused

    try:
        _check_fused_cfg(cfg)
        auto_tiles_fused(n, m)
        single_launch = True
    except (NotImplementedError, ValueError):
        single_launch = False

    def local(A_blk, b_blk, a1_blk, a2_blk):
        if single_launch:
            res = solve_lasso_fused(
                A_blk, b_blk, a1_blk, a2_blk, cfg=cfg, interpret=interpret
            )
        else:
            gb = make_gram_batch_fused(
                A_blk, b_blk, a1_blk, a2_blk,
                b_tile=b_tile_build, interpret=interpret,
            )
            res = fista_gram_vmem_adaptive(
                gb, cfg, b_tile=b_tile_solve, interpret=interpret
            )
        return res.x, res.iters, res.rel_gap, res.converged, res.failed

    vec = P(axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis), vec, vec),
        out_specs=(vec, vec, vec, vec, vec),
        # the pipeline is purely local (no collectives); pallas_call outputs
        # carry no varying-axes info, so skip the vma check
        check_vma=False,
    )
    dev = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    x, iters, gap, converged, failed = fn(
        dev(A, P(None, None, axis)), dev(b, P(None, axis)), dev(a1, vec), dev(a2, vec)
    )
    sl = slice(0, B_orig)
    return BatchResult(
        x=x[sl],
        iters=iters[sl],
        rel_gap=gap[sl],
        n_iters_total=jnp.max(iters[sl]),
        converged=converged[sl],
        failed=failed[sl],
    )
