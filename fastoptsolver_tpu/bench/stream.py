"""No-math pure-stream ceiling: what the fused kernel's grid could do if it
did nothing.

Round 4 measured (RESULTS.md) that a Pallas kernel with the fused solver's
exact block grid, reading every A/b brick and computing NOTHING, streams at
~515 GB/s on a day when the 819 GB/s paper peak was unreachable by any
kernel — so ``roofline_pct`` against the paper constant is cross-day tunnel
weather, not code quality (r4 verdict weak #1). This module packages that
scratch methodology: bench.py runs it IN-PROCESS before the timed solves
and reports ``pct_of_achievable`` against the same-process ceiling
alongside the paper-peak number.

The kernel mirrors kernels/fused_solve.py's input structure exactly — same
(B/b_tile, ⌈m/m_tile⌉) grid, same (n, m_tile, b_tile) A-brick and
(m_tile, b_tile) b-brick BlockSpecs, same double-buffered Pallas pipeline —
with the body reduced to one (1, BT) accumulate per brick (enough to keep
the DMAs observable, ~0.1% of the solver's arithmetic).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stream_kernel(A_ref, b_ref, o_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # touch both bricks (one sublane row each) so the streamed blocks are
    # live; everything else is pure DMA
    o_ref[:] = o_ref[:] + A_ref[0, 0:1, :] + b_ref[0:1, :]


@functools.partial(jax.jit, static_argnames=("b_tile", "m_tile", "interpret"))
def _stream_pass(A, b, *, b_tile: int, m_tile: int, interpret: bool = False):
    n, m, B = A.shape
    return pl.pallas_call(
        _stream_kernel,
        grid=(B // b_tile, pl.cdiv(m, m_tile)),
        in_specs=[
            pl.BlockSpec((n, m_tile, b_tile), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, b_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), A.dtype),
        interpret=interpret,
    )(A, b)


def measure_stream_ceiling(A, b, b_tile: int | None = None,
                           m_tile: int | None = None, reps: int = 25,
                           trials: int = 3, interpret: bool = False) -> dict:
    """Measured GB/s of the no-math streaming pass over ``A (n, m, B)`` /
    ``b (m, B)`` with the fused solver's tile structure, this process, this
    day. Timing follows bench.py's tunnel methodology (dispatch ``reps``
    back-to-back, one terminal value fetch, min over ``trials``)."""
    n, m, B = A.shape
    if b_tile is None or m_tile is None:
        from ..kernels.fused_solve import auto_tiles_fused, auto_tiles_overlap

        try:
            auto_bt, auto_mt = auto_tiles_overlap(n, m)
        except ValueError:
            auto_bt, auto_mt = auto_tiles_fused(n, m)
        b_tile = b_tile or min(auto_bt, B)
        m_tile = m_tile or min(auto_mt, m)
    out = _stream_pass(A, b, b_tile=b_tile, m_tile=m_tile,
                       interpret=interpret)  # warm/compile
    out.block_until_ready()
    totals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _stream_pass(A, b, b_tile=b_tile, m_tile=m_tile,
                               interpret=interpret)
        float(out[0, 0])  # terminal value fetch forces the stream
        totals.append(time.perf_counter() - t0)
    dt = min(totals) / reps
    gbytes = (n * m + m) * B * A.dtype.itemsize / 1e9
    return {
        "stream_ceiling_gbps": gbytes / dt,
        "stream_pass_s": dt,
        "b_tile": b_tile,
        "m_tile": m_tile,
    }
