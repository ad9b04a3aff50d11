"""Pallas TPU kernel: fused Gram build + Lipschitz estimation, one pass over A.

The batched-lasso pipeline's precompute stage — ``Q = AᵀA, c = Aᵀb,
btb = bᵀb`` plus the per-instance power-iteration Lipschitz constant — is
where most of the wall-clock goes at production batch sizes: the XLA path
(batch/fista_gram.py:make_gram_batch) reads the (B, m, n) design tensor once
for ``Q``, AGAIN for ``c`` (two separate dot_generals XLA does not fuse), and
then runs the power iteration as 40 separate HBM passes over ``Q``. Measured
on a v5e at B=64k, m=1000: ~12.6 ms of a 16.4 ms total.

This kernel does the whole stage in ONE streaming pass:

- input is the framework's native batched layout, **feature-leading**
  ``A (n, m, B)`` and ``b (m, B)`` — instances on lanes, rows on sublanes,
  features on the (untiled) leading axis, so ``A_ref[i]`` is a free plane
  select inside the kernel;
- per (m, B_TILE) tile: the 21 = (n+1)(n+2)/2 distinct entries of the
  symmetric augmented Gram ``[A|b]ᵀ[A|b]`` (exploiting symmetry — the XLA
  einsum computes all 36) as VPU multiply-reduce over the resident tile;
- the power iteration runs **in-kernel** against the register-resident Gram
  (40 × n_pad (8, B_TILE)-wide FMAs — microseconds, vs. milliseconds of HBM
  re-reads), started from ``c`` (deterministic, generically non-orthogonal
  to the dominant eigenvector);
- HBM traffic: A+b read exactly once, outputs O(n²·B) ≪ input.

Feeds kernels/fista_vmem.py directly (same feature-major GramBatch layout).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..batch.fista_gram import GramBatch

LANE = 128
SUBLANE = 8


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _gram_tile_kernel(A_ref, b_ref, Q_ref, c_ref, btb_ref, L_ref, *,
                      n: int, n_pad: int, pl_iters: int, split_k: int = 1):
    """One (m, B_TILE) tile: symmetric Gram + c + btb + in-kernel power
    iteration. ``A_ref``: (n, m, BT); ``b_ref``: (m, BT).

    ``split_k > 1`` folds the m-axis ``split_k``-ways BEFORE the tree
    reduction: ``Σ_m a·b = Σ_rows (a₀b₀ + a₁b₁ + …)`` where the k−1 adds
    chain onto fresh products — an FMA-shaped expression. The plain
    ``sum(a*b)`` form costs ~2 VPU ops/element (multiply + tree-add, the
    measured binding resource of the whole build stage); the folded form
    approaches ~1.25 ops/element at k=8 if Mosaic fuses multiply-add.
    Requires ``m % split_k == 0`` (caller falls back to 1 otherwise)."""
    cols = [A_ref[i] for i in range(n)] + [b_ref[:]]  # each (m, BT)
    na = n + 1
    m = cols[0].shape[0]

    if split_k > 1:
        part = m // split_k

        def pair_sum(a, b):
            acc = a[:part] * b[:part]
            for k in range(1, split_k):
                acc = acc + a[k * part:(k + 1) * part] * b[k * part:(k + 1) * part]
            return jnp.sum(acc, axis=0, keepdims=True)  # (1, BT)
    else:
        def pair_sum(a, b):
            return jnp.sum(a * b, axis=0, keepdims=True)  # (1, BT)

    # 21 distinct entries of the augmented Gram (VPU multiply + m-reduction).
    G = {}
    for i in range(na):
        for j in range(i, na):
            G[(i, j)] = pair_sum(cols[i], cols[j])

    def g(i: int, j: int) -> Array:
        return G[(min(i, j), max(i, j))]

    zero = jnp.zeros_like(G[(0, 0)])
    # Q rows as (n_pad, BT) planes (symmetric; padded rows/cols zero).
    rows = [
        jnp.concatenate(
            [g(i, j) if (i < n and j < n) else zero for j in range(n_pad)], axis=0
        )
        if i < n
        else jnp.zeros((n_pad,) + zero.shape[1:], zero.dtype)
        for i in range(n_pad)
    ]
    for i in range(n_pad):
        Q_ref[i] = rows[i]
    c_vec = jnp.concatenate(
        [g(i, n) if i < n else zero for i in range(n_pad)], axis=0
    )  # (n_pad, BT)
    c_ref[:] = c_vec
    btb_ref[:] = g(n, n)

    # Power iteration on the register-resident Gram: v0 = c (its padded rows
    # are already zero, so the iteration stays in the genuine n-subspace).
    def norm(v):
        return jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))

    v0 = c_vec / jnp.maximum(norm(c_vec), 1e-30)

    def matvec(v):
        # unroll over the TRUE feature count: rows[j] for j >= n are zero
        # planes (padding) — same 37%-of-FMAs saving as the solve kernel's
        # n_true unroll (kernels/fista_vmem.py), v stays in the n-subspace
        out = jnp.zeros_like(v)
        for j in range(n):
            out += rows[j] * v[j : j + 1, :]
        return out

    def step(_, carry):
        v, _ = carry
        w = matvec(v)
        L = norm(w)
        return w / jnp.maximum(L, 1e-30), L

    _, L = jax.lax.fori_loop(
        0, pl_iters, step, (v0, jnp.zeros_like(btb_ref[:]))
    )
    L_ref[:] = L


@functools.partial(
    jax.jit, static_argnames=("pl_iters", "b_tile", "interpret", "pB",
                              "split_k")
)
def _build(A, b, *, pl_iters, b_tile, interpret, pB, split_k=1):
    n, m, B_orig = A.shape
    if pB:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, pB)))
        b = jnp.pad(b, ((0, 0), (0, pB)))
    B = B_orig + pB
    n_pad = _round_up(max(n, SUBLANE), SUBLANE)
    kern = functools.partial(
        _gram_tile_kernel, n=n, n_pad=n_pad, pl_iters=pl_iters,
        split_k=split_k if m % split_k == 0 else 1,
    )
    grid = (B // b_tile,)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, m, b_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, b_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_pad, n_pad, b_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, b_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n_pad, B), A.dtype),
            jax.ShapeDtypeStruct((n_pad, B), A.dtype),
            jax.ShapeDtypeStruct((1, B), A.dtype),
            jax.ShapeDtypeStruct((1, B), A.dtype),
        ],
        interpret=interpret,
    )(A, b)
    Q, c, btb, L = out
    sl = slice(0, B_orig)
    return Q[:n, :n, sl], c[:n, sl], btb[0, sl], L[0, sl]


def make_gram_batch_fused(
    A: Array,  # (n, m, B) feature-leading
    b: Array,  # (m, B)
    alpha1,
    alpha2,
    pl_iters: int = 32,
    l_safety: float = 1.02,
    b_tile: int = 256,
    interpret: bool = False,
    split_k: int = 4,
) -> GramBatch:
    """Fused-kernel equivalent of ``batch.make_gram_batch`` for feature-leading
    inputs. ``l_safety`` scales the power-iteration estimate up slightly: an
    *under*-estimated L makes the FISTA step too long (divergence risk, lanes
    quarantined), an over-estimate just costs a few extra certified
    iterations — asymmetric risk, so lean high.

    Defaults are the measured-best headline configuration (RESULTS.md
    interleaved ablations): ``pl_iters=32`` (v0=c warm start + the 1.02 L
    safety margin keeps every instance certified at a quarter of the
    original 96-step depth), ``split_k=4`` (FMA-folded m-reduction, the
    build stage's binding VPU resource), ``b_tile=256`` (128 is ~4× slower,
    320+ exceeds the double-buffered VMEM budget) — so the routed public
    surface (batch/api.py) and the hand-wired bench measure the same code."""
    n, m, B = A.shape
    if n + 1 > SUBLANE:
        raise ValueError(
            f"fused build supports n <= {SUBLANE - 1} features (got {n}); "
            "use batch.make_gram_batch for wider problems"
        )
    if split_k < 1:
        raise ValueError(f"split_k must be >= 1 (got {split_k})")
    pB = _round_up(B, b_tile) - B
    Q, c, btb, L = _build(
        A, b, pl_iters=pl_iters, b_tile=b_tile, interpret=interpret, pB=pB,
        split_k=split_k,
    )
    dtype = A.dtype
    a1 = jnp.broadcast_to(jnp.asarray(alpha1, dtype), (B,))
    a2 = jnp.broadcast_to(jnp.asarray(alpha2, dtype), (B,))
    # guard degenerate instances (c = 0 ⇒ L estimate 0 ⇒ x* = 0 anyway)
    L = jnp.where(L > 0.0, l_safety * L, 1.0) + a2
    return GramBatch(Q=Q, c=c, btb=btb, alpha1=a1, alpha2=a2, L=L)
