"""Sharded problem definitions: distribution composes with the solvers.

Because every solver in this framework is generic over the problem protocol
(problems/base.py), distribution is *just another problem type*:
:class:`DistributedLeastSquares` implements ``smooth_value_and_grad`` with the
shard_map/psum matvecs from parallel/matvec.py, and the unmodified
``fista`` / ``ista`` / ``lbfgs`` loops run on top — convergence scalars are
replicated values, so stopping logic needs no extra collectives. The same
solver code therefore runs single-chip, row-sharded, or column-sharded; the
layout is chosen at problem construction.

``shard_gram_batch`` covers the other scaling axis: a GramBatch's instance
dimension laid out across the ``batch`` mesh axis (pure data parallelism —
the only cross-chip traffic is the ``any(not done)`` reduction XLA inserts).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch.fista_gram import GramBatch
from ..ops.prox import soft_threshold
from ..problems.base import fold_alphas
from .matvec import (
    col_sharded_matvec,
    col_sharded_normal_grad,
    row_sharded_value_and_grad,
    row_sharded_normal_grad,
)
from .mesh import BATCH_AXIS, MODEL_AXIS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistributedLeastSquares:
    """Row- or column-sharded ``½‖Ax−b‖² + ½α₂‖x‖² + α₁‖x‖₁``.

    layout="row": A ~ P(model, None), b ~ P(model), x replicated;
    layout="col": A ~ P(None, model), b replicated, x ~ P(model).
    """

    A: Array
    b: Array
    alpha1: Array
    alpha2: Array
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(default=MODEL_AXIS, metadata=dict(static=True))
    layout: str = dataclasses.field(default="row", metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        A,
        b,
        mesh: Mesh,
        reg_type: str = "lasso",
        alpha1: float = 0.0,
        alpha2: float = 0.0,
        axis: str = MODEL_AXIS,
        layout: str = "row",
        dtype=jnp.float32,
    ) -> "DistributedLeastSquares":
        if layout not in ("row", "col"):
            raise ValueError(f"layout must be 'row' or 'col', got {layout!r}")
        a1, a2, _ = fold_alphas(reg_type, alpha1, alpha2)
        A = jnp.asarray(A, dtype)
        b = jnp.asarray(b, dtype)
        if layout == "row":
            A = jax.device_put(A, NamedSharding(mesh, P(axis, None)))
            b = jax.device_put(b, NamedSharding(mesh, P(axis)))
        else:
            A = jax.device_put(A, NamedSharding(mesh, P(None, axis)))
            b = jax.device_put(b, NamedSharding(mesh, P()))
        return cls(
            A=A,
            b=b,
            alpha1=jnp.asarray(a1, dtype),
            alpha2=jnp.asarray(a2, dtype),
            mesh=mesh,
            axis=axis,
            layout=layout,
        )

    @property
    def dim(self) -> int:
        return self.A.shape[-1]

    # -- problem protocol ---------------------------------------------------

    def smooth_grad(self, x: Array) -> Array:
        if self.layout == "row":
            g = row_sharded_normal_grad(self.mesh, self.A, self.b, x, self.axis)
        else:
            g = col_sharded_normal_grad(self.mesh, self.A, self.b, x, self.axis)
        return g + self.alpha2 * x

    def smooth_value(self, x: Array) -> Array:
        if self.layout == "row":
            val, _ = row_sharded_value_and_grad(self.mesh, self.A, self.b, x, self.axis)
        else:
            r = col_sharded_matvec(self.mesh, self.A, x, self.axis) - self.b
            val = 0.5 * (r @ r)
        return val + 0.5 * self.alpha2 * (x @ x)

    def smooth_value_and_grad(self, x: Array) -> tuple[Array, Array]:
        if self.layout == "row":
            val, g = row_sharded_value_and_grad(self.mesh, self.A, self.b, x, self.axis)
        else:
            r = col_sharded_matvec(self.mesh, self.A, x, self.axis) - self.b
            val = 0.5 * (r @ r)
            g = col_sharded_rmatvec_cached(self.mesh, self.A, r, self.axis)
        return val + 0.5 * self.alpha2 * (x @ x), g + self.alpha2 * x

    def prox(self, v: Array, tau: Array) -> Array:
        return soft_threshold(v, tau * self.alpha1)

    def nonsmooth_value(self, x: Array) -> Array:
        return self.alpha1 * jnp.sum(jnp.abs(x))

    def objective(self, x: Array) -> Array:
        return self.smooth_value(x) + self.nonsmooth_value(x)

    def x0(self) -> Array:
        z = jnp.zeros(self.dim, dtype=self.A.dtype)
        if self.layout == "col":
            return jax.device_put(z, NamedSharding(self.mesh, P(self.axis)))
        return jax.device_put(z, NamedSharding(self.mesh, P()))

    def normal_matvec(self, v: Array) -> Array:
        """AᵀAv for the distributed power iteration (ops/lipschitz.py)."""
        if self.layout == "row":
            from .matvec import row_sharded_matvec, row_sharded_rmatvec

            return row_sharded_rmatvec(
                self.mesh, self.A, row_sharded_matvec(self.mesh, self.A, v, self.axis), self.axis
            )
        from .matvec import col_sharded_rmatvec

        return col_sharded_rmatvec(
            self.mesh, self.A, col_sharded_matvec(self.mesh, self.A, v, self.axis), self.axis
        )


def col_sharded_rmatvec_cached(mesh, A, r, axis):
    from .matvec import col_sharded_rmatvec

    return col_sharded_rmatvec(mesh, A, r, axis)


def shard_gram_batch(gb: GramBatch, mesh: Mesh, axis: str = BATCH_AXIS) -> GramBatch:
    """Lay a GramBatch's instance axis across the mesh's batch axis (feature-
    major layout keeps B as the trailing dim of every leaf)."""
    return GramBatch(
        Q=jax.device_put(gb.Q, NamedSharding(mesh, P(None, None, axis))),
        c=jax.device_put(gb.c, NamedSharding(mesh, P(None, axis))),
        btb=jax.device_put(gb.btb, NamedSharding(mesh, P(axis))),
        alpha1=jax.device_put(gb.alpha1, NamedSharding(mesh, P(axis))),
        alpha2=jax.device_put(gb.alpha2, NamedSharding(mesh, P(axis))),
        L=jax.device_put(gb.L, NamedSharding(mesh, P(axis))),
    )
