"""Cyclic coordinate descent for L1/elastic-net least squares (Gram form).

Not present in the reference — added as the framework's machine-precision
oracle (SURVEY.md §4: the convergence test strategy needs an independent
solver that reaches the true optimum, e.g. "coordinate descent we write
ourselves") and as a solver family in its own right: for small-n problems CD
converges linearly with a much better constant than first-order methods and
certifies f* for the whole test suite.

Each coordinate update in Gram form is closed-form:

    x_j ← soft_threshold(c_j − Σ_{k≠j} Q_jk x_k, α₁) / (Q_jj + α₂)

A sweep is a ``lax.fori_loop`` over coordinates (sequential by nature — CD's
convergence depends on using fresh values); sweeps iterate under
``lax.while_loop`` until the largest coordinate move falls below ``tol``.
Jittable and vmappable like every other solver here.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.prox import soft_threshold
from .common import Metrics, SolveResult


@dataclasses.dataclass(frozen=True)
class CDConfig:
    max_sweeps: int = 1000
    tol: float = 1e-12  # stop when max coordinate move < tol


class CDState(NamedTuple):
    x: Array
    max_move: Array
    k: Array


def cd_sweep(Q: Array, c: Array, alpha1: Array, alpha2: Array, x: Array) -> Array:
    """One cyclic sweep; returns the updated iterate."""
    n = x.shape[0]

    def update(j, x):
        qj = Q[j]
        xj_old = x[j]
        # partial residual: c_j − Σ_{k≠j} Q_jk x_k  =  c_j − (Q_j·x) + Q_jj x_j
        rho = c[j] - qj @ x + qj[j] * xj_old
        xj = soft_threshold(rho, alpha1) / (qj[j] + alpha2)
        return x.at[j].set(xj)

    return jax.lax.fori_loop(0, n, update, x)


def cd(
    problem,
    config: CDConfig = CDConfig(),
    x0: Array | None = None,
) -> SolveResult:
    """Solve a Gram-form (or dense — converted) least-squares problem to
    machine precision by cyclic CD."""
    gram = problem if hasattr(problem, "Q") else problem.to_gram()
    Q, c = gram.Q, gram.c
    a1, a2 = gram.alpha1, gram.alpha2
    x = gram.x0() if x0 is None else x0

    def cond(s: CDState):
        return (s.k < config.max_sweeps) & (s.max_move >= config.tol)

    def body(s: CDState):
        x_new = cd_sweep(Q, c, a1, a2, s.x)
        return CDState(
            x=x_new,
            max_move=jnp.max(jnp.abs(x_new - s.x)),
            k=s.k + 1,
        )

    init = CDState(x=x, max_move=jnp.asarray(jnp.inf, x.dtype), k=jnp.zeros((), jnp.int32))
    final = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        x=final.x,
        n_iters=final.k,
        L=jnp.zeros((), x.dtype),
        final_tau=jnp.zeros((), x.dtype),
        metrics=Metrics.zero()._replace(n_grad_evals=final.k * x.shape[0]),
    )


def certified_optimum(problem, config: CDConfig = CDConfig()) -> tuple[Array, Array]:
    """(x*, f*) oracle: CD to machine precision, then the objective."""
    res = cd(problem, config)
    return res.x, problem.objective(res.x)
