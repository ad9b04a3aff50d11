"""Standalone objective evaluation with reference-parity semantics.

``compute_objective`` mirrors the reference function of the same name
(``/root/reference/objective_functions.py:3-30``): the ridge term applies for
reg_type in {ridge, elasticnet}, the L1 term for {lasso, elasticnet}, unknown
types raise. Works on single vectors or (via standard vmap) batches.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from ..problems.base import fold_alphas


def compute_objective(
    x: Array, A: Array, b: Array, reg_type: str, alpha1: float, alpha2: float
) -> Array:
    """f(x) = ½||Ax−b||² (+ ½α₂||x||² if ridge/elasticnet) (+ α₁||x||₁ if
    lasso/elasticnet)."""
    a1, a2, _ = fold_alphas(reg_type, alpha1, alpha2)
    r = A @ x - b
    val = 0.5 * (r @ r) + 0.5 * a2 * (x @ x) + a1 * jnp.sum(jnp.abs(x))
    return val
