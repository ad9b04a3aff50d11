"""Proximal operators.

TPU-native equivalents of the reference's prox operators
(``/root/reference/prox_operators.py:3-16``), written as pure ``jnp``
functions: elementwise, fully fusable by XLA, and trivially vmappable over
stacked instance batches (the value *and* the threshold may both be batched).

Extra operators beyond the reference (group lasso, box, non-negativity) round
out the composite-optimization problem class.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def soft_threshold(v: Array, tau: Array) -> Array:
    """L1 prox (soft thresholding): ``sign(v) * max(|v| - tau, 0)``.

    Parity: reference ``prox_l1`` (prox_operators.py:3-8).
    """
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - tau, 0.0)


# Reference-compatible alias.
prox_l1 = soft_threshold


def prox_elastic_net(v: Array, tau: Array, alpha1: Array, alpha2: Array) -> Array:
    """Prox of ``h(x) = alpha1*||x||_1 + 0.5*alpha2*||x||_2^2``.

    ``prox = soft_threshold(v, tau*alpha1) / (1 + tau*alpha2)``.
    Parity: reference ``prox_elastic_net`` (prox_operators.py:10-16) — note the
    reference's solvers never call this (they fold the ridge term into the
    smooth part and use plain L1 prox); we expose both paths the same way.
    """
    return soft_threshold(v, tau * alpha1) / (1.0 + tau * alpha2)


def prox_group_lasso(v: Array, tau: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """Block soft thresholding: shrink each group (slice along ``axis``) by its
    L2 norm: ``v * max(1 - tau/||v||_2, 0)`` per group.

    Not in the reference; standard composite-optimization extension.
    """
    norms = jnp.linalg.norm(v, axis=axis, keepdims=True)
    scale = jnp.maximum(1.0 - tau / jnp.maximum(norms, eps), 0.0)
    return v * scale


def prox_nonneg(v: Array, tau: Array = 0.0) -> Array:
    """Projection onto the non-negative orthant (prox of the indicator)."""
    del tau
    return jnp.maximum(v, 0.0)


def prox_box(v: Array, tau: Array = 0.0, lower: Array = -1.0, upper: Array = 1.0) -> Array:
    """Projection onto the box ``[lower, upper]`` (prox of the indicator)."""
    del tau
    return jnp.clip(v, lower, upper)


def prox_zero(v: Array, tau: Array = 0.0) -> Array:
    """Prox of ``h = 0`` (identity) — used for pure smooth problems (ridge)."""
    del tau
    return v
