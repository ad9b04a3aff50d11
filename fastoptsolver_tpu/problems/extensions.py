"""Additional composite problem families beyond the reference's three.

All are thin problem-pytree constructors over the same protocol, so every
solver (ISTA/FISTA/FISTA-Δ, and L-BFGS for the smooth parts) and every
driver (vmap batching, sharding) works on them unchanged:

- :class:`NonNegativeLeastSquares` — ``h = indicator(x ≥ 0)`` (projection
  prox), optionally with L1;
- :class:`GroupLassoLeastSquares` — ``h = α_g Σ_g ‖x_g‖₂`` over contiguous
  equal-size groups (block soft threshold prox);
- :class:`BoxConstrainedLeastSquares` — ``h = indicator(l ≤ x ≤ u)``.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.prox import (
    prox_box,
    prox_group_lasso,
    prox_nonneg,
    prox_slope,
    slope_norm,
    soft_threshold,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _LSBase:
    A: Array
    b: Array

    @property
    def dim(self) -> int:
        return self.A.shape[-1]

    def residual(self, x: Array) -> Array:
        return self.A @ x - self.b

    def smooth_value(self, x: Array) -> Array:
        r = self.residual(x)
        return 0.5 * (r @ r)

    def smooth_grad(self, x: Array) -> Array:
        return self.A.T @ self.residual(x)

    def smooth_value_and_grad(self, x: Array):
        r = self.residual(x)
        return 0.5 * (r @ r), self.A.T @ r

    def objective(self, x: Array) -> Array:
        return self.smooth_value(x) + self.nonsmooth_value(x)

    def x0(self) -> Array:
        return jnp.zeros(self.dim, dtype=self.A.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NonNegativeLeastSquares(_LSBase):
    """``min ½‖Ax−b‖² + ½α₂‖x‖² + α₁‖x‖₁  s.t. x ≥ 0`` (α₁ = α₂ = 0 gives
    plain NNLS; α₂ > 0 is the positively-constrained elastic net — sklearn's
    ``ElasticNet(positive=True)``). The ridge term folds into the smooth part
    exactly like ``LeastSquares`` (SURVEY §7 item 5)."""

    alpha1: Array = 0.0
    alpha2: Array = 0.0

    @classmethod
    def create(cls, A, b, alpha1: float = 0.0, alpha2: float = 0.0,
               dtype=jnp.float32):
        return cls(
            A=jnp.asarray(A, dtype),
            b=jnp.asarray(b, dtype),
            alpha1=jnp.asarray(alpha1, dtype),
            alpha2=jnp.asarray(alpha2, dtype),
        )

    def smooth_value(self, x: Array) -> Array:
        r = self.residual(x)
        return 0.5 * (r @ r) + 0.5 * self.alpha2 * (x @ x)

    def smooth_grad(self, x: Array) -> Array:
        return self.A.T @ self.residual(x) + self.alpha2 * x

    def smooth_value_and_grad(self, x: Array):
        r = self.residual(x)
        return (
            0.5 * (r @ r) + 0.5 * self.alpha2 * (x @ x),
            self.A.T @ r + self.alpha2 * x,
        )

    def prox(self, v: Array, tau: Array) -> Array:
        # prox of (L1 + nonneg indicator) = max(v − τα₁, 0)
        return prox_nonneg(v - tau * self.alpha1)

    def nonsmooth_value(self, x: Array) -> Array:
        # indicator contributes 0 on the feasible set; solvers only evaluate
        # at prox outputs, which are feasible
        return self.alpha1 * jnp.sum(jnp.abs(x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupLassoLeastSquares(_LSBase):
    """``min ½‖Ax−b‖² + α_g Σ_g ‖x_g‖₂`` over contiguous groups of size
    ``group_size`` (n must divide evenly)."""

    alpha_g: Array = 1.0
    group_size: int = dataclasses.field(default=1, metadata=dict(static=True))

    @classmethod
    def create(cls, A, b, alpha_g: float, group_size: int, dtype=jnp.float32):
        A = jnp.asarray(A, dtype)
        if A.shape[-1] % group_size:
            raise ValueError(
                f"n={A.shape[-1]} not divisible by group_size={group_size}"
            )
        return cls(
            A=A,
            b=jnp.asarray(b, dtype),
            alpha_g=jnp.asarray(alpha_g, dtype),
            group_size=group_size,
        )

    def _grouped(self, x: Array) -> Array:
        return x.reshape(-1, self.group_size)

    def prox(self, v: Array, tau: Array) -> Array:
        out = prox_group_lasso(self._grouped(v), tau * self.alpha_g, axis=-1)
        return out.reshape(-1)

    def nonsmooth_value(self, x: Array) -> Array:
        return self.alpha_g * jnp.sum(
            jnp.linalg.norm(self._grouped(x), axis=-1)
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoxConstrainedLeastSquares(_LSBase):
    """``min ½‖Ax−b‖²  s.t. lower ≤ x ≤ upper``."""

    lower: Array = -1.0
    upper: Array = 1.0

    @classmethod
    def create(cls, A, b, lower, upper, dtype=jnp.float32):
        return cls(
            A=jnp.asarray(A, dtype),
            b=jnp.asarray(b, dtype),
            lower=jnp.asarray(lower, dtype),
            upper=jnp.asarray(upper, dtype),
        )

    def prox(self, v: Array, tau: Array) -> Array:
        return prox_box(v, lower=self.lower, upper=self.upper)

    def nonsmooth_value(self, x: Array) -> Array:
        return jnp.zeros((), x.dtype)

    def x0(self) -> Array:
        z = jnp.zeros(self.dim, dtype=self.A.dtype)
        return jnp.clip(z, self.lower, self.upper)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiTaskLeastSquares:
    """Multi-task (joint-sparsity) regression with matrix coefficients
    X ∈ R^{n×T}: ``min ½‖AX−B‖_F² + ½α₂‖X‖_F² + α₁ Σ_j ‖X_{j,:}‖₂`` — the
    L2,1 row-group penalty makes the T tasks share one support (a feature is
    selected for all tasks or none). The solvers run unchanged on the matrix
    iterate: their inner products are ``jnp.vdot`` and norms Frobenius, and
    the Lipschitz constant is the same λ_max(AᵀA) + α₂ as the vector case.
    Not in the reference; sklearn's MultiTaskLasso/MultiTaskElasticNet
    semantics (see estimators.MultiTaskLasso for the α mapping)."""

    A: Array   # (m, n)
    B: Array   # (m, T)
    alpha1: Array  # row-group penalty weight
    alpha2: Array

    @classmethod
    def create(cls, A, B, alpha1: float = 0.0, alpha2: float = 0.0,
               dtype=jnp.float32):
        B = jnp.asarray(B, dtype)
        if B.ndim != 2:
            raise ValueError(f"B must be (m, n_tasks), got shape {B.shape}")
        return cls(
            A=jnp.asarray(A, dtype),
            B=B,
            alpha1=jnp.asarray(alpha1, dtype),
            alpha2=jnp.asarray(alpha2, dtype),
        )

    @property
    def dim(self) -> int:
        return self.A.shape[-1]

    @property
    def n_tasks(self) -> int:
        return self.B.shape[-1]

    @property
    def ridge_in_smooth(self) -> bool:
        return True

    def residual(self, X: Array) -> Array:
        return self.A @ X - self.B

    def smooth_value(self, X: Array) -> Array:
        R = self.residual(X)
        return 0.5 * jnp.vdot(R, R) + 0.5 * self.alpha2 * jnp.vdot(X, X)

    def smooth_grad(self, X: Array) -> Array:
        return self.A.T @ self.residual(X) + self.alpha2 * X

    def smooth_value_and_grad(self, X: Array):
        R = self.residual(X)
        return (
            0.5 * jnp.vdot(R, R) + 0.5 * self.alpha2 * jnp.vdot(X, X),
            self.A.T @ R + self.alpha2 * X,
        )

    def prox(self, V: Array, tau: Array) -> Array:
        return prox_group_lasso(V, tau * self.alpha1, axis=-1)

    def nonsmooth_value(self, X: Array) -> Array:
        return self.alpha1 * jnp.sum(jnp.linalg.norm(X, axis=-1))

    def objective(self, X: Array) -> Array:
        return self.smooth_value(X) + self.nonsmooth_value(X)

    def x0(self) -> Array:
        return jnp.zeros((self.dim, self.n_tasks), dtype=self.A.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantileRegression:
    """Smoothed quantile regression: ``g(x) = Σᵢ ρ_τ^μ(aᵢᵀx − bᵢ) + ½α₂‖x‖²``,
    ``h = α₁‖x‖₁``, where ρ_τ^μ is the Moreau envelope (smoothing parameter
    μ > 0) of the pinball loss in the residual r = aᵀx − b: under-prediction
    (r < 0) costs τ|r|, over-prediction costs (1−τ)r, so the minimizer is the
    τ-th conditional quantile. ρ_τ(r) = max((1−τ)r, −τr), and

        ρ_τ^μ(r) = r²/(2μ)              for −μτ ≤ r ≤ μ(1−τ)
                   (1−τ)r − μ(1−τ)²/2    for r >  μ(1−τ)
                   −τr − μτ²/2           for r < −μτ

    The gradient is ``Aᵀ clip(r/μ, −τ, 1−τ)`` with curvature ≤ 1/μ, so
    ``L = λ_max(AᵀA)/μ + α₂`` (supplied via ``normal_matvec``) and every
    prox-gradient solver runs unchanged. As μ → 0 the solution approaches the
    exact τ-th conditional quantile fit (convolution smoothing, e.g.
    He et al. 2021 "smoothed quantile regression"). Not in the reference."""

    A: Array
    b: Array
    tau_q: Array   # quantile level τ ∈ (0, 1)
    mu: Array      # Moreau smoothing parameter > 0
    alpha1: Array
    alpha2: Array

    @classmethod
    def create(cls, A, b, tau: float = 0.5, mu: float = 0.1,
               alpha1: float = 0.0, alpha2: float = 0.0, dtype=jnp.float32):
        if not 0.0 < tau < 1.0:
            raise ValueError(f"quantile level tau must be in (0, 1), got {tau}")
        if mu <= 0.0:
            raise ValueError(f"smoothing mu must be > 0, got {mu}")
        return cls(
            A=jnp.asarray(A, dtype),
            b=jnp.asarray(b, dtype),
            tau_q=jnp.asarray(tau, dtype),
            mu=jnp.asarray(mu, dtype),
            alpha1=jnp.asarray(alpha1, dtype),
            alpha2=jnp.asarray(alpha2, dtype),
        )

    @property
    def dim(self) -> int:
        return self.A.shape[-1]

    @property
    def ridge_in_smooth(self) -> bool:
        return True

    def residual(self, x: Array) -> Array:
        return self.A @ x - self.b

    def normal_matvec(self, v: Array) -> Array:
        """Curvature-bound operator AᵀA/μ (ψ″ ≤ 1/μ on the quadratic branch)."""
        return self.A.T @ (self.A @ v) / self.mu

    def _rho(self, r: Array) -> Array:
        t, mu = self.tau_q, self.mu
        quad = r * r / (2.0 * mu)
        hi = (1.0 - t) * r - mu * (1.0 - t) ** 2 / 2.0
        lo = -t * r - mu * t * t / 2.0
        return jnp.where(r > mu * (1.0 - t), hi, jnp.where(r < -mu * t, lo, quad))

    def smooth_value(self, x: Array) -> Array:
        return jnp.sum(self._rho(self.residual(x))) + 0.5 * self.alpha2 * (x @ x)

    def smooth_grad(self, x: Array) -> Array:
        psi = jnp.clip(self.residual(x) / self.mu, -self.tau_q, 1.0 - self.tau_q)
        return self.A.T @ psi + self.alpha2 * x

    def smooth_value_and_grad(self, x: Array):
        r = self.residual(x)
        psi = jnp.clip(r / self.mu, -self.tau_q, 1.0 - self.tau_q)
        return (
            jnp.sum(self._rho(r)) + 0.5 * self.alpha2 * (x @ x),
            self.A.T @ psi + self.alpha2 * x,
        )

    def prox(self, v: Array, tau: Array) -> Array:
        return soft_threshold(v, tau * self.alpha1)

    def nonsmooth_value(self, x: Array) -> Array:
        return self.alpha1 * jnp.sum(jnp.abs(x))

    def objective(self, x: Array) -> Array:
        return self.smooth_value(x) + self.nonsmooth_value(x)

    def pinball_value(self, x: Array) -> Array:
        """The *exact* (unsmoothed) pinball objective — for reporting."""
        r = self.residual(x)
        return jnp.sum(jnp.maximum((1.0 - self.tau_q) * r, -self.tau_q * r))

    def x0(self) -> Array:
        return jnp.zeros(self.dim, dtype=self.A.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoissonRegression:
    """L1/L2-regularized Poisson regression (log-linear counts):
    ``g(x) = Σᵢ (exp(aᵢᵀx) − bᵢ·aᵢᵀx) + ½α₂‖x‖²``, ``h = α₁‖x‖₁`` — the
    Poisson negative log-likelihood up to the x-independent ``log bᵢ!`` term.

    The Hessian ``Aᵀdiag(exp(Ax))A`` is unbounded, so there is no global
    Lipschitz constant: solve with ``backtracking=True`` (the Armijo search,
    solvers/common.py). ``normal_matvec`` supplies the curvature at x₀ = 0
    (exactly AᵀA) as the starting step scale; backtracking then adapts.
    Not in the reference."""

    A: Array
    b: Array  # nonnegative counts
    alpha1: Array
    alpha2: Array

    @classmethod
    def create(cls, A, b, alpha1: float = 0.0, alpha2: float = 0.0,
               dtype=jnp.float32):
        b = jnp.asarray(b, dtype)
        return cls(
            A=jnp.asarray(A, dtype),
            b=b,
            alpha1=jnp.asarray(alpha1, dtype),
            alpha2=jnp.asarray(alpha2, dtype),
        )

    @property
    def dim(self) -> int:
        return self.A.shape[-1]

    @property
    def ridge_in_smooth(self) -> bool:
        return True

    def normal_matvec(self, v: Array) -> Array:
        """Curvature at the solver start x₀ = 0: Aᵀ diag(e⁰) A = AᵀA."""
        return self.A.T @ (self.A @ v)

    def smooth_value(self, x: Array) -> Array:
        eta = self.A @ x
        return jnp.sum(jnp.exp(eta) - self.b * eta) + 0.5 * self.alpha2 * (x @ x)

    def smooth_grad(self, x: Array) -> Array:
        eta = self.A @ x
        return self.A.T @ (jnp.exp(eta) - self.b) + self.alpha2 * x

    def smooth_value_and_grad(self, x: Array):
        eta = self.A @ x
        ex = jnp.exp(eta)
        return (
            jnp.sum(ex - self.b * eta) + 0.5 * self.alpha2 * (x @ x),
            self.A.T @ (ex - self.b) + self.alpha2 * x,
        )

    def prox(self, v: Array, tau: Array) -> Array:
        return soft_threshold(v, tau * self.alpha1)

    def nonsmooth_value(self, x: Array) -> Array:
        return self.alpha1 * jnp.sum(jnp.abs(x))

    def objective(self, x: Array) -> Array:
        return self.smooth_value(x) + self.nonsmooth_value(x)

    def x0(self) -> Array:
        return jnp.zeros(self.dim, dtype=self.A.dtype)


def slope_lambda_bh(n: int, q: float = 0.1, sigma: float = 1.0, dtype=None):
    """Benjamini–Hochberg λ ladder for SLOPE:
    ``λ_i = σ · Φ⁻¹(1 − q·i / (2n))``, i = 1..n (non-increasing by
    construction). The standard FDR-controlling sequence from Bogdan et al.
    2015; pass to :class:`SlopeLeastSquares`."""
    from jax.scipy.stats import norm

    if dtype is None:  # widest enabled float: no truncation warning under f32
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    i = jnp.arange(1, n + 1, dtype=dtype)
    return sigma * norm.ppf(1.0 - q * i / (2.0 * n))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlopeLeastSquares(_LSBase):
    """SLOPE / OWL regression: ``min ½‖Ax−b‖² + Σ_i λ_i |x|_(i)`` with a
    non-increasing penalty ladder λ applied to the magnitudes in decreasing
    order (sorted-L1 norm). Equal λ recovers the lasso; the BH ladder
    (``slope_lambda_bh``) gives FDR control. Prox is ``ops/prox.py:
    prox_slope`` (dense isotonic projection — one fused XLA program).
    Not in the reference; standard composite-optimization extension."""

    lam: Array = None  # (n,) non-increasing, nonnegative

    @classmethod
    def create(cls, A, b, lam, dtype=jnp.float32):
        A = jnp.asarray(A, dtype)
        lam = jnp.broadcast_to(jnp.asarray(lam, dtype), (A.shape[-1],))
        lam_np = np.asarray(lam)
        if np.any(np.diff(lam_np) > 0) or np.any(lam_np < 0):
            raise ValueError("SLOPE lambda ladder must be non-increasing and >= 0")
        return cls(A=A, b=jnp.asarray(b, dtype), lam=lam)

    def prox(self, v: Array, tau: Array) -> Array:
        return prox_slope(v, tau * self.lam)

    def nonsmooth_value(self, x: Array) -> Array:
        return slope_norm(x, self.lam)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WeightedLeastSquares:
    """Per-row sample weights: ``g(x) = ½ Σᵢ wᵢ(aᵢᵀx − bᵢ)² + ½α₂‖x‖²``,
    ``h = α₁‖x‖₁``. Equivalent to scaling rows by √wᵢ, kept explicit so user
    weight semantics survive (e.g. inverse-variance weighting). Not in the
    reference; standard regression extension."""

    A: Array  # (m, n)
    b: Array  # (m,)
    w: Array  # (m,) nonnegative sample weights
    alpha1: Array
    alpha2: Array

    @classmethod
    def create(cls, A, b, w, reg_type: str = "lasso", alpha1: float = 0.0,
               alpha2: float = 0.0, dtype=jnp.float32):
        from .base import fold_alphas

        a1, a2, _ = fold_alphas(reg_type, alpha1, alpha2)
        return cls(
            A=jnp.asarray(A, dtype),
            b=jnp.asarray(b, dtype),
            w=jnp.asarray(w, dtype),
            alpha1=jnp.asarray(a1, dtype),
            alpha2=jnp.asarray(a2, dtype),
        )

    @property
    def dim(self) -> int:
        return self.A.shape[-1]

    @property
    def ridge_in_smooth(self) -> bool:
        return True

    def residual(self, x: Array) -> Array:
        return self.A @ x - self.b

    def normal_matvec(self, v: Array) -> Array:
        """``Aᵀdiag(w)A·v`` — the weighted normal operator; lipschitz_for
        (ops/lipschitz.py) power-iterates this so the step size reflects the
        weights (the unweighted λ_max(AᵀA) can underestimate by max(w))."""
        return self.A.T @ (self.w * (self.A @ v))

    def smooth_value(self, x: Array) -> Array:
        r = self.residual(x)
        return 0.5 * jnp.sum(self.w * r * r) + 0.5 * self.alpha2 * (x @ x)

    def smooth_grad(self, x: Array) -> Array:
        return self.A.T @ (self.w * self.residual(x)) + self.alpha2 * x

    def smooth_value_and_grad(self, x: Array):
        r = self.residual(x)
        val = 0.5 * jnp.sum(self.w * r * r) + 0.5 * self.alpha2 * (x @ x)
        return val, self.A.T @ (self.w * r) + self.alpha2 * x

    def prox(self, v: Array, tau: Array) -> Array:
        return soft_threshold(v, tau * self.alpha1)

    def nonsmooth_value(self, x: Array) -> Array:
        return self.alpha1 * jnp.sum(jnp.abs(x))

    def objective(self, x: Array) -> Array:
        return self.smooth_value(x) + self.nonsmooth_value(x)

    def x0(self) -> Array:
        return jnp.zeros(self.dim, dtype=self.A.dtype)

    def to_gram(self):
        """``Q = Aᵀdiag(w)A`` — the weighted normal equations; the Gram-form
        solvers and the CD oracle then run unchanged."""
        from .least_squares import GramLeastSquares

        Aw = self.A * self.w[:, None]
        return GramLeastSquares(
            Q=self.A.T @ Aw,
            c=Aw.T @ self.b,
            btb=jnp.sum(self.w * self.b * self.b),
            alpha1=self.alpha1,
            alpha2=self.alpha2,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HuberRegression:
    """Robust regression: ``g(x) = Σᵢ huber_δ(aᵢᵀx − bᵢ) + ½α₂‖x‖²``,
    ``h = α₁‖x‖₁``, with ``huber_δ(r) = ½r²`` for |r| ≤ δ and
    ``δ|r| − ½δ²`` beyond. The smooth part's curvature is bounded by the
    quadratic branch (ψ′ ≤ 1), so ``L = λ_max(AᵀA) + α₂`` — the unweighted
    Lipschitz estimate is valid and the prox-gradient solvers run unchanged.
    Not in the reference."""

    A: Array
    b: Array
    delta: Array
    alpha1: Array
    alpha2: Array

    @classmethod
    def create(cls, A, b, delta: float = 1.0, alpha1: float = 0.0,
               alpha2: float = 0.0, dtype=jnp.float32):
        return cls(
            A=jnp.asarray(A, dtype),
            b=jnp.asarray(b, dtype),
            delta=jnp.asarray(delta, dtype),
            alpha1=jnp.asarray(alpha1, dtype),
            alpha2=jnp.asarray(alpha2, dtype),
        )

    @property
    def dim(self) -> int:
        return self.A.shape[-1]

    @property
    def ridge_in_smooth(self) -> bool:
        return True

    def residual(self, x: Array) -> Array:
        return self.A @ x - self.b

    def _huber(self, r: Array) -> Array:
        a = jnp.abs(r)
        return jnp.where(a <= self.delta, 0.5 * r * r,
                         self.delta * (a - 0.5 * self.delta))

    def smooth_value(self, x: Array) -> Array:
        return jnp.sum(self._huber(self.residual(x))) + 0.5 * self.alpha2 * (x @ x)

    def smooth_grad(self, x: Array) -> Array:
        psi = jnp.clip(self.residual(x), -self.delta, self.delta)
        return self.A.T @ psi + self.alpha2 * x

    def smooth_value_and_grad(self, x: Array):
        r = self.residual(x)
        val = jnp.sum(self._huber(r)) + 0.5 * self.alpha2 * (x @ x)
        psi = jnp.clip(r, -self.delta, self.delta)
        return val, self.A.T @ psi + self.alpha2 * x

    def prox(self, v: Array, tau: Array) -> Array:
        return soft_threshold(v, tau * self.alpha1)

    def nonsmooth_value(self, x: Array) -> Array:
        return self.alpha1 * jnp.sum(jnp.abs(x))

    def objective(self, x: Array) -> Array:
        return self.smooth_value(x) + self.nonsmooth_value(x)

    def x0(self) -> Array:
        return jnp.zeros(self.dim, dtype=self.A.dtype)
