"""One-call solving interface.

``solve(A, b, "lasso", alpha1=0.5)`` builds the right problem representation
and solver for you:

- method: "fista" (default), "ista", "fista_delta", "lbfgs", "cd", "admm",
  "owlqn", "svrg", "saga";
- Gram form is used automatically when it pays (small n, tall A) so the
  iteration cost drops from O(mn) to O(n²);
- accepts NumPy or JAX arrays; any extra keyword arguments flow into the
  method's config dataclass (e.g. ``max_iter=…, backtracking=True,
  adaptive_restart=True, delta=4.0``).

This is sugar over the composable layers (problems/, solvers/) — everything
it does can be spelled out manually.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .problems import LeastSquares
from .solvers import (
    ADMMConfig,
    CDConfig,
    FISTAConfig,
    ISTAConfig,
    LBFGSConfig,
    OWLQNConfig,
    SAGAConfig,
    SVRGConfig,
    SolveResult,
    admm,
    cd,
    fista,
    fista_with_history,
    ista,
    ista_with_history,
    lbfgs,
    lbfgs_with_history,
    owlqn,
    owlqn_with_history,
    prox_saga,
    prox_svrg,
)

_METHODS = {
    "fista": (FISTAConfig, fista, fista_with_history),
    "fista_delta": (FISTAConfig, fista, fista_with_history),
    "ista": (ISTAConfig, ista, ista_with_history),
    "lbfgs": (LBFGSConfig, lbfgs, lbfgs_with_history),
    "cd": (CDConfig, cd, None),
    "admm": (ADMMConfig, admm, None),
    "owlqn": (OWLQNConfig, owlqn, owlqn_with_history),
    "svrg": (SVRGConfig, prox_svrg, None),
    "saga": (SAGAConfig, prox_saga, None),
}


def solve(
    A,
    b,
    reg_type: str = "lasso",
    alpha1: float = 0.0,
    alpha2: float = 0.0,
    method: str = "fista",
    history: bool = False,
    gram: bool | None = None,
    dtype=jnp.float32,
    x0=None,
    key=None,
    **config_kwargs,
) -> SolveResult:
    """Solve ``min ½‖Ax−b‖² + reg`` with the chosen method. See module doc."""
    if method not in _METHODS:
        raise ValueError(f"Unknown method '{method}' (one of {sorted(_METHODS)})")
    cfg_cls, run, run_hist = _METHODS[method]
    if method == "fista_delta":
        config_kwargs.setdefault("momentum", "delta")
        config_kwargs.setdefault("delta", 3.0)

    problem = LeastSquares.create(A, b, reg_type, alpha1, alpha2, dtype=dtype)
    m, n = problem.A.shape
    if gram is None:
        # Gram precompute pays when A is tall and narrow (setup O(mn²) is
        # amortized by O(n²) iterations) and the method iterates on gradients.
        # SVRG/SAGA need row access (minibatch gathers), so they stay on (A, b).
        gram = method not in ("lbfgs", "svrg", "saga") and n <= 128 and m >= 4 * n
    if gram and method not in ("lbfgs", "svrg", "saga"):
        problem = problem.to_gram()

    valid = {f.name for f in dataclasses.fields(cfg_cls)}
    unknown = set(config_kwargs) - valid
    if unknown:
        raise TypeError(f"{method} does not accept config options {sorted(unknown)}")
    config = cfg_cls(**config_kwargs)

    if history:
        if run_hist is None:
            raise ValueError(f"method '{method}' has no history variant")
        if method in ("lbfgs", "owlqn"):
            return run_hist(problem, config, x0=x0)
        return run_hist(problem, config, x0=x0, key=key)
    if method == "svrg":
        from .ops import estimate_lipschitz

        L = estimate_lipschitz(problem.A) + problem.alpha2
        return run(problem, L, config, x0=x0, key=key)
    if method in ("lbfgs", "cd", "admm", "owlqn"):
        return run(problem, config, x0=x0)
    return run(problem, config, x0=x0, key=key)
