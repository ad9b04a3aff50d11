"""Instance-batched solving: the whole solver vmapped over stacked problems.

The reference benchmark runs its 80 scenarios in a serial Python for-loop
around single-instance NumPy solvers (SURVEY.md §3.5). Here the *entire
solve* — Lipschitz power iteration, the full FISTA/ISTA/L-BFGS while-loop,
metrics — is ``jax.vmap``-ed over a stacked problem pytree and compiled once:
one XLA program advances every instance in lockstep, with converged instances
frozen by the batching rule's predicate masking, so per-instance stopping
semantics match N independent solves exactly (tested in
tests/test_batch.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.lipschitz import lipschitz_for
from ..solvers.fista import FISTAConfig, fista, fista_with_history
from ..solvers.ista import ISTAConfig, ista, ista_with_history
from ..solvers.lbfgs import LBFGSConfig, lbfgs, lbfgs_with_history

_SOLVERS = {
    "fista": (fista, fista_with_history),
    "ista": (ista, ista_with_history),
    "lbfgs": (lbfgs, lbfgs_with_history),
}


def stack_problems(problems):
    """Stack a list of structurally identical problem pytrees into one batched
    pytree (leading batch axis on every leaf)."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *problems)


def batch_lipschitz(problem_batch, key=None, n_iter: int = 100, tol: float = 1e-6):
    """Per-instance Lipschitz constants, vmapped power iteration."""
    batch = jax.tree.leaves(problem_batch)[0].shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda p, k: lipschitz_for(p, k, n_iter=n_iter, tol=tol))(
        problem_batch, keys
    )


def solve_batch(
    problem_batch,
    method: str = "fista",
    config=None,
    history: bool = False,
    L=None,
    key=None,
):
    """Solve a stacked batch of problems with one compiled vmapped program.

    ``method`` ∈ {"fista", "ista", "lbfgs"}; ``config`` is the matching static
    config dataclass. ``L`` may be precomputed per-instance Lipschitz constants
    (ignored by lbfgs). Returns a batched ``SolveResult``.
    """
    if method not in _SOLVERS:
        raise ValueError(f"Unknown method '{method}' (want one of {list(_SOLVERS)})")
    solve, solve_hist = _SOLVERS[method]
    fn = solve_hist if history else solve
    if config is None:
        config = {
            "fista": FISTAConfig,
            "ista": ISTAConfig,
            "lbfgs": LBFGSConfig,
        }[method]()

    if method == "lbfgs":
        return jax.vmap(lambda p: fn(p, config))(problem_batch)

    if L is None:
        L = batch_lipschitz(problem_batch, key)
    L = jnp.asarray(L)
    return jax.vmap(lambda p, l: fn(p, config, L=l))(problem_batch, L)
