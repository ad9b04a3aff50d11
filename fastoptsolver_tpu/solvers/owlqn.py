"""OWL-QN: Orthant-Wise Limited-memory Quasi-Newton (Andrew & Gao, 2007).

Capability addition, and the principled fix for the reference's L-BFGS quirk:
for lasso the reference minimizes ONLY the smooth part, silently dropping the
``α₁‖x‖₁`` term from the optimized objective (``/root/reference/lbfgs.py:43-54``;
reproduced deliberately in solvers/lbfgs.py for parity). OWL-QN is the
quasi-Newton method that actually minimizes ``g(x) + α₁‖x‖₁``:

- the **pseudo-gradient** ◇f replaces ∇f: it picks the one-sided directional
  derivative that allows descent at non-differentiable points (x_i = 0);
- the two-loop L-BFGS direction (built from *smooth*-gradient curvature pairs,
  solvers/lbfgs.py:62-98) is **sign-aligned** against −◇f: components that
  disagree are zeroed;
- every line-search trial point is **projected onto the orthant** chosen at
  the start of the iteration, so coordinates crossing zero land exactly on 0
  — iterates are exactly sparse, like prox methods and unlike smooth L-BFGS;
- backtracking sufficient decrease on the full composite objective, measured
  with the pseudo-gradient inner product (the paper's Armijo variant).

Everything runs in one ``lax.while_loop`` fixed point: jittable, vmappable,
differentiable problem protocol underneath (problems/base.py).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from .common import History, Metrics, SolveResult, tree_where
from .lbfgs import two_loop_direction


@dataclasses.dataclass(frozen=True)
class OWLQNConfig:
    memory: int = 10
    max_iter: int = 500
    tol: float = 1e-6  # stop when ||pseudo-grad||_inf <= tol
    c1: float = 1e-4  # sufficient-decrease constant
    ls_shrink: float = 0.5
    max_ls_steps: int = 40
    curvature_eps: float = 1e-10
    gamma_init: float = 1.0


def pseudo_gradient(x: Array, g: Array, alpha1: Array) -> Array:
    """◇f for f = g + α₁‖·‖₁ (Andrew & Gao eq. 4): at x_i ≠ 0 the L1 term is
    differentiable; at x_i = 0 take the one-sided derivative if it permits
    descent, else 0 (x_i is at a subdifferential minimum)."""
    right = g + alpha1  # derivative moving positive
    left = g - alpha1  # derivative moving negative
    at_zero = jnp.where(right < 0, right, jnp.where(left > 0, left, 0.0))
    return jnp.where(x > 0, right, jnp.where(x < 0, left, at_zero))


def _project_orthant(v: Array, xi: Array) -> Array:
    """π(v; ξ): zero coordinates whose sign disagrees with the orthant ξ."""
    return jnp.where(jnp.sign(v) == xi, v, 0.0)


class OWLQNState(NamedTuple):
    x: Array
    f: Array  # FULL composite objective
    g: Array  # smooth gradient (curvature pairs use this, per the paper)
    v: Array  # pseudo-gradient
    S: Array
    Y: Array
    rho: Array
    count: Array
    head: Array
    gamma: Array
    k: Array
    done: Array


class _Carry(NamedTuple):
    state: OWLQNState
    metrics: Metrics


def _full_objective(problem, x: Array) -> Array:
    return problem.objective(x)


def _init(problem, config: OWLQNConfig, x0) -> OWLQNState:
    x = problem.x0() if x0 is None else x0
    g = problem.smooth_grad(x)
    f = _full_objective(problem, x)
    v = pseudo_gradient(x, g, problem.alpha1)
    mem, n = config.memory, x.shape[0]
    return OWLQNState(
        x=x, f=f, g=g, v=v,
        S=jnp.zeros((mem, n), x.dtype),
        Y=jnp.zeros((mem, n), x.dtype),
        rho=jnp.zeros((mem,), x.dtype),
        count=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
        gamma=jnp.asarray(config.gamma_init, x.dtype),
        k=jnp.zeros((), jnp.int32),
        done=jnp.max(jnp.abs(v)) <= config.tol,
    )


class _LS(NamedTuple):
    a: Array
    x_new: Array
    f_new: Array
    accepted: Array
    steps: Array


def owlqn_step(problem, config: OWLQNConfig, state: OWLQNState, metrics: Metrics):
    v = state.v
    d = two_loop_direction(
        v, state.S, state.Y, state.rho, state.count, state.head, state.gamma
    )
    # Alignment (paper §3.2): drop direction components whose sign disagrees
    # with the steepest-descent direction −v; fall back to −v if that empties
    # the direction (e.g. first iteration with a degenerate gamma).
    d = jnp.where(d * (-v) > 0, d, 0.0)
    d = jnp.where(jnp.any(d != 0), d, -v)

    # Orthant for this iteration: sign(x_i), or sign(−v_i) where x_i = 0.
    xi = jnp.where(state.x != 0, jnp.sign(state.x), jnp.sign(-v))

    def trial(a: Array) -> tuple[Array, Array, Array]:
        x_new = _project_orthant(state.x + a * d, xi)
        f_new = _full_objective(problem, x_new)
        # Sufficient decrease wrt the pseudo-gradient (paper eq. 5):
        # f(x⁺) ≤ f(x) + c1 · vᵀ(x⁺ − x).
        ok = f_new <= state.f + config.c1 * (v @ (x_new - state.x))
        return x_new, f_new, ok

    a0 = jnp.ones((), state.f.dtype)
    # First iteration: scale the unit step by 1/‖v‖ (paper's initialization —
    # the raw gradient step is wildly long before curvature is learned).
    a0 = jnp.where(
        state.count == 0, 1.0 / jnp.maximum(jnp.linalg.norm(v), 1.0), a0
    )
    x_first, f_first, ok_first = trial(a0)

    def ls_cond(s: _LS):
        return (~s.accepted) & (s.steps < config.max_ls_steps)

    def ls_body(s: _LS):
        a = s.a * config.ls_shrink
        x_new, f_new, ok = trial(a)
        return _LS(a=a, x_new=x_new, f_new=f_new, accepted=ok, steps=s.steps + 1)

    ls = jax.lax.while_loop(
        ls_cond,
        ls_body,
        _LS(a=a0, x_new=x_first, f_new=f_first, accepted=ok_first,
            steps=jnp.zeros((), jnp.int32)),
    )
    # On total line-search failure keep the current point (and stop below).
    x_new = tree_where(ls.accepted, ls.x_new, state.x)
    f_new = jnp.where(ls.accepted, ls.f_new, state.f)

    g_new = problem.smooth_grad(x_new)
    v_new = pseudo_gradient(x_new, g_new, problem.alpha1)
    metrics = metrics._replace(
        n_grad_evals=metrics.n_grad_evals + 1,
        n_ls_calls=metrics.n_ls_calls + 1,
        ls_iters_total=metrics.ls_iters_total + ls.steps + 1,
    )

    # Curvature pair from SMOOTH gradients (paper §3.2 point 1).
    s_vec = x_new - state.x
    y_vec = g_new - state.g
    sy = s_vec @ y_vec
    keep = ls.accepted & (
        sy > config.curvature_eps * jnp.linalg.norm(s_vec) * jnp.linalg.norm(y_vec)
    )
    head, mem = state.head, config.memory
    S = jnp.where(keep, state.S.at[head].set(s_vec), state.S)
    Y = jnp.where(keep, state.Y.at[head].set(y_vec), state.Y)
    rho = jnp.where(keep, state.rho.at[head].set(1.0 / jnp.where(keep, sy, 1.0)), state.rho)
    head = jnp.where(keep, (head + 1) % mem, head)
    count = jnp.where(keep, jnp.minimum(state.count + 1, mem), state.count)
    gamma = jnp.where(keep, sy / jnp.maximum(y_vec @ y_vec, 1e-38), state.gamma)

    # Stop on: pseudo-gradient tolerance; line-search failure; or a
    # zero-movement step (backtracking shrank a until the projected trial
    # rounded back to x — the sufficient-decrease test then holds trivially
    # (0 ≤ 0) and no further progress is possible at this precision).
    stalled = jnp.all(x_new == state.x)
    done = (jnp.max(jnp.abs(v_new)) <= config.tol) | ~ls.accepted | stalled
    new_state = OWLQNState(
        x=x_new, f=f_new, g=g_new, v=v_new,
        S=S, Y=Y, rho=rho, count=count, head=head, gamma=gamma,
        k=state.k + 1, done=done,
    )
    return new_state, metrics


def owlqn(
    problem,
    config: OWLQNConfig = OWLQNConfig(),
    x0: Array | None = None,
) -> SolveResult:
    """Minimize ``problem.smooth_value(x) + problem.alpha1·‖x‖₁``.

    The problem must expose ``alpha1`` (every least-squares family problem
    does); ridge terms stay inside the smooth part and need no special
    handling, so elastic-net works out of the box."""
    state0 = _init(problem, config, x0)
    metrics0 = Metrics.zero()._replace(n_grad_evals=jnp.ones((), jnp.int32))

    def cond(c: _Carry):
        return (c.state.k < config.max_iter) & ~c.state.done

    def body(c: _Carry):
        return _Carry(*owlqn_step(problem, config, c.state, c.metrics))

    final = jax.lax.while_loop(cond, body, _Carry(state0, metrics0))
    return SolveResult(
        x=final.state.x,
        n_iters=final.state.k,
        L=jnp.zeros((), final.state.f.dtype),
        final_tau=jnp.zeros((), final.state.f.dtype),
        metrics=final.metrics,
    )


def owlqn_with_history(
    problem,
    config: OWLQNConfig = OWLQNConfig(),
    x0: Array | None = None,
) -> SolveResult:
    """Fixed-length scan recording the composite objective per iteration."""
    state0 = _init(problem, config, x0)
    metrics0 = Metrics.zero()._replace(n_grad_evals=jnp.ones((), jnp.int32))

    def step(c: _Carry, _):
        active = (c.state.k < config.max_iter) & ~c.state.done
        new_c = _Carry(*owlqn_step(problem, config, c.state, c.metrics))
        new_c = tree_where(active, new_c, c)
        step_norm = jnp.linalg.norm(new_c.state.x - c.state.x)
        return new_c, (new_c.state.x, new_c.state.f, step_norm, active)

    final, (xs, objs, steps, valid) = jax.lax.scan(
        step, _Carry(state0, metrics0), None, length=config.max_iter
    )
    return SolveResult(
        x=final.state.x,
        n_iters=final.state.k,
        L=jnp.zeros((), final.state.f.dtype),
        final_tau=jnp.zeros((), final.state.f.dtype),
        metrics=final.metrics,
        history=History(x=xs, obj=objs, step_norm=steps, valid=valid),
    )
