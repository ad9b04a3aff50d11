"""Checkpoint/resume on the single-launch fused engine + the routed surface
(round 5, VERDICT item 3).

Round 4 left an asymmetry: the router's PREFERRED engine
(kernels/fused_solve.solve_lasso_fused) was the one engine that could not
checkpoint, and ``solve_lasso_batch`` had no resume parameters at all. These
tests pin:

- bit-exact resume on the plain fused kernel in every momentum mode
  (including the round-5 in-kernel Armijo), with per-tile-heterogeneous
  iteration counts (tiles that certified early carry a smaller k than tiles
  that ran to the cut) and a disk round-trip through utils/checkpoint.py;
- the overlap variant rejecting state (its solver scratch can't round-trip);
- ``solve_lasso_batch(state0=…, return_state=…)`` with pin-to-engine
  semantics across all three state types.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from fastoptsolver_tpu.batch.fista_gram import BatchFISTAConfig


def _problem(seed=1, B=300, m=96, n=5):
    rng = np.random.default_rng(seed)
    Afm = jnp.asarray(rng.normal(size=(n, m, B)), jnp.float32)
    xt = np.zeros((n, B), np.float32)
    xt[:2] = rng.normal(size=(2, B))
    bfm = jnp.einsum("nmb,nb->mb", Afm, jnp.asarray(xt))
    a1 = 0.1 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0)
    return Afm, bfm, a1


def test_fused_resume_is_exact_all_modes(tmp_path):
    from fastoptsolver_tpu.kernels import FusedSolveState, solve_lasso_fused
    from fastoptsolver_tpu.utils.checkpoint import restore_pytree, save_pytree

    Afm, bfm, a1 = _problem()
    for i, kw in enumerate((
        dict(),
        dict(adaptive_restart=True),
        dict(momentum="greedy"),
        dict(backtracking=True),
    )):
        full = BatchFISTAConfig(max_iter=200, check_every=25,
                                rel_gap_tol=1e-6, **kw)
        half = BatchFISTAConfig(max_iter=75, check_every=25,
                                rel_gap_tol=1e-6, **kw)
        straight = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=full,
                                     interpret=True, b_tile=128)
        _, mid = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=half,
                                   interpret=True, b_tile=128,
                                   return_state=True)
        assert isinstance(mid, FusedSolveState)
        if i == 0:  # disk round-trip pins the on-disk format
            path = save_pytree(str(tmp_path / "fstate"), mid)
            mid = restore_pytree(path, mid)
        resumed = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=full,
                                    interpret=True, b_tile=128, state0=mid)
        for field in ("x", "iters", "rel_gap", "converged"):
            np.testing.assert_array_equal(
                np.asarray(getattr(resumed, field)),
                np.asarray(getattr(straight, field)),
                err_msg=f"{kw} {field}",
            )


def test_fused_resume_heterogeneous_tile_k():
    """Cut the run late enough that some lane tiles certified and exited
    early: the checkpoint's per-lane k differs across tiles, and each tile
    must resume from ITS OWN burst boundary (the kernel reads k from its
    tile's row). The resumed run must still equal the straight run."""
    from fastoptsolver_tpu.kernels import solve_lasso_fused

    Afm, bfm, a1 = _problem(seed=4)
    # make the FIRST lane tile trivially easy (α ≥ ‖Aᵀb‖∞ ⇒ x* = 0,
    # certified at the first burst) so it exits while later tiles still run
    a1 = jnp.where(
        jnp.arange(a1.shape[0]) < 128,
        10.0 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0),
        a1,
    )
    cfg_straight = BatchFISTAConfig(max_iter=400, check_every=25,
                                    rel_gap_tol=1e-6)
    cut = BatchFISTAConfig(max_iter=150, check_every=25, rel_gap_tol=1e-6)
    straight = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cfg_straight,
                                 interpret=True, b_tile=128)
    _, mid = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cut, interpret=True,
                               b_tile=128, return_state=True)
    kvals = sorted(set(np.asarray(mid.k).tolist()))
    assert len(kvals) > 1, (
        f"test needs heterogeneous per-tile k, got {kvals} — reshape the "
        "problem so some tiles certify before the cut"
    )
    resumed = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cfg_straight,
                                interpret=True, b_tile=128, state0=mid)
    np.testing.assert_array_equal(np.asarray(resumed.x),
                                  np.asarray(straight.x))
    np.testing.assert_array_equal(np.asarray(resumed.iters),
                                  np.asarray(straight.iters))


def test_fused_overlap_rejects_state():
    import pytest

    from fastoptsolver_tpu.kernels import solve_lasso_fused

    Afm, bfm, a1 = _problem(seed=2, B=256)
    cfg = BatchFISTAConfig(max_iter=50, check_every=25)
    with pytest.raises(NotImplementedError, match="overlap"):
        solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cfg, interpret=True,
                          overlap=True, return_state=True)
    # auto mode must drop to the plain variant and deliver the state
    _, st = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cfg, interpret=True,
                              return_state=True)
    assert st.X.shape == (5, 256)


def test_routed_resume_pins_engine(tmp_path):
    """solve_lasso_batch(state0=…) resumes on the engine that produced the
    state — and refuses to resume a state on a different engine."""
    import pytest

    from fastoptsolver_tpu.batch import solve_lasso_batch
    from fastoptsolver_tpu.batch.fista_gram import BatchState
    from fastoptsolver_tpu.kernels import FusedSolveState
    from fastoptsolver_tpu.utils.checkpoint import restore_pytree, save_pytree

    Afm, bfm, a1 = _problem(seed=3)
    full = BatchFISTAConfig(max_iter=200, check_every=25, rel_gap_tol=1e-6)
    half = BatchFISTAConfig(max_iter=75, check_every=25, rel_gap_tol=1e-6)

    # kernel route (interpret): the router picks the fused engine
    straight = solve_lasso_batch(Afm, bfm, a1, cfg=full,
                                 feature_major=True, interpret=True)
    _, mid = solve_lasso_batch(Afm, bfm, a1, cfg=half, feature_major=True,
                               interpret=True, return_state=True)
    assert isinstance(mid, FusedSolveState)
    path = save_pytree(str(tmp_path / "routed"), mid)
    mid = restore_pytree(path, mid)
    resumed = solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                                interpret=True, state0=mid)
    np.testing.assert_array_equal(np.asarray(resumed.x),
                                  np.asarray(straight.x))
    np.testing.assert_array_equal(np.asarray(resumed.iters),
                                  np.asarray(straight.iters))
    # a fused state cannot resume on the driver
    with pytest.raises(ValueError, match="FusedSolveState"):
        solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                          interpret=True, state0=mid, backend="xla")

    # driver route: BatchState round-trips and refuses the kernel
    straight_x = solve_lasso_batch(Afm, bfm, a1, cfg=full,
                                   feature_major=True, backend="xla")
    _, mid_x = solve_lasso_batch(Afm, bfm, a1, cfg=half, feature_major=True,
                                 backend="xla", return_state=True)
    assert isinstance(mid_x, BatchState)
    resumed_x = solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                                  backend="xla", state0=mid_x)
    np.testing.assert_array_equal(np.asarray(resumed_x.x),
                                  np.asarray(straight_x.x))
    with pytest.raises(ValueError, match="BatchState"):
        solve_lasso_batch(Afm, bfm, a1, cfg=full, feature_major=True,
                          interpret=True, state0=mid_x, backend="kernel")


def test_routed_resume_rejects_unknown_state():
    import pytest

    from fastoptsolver_tpu.batch import solve_lasso_batch

    Afm, bfm, a1 = _problem(seed=6, B=128)
    with pytest.raises(TypeError, match="state0"):
        solve_lasso_batch(Afm, bfm, a1, feature_major=True,
                          state0={"not": "a state"})


def test_fused_resume_rejects_regrouped_tiles():
    """A checkpoint whose per-lane k is heterogeneous ACROSS the resuming
    run's coarser lane tiles must refuse (a lockstep tile cannot hold lanes
    at different absolute iterations) — the hazard of resuming a
    mesh-sharded checkpoint through a coarser single-chip tiling."""
    import pytest

    from fastoptsolver_tpu.kernels import solve_lasso_fused

    Afm, bfm, a1 = _problem(seed=8, B=256)
    a1 = jnp.where(
        jnp.arange(a1.shape[0]) < 128,
        10.0 * jnp.max(jnp.abs(jnp.einsum("nmb,mb->nb", Afm, bfm)), axis=0),
        a1,
    )
    cut = BatchFISTAConfig(max_iter=150, check_every=25, rel_gap_tol=1e-6)
    _, mid = solve_lasso_fused(Afm, bfm, a1, 0.0, cfg=cut, interpret=True,
                               b_tile=128, return_state=True)
    assert len(set(np.asarray(mid.k).tolist())) > 1
    # same grouping: fine
    solve_lasso_fused(Afm, bfm, a1, 0.0,
                      cfg=BatchFISTAConfig(max_iter=300, check_every=25),
                      interpret=True, b_tile=128, state0=mid)
    # coarser grouping mixes the two k values into one tile: refuse
    with pytest.raises(ValueError, match="not uniform"):
        solve_lasso_fused(Afm, bfm, a1, 0.0,
                          cfg=BatchFISTAConfig(max_iter=300, check_every=25),
                          interpret=True, b_tile=256, state0=mid)
