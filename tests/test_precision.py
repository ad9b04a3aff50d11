"""The package must pin f32 matmul precision at import.

On TPU the MXU default truncates f32 matmul operands to bf16 (~4e-3 relative
error). Measured on a v5e (bench/verify_tpu.py wide_n checks, round 3): the
batched FISTA driver's Q·x gradient silently dropped to bf16 once n was wide
enough for XLA to route the contraction to the MXU (n ≥ ~64), flooring the
true duality gap at ~4e-2 while the solver "ran" for 2000 iterations. A
certification library cannot run on that default, so fastoptsolver_tpu's
__init__ sets jax_default_matmul_precision="highest" (overridable via
FOS_MATMUL_PRECISION). CPU CI cannot reproduce the numerical failure — this
pins the configuration instead.
"""
import os

import jax

import fastoptsolver_tpu  # noqa: F401 — import must set the default


def test_default_matmul_precision_pinned():
    assert os.environ.get("FOS_MATMUL_PRECISION", "highest") == "highest", (
        "test environment overrode FOS_MATMUL_PRECISION; this test assumes "
        "the default"
    )
    assert jax.config.jax_default_matmul_precision == "highest"


def test_hot_loop_einsums_pin_precision_explicitly():
    # The driver's correctness-defining einsums do not rely on the global
    # (a user's jax.default_matmul_precision context must not weaken them).
    import inspect

    from fastoptsolver_tpu.batch import fista_gram

    src = inspect.getsource(fista_gram)
    assert src.count("precision=_HI") >= 4
