from .gram_build import make_gram_batch_fused
from .fused_solve import FusedSolveState, solve_lasso_fused
from .resident import ResidentSolveState, fista_gram_resident
from .pipeline import solve_pipeline_sharded
from .fista_vmem import (
    fista_gram_vmem,
    fista_gram_vmem_adaptive,
    fista_gram_vmem_sharded,
    momentum_betas,
    auto_b_tile,
    VmemSolveState,
)

__all__ = [
    "make_gram_batch_fused",
    "FusedSolveState",
    "solve_lasso_fused",
    "ResidentSolveState",
    "fista_gram_resident",
    "solve_pipeline_sharded",
    "fista_gram_vmem",
    "fista_gram_vmem_adaptive",
    "fista_gram_vmem_sharded",
    "momentum_betas",
    "auto_b_tile",
    "VmemSolveState",
]
