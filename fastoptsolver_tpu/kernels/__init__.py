from .fista_vmem import (
    fista_gram_vmem,
    fista_gram_vmem_sharded,
    momentum_betas,
    auto_b_tile,
)

__all__ = [
    "fista_gram_vmem",
    "fista_gram_vmem_sharded",
    "momentum_betas",
    "auto_b_tile",
]
