from .fista_vmem import fista_gram_vmem, momentum_betas

__all__ = ["fista_gram_vmem", "momentum_betas"]
