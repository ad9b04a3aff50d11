from .api import (stack_problems, solve_batch, solve_gram_batch,
                  solve_lasso_batch, batch_lipschitz)
from .fista_gram import fista_gram_batch, GramBatch, make_gram_batch, init_batch_state
from .path import lasso_path, alpha_ladder, alpha_max_for, path_gram_batch
from .cv import cv_lasso, CVResult

__all__ = [
    "cv_lasso",
    "CVResult",
    "stack_problems",
    "solve_batch",
    "solve_gram_batch",
    "solve_lasso_batch",
    "batch_lipschitz",
    "fista_gram_batch",
    "GramBatch",
    "make_gram_batch",
    "init_batch_state",
    "lasso_path",
    "alpha_ladder",
    "alpha_max_for",
    "path_gram_batch",
]
