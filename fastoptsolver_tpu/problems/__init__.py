from .base import CustomProblem, fold_alphas, REG_TYPES
from .least_squares import LeastSquares, GramLeastSquares, LogisticRegression
from .generators import (
    generate_boston_like,
    generate_scenario,
    generate_scenario_batch,
    scenario_grid,
    X_TRUE,
)

__all__ = [
    "CustomProblem",
    "fold_alphas",
    "REG_TYPES",
    "LeastSquares",
    "GramLeastSquares",
    "LogisticRegression",
    "generate_boston_like",
    "generate_scenario",
    "generate_scenario_batch",
    "scenario_grid",
    "X_TRUE",
]
