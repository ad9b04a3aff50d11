from .host import (
    ScenarioLoader,
    ensure_built,
    native_available,
    generate_scenarios_host,
    standardize_host,
    gram_batch_host,
)

__all__ = [
    "ScenarioLoader",
    "ensure_built",
    "native_available",
    "generate_scenarios_host",
    "standardize_host",
    "gram_batch_host",
]
