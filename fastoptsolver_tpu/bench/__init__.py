from .sweep import run_sweep, suboptimality, plot_scenario, build_scenarios

__all__ = ["run_sweep", "suboptimality", "plot_scenario", "build_scenarios"]
