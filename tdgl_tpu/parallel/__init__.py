from .sweep import SweepResult, solve_sweep

__all__ = ["SweepResult", "solve_sweep"]
