from .cg import CGResult, cg_solve, solve_mu_poisson

__all__ = ["CGResult", "cg_solve", "solve_mu_poisson"]
