from .spatial import (
    shard_solver_spatially,
    spatial_device_mesh,
    spatial_spec,
)
from .sweep import SweepResult, solve_sweep

__all__ = [
    "SweepResult",
    "solve_sweep",
    "shard_solver_spatially",
    "spatial_device_mesh",
    "spatial_spec",
]
