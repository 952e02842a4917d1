"""L5 parallel execution: device-mesh sweeps and sequence-parallel primitives."""

from ..train.batching import run_mesh
from .sweep import expand_grid, run_sweep, RUNNERS

__all__ = ["run_mesh", "expand_grid", "run_sweep", "RUNNERS"]
