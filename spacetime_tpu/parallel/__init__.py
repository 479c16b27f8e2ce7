"""Multi-device execution: timesteps sharded over a 1-D ``time`` mesh axis.

The reference's mpi4py time-slab communicator (SURVEY.md §2, L1) maps to a
``jax.sharding.Mesh`` with a single ``time`` axis: the (N_t+1, *grid) space-
time coefficient array is sharded on axis 0, the banded-in-time operators
become nearest-neighbor collective-permutes, dot products become psums, and
the wavelet levels induce log-depth tree communication — all inserted by
GSPMD from sharding annotations on one jitted program (the scaling-book
recipe), not hand-written point-to-point calls.
"""

from .explicit import ExplicitHeatSolver
from .explicit2d import Explicit2DHeatSolver
from .mesh import make_spacetime_mesh, make_time_mesh
from .sharded import ShardedHeatSolver

__all__ = [
    "make_time_mesh",
    "make_spacetime_mesh",
    "ShardedHeatSolver",
    "ExplicitHeatSolver",
    "Explicit2DHeatSolver",
]
