"""JAX/TPU solver path: jitted operators, preconditioners, and PCG."""

from .heateq import HeatSolver, SolveResult, solve_heat_equation_tpu
from .pcg import pcg

__all__ = ["HeatSolver", "SolveResult", "solve_heat_equation_tpu", "pcg"]
