"""Problem definitions — the "model zoo" of this framework.

The reference's models are heat-equation benchmark problems (SURVEY.md §2
"Problem library"); each is a domain + data (g, u0), optionally manufactured
from a closed-form exact solution for error reporting.
"""

from .problems import Problem, get_problem, register_problem, PROBLEMS

__all__ = ["Problem", "get_problem", "register_problem", "PROBLEMS"]
