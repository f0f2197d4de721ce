"""Problem registry: the 5 reference systems of goroda/c3sc's examples.

Reference: ``c3sc/examples/<system>/`` — line n/a (empty mount); systems match
``BASELINE.json`` ``configs`` exactly. See SURVEY.md §2.1.
"""

from c3sc_tpu.models.base import Boundary, ControlProblem, Obstacle
from c3sc_tpu.models.lq import make_lq_family, make_lq_problem, lqr_solution
from c3sc_tpu.models.pendulum import make_pendulum_problem
from c3sc_tpu.models.dubins import make_dubins_problem
from c3sc_tpu.models.glider import make_glider_problem
from c3sc_tpu.models.quadcopter import (make_quadcopter7_problem,
                                         make_quadcopter_family,
                                         make_quadcopter_problem)

REGISTRY = {
    "lq": make_lq_problem,
    "pendulum": make_pendulum_problem,
    "dubins": make_dubins_problem,
    "glider": make_glider_problem,
    "quadcopter": make_quadcopter_problem,
    "quadcopter7": make_quadcopter7_problem,
}


def make_problem(name: str, **kwargs):
    """Build a named reference problem (+ its default grid)."""
    return REGISTRY[name](**kwargs)


__all__ = [
    "Boundary",
    "ControlProblem",
    "Obstacle",
    "REGISTRY",
    "make_problem",
    "make_lq_problem",
    "lqr_solution",
    "make_pendulum_problem",
    "make_dubins_problem",
    "make_glider_problem",
    "make_quadcopter_problem",
    "make_quadcopter7_problem",
]
