"""Dubins car: 3D reach-avoid with obstacle cost.

Reference: ``c3sc/examples`` Dubins/car system (line n/a, empty mount;
SURVEY.md §2.1; BASELINE.json configs[2]).

    dx = V cos(theta) dt + sigma_xy dw1
    dy = V sin(theta) dt + sigma_xy dw2
    dtheta = u dt + sigma_th dw3

Min-time reach of a goal disc (modeled as an absorbing rectangle with cost 0)
while avoiding absorbing obstacle rectangles (high cost); leaving the domain
is absorbing with moderate cost. Stage cost ~ 1 (time) + small u^2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models.base import Boundary, ControlProblem, Obstacle


def make_dubins_problem(
    speed: float = 1.0,
    sigma_xy: float = 0.05,
    sigma_th: float = 0.2,
    beta: float = 0.2,
    box: float = 4.0,
    u_max: float = 2.0,
    w_u: float = 0.1,
    exit_cost: float = 50.0,
    obstacle_cost: float = 100.0,
    goal_half: float = 0.5,
    with_obstacles: bool = True,
) -> ControlProblem:
    def drift(x, u):
        th = x[2]
        return jnp.stack([speed * jnp.cos(th), speed * jnp.sin(th), u[0]])

    def diff(x, u):
        return jnp.diag(jnp.array([sigma_xy, sigma_xy, sigma_th]))

    def stage_cost(x, u):
        return 1.0 + w_u * u[0] ** 2

    def boundary_cost(x):
        return jnp.asarray(exit_cost)

    goal = Obstacle(  # absorbing goal region, zero cost
        lb=(-goal_half, -goal_half, -np.pi), ub=(goal_half, goal_half, np.pi), cost=0.0
    )
    obstacles = [goal]
    if with_obstacles:
        obstacles += [
            Obstacle(lb=(1.2, -2.8, -np.pi), ub=(2.2, -0.6, np.pi), cost=obstacle_cost),
            Obstacle(lb=(-2.4, 1.0, -np.pi), ub=(-1.0, 2.2, np.pi), cost=obstacle_cost),
        ]

    return ControlProblem(
        dx=3, du=1, dw=3,
        lb=(-box, -box, -np.pi), ub=(box, box, np.pi),
        boundary=(Boundary.ABSORB, Boundary.ABSORB, Boundary.PERIODIC),
        ulb=(-u_max,), uub=(u_max,),
        drift=drift, diff=diff,
        stage_cost=stage_cost, boundary_cost=boundary_cost,
        drift_f0=lambda x: jnp.stack(
            [speed * jnp.cos(x[2]), speed * jnp.sin(x[2]), jnp.zeros(())]),
        drift_G=lambda x: jnp.array([[0.0], [0.0], [1.0]]),
        sigma2_x=lambda x: jnp.array(
            [sigma_xy**2, sigma_xy**2, sigma_th**2]),
        cost_q=lambda x: jnp.asarray(1.0),
        cost_r=lambda u: w_u * u[0] ** 2,
        beta=beta, obstacles=tuple(obstacles), name="dubins",
        value_bounds=(
            0.0,
            max(exit_cost, obstacle_cost,
                (1.0 + w_u * u_max**2) / max(beta, 1e-6)),
        ),
    )
