"""Pendulum swing-up: 2D state (theta, omega), periodic angle, bounded torque.

Reference: ``c3sc/examples/pendulum`` (line n/a, empty mount; SURVEY.md §2.1;
BASELINE.json configs[1]).

    d theta = omega dt
    d omega = ((g/l) sin(theta) - b*omega + u/(m l^2)) dt + sigma dw

theta = 0 is UPRIGHT (the unstable equilibrium to stabilize); theta is
periodic on [-pi, pi). Smooth periodic stage cost
    g(x,u) = w_th * 2*(1 - cos theta) + w_om * omega^2 + w_u * u^2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models.base import Boundary, ControlProblem


def make_pendulum_problem(
    g: float = 9.81,
    length: float = 1.0,
    mass: float = 1.0,
    damping: float = 0.1,
    sigma: float = 0.5,
    beta: float = 0.1,
    omega_max: float = 8.0,
    u_max: float = 4.0,
    w_th: float = 1.0,
    w_om: float = 0.1,
    w_u: float = 0.05,
) -> ControlProblem:
    ml2 = mass * length**2

    def drift(x, u):
        th, om = x[0], x[1]
        dom = (g / length) * jnp.sin(th) - damping * om + u[0] / ml2
        return jnp.stack([om, dom])

    def diff(x, u):
        return jnp.array([[0.0], [sigma]])

    def stage_cost(x, u):
        th, om = x[0], x[1]
        return w_th * 2.0 * (1.0 - jnp.cos(th)) + w_om * om**2 + w_u * u[0] ** 2

    def boundary_cost(x):
        # reflecting omega boundary: psi only used if regime changed to absorb
        return jnp.asarray(0.0)

    # fast-path structure: control-affine drift, u-independent diffusion,
    # separable cost (SURVEY.md §7: batch everything)
    def drift_f0(x):
        return jnp.stack([x[1], (g / length) * jnp.sin(x[0]) - damping * x[1]])

    def drift_G(x):
        return jnp.array([[0.0], [1.0 / ml2]])

    def sigma2_x(x):
        return jnp.array([0.0, sigma**2])

    def cost_q(x):
        return w_th * 2.0 * (1.0 - jnp.cos(x[0])) + w_om * x[1] ** 2

    def cost_r(u):
        return w_u * u[0] ** 2

    g_sup = w_th * 4.0 + w_om * omega_max**2 + w_u * u_max**2
    return ControlProblem(
        dx=2, du=1, dw=1,
        lb=(-np.pi, -omega_max), ub=(np.pi, omega_max),
        boundary=(Boundary.PERIODIC, Boundary.REFLECT),
        ulb=(-u_max,), uub=(u_max,),
        drift=drift, diff=diff,
        stage_cost=stage_cost, boundary_cost=boundary_cost,
        drift_f0=drift_f0, drift_G=drift_G, sigma2_x=sigma2_x,
        cost_q=cost_q, cost_r=cost_r,
        beta=beta, name="pendulum",
        value_bounds=(0.0, g_sup / max(beta, 1e-6)),
    )
