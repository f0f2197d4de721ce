"""Perching glider: 4D nonlinear flat-plate dynamics, terminal-cost DP.

Reference: ``c3sc/examples`` perching-glider system (line n/a, empty mount;
SURVEY.md §2.1; BASELINE.json configs[3]).

Flat-plate glider in the longitudinal plane, state (x, z, v, gamma):
position, airspeed, flight-path angle; control = angle of attack alpha.

    x'     = v cos(gamma)
    z'     = v sin(gamma)
    v'     = -g sin(gamma) - D(v, alpha)/m           + noise
    gamma' =  L(v, alpha)/(m v) - g cos(gamma)/v     + noise

with flat-plate aero  C_L = 2 sin(a) cos(a),  C_D = 2 sin^2(a) + cd0,
L = q S C_L, D = q S C_D, q = rho v^2 / 2.

Perching: reach the plane x = 0 (absorbing) with small z, v, gamma
deviations — charged by the terminal/boundary cost psi.
"""

from __future__ import annotations

import jax.numpy as jnp

from c3sc_tpu.models.base import Boundary, ControlProblem


def make_glider_problem(
    mass: float = 0.08,
    s_area: float = 0.1,
    rho: float = 1.2,
    gconst: float = 9.81,
    cd0: float = 0.02,
    sigma_v: float = 0.2,
    sigma_g: float = 0.1,
    beta: float = 0.05,
    alpha_max: float = 0.9,
    miss_cost: float = 50.0,
    target_z: float = 0.0,
    target_v: float = 1.0,
) -> ControlProblem:
    qs = 0.5 * rho * s_area

    def drift(x, u):
        _, _, v, gam = x[0], x[1], x[2], x[3]
        a = u[0]
        vsafe = jnp.maximum(v, 0.3)
        cl = 2.0 * jnp.sin(a) * jnp.cos(a)
        cd = 2.0 * jnp.sin(a) ** 2 + cd0
        lift = qs * vsafe**2 * cl
        drag = qs * vsafe**2 * cd
        dv = -gconst * jnp.sin(gam) - drag / mass
        dgam = lift / (mass * vsafe) - gconst * jnp.cos(gam) / vsafe
        return jnp.stack([v * jnp.cos(gam), v * jnp.sin(gam), dv, dgam])

    def diff(x, u):
        return jnp.array(
            [[0.0, 0.0], [0.0, 0.0], [sigma_v, 0.0], [0.0, sigma_g]]
        )

    def stage_cost(x, u):
        return 0.1 + 0.1 * u[0] ** 2

    def boundary_cost(x):
        # perch quality at exit: miss distance in (z, v, gamma); exits far
        # from the perch plane (x > 0 side walls, etc.) are dominated by the
        # z/v terms and thus expensive, matching "terminal-cost DP".
        z, v, gam = x[1], x[2], x[3]
        miss = 4.0 * (z - target_z) ** 2 + 1.0 * (v - target_v) ** 2 + 0.5 * gam**2
        # the glider flies in +x; only the x=ub face is the perch — other
        # exits pay full miss_cost
        at_perch = x[0] >= 0.4
        return jnp.where(at_perch, miss, miss_cost)

    return ControlProblem(
        dx=4, du=1, dw=2,
        lb=(-3.5, -1.5, 0.3, -1.2), ub=(0.5, 1.5, 6.0, 1.2),
        boundary=(Boundary.ABSORB, Boundary.ABSORB, Boundary.REFLECT, Boundary.REFLECT),
        ulb=(-alpha_max,), uub=(alpha_max,),
        drift=drift, diff=diff,
        stage_cost=stage_cost, boundary_cost=boundary_cost,
        # drift is NONLINEAR in u (angle of attack) — no affine fast path;
        # diffusion and cost structure still declared
        sigma2_x=lambda x: jnp.array([0.0, 0.0, sigma_v**2, sigma_g**2]),
        cost_q=lambda x: jnp.asarray(0.1),
        cost_r=lambda u: 0.1 * u[0] ** 2,
        beta=beta, name="glider",
        value_bounds=(
            0.0,
            max(miss_cost * 1.5,
                (0.1 + 0.1 * alpha_max**2) / max(beta, 1e-6)),
        ),
    )
