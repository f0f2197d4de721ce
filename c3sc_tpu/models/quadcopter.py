"""Quadcopter: 6D planar-quadrotor stochastic hover/MPC — the target config.

Reference: ``c3sc/examples`` quadcopter system (6–7D) (line n/a, empty mount;
SURVEY.md §2.1; BASELINE.json configs[4] — "rank-adaptive FT +
receding-horizon replan").

Planar quadrotor, state (x, z, th, vx, vz, om), controls (u1, u2) = rotor
thrusts in [0, u_max]:

    x'  = vx                     vx' = -(u1 + u2) sin(th) / m      + noise
    z'  = vz                     vz' =  (u1 + u2) cos(th) / m - g  + noise
    th' = om                     om' =  arm (u1 - u2) / inertia    + noise

Quadratic stage cost to hover at the origin.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models.base import Boundary, ControlProblem


def make_quadcopter_problem(
    mass: float = 0.5,
    inertia: float = 0.01,
    arm: float = 0.17,
    gconst: float = 9.81,
    sigma_v: float = 0.25,
    sigma_om: float = 0.25,
    beta: float = 0.2,
    u_max: float = 6.0,
    pos_max: float = 2.0,
    th_max: float = 1.0,
    vel_max: float = 3.0,
    om_max: float = 4.0,
    w_pos: float = 2.0,
    w_th: float = 1.0,
    w_vel: float = 0.2,
    w_om: float = 0.1,
    w_u: float = 0.02,
    exit_cost: float = 100.0,
) -> ControlProblem:
    hover = 0.5 * mass * gconst  # per-rotor hover thrust (cost reference)

    def drift(x, u):
        th, vx, vz, om = x[2], x[3], x[4], x[5]
        thrust = u[0] + u[1]
        return jnp.stack(
            [
                vx,
                vz,
                om,
                -thrust * jnp.sin(th) / mass,
                thrust * jnp.cos(th) / mass - gconst,
                arm * (u[0] - u[1]) / inertia,
            ]
        )

    def diff(x, u):
        L = jnp.zeros((6, 3))
        L = L.at[3, 0].set(sigma_v)
        L = L.at[4, 1].set(sigma_v)
        L = L.at[5, 2].set(sigma_om)
        return L

    def stage_cost(x, u):
        pos = x[0] ** 2 + x[1] ** 2
        du = (u[0] - hover) ** 2 + (u[1] - hover) ** 2
        return (
            w_pos * pos
            + w_th * x[2] ** 2
            + w_vel * (x[3] ** 2 + x[4] ** 2)
            + w_om * x[5] ** 2
            + w_u * du
        )

    def boundary_cost(x):
        return jnp.asarray(exit_cost)

    # control-affine structure: f(x, u) = f0(x) + G(x) u  (fast-path fields)
    def drift_f0(x):
        return jnp.stack([x[3], x[4], x[5], jnp.zeros(()), -jnp.full((), gconst),
                          jnp.zeros(())])

    def drift_G(x):
        s, c = jnp.sin(x[2]) / mass, jnp.cos(x[2]) / mass
        k = arm / inertia
        z = jnp.zeros(())
        return jnp.stack([
            jnp.stack([z, z]), jnp.stack([z, z]), jnp.stack([z, z]),
            jnp.stack([-s, -s]), jnp.stack([c, c]),
            jnp.stack([jnp.full((), k), jnp.full((), -k)]),
        ])

    def sigma2_x(x):
        return jnp.array([0.0, 0.0, 0.0, sigma_v**2, sigma_v**2, sigma_om**2])

    def cost_q(x):
        return (w_pos * (x[0] ** 2 + x[1] ** 2) + w_th * x[2] ** 2
                + w_vel * (x[3] ** 2 + x[4] ** 2) + w_om * x[5] ** 2)

    def cost_r(u):
        return w_u * ((u[0] - hover) ** 2 + (u[1] - hover) ** 2)

    return ControlProblem(
        dx=6, du=2, dw=3,
        lb=(-pos_max, -pos_max, -th_max, -vel_max, -vel_max, -om_max),
        ub=(pos_max, pos_max, th_max, vel_max, vel_max, om_max),
        boundary=(
            Boundary.ABSORB, Boundary.ABSORB, Boundary.REFLECT,
            Boundary.REFLECT, Boundary.REFLECT, Boundary.REFLECT,
        ),
        ulb=(0.0, 0.0), uub=(u_max, u_max),
        drift=drift, diff=diff,
        stage_cost=stage_cost, boundary_cost=boundary_cost,
        drift_f0=drift_f0, drift_G=drift_G, sigma2_x=sigma2_x,
        cost_q=cost_q, cost_r=cost_r,
        beta=beta, name="quadcopter",
        value_bounds=(0.0, max(exit_cost, _g_sup(
            w_pos, w_th, w_vel, w_om, w_u, pos_max, th_max, vel_max, om_max,
            u_max, hover) / max(beta, 1e-6))),
    )


def _g_sup(w_pos, w_th, w_vel, w_om, w_u, pos_max, th_max, vel_max, om_max,
           u_max, hover):
    return (
        w_pos * 2 * pos_max**2 + w_th * th_max**2 + w_vel * 2 * vel_max**2
        + w_om * om_max**2 + w_u * 2 * max(hover, u_max - hover) ** 2
    )


def make_quadcopter_family(**kwargs):
    """Moving-hover-target quadcopter FAMILY: ``family(theta) ->
    ControlProblem`` where theta [2] = (x*, z*) is the hover target the
    position cost tracks. All other terms match
    ``make_quadcopter_problem`` exactly; theta may be a traced array, so
    ``sim/tracking.py`` re-solves a target move as a dispatch of one
    compiled program (the north-star time-varying-cost loop;
    BASELINE.json north_star sentence 2)."""
    base = make_quadcopter_problem(**kwargs)
    w_pos = kwargs.get("w_pos", 2.0)
    b_cost_q, b_stage = base.cost_q, base.stage_cost

    def family(theta):
        theta = jnp.asarray(theta)

        def cost_q(x):
            # replace the origin-centered position term with the target-
            # centered one; every other term is the base problem's
            return (b_cost_q(x)
                    - w_pos * (x[0] ** 2 + x[1] ** 2)
                    + w_pos * ((x[0] - theta[0]) ** 2
                               + (x[1] - theta[1]) ** 2))

        def stage_cost(x, u):
            return (b_stage(x, u)
                    - w_pos * (x[0] ** 2 + x[1] ** 2)
                    + w_pos * ((x[0] - theta[0]) ** 2
                               + (x[1] - theta[1]) ** 2))

        return dataclasses.replace(base, cost_q=cost_q,
                                   stage_cost=stage_cost,
                                   name="quadcopter_tracking")

    return family


def make_quadcopter7_problem(
    wind_tau: float = 2.0,
    wind_sigma: float = 0.6,
    wind_max: float = 1.5,
    **kwargs,
) -> ControlProblem:
    """7D quadcopter: the 6D planar quadrotor + an Ornstein-Uhlenbeck wind
    state w acting on horizontal acceleration.

    Reference: BASELINE.json configs[4] / SURVEY.md §0 describe the
    flagship as "quadcopter (6-7D)"; this is the 7D variant — the wind is
    an exogenous colored disturbance the controller must lean against:

        vx' += w          (wind drag acceleration)
        w'   = -w / tau + sigma_w dW

    State (x, z, th, vx, vz, om, w), controls unchanged (2 rotor thrusts).
    Control-affine structure and separable costs are preserved, so the
    MCA fast paths stay active.
    """
    base = make_quadcopter_problem(**kwargs)
    b_drift, b_f0, b_G = base.drift, base.drift_f0, base.drift_G
    b_s2, b_cost_q = base.sigma2_x, base.cost_q

    def drift(x, u):
        f6 = b_drift(x[:6], u)
        return jnp.concatenate([
            f6.at[3].add(x[6]),                       # wind pushes vx
            jnp.stack([-x[6] / wind_tau]),
        ])

    def diff(x, u):
        L6 = base.diff(x[:6], u)                      # [6, 3]
        L = jnp.zeros((7, 4), L6.dtype)
        L = L.at[:6, :3].set(L6)
        return L.at[6, 3].set(wind_sigma)

    def drift_f0(x):
        f6 = b_f0(x[:6])
        return jnp.concatenate([
            f6.at[3].add(x[6]),
            jnp.stack([-x[6] / wind_tau]),
        ])

    def drift_G(x):
        G6 = b_G(x[:6])                               # [6, 2]
        return jnp.concatenate([G6, jnp.zeros((1, 2), G6.dtype)], axis=0)

    def sigma2_x(x):
        return jnp.concatenate([b_s2(x[:6]), jnp.array([wind_sigma**2])])

    def cost_q(x):
        return b_cost_q(x[:6])                        # wind itself is free

    return ControlProblem(
        dx=7, du=2, dw=4,
        lb=base.lb + (-wind_max,), ub=base.ub + (wind_max,),
        boundary=base.boundary + (Boundary.REFLECT,),
        ulb=base.ulb, uub=base.uub,
        drift=drift, diff=diff,
        stage_cost=lambda x, u: base.stage_cost(x[:6], u),
        boundary_cost=lambda x: base.boundary_cost(x[:6]),
        drift_f0=drift_f0, drift_G=drift_G, sigma2_x=sigma2_x,
        cost_q=cost_q, cost_r=base.cost_r,
        beta=base.beta, name="quadcopter7",
        value_bounds=base.value_bounds,
    )
