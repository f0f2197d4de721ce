"""Batched SDE/ODE integrators and Monte-Carlo rollouts.

Reference: ``c3sc/src/simulate.c`` ``struct Integrator`` (Euler, RK4,
Euler–Maruyama) + ``struct Trajectory`` (line n/a, empty mount; SURVEY.md
§2.1/§3.3). The reference steps ONE trajectory in a C loop; here a whole
batch of scenarios advances in lockstep under ``lax.scan`` + ``vmap`` — the
"thousands of batched rollouts" design of SURVEY.md §7 item 8. Absorbing
boundaries freeze a trajectory and charge the discounted exit cost once.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import Boundary, ControlProblem


class Trajectory(NamedTuple):
    """Batched rollout record (the `struct Trajectory` equivalent)."""

    xs: jnp.ndarray      # [T+1, B, d] states
    us: jnp.ndarray      # [T, B, du] controls applied
    cost: jnp.ndarray    # [B] realized discounted cost
    alive: jnp.ndarray   # [T+1, B] bool — False once absorbed
    exit_time: jnp.ndarray  # [B] absorption time (= T*dt_sim if never)


def trajectory_save(path: str, traj: Trajectory) -> None:
    """Persist a batched rollout record (``trajectory_save`` parity,
    reference ``simulate.c`` — the linked-list dump becomes one npz)."""
    import numpy as np

    np.savez_compressed(
        path, xs=np.asarray(traj.xs), us=np.asarray(traj.us),
        cost=np.asarray(traj.cost), alive=np.asarray(traj.alive),
        exit_time=np.asarray(traj.exit_time),
    )


def trajectory_load(path: str) -> Trajectory:
    import numpy as np

    z = np.load(path)
    return Trajectory(
        xs=jnp.asarray(z["xs"]), us=jnp.asarray(z["us"]),
        cost=jnp.asarray(z["cost"]), alive=jnp.asarray(z["alive"]),
        exit_time=jnp.asarray(z["exit_time"]),
    )


def _apply_boundaries(problem: ControlProblem, grid: Grid, x):
    """Post-step boundary projection.

    Returns (x_projected, absorbed_mask). Periodic dims wrap, reflect dims
    clamp; absorbing dims leaving the box (or entering an obstacle) absorb.
    """
    lb = jnp.asarray(problem.lb, x.dtype)
    ub = jnp.asarray(problem.ub, x.dtype)
    x = grid.wrap_state(x)
    absorbed = jnp.zeros(x.shape[:-1], bool)
    for k in range(problem.dx):
        b = problem.boundary[k]
        if b == Boundary.ABSORB:
            absorbed = absorbed | (x[..., k] < lb[k]) | (x[..., k] > ub[k])
        if b != Boundary.PERIODIC:
            x = x.at[..., k].set(jnp.clip(x[..., k], lb[k], ub[k]))
    absorbed = absorbed | problem.in_obstacle(x)
    return x, absorbed


def _exit_value(problem: ControlProblem, x):
    psi = problem.boundary_cost(x)
    if problem.obstacles:
        inobs = problem.in_obstacle(x)
        psi = jnp.where(inobs, problem.obstacle_cost(x), psi)
    return psi


def rollout(
    problem: ControlProblem,
    grid: Grid,
    policy: Callable,
    x0,
    key,
    dt: float,
    n_steps: int,
    policy_every: int = 1,
    method: str = "euler_maruyama",
) -> Trajectory:
    """Closed-loop rollouts.

    x0: [B, d] initial states;  policy: x [B, d] -> u [B, du].
    policy_every: recompute the (expensive) implicit argmin every k steps —
    zero-order-hold in between (the reference's per-step fresh c3opt solve
    corresponds to policy_every=1).
    method: 'euler_maruyama' (SDE, default), 'euler' or 'rk4'
    (deterministic — reference integrator_set_type parity, SURVEY.md §2.1).
    """
    B = x0.shape[0]
    dtf = jnp.asarray(dt, x0.dtype)
    sqdt = jnp.sqrt(dtf)
    drift_b = jax.vmap(problem.drift)
    diff_b = jax.vmap(problem.diff)
    g_b = jax.vmap(problem.stage_cost)
    exit_b = jax.vmap(_exit_value, in_axes=(None, 0))

    def step(carry, inp):
        x, u_prev, cost, alive, t, texit = carry
        k, i = inp
        u = jax.lax.cond(i % policy_every == 0, lambda: policy(x), lambda: u_prev)
        if method == "rk4":
            k1 = drift_b(x, u)
            k2 = drift_b(x + 0.5 * dtf * k1, u)
            k3 = drift_b(x + 0.5 * dtf * k2, u)
            k4 = drift_b(x + dtf * k3, u)
            xn = x + (dtf / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        elif method == "rkf45":
            # Runge-Kutta-Fehlberg 4(5), fixed step, 5th-order solution
            # (reference integrator_set_type parity, SURVEY.md §2.1 L6;
            # the adaptive step-size control stays host-side — inside
            # lax.scan the step is fixed by construction)
            k1 = drift_b(x, u)
            k2 = drift_b(x + dtf * (k1 / 4.0), u)
            k3 = drift_b(x + dtf * (3 * k1 + 9 * k2) / 32.0, u)
            k4 = drift_b(
                x + dtf * (1932 * k1 - 7200 * k2 + 7296 * k3) / 2197.0, u)
            k5 = drift_b(
                x + dtf * (439 * k1 / 216 - 8 * k2 + 3680 * k3 / 513
                           - 845 * k4 / 4104), u)
            k6 = drift_b(
                x + dtf * (-8 * k1 / 27 + 2 * k2 - 3544 * k3 / 2565
                           + 1859 * k4 / 4104 - 11 * k5 / 40), u)
            xn = x + dtf * (16 * k1 / 135 + 6656 * k3 / 12825
                            + 28561 * k4 / 56430 - 9 * k5 / 50 + 2 * k6 / 55)
        elif method == "euler":
            xn = x + drift_b(x, u) * dtf
        else:  # euler_maruyama
            f = drift_b(x, u)
            L = diff_b(x, u)
            noise = jax.random.normal(k, (B, problem.dw), x.dtype)
            xn = x + f * dtf + jnp.einsum("bij,bj->bi", L, noise) * sqdt
        xn, absorbed_now = _apply_boundaries(problem, grid, xn)
        newly = absorbed_now & alive
        disc = jnp.exp(-problem.beta * t)
        # running cost while alive; exit cost charged once on absorption
        cost = cost + jnp.where(alive, disc * g_b(x, u) * dtf, 0.0)
        cost = cost + jnp.where(
            newly, jnp.exp(-problem.beta * (t + dtf)) * exit_b(problem, xn), 0.0
        )
        alive_next = alive & ~absorbed_now
        xn = jnp.where(alive[:, None], xn, x)  # freeze absorbed trajectories
        texit = jnp.where(newly, t + dtf, texit)
        return (xn, u, cost, alive_next, t + dtf, texit), (xn, u, alive_next)

    keys = jax.random.split(key, n_steps)
    u0 = jnp.zeros((B, problem.du), x0.dtype)
    cost0 = jnp.zeros(B, x0.dtype)
    alive0 = jnp.ones(B, bool)
    texit0 = jnp.full(B, n_steps * dt, x0.dtype)
    (xT, _, cost, aliveT, _, texit), (xs, us, alives) = jax.lax.scan(
        step, (x0, u0, cost0, alive0, jnp.asarray(0.0, x0.dtype), texit0),
        (keys, jnp.arange(n_steps)),
    )
    xs = jnp.concatenate([x0[None], xs], axis=0)
    alives = jnp.concatenate([alive0[None], alives], axis=0)
    return Trajectory(xs=xs, us=us, cost=cost, alive=alives, exit_time=texit)
