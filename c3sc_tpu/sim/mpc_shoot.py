"""Receding-horizon shooting MPC: trajectory optimization over the learned
value function — the flagship deployment mode.

BASELINE.json north_star: "a TPU-native stochastic MPC / trajectory-
optimization engine ... the receding-horizon outer loop re-solves online";
configs[4]: "Quadcopter 6-7D stochastic MPC, rank-adaptive FT +
receding-horizon replan". The reference realizes the replan as a fresh
per-step ``c3opt`` argmin against the value function (``c3sc/src/
simulate.c`` — line n/a, empty mount; SURVEY.md §3.3). That one-step greedy
extraction is hypersensitive near cost minima where the value gradient
vanishes: the round-4 frontier measurement (experiments/frontier_n*.json)
shows even SVD-OPTIMAL rank-64/81 value truncations (q95 0.1-0.2% of the
value range) realize 0.5-25% closed-loop cost deviation — WHERE a tilted
flat basin parks the plant is quasi-random in the truncation rank, because
a one-step Q argmin reads only the (tiny, noise-dominated) local value
differences.

The TPU-native deployment controller instead optimizes a full control
TRAJECTORY per replan (certainty-equivalent receding horizon):

    min_{u_0..u_{H-1}}  sum_t e^{-beta t dt} g(x_t, u_t) dt
                        + e^{-beta H dt} V(x_H),
    x_{t+1} = x_t + dt f(x_t, u_t),   u_t in [ulb, uub],

with gradients through the whole shooting scan via ``jax.grad`` (the
dynamics are differentiable JAX callables) and a projected-Adam inner
optimizer — thousands of rollout scenarios replan in ONE batched jitted
program. The stage-cost integral re-anchors the attractor that the value
error tilts: the terminal value still steers global behavior (it is the
only cost-to-go information beyond the horizon) but no longer decides the
parking point by its local gradient. Measured on the 9^6 quadcopter
against the dense oracle under common random numbers: see NORTHSTAR.json
(deployment-mode cost parity) vs its greedy-rollout row.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import Boundary, ControlProblem
from c3sc_tpu.sim.integrators import Trajectory, _apply_boundaries, _exit_value


def problem_periodic(problem: ControlProblem):
    """Per-dim bool: True where the boundary wraps."""
    return [b == Boundary.PERIODIC for b in problem.boundary]


def make_plan_fn(
    problem: ControlProblem,
    value_fn: Callable,
    dt: float,
    horizon: int,
    opt_iters: int = 30,
    lr: float = 0.15,
):
    """Build ``plan(x [B, d], u_seq [B, H, du]) -> u_seq`` — projected-Adam
    trajectory optimization of the certainty-equivalent shooting objective,
    warm-started from the previous plan."""
    drift_b = jax.vmap(problem.drift)
    g_b = jax.vmap(problem.stage_cost)
    ulb = jnp.asarray(problem.ulb, jnp.float32)
    uub = jnp.asarray(problem.uub, jnp.float32)
    lb = jnp.asarray(problem.lb, jnp.float32)
    ub = jnp.asarray(problem.ub, jnp.float32)
    periodic = jnp.asarray(problem_periodic(problem))
    dtf = jnp.float32(dt)
    beta = jnp.float32(problem.beta)

    def objective_per_sample(u_seq, x0):
        """Discounted horizon cost + terminal value, per batch sample [B]."""

        def step(carry, u_t):
            x, t = carry
            cost_t = jnp.exp(-beta * t) * g_b(x, u_t) * dtf       # [B]
            xn = x + drift_b(x, u_t) * dtf
            # differentiable box projection: reflect/absorb dims clamp (the
            # planner's smooth surrogate; the PLANT applies true semantics).
            # Periodic dims stay free — value_fn wraps internally, and
            # clamping an angle would wall off the swing-through.
            xn = jnp.where(periodic, xn, jnp.clip(xn, lb, ub))
            return (xn, t + dtf), cost_t

        (xH, tH), costs = jax.lax.scan(
            step, (x0, jnp.float32(0.0)), jnp.swapaxes(u_seq, 0, 1))
        return costs.sum(0) + jnp.exp(-beta * tH) * value_fn(xH)   # [B]

    # batch samples are independent, so the gradient of the SUM is the
    # per-sample gradient
    grad_fn = jax.grad(lambda u, x0: objective_per_sample(u, x0).sum())

    def plan(x0, u_seq):
        """Projected Adam with PER-SAMPLE monotone acceptance.

        Shooting gradients through an open-loop-unstable plant explode
        with the horizon (measured on the 6D quadcopter: 30 free Adam
        steps at lr 0.2 walked the planned terminal state into the
        absorbing walls, J 2.2 -> 31.8). Tracking the best-J sequence per
        sample makes the planner MONOTONE relative to its warm start —
        it can polish the greedy seed but never trade it away."""
        J0 = objective_per_sample(u_seq, x0)

        def adam_step(i, carry):
            u, m, v, u_best, J_best = carry
            g = grad_fn(u, x0)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mh = m / (1.0 - 0.9 ** (i + 1.0))
            vh = v / (1.0 - 0.999 ** (i + 1.0))
            u = jnp.clip(u - lr * mh / (jnp.sqrt(vh) + 1e-8), ulb, uub)
            J = objective_per_sample(u, x0)
            better = J < J_best                                    # [B]
            u_best = jnp.where(better[:, None, None], u, u_best)
            J_best = jnp.where(better, J, J_best)
            return (u, m, v, u_best, J_best)

        _, _, _, u_best, _ = jax.lax.fori_loop(
            0, opt_iters, adam_step,
            (u_seq, jnp.zeros_like(u_seq), jnp.zeros_like(u_seq), u_seq, J0))
        return u_best

    return plan, objective_per_sample


def _rh_rollout(problem, grid, value_fn, x0, u_init, key, dt, n_steps,
                horizon, replan_every, opt_iters, lr, greedy_seed=None,
                planner="ilqr", terminal_lqr=None):
    B = x0.shape[0]
    dtf = jnp.asarray(dt, x0.dtype)
    sqdt = jnp.sqrt(dtf)
    drift_b = jax.vmap(problem.drift)
    diff_b = jax.vmap(problem.diff)
    g_b = jax.vmap(problem.stage_cost)
    exit_b = jax.vmap(_exit_value, in_axes=(None, 0))
    if planner == "ilqr":
        from c3sc_tpu.sim.ilqr import make_ilqr_plan

        plan, obj = make_ilqr_plan(problem, value_fn, dt, horizon,
                                   n_iters=opt_iters)
        obj_ps = lambda u, x: obj(u, x)
    else:
        plan, obj_ps = make_plan_fn(problem, value_fn, dt, horizon,
                                    opt_iters, lr)

    def replan(x, u_seq):
        if greedy_seed is not None:
            # the shifted previous plan goes STALE under plant noise (its
            # tail is a held action planned many steps ago); a fresh
            # deterministic greedy rollout from the CURRENT state is the
            # feedback-stabilized alternative. Seed the optimizer with the
            # per-sample better of the two — measured on the 6D
            # quadcopter, shift-only warm starts track greedy to t~1.0 s
            # and then diverge (|pos| 0.26 -> 1.32 by t = 2 s).
            u_g = greedy_seed(x)
            better = obj_ps(u_g, x) < obj_ps(u_seq, x)             # [B]
            u_seq = jnp.where(better[:, None, None], u_g, u_seq)
        return plan(x, u_seq)

    def step(carry, inp):
        x, u_seq, cost, alive, t, texit, tmode = carry
        k, i = inp
        u_seq = jax.lax.cond(i % replan_every == 0,
                             lambda: replan(x, u_seq), lambda: u_seq)
        u = u_seq[:, 0]
        if terminal_lqr is not None:
            # dual-mode MPC: once a sample first enters the terminal
            # basin it LATCHES into the exact discounted hover-LQR
            # (field-independent; sim/terminal.py docstring has the
            # measured rationale). Latching matters: a momentary
            # membership test lets a tilted value field fight the LQR at
            # the basin shell — measured on the 9^6 quad as a limit
            # cycle riding the boundary at radius-0.6 state cost (prod
            # 1.156 vs latched transient-only gaps; experiments/
            # dualmode_sweep.log). The basin is forward-invariant for
            # the LQR (tests/test_terminal.py regulation check), so the
            # latch is the textbook dual-mode commit.
            from c3sc_tpu.sim.terminal import terminal_control

            ulb = jnp.asarray(problem.ulb, x0.dtype)
            uub = jnp.asarray(problem.uub, x0.dtype)
            u_lqr, in_basin = terminal_control(terminal_lqr, x, ulb, uub)
            tmode = tmode | in_basin
            u = jnp.where(tmode[:, None], u_lqr, u)
        # plant: true stochastic dynamics + true boundary semantics,
        # cost accounting identical to integrators.rollout
        f = drift_b(x, u)
        L = diff_b(x, u)
        noise = jax.random.normal(k, (B, problem.dw), x.dtype)
        xn = x + f * dtf + jnp.einsum("bij,bj->bi", L, noise) * sqdt
        xn, absorbed_now = _apply_boundaries(problem, grid, xn)
        newly = absorbed_now & alive
        disc = jnp.exp(-problem.beta * t)
        cost = cost + jnp.where(alive, disc * g_b(x, u) * dtf, 0.0)
        cost = cost + jnp.where(
            newly, jnp.exp(-problem.beta * (t + dtf)) * exit_b(problem, xn),
            0.0)
        alive_next = alive & ~absorbed_now
        xn = jnp.where(alive[:, None], xn, x)
        texit = jnp.where(newly, t + dtf, texit)
        # receding horizon: consume the applied action, hold the last
        u_seq = jnp.concatenate([u_seq[:, 1:], u_seq[:, -1:]], axis=1)
        return ((xn, u_seq, cost, alive_next, t + dtf, texit, tmode),
                (xn, u, alive_next))

    keys = jax.random.split(key, n_steps)
    cost0 = jnp.zeros(B, x0.dtype)
    alive0 = jnp.ones(B, bool)
    texit0 = jnp.full(B, n_steps * dt, x0.dtype)
    tmode0 = jnp.zeros(B, bool)  # terminal-mode latch (dual-mode MPC)
    (xT, _, cost, aliveT, _, texit, _), (xs, us, alives) = jax.lax.scan(
        step,
        (x0, u_init, cost0, alive0, jnp.asarray(0.0, x0.dtype), texit0,
         tmode0),
        (keys, jnp.arange(n_steps)),
    )
    xs = jnp.concatenate([x0[None], xs], axis=0)
    alives = jnp.concatenate([alive0[None], alives], axis=0)
    return Trajectory(xs=xs, us=us, cost=cost, alive=alives, exit_time=texit)


def receding_horizon_rollout(
    problem: ControlProblem,
    grid: Grid,
    value_fn: Callable,
    x0,
    key,
    dt: float,
    n_steps: int,
    horizon: int = 128,
    replan_every: int = 4,
    opt_iters: int = 10,
    lr: float = 0.05,
    u_init=None,
    controls=None,
    planner: str = "ilqr",
    terminal_lqr=None,
) -> Trajectory:
    """Closed-loop receding-horizon MPC rollout (see module docstring).

    value_fn: batched points [B, d] -> values [B] (TT ``tt_lerp_eval`` or
    dense ``multilinear_interp`` — the cost-to-go beyond the horizon).
    Plant noise/boundaries/cost accounting match ``integrators.rollout``
    exactly, so CRN comparisons against the greedy implicit policy are
    apples-to-apples.

    terminal_lqr: optional ``sim.terminal.TerminalLQR`` — enables dual-mode
    deployment: each sample latches into the exact goal-basin LQR on first
    basin entry (see sim/terminal.py for the measured rationale; the latch
    semantics are documented at the override site in ``_rh_rollout``).
    """
    B = x0.shape[0]
    greedy_seed = None
    if controls is not None:
        # greedy re-seeding: at every replan the optimizer warm-starts
        # from the per-sample better of {shifted previous plan, fresh
        # deterministic greedy rollout}. This (a) solves swing-up-style
        # non-convex shooting landscapes (a constant-control start stalls
        # in a local minimum) and (b) prevents warm-start staleness under
        # plant noise (see replan() in _rh_rollout).
        from c3sc_tpu.sim.policy import make_implicit_policy

        pol = make_implicit_policy(problem, grid, value_fn, controls)
        greedy_seed = lambda x: _greedy_useq(
            problem, grid, pol, x, float(dt), int(horizon))
    if u_init is None or isinstance(u_init, str):
        if greedy_seed is not None:
            u_init = jax.jit(greedy_seed)(jnp.asarray(x0))
        else:
            umid = 0.5 * (jnp.asarray(problem.ulb, jnp.float32)
                          + jnp.asarray(problem.uub, jnp.float32))
            u_init = jnp.broadcast_to(
                umid, (B, horizon, problem.du)).astype(jnp.float32)
    run = jax.jit(lambda x0, u0, k: _rh_rollout(
        problem, grid, value_fn, x0, u0, k, float(dt), int(n_steps),
        int(horizon), int(replan_every), int(opt_iters), float(lr),
        greedy_seed=greedy_seed, planner=planner, terminal_lqr=terminal_lqr))
    return run(jnp.asarray(x0), u_init, key)


def _greedy_useq(problem, grid, pol, x0, dt, horizon):
    """Deterministic greedy rollout -> [B, H, du] control sequence."""
    dtf = jnp.asarray(dt, x0.dtype)
    drift_b = jax.vmap(problem.drift)

    def step(x, _):
        u = pol(x)
        xn = x + drift_b(x, u) * dtf
        xn, _ = _apply_boundaries(problem, grid, xn)
        return xn, u

    _, us = jax.lax.scan(step, x0, None, length=horizon)
    return jnp.swapaxes(us, 0, 1)  # [B, H, du]
