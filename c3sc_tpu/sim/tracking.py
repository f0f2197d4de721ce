"""Time-varying-cost receding-horizon re-solve (tracking MPC).

BASELINE.json north star, sentence 2: "the receding-horizon outer loop
re-solves online against a time-varying cost ... within the reference's
real-time replanning budget". The round-4 ``sim/mpc_fused.py`` warm-
refines a STATIC problem; this module closes the gap (VERDICT r4
missing #2): the cost carries a PARAMETER vector theta (e.g. a moving
hover target), and every cost update triggers a warm fused re-solve that
reuses the previous cycle's full solver state.

TPU-native design: theta is a TRACED argument of one jitted update
function, NOT a baked constant — a cost change re-dispatches the SAME
compiled program (millisecond replan latency) instead of recompiling.
This works because the whole problem spec is pure JAX functions of
(x, u, theta) (models/base.py design): the update jit closes over the
problem FAMILY ``theta -> ControlProblem`` and rebuilds the fused-VI
graph during tracing with theta flowing through the stage cost.

Reference: the reference re-solves by re-running ``c3control_vi_solve``
from the saved cost/value (SURVEY.md §3.1-3.3, ``examples/`` receding-
horizon loops — line n/a, empty mount); there the cost is recompiled C —
here it is a traced tensor, which is the idiomatic XLA translation.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.ops.tt import TT, tt_lerp_eval
from c3sc_tpu.sim.integrators import rollout
from c3sc_tpu.sim.policy import make_implicit_policy
from c3sc_tpu.solvers.fused import make_fused_vi


@dataclasses.dataclass
class TrackingSolver:
    """Warm re-solving value function for a theta-parameterized cost."""

    init: Callable          # (theta, key, n_iters) -> carry
    update: Callable        # (carry, theta, n_iters) -> carry  (jitted)
    value_fn: Callable      # (carry, p [B, d]) -> [B]  (jitted TT eval)
    policy: Callable        # (carry, theta, x [B, d]) -> u [B, du]
    grid: Grid
    controls: np.ndarray


def make_tracking_solver(
    problem_family: Callable,
    grid: Grid,
    controls,
    rmax: int = 16,
    theta_example=None,
    solver_kwargs: dict | None = None,
) -> TrackingSolver:
    """Build the warm re-solving tracking stack.

    ``problem_family(theta) -> ControlProblem``: the cost (and, if
    desired, dynamics) closures capture ``theta``; theta must be a pytree
    of arrays with static shapes. The returned ``update(carry, theta,
    n_iters)`` is ONE compiled program: calling it with a new theta is a
    dispatch, not a recompile (verified by ``tests/test_tracking.py``
    compile-count assertion).
    """
    solver_kwargs = dict(solver_kwargs or {})
    solver_kwargs.setdefault("tol", 0.0)
    solver_kwargs.setdefault("max_iters", 10 ** 9)
    uc = jnp.asarray(controls, jnp.float32)

    def _bundle(theta):
        prob = problem_family(theta)
        return prob, make_fused_vi(prob, grid, controls, rmax=rmax,
                                   **solver_kwargs)

    def _init(theta, key):
        # init_fn is host-side (seeds pivot sets from the key) and does
        # not read the cost — build it at the concrete theta
        _, solver = _bundle(theta)
        return solver.init_fn(key)

    from functools import partial

    @partial(jax.jit, static_argnames=("n_iters",))
    def _update(carry, theta, n_iters):
        _, solver = _bundle(theta)
        return solver.step_fn(carry, n_iters)

    @jax.jit
    def _value(carry, p):
        return tt_lerp_eval(TT(carry.cores, carry.ranks), grid, p)

    def init(theta, key, n_iters=500):
        carry = _init(theta, key)
        return _update(carry, theta, n_iters)

    @jax.jit
    def _policy(carry, theta, x):
        prob = problem_family(theta)
        pol = make_implicit_policy(
            prob, grid,
            lambda p: tt_lerp_eval(TT(carry.cores, carry.ranks), grid, p),
            uc)
        return pol(x)

    return TrackingSolver(init=init, update=_update, value_fn=_value,
                          policy=_policy, grid=grid,
                          controls=np.asarray(controls))


@dataclasses.dataclass
class TrackingRunResult:
    xs: np.ndarray
    cost: np.ndarray            # realized discounted TRACKING cost per traj
    replan_latency_s: list      # per cost update, device-synced
    thetas: np.ndarray


def tracking_mpc_run(
    solver: TrackingSolver,
    problem_family: Callable,
    theta_schedule,              # [K, ...] theta per segment
    x0,
    key,
    dt: float = 0.01,
    steps_per_segment: int = 100,
    replan_iters: int = 40,
    first_solve_iters: int = 600,
    stale: bool = False,
    verbose: bool = False,
) -> TrackingRunResult:
    """Closed loop against a piecewise-constant theta schedule.

    ``stale=True`` is the ablation: the value function is NEVER re-solved
    after the first segment (the policy still queries the CURRENT cost's
    greedy argmin against the stale value) — the baseline a tracking
    re-solve must beat (``tests/test_tracking.py``).
    """
    thetas = jnp.asarray(theta_schedule)
    beta = float(problem_family(np.asarray(theta_schedule)[0]).beta)
    key, sk = jax.random.split(key)
    carry = solver.init(thetas[0], sk, first_solve_iters)
    jax.block_until_ready(carry.residual)

    grid = solver.grid

    def _segment(carry, theta, x, k):
        prob = problem_family(theta)
        pol = make_implicit_policy(
            prob, grid,
            lambda p: tt_lerp_eval(TT(carry.cores, carry.ranks), grid, p),
            jnp.asarray(solver.controls, jnp.float32))
        return rollout(prob, grid, pol, x, k, dt, steps_per_segment)

    seg_fn = jax.jit(_segment)

    x = jnp.asarray(x0)
    xs_all = [np.asarray(x0)[None]]
    cost = np.zeros(x.shape[0], np.float64)
    lat = []
    t_sim = 0.0
    for seg in range(thetas.shape[0]):
        if seg > 0 and not stale:
            t0 = time.perf_counter()
            carry = solver.update(carry, thetas[seg], replan_iters)
            jax.block_until_ready(carry.residual)
            lat.append(time.perf_counter() - t0)
        key, rk = jax.random.split(key)
        traj = seg_fn(carry, thetas[seg], x, rk)
        x = traj.xs[-1]
        xs_all.append(np.asarray(traj.xs[1:]))
        cost = cost + np.exp(-beta * t_sim) * np.asarray(traj.cost)
        t_sim += steps_per_segment * dt
        if verbose:
            print(f"[tracking] seg={seg} theta={np.asarray(thetas[seg])} "
                  f"lat={lat[-1]*1e3:.1f}ms" if seg > 0 and not stale else
                  f"[tracking] seg={seg}", flush=True)
    return TrackingRunResult(
        xs=np.concatenate(xs_all, 0), cost=cost,
        replan_latency_s=lat, thetas=np.asarray(thetas))
