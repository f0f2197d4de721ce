"""Receding-horizon MPC on the fused solver: single-dispatch warm replans.

The production MPC path (BASELINE.json: "receding-horizon outer loop
re-solves online against a time-varying cost ... within the reference's
real-time replanning budget"). Each replan is ONE device dispatch:
``step_fn(carry, refine_iters)`` continues the fused VI from the previous
cycle's full solver state (TT cores + cross pivot sets), so warm replans
cost refine_iters x ~ms instead of a cold solve.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops.tt import TT, tt_lerp_eval
from c3sc_tpu.sim.integrators import rollout
from c3sc_tpu.sim.policy import make_implicit_policy
from c3sc_tpu.solvers.fused import make_fused_vi


@dataclasses.dataclass
class FusedMPCResult:
    xs: np.ndarray
    us: np.ndarray
    cost: np.ndarray
    replan_latency: list       # seconds per replan (device-synced)
    residuals: list


def fused_mpc_run(
    problem: ControlProblem,
    grid: Grid,
    x0,
    key,
    dt: float,
    steps_per_replan: int,
    n_replans: int,
    controls=None,
    n_controls: int = 9,
    rmax: int = 16,
    refine_iters: int = 3,
    first_solve_iters: int = 800,
    refine_steps: int = 0,
    tol: float = 1e-4,
    verbose: bool = False,
) -> FusedMPCResult:
    if controls is None:
        controls = problem.control_candidates(n_controls)
    solve_fn, init_fn, step_fn, _ = make_fused_vi(
        problem, grid, controls, rmax=rmax, tol=0.0, max_iters=10**9,
    )
    key, sk = jax.random.split(key)
    carry = init_fn(sk)
    carry = step_fn(carry, first_solve_iters)
    jax.block_until_ready(carry.residual)

    policy_of = lambda v: make_implicit_policy(
        problem, grid, lambda p: tt_lerp_eval(v, grid, p), controls,
        refine_steps=refine_steps,
    )

    def _roll(vtt: TT, x0, k):
        return rollout(problem, grid, policy_of(vtt), x0, k, dt, steps_per_replan)

    roll_fn = jax.jit(_roll)

    B = x0.shape[0]
    x = jnp.asarray(x0)
    xs_all = [np.asarray(x0)[None]]
    us_all = []
    cost = np.zeros(B, np.float64)
    lat, residuals = [], []
    t_sim = 0.0
    for cycle in range(n_replans):
        if cycle > 0:
            t0 = time.perf_counter()
            carry = step_fn(carry, refine_iters)
            jax.block_until_ready(carry.residual)
            lat.append(time.perf_counter() - t0)
        else:
            lat.append(0.0)  # cold solve accounted separately
        residuals.append(float(carry.residual))
        v = TT(carry.cores, carry.ranks)
        key, rk = jax.random.split(key)
        traj = roll_fn(v, x, rk)
        x = traj.xs[-1]
        xs_all.append(np.asarray(traj.xs[1:]))
        us_all.append(np.asarray(traj.us))
        cost = cost + np.exp(-problem.beta * t_sim) * np.asarray(traj.cost)
        t_sim += steps_per_replan * dt
        if verbose:
            print(f"[fused_mpc] cycle={cycle} latency={lat[-1]*1e3:.1f}ms "
                  f"res={residuals[-1]:.2e}")
    return FusedMPCResult(
        xs=np.concatenate(xs_all, 0), us=np.concatenate(us_all, 0),
        cost=cost, replan_latency=lat, residuals=residuals,
    )
