"""Receding-horizon stochastic MPC driver.

Reference workflow: examples run receding-horizon style re-solves and
thousands of Monte-Carlo rollouts (SURVEY.md §0, §3.3); BASELINE.json: "the
receding-horizon outer loop re-solves online against a time-varying cost".

Each replan cycle:
  1. refine the TT value function against the (possibly time-varying)
     problem, warm-started from the previous cycle's TT cores AND cross
     pivot sets — typically 1-2 cheap warm VI iterations;
  2. advance the whole batch of plants ``steps_per_replan`` Euler-Maruyama
     steps under the implicit TT policy;
  3. record replanning latency (the real-time budget metric).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops.tt import TT, tt_lerp_eval
from c3sc_tpu.sim.integrators import Trajectory, rollout
from c3sc_tpu.sim.policy import make_implicit_policy
from c3sc_tpu.solvers.ttvi import tt_vi


@dataclasses.dataclass
class MPCResult:
    xs: np.ndarray            # [T+1, B, d]
    us: np.ndarray            # [T, B, du]
    cost: np.ndarray          # [B] realized discounted cost
    replan_latency: list      # seconds per replan cycle
    residuals: list           # solver residual per cycle
    ranks: list               # value TT max rank per cycle


def mpc_run(
    problem: ControlProblem | Callable[[float], ControlProblem],
    grid: Grid,
    x0,
    key,
    dt: float,
    steps_per_replan: int,
    n_replans: int,
    controls=None,
    n_controls: int = 9,
    rmax: int = 16,
    refine_iters: int = 2,
    first_solve_iters: int = 300,
    solver_kwargs: dict | None = None,
    verbose: bool = False,
) -> MPCResult:
    """Closed-loop MPC: solve -> act -> re-solve, warm-started throughout.

    ``problem`` may be a fixed ControlProblem or a callable t -> problem for
    time-varying costs/dynamics (rebuilds the jitted kernels per change of
    problem; keep the structure static for speed).
    """
    time_varying = callable(problem)
    prob0 = problem(0.0) if time_varying else problem
    if controls is None:
        controls = prob0.control_candidates(n_controls)
    kw = dict(cross_sweeps=1, chunk=2048)
    kw.update(solver_kwargs or {})

    key, sk = jax.random.split(key)
    sol = tt_vi(prob0, grid, controls=controls, rmax=rmax, key=sk,
                max_iters=first_solve_iters, **kw)
    state, v = sol.state, sol.v

    B = x0.shape[0]
    xs_all = [np.asarray(x0)[None]]
    us_all = []
    cost = np.zeros(B, np.float64)
    lat, residuals, ranks = [], [], []
    x = jnp.asarray(x0)
    t_sim = 0.0

    roll_fn = None
    prob_t = prob0
    for cycle in range(n_replans):
        if time_varying and cycle > 0:
            prob_t = problem(t_sim)
        t0 = time.perf_counter()
        if cycle > 0:
            key, sk = jax.random.split(key)
            refine_kw = {k_: v_ for k_, v_ in kw.items() if k_ != "tol"}
            sol = tt_vi(prob_t, grid, controls=controls, rmax=rmax, key=sk,
                        max_iters=refine_iters, tol=0.0, v0=v, state=state,
                        **refine_kw)
            state, v = sol.state, sol.v
        lat.append(time.perf_counter() - t0)
        residuals.append(sol.residual)
        ranks.append(int(np.asarray(v.ranks).max()))

        if roll_fn is None or time_varying:
            # the value TT is a traced argument: one compile serves every
            # cycle's refined value function
            def _roll(vtt, x0, k, p=prob_t):
                value_fn = lambda pts: tt_lerp_eval(vtt, grid, pts)
                policy = make_implicit_policy(p, grid, value_fn, controls)
                return rollout(p, grid, policy, x0, k, dt, steps_per_replan)

            roll_fn = jax.jit(_roll)
        key, rk = jax.random.split(key)
        traj: Trajectory = roll_fn(v, x, rk)
        x = traj.xs[-1]
        xs_all.append(np.asarray(traj.xs[1:]))
        us_all.append(np.asarray(traj.us))
        cost = cost + np.exp(-prob_t.beta * t_sim) * np.asarray(traj.cost)
        t_sim += steps_per_replan * dt
        if verbose:
            print(f"[mpc] cycle={cycle} latency={lat[-1]*1e3:.1f}ms "
                  f"res={sol.residual:.2e} rank={ranks[-1]}")

    return MPCResult(
        xs=np.concatenate(xs_all, axis=0), us=np.concatenate(us_all, axis=0),
        cost=cost, replan_latency=lat, residuals=residuals, ranks=ranks,
    )
