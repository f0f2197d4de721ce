"""Fused-solver MPC: warm single-dispatch replans stabilize LQ."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_lq_problem
from c3sc_tpu.sim.mpc_fused import fused_mpc_run


def test_fused_mpc_stabilizes_lq():
    prob = make_lq_problem(sigma=0.5, beta=1.0)
    grid = prob.default_grid(21)
    B = 16
    dt, steps_per_replan = 0.02, 25
    res = fused_mpc_run(
        prob, grid, jnp.tile(jnp.array([1.5, 0.0]), (B, 1)), jax.random.key(0),
        dt=dt, steps_per_replan=steps_per_replan, n_replans=6,
        n_controls=9, rmax=8, refine_iters=3, first_solve_iters=300,
    )
    assert res.xs.shape == (1 + 6 * 25, B, 2)
    final = np.abs(res.xs[-1]).mean(axis=0)
    assert final[0] < 1.0  # decreased from 1.5 under noise
    assert np.all(np.isfinite(res.cost))
    # warm replans exist and are recorded
    assert len(res.replan_latency) == 6
    assert all(l >= 0 for l in res.replan_latency)
    # real-time budget (BASELINE.md replanning row): a warm replan must
    # finish inside the simulated horizon it replans for, i.e. the
    # controller keeps up with real time. Warm replans are index 1+ (index
    # 0 is the cold solve, accounted separately by fused_mpc_run).
    budget_s = steps_per_replan * dt
    warm = res.replan_latency[1:]
    # median: robust to a single scheduler-noise outlier on loaded CI
    # machines (measured ~45 ms vs the 500 ms budget — 10x headroom)
    assert float(np.median(warm)) < budget_s, (
        f"median warm replan latency {np.median(warm):.3f}s exceeds the "
        f"{budget_s:.2f}s real-time budget ({warm})"
    )
