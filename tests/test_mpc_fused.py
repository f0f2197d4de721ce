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
    x0 = jnp.tile(jnp.array([1.5, 0.0]), (B, 1))
    res = fused_mpc_run(
        prob, grid, x0, jax.random.key(0),
        dt=0.02, steps_per_replan=25, n_replans=6,
        n_controls=9, rmax=8, refine_iters=3, first_solve_iters=300,
    )
    assert res.xs.shape == (1 + 6 * 25, B, 2)
    final = np.abs(res.xs[-1]).mean(axis=0)
    assert final[0] < 1.0  # decreased from 1.5 under noise
    assert np.all(np.isfinite(res.cost))
    # warm replans exist and are recorded
    assert len(res.replan_latency) == 6
    assert all(l >= 0 for l in res.replan_latency)
