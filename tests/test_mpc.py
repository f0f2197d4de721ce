"""Receding-horizon MPC driver test on the LQ system."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_lq_problem
from c3sc_tpu.sim.mpc import mpc_run


def test_mpc_stabilizes_lq():
    prob = make_lq_problem(sigma=0.5, beta=1.0)
    grid = prob.default_grid(21)
    B = 16
    x0 = jnp.tile(jnp.array([1.5, 0.0]), (B, 1))
    res = mpc_run(
        prob, grid, x0, jax.random.key(0),
        dt=0.02, steps_per_replan=25, n_replans=6,
        n_controls=9, rmax=8, refine_iters=2, first_solve_iters=200,
        solver_kwargs=dict(tol=1e-3, cross_sweeps=1, chunk=1024),
    )
    assert res.xs.shape == (1 + 6 * 25, B, 2)
    assert res.us.shape == (6 * 25, B, 1)
    # replans after the first are warm-started and fast relative to cold solve
    assert len(res.replan_latency) == 6
    # closed loop drives the state toward the origin
    final = np.abs(res.xs[-1]).mean(axis=0)
    start = np.abs(res.xs[0]).mean(axis=0)
    assert final[0] < start[0] * 0.5
    assert np.all(np.isfinite(res.cost))
