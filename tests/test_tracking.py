"""Time-varying-cost receding-horizon re-solve (sim/tracking.py).

The north-star sentence this covers (BASELINE.json): "the receding-
horizon outer loop re-solves online against a time-varying cost".
Asserts (a) a cost update is a DISPATCH of one compiled program, not a
recompile; (b) the warm re-solve tracks a moving LQ setpoint with lower
realized cost than the stale-value ablation; (c) the re-solved value
approaches the analytic Riccati value of the moved setpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_lq_family, lqr_solution
from c3sc_tpu.sim.tracking import make_tracking_solver, tracking_mpc_run


@pytest.fixture(scope="module")
def lq_tracking():
    family = make_lq_family(sigma=0.5, beta=1.0)
    prob0 = family(np.zeros(2))
    grid = prob0.default_grid(21)
    controls = prob0.control_candidates(13)
    solver = make_tracking_solver(family, grid, controls, rmax=8,
                                  solver_kwargs={"sample_size": 128})
    return family, grid, controls, solver


def test_update_is_dispatch_not_recompile(lq_tracking):
    family, grid, controls, solver = lq_tracking
    carry = solver.init(jnp.zeros(2), jax.random.key(0), n_iters=300)
    carry = solver.update(carry, jnp.array([0.1, 0.0]), 20)  # warm n=20
    n0 = solver.update._cache_size()
    for t in [0.3, -0.5, 0.8]:
        carry = solver.update(carry, jnp.array([t, 0.0]), 20)
    jax.block_until_ready(carry.residual)
    assert solver.update._cache_size() == n0  # zero new compiles


def test_warm_resolve_tracks_moved_setpoint(lq_tracking):
    family, grid, controls, solver = lq_tracking
    carry = solver.init(jnp.zeros(2), jax.random.key(0), n_iters=400)
    theta = jnp.array([0.8, 0.0])
    carry = solver.update(carry, theta, 200)
    # value at the new setpoint must approach the analytic Riccati value
    P, c, _ = lqr_solution(sigma=0.5, beta=1.0)
    pts = jnp.asarray(
        np.array([[0.8, 0.0], [0.3, 0.0], [0.8, 0.5]]), jnp.float32)
    v = np.asarray(solver.value_fn(carry, pts))
    e = np.asarray(pts) - np.asarray(theta)
    v_true = np.einsum("ni,ij,nj->n", e, P, e) + c
    assert np.abs(v - v_true).max() < 0.35, (v, v_true)


@pytest.mark.slow
def test_tracking_beats_stale_value():
    """Moving setpoint with cheap control: the warm re-solve must track
    (measured 0.37 vs 0.96 stale, experiments/tracking_debug2.py) and the
    plant must actually reach the moved target."""
    family = make_lq_family(sigma=0.3, beta=0.5, q=2.0, r=0.1)
    prob0 = family(np.zeros(2))
    grid = prob0.default_grid(21)
    controls = prob0.control_candidates(13)
    solver = make_tracking_solver(family, grid, controls, rmax=8,
                                  solver_kwargs={"sample_size": 128})
    thetas = np.array([[0.0, 0.0], [1.0, 0.0]])
    x0 = jnp.zeros((32, 2), jnp.float32)
    kw = dict(dt=0.01, steps_per_segment=400, replan_iters=300,
              first_solve_iters=500)
    run_track = tracking_mpc_run(solver, family, thetas, x0,
                                 jax.random.key(7), **kw)
    run_stale = tracking_mpc_run(solver, family, thetas, x0,
                                 jax.random.key(7), stale=True, **kw)
    c_t = run_track.cost.mean()
    c_s = run_stale.cost.mean()
    assert c_t < 0.6 * c_s, (c_t, c_s)
    # the plant reaches the moved setpoint under the re-solved value
    assert abs(run_track.xs[-1, :, 0].mean() - 1.0) < 0.25
    assert len(run_track.replan_latency_s) == 1
