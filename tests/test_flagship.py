"""Smoke tests for the >=4D flagship configs on CPU (small budgets): the
solver must run, produce finite values, adapt ranks, and yield a working
closed-loop policy."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_glider_problem, make_quadcopter_problem
from c3sc_tpu.ops.tt import tt_gather_eval, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers.fused import fused_tt_vi


def test_quadcopter_6d_smoke():
    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(9)
    controls = prob.control_candidates(3)
    sol = fused_tt_vi(
        prob, grid, controls=controls, rmax=8, key=jax.random.key(0),
        tol=1e-3, max_iters=200, patience=60,
    )
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.stack([rng.integers(0, n, 128) for n in grid.shape], -1), jnp.int32)
    v = np.asarray(tt_gather_eval(sol.v, idx))
    # rank-8 on 9^6 is deliberately under-resolved: smoke = finite + usable
    assert np.all(np.isfinite(v))
    ranks = np.asarray(sol.v.ranks)
    assert ranks.max() > 1  # adapted beyond the rank-1 start
    # closed loop: hover near origin beats drifting to the box edge
    policy = make_implicit_policy(
        prob, grid, lambda p: tt_lerp_eval(sol.v, grid, p), controls
    )
    x0 = jnp.tile(jnp.zeros(6), (16, 1))
    traj = rollout(prob, grid, policy, x0, jax.random.key(1), dt=0.01, n_steps=150)
    assert np.asarray(traj.alive[-1]).mean() > 0.5


def test_glider_4d_smoke():
    prob = make_glider_problem()
    grid = prob.default_grid((11, 9, 9, 9))
    controls = prob.control_candidates(5)
    sol = fused_tt_vi(
        prob, grid, controls=controls, rmax=8, key=jax.random.key(2),
        tol=1e-3, max_iters=200, patience=60,
    )
    rng = np.random.default_rng(1)
    idx = jnp.asarray(np.stack([rng.integers(0, n, 128) for n in grid.shape], -1), jnp.int32)
    v = np.asarray(tt_gather_eval(sol.v, idx))
    assert np.all(np.isfinite(v))
    assert np.asarray(sol.v.ranks).max() > 1


def test_quadcopter_7d_smoke():
    """7D flagship variant (BASELINE 'quadcopter (6-7D)'): 6D quadrotor +
    OU wind state. Solver adapts ranks, yields a finite value and a
    policy that keeps most trajectories inside the box."""
    from c3sc_tpu.models import make_quadcopter7_problem

    prob = make_quadcopter7_problem(sigma_v=0.15, sigma_om=0.15)
    assert prob.dx == 7 and prob.dw == 4
    grid = prob.default_grid(7)
    controls = prob.control_candidates(3)
    sol = fused_tt_vi(
        prob, grid, controls=controls, rmax=6, key=jax.random.key(0),
        tol=1e-3, max_iters=150, patience=60,
    )
    rng = np.random.default_rng(2)
    idx = jnp.asarray(np.stack([rng.integers(0, n, 128) for n in grid.shape], -1), jnp.int32)
    v = np.asarray(tt_gather_eval(sol.v, idx))
    assert np.all(np.isfinite(v))
    assert np.asarray(sol.v.ranks).max() > 1
    policy = make_implicit_policy(
        prob, grid, lambda p: tt_lerp_eval(sol.v, grid, p), controls
    )
    x0 = jnp.tile(jnp.zeros(7), (8, 1))
    traj = rollout(prob, grid, policy, x0, jax.random.key(1), dt=0.01, n_steps=100)
    assert np.asarray(traj.alive[-1]).mean() > 0.5


def test_quadcopter_7d_artifact_thresholds():
    """Assert the recorded 7D flagship artifact meets its coded thresholds
    (VERDICT r3 next #5: 'upgrade the smoke test to assert the recorded
    thresholds'). Runs only when NORTHSTAR7.json exists (the artifact is
    produced on the TPU chip by experiments/quad7_northstar.py)."""
    import json
    import os

    import pytest

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "NORTHSTAR7.json")
    if not os.path.exists(path):
        pytest.skip("NORTHSTAR7.json not generated on this machine")
    with open(path) as f:
        art = json.load(f)
    tol = art["tolerance"]
    prod = art["production"]
    assert prod["survival"] >= tol["survival_min"], prod
    assert prod["bellman_residual_sampled"] <= tol["bellman_residual_max"], prod
    assert art["pass"] is True, art
