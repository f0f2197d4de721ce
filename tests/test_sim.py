"""Closed-loop simulator tests: pendulum swing-up achieves upright under the
dense-oracle implicit policy (the reference's examples workflow, SURVEY.md
§3.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.grids import Grid
from c3sc_tpu.models import make_lq_problem, make_pendulum_problem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers import dense_vi


@pytest.fixture(scope="module")
def pendulum_setup():
    prob = make_pendulum_problem(beta=0.5, sigma=0.2)
    grid = prob.default_grid(61)
    sol = dense_vi(prob, grid, n_controls=9, tol=1e-4, max_outer=600, chunk=150)
    value_fn = lambda pts: multilinear_interp(grid, sol.v, pts)
    controls = prob.control_candidates(9)
    policy = make_implicit_policy(prob, grid, value_fn, controls)
    return prob, grid, policy


def test_pendulum_swingup(pendulum_setup):
    prob, grid, policy = pendulum_setup
    B = 32
    # start hanging down (theta = pi), zero velocity
    x0 = jnp.tile(jnp.array([np.pi - 0.05, 0.0]), (B, 1))
    traj = jax.jit(
        lambda x0, key: rollout(prob, grid, policy, x0, key, dt=0.01, n_steps=700)
    )(x0, jax.random.key(0))
    th_final = np.asarray(traj.xs[-1, :, 0])
    om_final = np.asarray(traj.xs[-1, :, 1])
    upright = (np.cos(th_final) > 0.85) & (np.abs(om_final) < 2.0)
    assert upright.mean() > 0.7, f"only {upright.mean():.0%} swung up"
    assert np.all(np.isfinite(np.asarray(traj.cost)))


def test_rollout_shapes_and_absorption():
    prob = make_lq_problem(sigma=2.0, beta=1.0)
    grid = prob.default_grid(21)
    # aggressive null policy + strong noise → some trajectories exit the box
    policy = lambda x: jnp.zeros((x.shape[0], 1))
    x0 = jnp.tile(jnp.array([1.8, 1.8]), (64, 1))
    traj = rollout(prob, grid, policy, x0, jax.random.key(1), dt=0.02, n_steps=100)
    assert traj.xs.shape == (101, 64, 2)
    assert traj.us.shape == (100, 64, 1)
    alive = np.asarray(traj.alive)
    # alive is monotone nonincreasing per trajectory
    assert np.all(alive[1:] <= alive[:-1])
    assert alive[-1].mean() < 1.0  # at least one absorbed
    # absorbed trajectories are frozen
    dead_idx = np.where(~alive[-1])[0]
    if len(dead_idx):
        b = dead_idx[0]
        t_dead = np.argmax(~alive[:, b])
        xs = np.asarray(traj.xs)
        assert np.allclose(xs[t_dead + 1 :, b], xs[t_dead, b])


def test_trajectory_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp
    import numpy as np
    from c3sc_tpu.sim import Trajectory, trajectory_load, trajectory_save

    traj = Trajectory(
        xs=jnp.ones((3, 2, 2)), us=jnp.zeros((2, 2, 1)),
        cost=jnp.asarray([1.0, 2.0]), alive=jnp.ones((3, 2), bool),
        exit_time=jnp.asarray([0.5, 0.7]),
    )
    p = str(tmp_path / "traj.npz")
    trajectory_save(p, traj)
    back = trajectory_load(p)
    for a, b in zip(traj, back):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
