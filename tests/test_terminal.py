"""Terminal basin LQR (sim/terminal.py) — the second mode of the dual-mode
deployment controller.

Checks: (a) the equilibrium solver recovers the quadcopter's analytic
hover thrust, (b) the discounted Riccati gains stabilize the linearized
discrete plant (spectral radius < 1), (c) the TRUE nonlinear plant under
the terminal controller regulates basin states to the goal, (d) the
dual-mode receding-horizon rollout runs and parks tighter than its own
terminal-mode-off twin under CRN with a deliberately tilted value field
(the parking-lottery mechanism the controller exists to remove — see
sim/terminal.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.sim.terminal import (make_terminal_lqr, terminal_control)


@pytest.fixture(scope="module")
def quad():
    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    return prob, make_terminal_lqr(prob, dt=0.01)


def test_equilibrium_is_hover(quad):
    prob, tl = quad
    hover = 0.5 * 0.5 * 9.81  # mass * g / 2 per rotor
    np.testing.assert_allclose(np.asarray(tl.u_eq), [hover, hover],
                               rtol=1e-5)
    # drift vanishes at (x_eq, u_eq)
    f = np.asarray(prob.drift(tl.x_eq, tl.u_eq))
    assert np.abs(f).max() < 1e-5


def test_gains_stabilize_linearization(quad):
    prob, tl = quad
    x, u = jnp.asarray(tl.x_eq), jnp.asarray(tl.u_eq)
    A = np.asarray(jax.jacobian(prob.drift, 0)(x, u), np.float64)
    B = np.asarray(jax.jacobian(prob.drift, 1)(x, u), np.float64)
    Ad = np.eye(prob.dx) + 0.01 * A
    Bd = 0.01 * B
    K = np.asarray(tl.K, np.float64)
    rho = np.abs(np.linalg.eigvals(Ad - Bd @ K)).max()
    assert rho < 1.0, rho


def test_regulates_nonlinear_plant(quad):
    prob, tl = quad
    ulb = jnp.asarray(prob.ulb, jnp.float32)
    uub = jnp.asarray(prob.uub, jnp.float32)
    rng = np.random.default_rng(0)
    scale = np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0])
    x = jnp.asarray(0.25 * rng.uniform(-1, 1, (16, 6)) * scale, jnp.float32)
    drift_b = jax.vmap(prob.drift)

    def step(x, _):
        u, _ = terminal_control(tl, x, ulb, uub)
        return x + 0.01 * drift_b(x, u), None

    xT, _ = jax.lax.scan(step, x, None, length=600)
    r0 = np.linalg.norm(np.asarray(x) / scale, axis=-1)
    rT = np.linalg.norm(np.asarray(xT) / scale, axis=-1)
    assert rT.max() < 0.02, (r0.max(), rT.max())


@pytest.mark.slow
def test_dual_mode_removes_parking_tilt(quad):
    prob, tl = quad
    grid = prob.default_grid(9)
    controls = prob.control_candidates(5)
    scale = jnp.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0])

    # smooth surrogate value with a deliberate linear TILT in altitude —
    # the error mode the parking diagnosis measured on seed 0
    def vfn(p):
        z = p / scale
        return 8.0 * jnp.sum(z * z, axis=-1) + 1.5 * z[..., 1]

    rng = np.random.default_rng(5)
    x0 = jnp.asarray(0.3 * rng.uniform(-1, 1, (16, 6)) * np.asarray(scale),
                     jnp.float32)
    key = jax.random.key(7)
    kw = dict(dt=0.01, n_steps=150, horizon=32, replan_every=4,
              opt_iters=6, controls=controls)
    tr_off = receding_horizon_rollout(prob, grid, vfn, x0, key, **kw)
    tr_on = receding_horizon_rollout(prob, grid, vfn, x0, key,
                                     terminal_lqr=tl, **kw)
    g_b = jax.vmap(prob.stage_cost)
    u_h = tl.u_eq

    def tail_state_cost(tr):
        xs = np.asarray(tr.xs[100:]).reshape(-1, 6)
        return float(np.asarray(g_b(jnp.asarray(xs),
                                    jnp.broadcast_to(u_h, (len(xs), 2)))
                                ).mean())

    c_on, c_off = tail_state_cost(tr_on), tail_state_cost(tr_off)
    assert bool(np.asarray(tr_on.alive[-1]).all())
    assert c_on < c_off, (c_on, c_off)
