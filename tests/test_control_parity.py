"""North-star parity: closed-loop control sequence from the TT policy vs the
dense-oracle policy (BASELINE.md: control-sequence deviation <= 1% under the
same horizon + MCA discretization; the dense oracle stands in for the
unavailable reference binary per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi


def test_pendulum_control_sequence_parity():
    prob = make_pendulum_problem(beta=0.5, sigma=0.3)
    grid = prob.default_grid(41)
    controls = prob.control_candidates(9)

    dense = dense_vi(prob, grid, controls=controls, tol=1e-5, max_outer=400, chunk=100)
    # rmax 16 = this problem's measured epsilon-rank: the solve converges
    # to tol (1.6e-4, ~2200 iters). Caps ABOVE it (20, 24) fit f32 noise
    # columns and churn at a 2-30% pivot-noise floor — the r1 version of
    # this test used rmax=24 and passed only because the budget happened
    # to run out on a good iterate (docs/DESIGN.md, rank-cap selection).
    sol = fused_tt_vi(prob, grid, controls=controls, rmax=16,
                      key=jax.random.key(0), tol=2e-4, max_iters=2500,
                      eps_rank=1e-5, patience=40)

    pol_dense = make_implicit_policy(
        prob, grid, lambda p: multilinear_interp(grid, dense.v, p), controls
    )
    pol_tt = make_implicit_policy(
        prob, grid, lambda p: tt_lerp_eval(sol.v, grid, p), controls
    )

    # identical noise realizations: same key + same integrator
    B, T = 16, 400
    x0 = jnp.tile(jnp.array([np.pi - 0.1, 0.0]), (B, 1))
    key = jax.random.key(7)
    tr_d = rollout(prob, grid, pol_dense, x0, key, dt=0.01, n_steps=T)
    tr_t = rollout(prob, grid, pol_tt, x0, key, dt=0.01, n_steps=T)

    u_d = np.asarray(tr_d.us)  # [T, B, 1]
    u_t = np.asarray(tr_t.us)
    u_range = prob.uub[0] - prob.ulb[0]
    # mean absolute control deviation, normalized by the control range
    dev = np.abs(u_t - u_d).mean() / u_range
    assert dev < 0.01, f"control-sequence deviation {dev:.4f} >= 1%"
    # realized cost parity
    c_d = np.asarray(tr_d.cost).mean()
    c_t = np.asarray(tr_t.cost).mean()
    assert abs(c_t - c_d) / max(abs(c_d), 1e-9) < 0.05, (c_d, c_t)
