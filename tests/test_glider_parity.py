"""North-star parity at 4D (VERDICT r1 next #1): perching-glider fused-TT
solve vs a ~20k-node dense oracle — value error, closed-loop control
sequence (<1% of the control range, BASELINE.md) and realized cost under
identical noise keys. SURVEY.md §4: the dense oracle stands in for the
unavailable reference binary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_glider_problem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_gather_eval, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi


@pytest.mark.slow
def test_glider_4d_control_sequence_parity():
    prob = make_glider_problem()
    grid = prob.default_grid((15, 11, 11, 11))
    controls = prob.control_candidates(9)

    dense = dense_vi(prob, grid, controls=controls, tol=1e-5,
                     max_outer=2000, chunk=100)
    assert dense.residual < 1e-4

    sol = fused_tt_vi(prob, grid, controls=controls, rmax=16,
                      key=jax.random.key(0), tol=2e-4, max_iters=1200,
                      eps_rank=1e-5, patience=40)

    # node-wise value parity (sup is dominated by a few nodes next to the
    # discontinuous miss-cost faces; the bulk metric is q95)
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in grid.shape],
                               indexing="ij"), -1).reshape(-1, 4)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_d = np.asarray(dense.v).ravel()
    err = np.abs(v_tt - v_d) / np.abs(v_d).max()
    assert np.quantile(err, 0.95) < 0.05, f"q95 value err {np.quantile(err, 0.95):.4f}"

    # closed-loop control-sequence parity under identical noise keys
    pol_d = make_implicit_policy(
        prob, grid, lambda p: multilinear_interp(grid, dense.v, p), controls)
    pol_t = make_implicit_policy(
        prob, grid, lambda p: tt_lerp_eval(sol.v, grid, p), controls)
    B, T = 32, 300
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(np.stack([
        rng.uniform(-3.2, -2.0, B), rng.uniform(-0.5, 0.5, B),
        rng.uniform(2.0, 5.0, B), rng.uniform(-0.5, 0.3, B)], -1), jnp.float32)
    key = jax.random.key(7)
    tr_d = rollout(prob, grid, pol_d, x0, key, dt=0.01, n_steps=T)
    tr_t = rollout(prob, grid, pol_t, x0, key, dt=0.01, n_steps=T)

    alive = (np.asarray(tr_d.alive[:-1]) & np.asarray(tr_t.alive[:-1]))[..., None]
    u_range = prob.uub[0] - prob.ulb[0]
    dev = (np.abs(np.asarray(tr_t.us) - np.asarray(tr_d.us)) * alive).sum() \
        / max(alive.sum(), 1) / u_range
    assert dev < 0.01, f"4D control-sequence deviation {dev:.4f} >= 1%"

    c_d = float(np.asarray(tr_d.cost).mean())
    c_t = float(np.asarray(tr_t.cost).mean())
    assert abs(c_t - c_d) / max(abs(c_d), 1e-9) < 0.02, (c_d, c_t)
