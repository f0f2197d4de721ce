"""TT policy iteration vs dense oracle on LQ (policy is linear -> low-rank
TT; PI must reach the same fixed point as VI)."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_lq_problem
from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.solvers import dense_vi
from c3sc_tpu.solvers.ttpi import tt_pi


def test_ttpi_matches_dense_lq():
    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(31)
    controls = prob.control_candidates(15)
    dense = dense_vi(prob, grid, controls=controls, tol=1e-5, max_outer=400, chunk=100)
    sol = tt_pi(
        prob, grid, controls=controls, rmax=10, key=jax.random.key(0),
        tol=3e-4, outer_iters=40, eval_iters=15, chunk=1024,
    )
    idx = np.stack(
        np.meshgrid(*[np.arange(n) for n in grid.shape], indexing="ij"), -1
    ).reshape(-1, 2)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_dense = np.asarray(dense.v).ravel()
    err = np.abs(v_tt - v_dense).max() / np.abs(v_dense).max()
    assert err < 0.03, f"PI vs dense sup error {err:.3f}"
    # policy TT evaluates to a sensible control field: near-zero at origin
    mid = np.array([[15, 15]], dtype=np.int32)
    u0 = float(tt_gather_eval(sol.policy[0], jnp.asarray(mid))[0])
    assert abs(u0) < 1.0
    # PI should need far fewer outer iterations than plain VI needs sweeps
    assert sol.outer_iters <= 40
