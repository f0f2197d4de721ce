"""TT-VI vs dense oracle node-wise (SURVEY.md §4/§7: the TT path must
reproduce the dense-grid solution; LQ + pendulum)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_lq_problem, make_pendulum_problem
from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.solvers import dense_vi
from c3sc_tpu.solvers.ttvi import tt_vi


def all_nodes(grid):
    return np.stack(
        np.meshgrid(*[np.arange(n) for n in grid.shape], indexing="ij"), -1
    ).reshape(-1, grid.ndim)


@pytest.mark.parametrize(
    "make,kwargs,n,nc,rmax",
    [
        (make_lq_problem, dict(sigma=1.0, beta=1.0), 31, 15, 10),
        (make_pendulum_problem, dict(beta=0.5, sigma=0.5), 31, 9, 16),
    ],
    ids=["lq", "pendulum"],
)
def test_ttvi_matches_dense(make, kwargs, n, nc, rmax):
    prob = make(**kwargs)
    grid = prob.default_grid(n)
    controls = prob.control_candidates(nc)
    dense = dense_vi(prob, grid, controls=controls, tol=1e-5, max_outer=400, chunk=100)
    sol = tt_vi(
        prob, grid, controls=controls, rmax=rmax, key=jax.random.key(0),
        tol=2e-4, max_iters=1500, cross_sweeps=1, chunk=2048,
    )
    idx = all_nodes(grid)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_dense = np.asarray(dense.v).ravel()
    scale = np.abs(v_dense).max()
    err = np.abs(v_tt - v_dense).max() / scale
    assert err < 0.02, f"TT vs dense sup error {err:.3f} (ranks={sol.ranks[-1]})"
    # compression: max rank well below full
    assert max(sol.ranks[-1]) <= rmax


def test_ttvi_dmrg_backend_matches_dense():
    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(31)
    controls = prob.control_candidates(15)
    dense = dense_vi(prob, grid, controls=controls, tol=1e-5, max_outer=400,
                     chunk=100)
    sol = tt_vi(
        prob, grid, controls=controls, rmax=10, key=jax.random.key(0),
        tol=2e-4, max_iters=800, cross_sweeps=1, chunk=2048,
        cross_method="dmrg",
    )
    idx = all_nodes(grid)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_dense = np.asarray(dense.v).ravel()
    err = np.abs(v_tt - v_dense).max() / np.abs(v_dense).max()
    assert err < 0.02, f"DMRG TT vs dense sup error {err:.3f}"
