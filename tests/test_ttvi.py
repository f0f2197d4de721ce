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


def test_bellman_backup_refine_is_monotone_improvement():
    """refine_steps polishes the brute-force winner: the refined backup is
    <= the brute-force backup at every non-terminal node (the incumbent is
    always a line-search candidate), and strictly better somewhere when the
    candidate grid is coarse (VERDICT r1 missing #2)."""
    from c3sc_tpu.ops.tt import tt_random
    from c3sc_tpu.solvers.ttvi import bellman_backup

    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    uc = jnp.asarray(prob.control_candidates(5))  # deliberately coarse
    v = tt_random(jax.random.key(0), grid.shape, (1, 4, 1), rmax=8)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        np.stack([rng.integers(1, n - 1, size=256) for n in grid.shape], -1),
        jnp.int32,
    )
    bf = np.asarray(bellman_backup(prob, grid, uc, v, idx))
    ref = np.asarray(
        bellman_backup(prob, grid, uc, v, idx, refine_steps=8)
    )
    assert np.all(ref <= bf + 1e-5)
    assert (bf - ref).max() > 1e-4  # coarse candidates leave room to polish


def test_ttvi_refine_steps_runs_and_matches_dense():
    """tt_vi with the continuous inner min enabled still converges to the
    dense fixed point (value parity within the usual tolerance)."""
    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    controls = prob.control_candidates(9)  # coarse: refine must compensate
    dense = dense_vi(prob, grid, controls=prob.control_candidates(41),
                     tol=1e-5, max_outer=400, chunk=100)
    sol = tt_vi(
        prob, grid, controls=controls, rmax=10, key=jax.random.key(0),
        tol=2e-4, max_iters=800, cross_sweeps=1, chunk=2048, refine_steps=5,
    )
    idx = all_nodes(grid)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_dense = np.asarray(dense.v).ravel()
    scale = np.abs(v_dense).max()
    err = np.abs(v_tt - v_dense) / scale
    assert np.quantile(err, 0.95) < 0.05
