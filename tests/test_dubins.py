"""Dubins car 3D reach-avoid: fused TT-VI vs dense oracle with obstacles +
periodic heading (SURVEY.md §7 hard part #3: boundary semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_dubins_problem
from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.solvers import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi


@pytest.fixture(scope="module")
def dubins():
    prob = make_dubins_problem(beta=0.5)
    grid = prob.default_grid((25, 25, 16))
    controls = prob.control_candidates(7)
    return prob, grid, controls


def test_dubins_fused_matches_dense(dubins):
    prob, grid, controls = dubins
    dense = dense_vi(prob, grid, controls=controls, tol=1e-4, max_outer=200, chunk=50)
    sol = fused_tt_vi(
        prob, grid, controls=controls, rmax=20, key=jax.random.key(0),
        tol=3e-4, max_iters=1500, patience=100,
    )
    idx = np.stack(
        np.meshgrid(*[np.arange(n) for n in grid.shape], indexing="ij"), -1
    ).reshape(-1, 3)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_dense = np.asarray(dense.v).ravel()
    scale = np.abs(v_dense).max()
    # sup error is dominated by the discontinuous obstacle boundary; use a
    # high quantile + interior mean instead
    err = np.abs(v_tt - v_dense) / scale
    assert np.quantile(err, 0.95) < 0.05, f"q95 err {np.quantile(err, 0.95):.3f}"
    assert err.mean() < 0.02, f"mean err {err.mean():.3f}"


def test_dubins_dense_goal_reachable(dubins):
    """Value near goal is ~0; far from goal is positive; obstacle nodes carry
    the obstacle cost."""
    prob, grid, controls = dubins
    dense = dense_vi(prob, grid, controls=controls, tol=1e-4, max_outer=300, chunk=75)
    v = np.asarray(dense.v)
    # node nearest the goal center (0,0,*)
    i0 = np.argmin(np.abs(grid.nodes(0)))
    j0 = np.argmin(np.abs(grid.nodes(1)))
    assert v[i0, j0].max() < 1.0  # inside goal -> absorbed at cost ~0
    # obstacle interior pins at obstacle cost
    oi = np.argmin(np.abs(grid.nodes(0) - 1.7))
    oj = np.argmin(np.abs(grid.nodes(1) + 1.7))
    assert v[oi, oj].min() > 50.0
    assert np.isfinite(v).all()
