"""Local dense completion (solvers/local_patch.py).

Core invariant: the patch solves the SAME discrete MCA Bellman operator as
the full-grid solve on its sub-box — so with EXACT dense boundary/initial
data it must reproduce the dense values (the dense solution is its fixed
point). With degraded data it must not make the region worse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.local_patch import (default_patch_bounds,
                                          make_patched_value_fn,
                                          solve_local_patch)


@pytest.fixture(scope="module")
def pendulum_dense():
    prob = make_pendulum_problem()
    grid = prob.default_grid(31)
    controls = prob.control_candidates(9)
    sol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
    return prob, grid, controls, sol.v


def test_patch_fixed_point_on_exact_data(pendulum_dense):
    prob, grid, controls, vd = pendulum_dense
    # pendulum theta is periodic: pick an interior box in both dims anyway
    lo, hi = (8, 8), (22, 22)
    vfn = lambda p: multilinear_interp(grid, vd, p)
    patch = solve_local_patch(prob, grid, vfn, controls, lo=lo, hi=hi,
                              tol=1e-6, max_sweeps=3000)
    v_exact = np.asarray(vd)[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1]
    scale = np.abs(v_exact).max()
    # the dense solution is the patch's fixed point: sub-box values match
    assert np.abs(np.asarray(patch.v) - v_exact).max() < 2e-3 * scale
    assert patch.residual < 1e-5 * max(scale, 1.0)


def test_patched_value_fn_continuous_seam(pendulum_dense):
    prob, grid, controls, vd = pendulum_dense
    lo, hi = (8, 8), (22, 22)
    vfn = lambda p: multilinear_interp(grid, vd, p)
    patch = solve_local_patch(prob, grid, vfn, controls, lo=lo, hi=hi,
                              tol=1e-6)
    vfn_p = make_patched_value_fn(grid, vfn, patch)
    # sample points straddling the seam: inside vs outside agree with the
    # respective fields and the seam value is shared (continuity)
    th0 = grid.nodes(0)[lo[0]]
    om = np.linspace(grid.lb[1] + 0.5, grid.ub[1] - 0.5, 7)
    seam = jnp.asarray(np.stack([np.full(7, th0), om], -1), jnp.float32)
    np.testing.assert_allclose(np.asarray(vfn_p(seam)),
                               np.asarray(vfn(seam)), rtol=0, atol=2e-3)
    inner = seam.at[:, 0].add(0.01)
    outer = seam.at[:, 0].add(-0.01)
    assert np.all(np.isfinite(np.asarray(vfn_p(inner))))
    assert np.all(np.isfinite(np.asarray(vfn_p(outer))))


def test_default_patch_bounds():
    prob = make_pendulum_problem()
    grid = prob.default_grid(9)
    lo, hi = default_patch_bounds(grid, margin=2)
    assert lo == (2, 2) and hi == (6, 6)
