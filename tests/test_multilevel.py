"""Grid-multilevel VI: coarse-to-fine warm starting must reach the same
fixed point as a cold fine-grid solve (the final level IS the fine MCA
problem) while spending most iterations on cheap coarse levels."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.solvers import dense_vi
from c3sc_tpu.solvers.multilevel import multilevel_tt_vi


def test_multilevel_matches_dense_fixed_point():
    prob = make_pendulum_problem(beta=0.5, sigma=0.5)
    controls = prob.control_candidates(9)
    ml = multilevel_tt_vi(prob, ns=[21, 31], rmax=16, key=jax.random.key(0),
                          tol=2e-4, controls=controls)
    assert len(ml.levels) == 2
    # final level converged or plateaued finitely
    assert np.isfinite(ml.final.residual)
    grid = ml.grid
    assert grid.shape == (31, 31)
    dense = dense_vi(prob, grid, controls=controls, tol=1e-5,
                     max_outer=400, chunk=100)
    idx = np.stack(np.meshgrid(np.arange(31), np.arange(31), indexing="ij"),
                   -1).reshape(-1, 2)
    v_tt = np.asarray(tt_gather_eval(ml.final.v, jnp.asarray(idx, jnp.int32)))
    v_d = np.asarray(dense.v).ravel()
    err = np.abs(v_tt - v_d) / np.abs(v_d).max()
    assert np.quantile(err, 0.95) < 0.05, np.quantile(err, 0.95)
