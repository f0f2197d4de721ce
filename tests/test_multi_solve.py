"""Batched sharded solves: correctness on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_lq_problem
from c3sc_tpu.ops.tt import TT, tt_gather_eval
from c3sc_tpu.parallel import make_mesh
from c3sc_tpu.parallel.multi_solve import solve_batch
from c3sc_tpu.solvers import dense_vi


def test_solve_batch_sharded_matches_dense():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    controls = prob.control_candidates(9)
    mesh = make_mesh(axes=("fibers",), shape=(8,), devices=jax.devices()[:8])
    keys = [jax.random.key(i) for i in range(8)]
    out = solve_batch(
        prob, grid, controls, keys, rmax=8, mesh=mesh,
        tol=5e-4, max_iters=400, patience=100,
    )
    assert out.residual.shape == (8,)
    dense = dense_vi(prob, grid, controls=controls, tol=1e-5, max_outer=300, chunk=100)
    idx = np.stack(
        np.meshgrid(*[np.arange(n) for n in grid.shape], indexing="ij"), -1
    ).reshape(-1, 2)
    v_dense = np.asarray(dense.v).ravel()
    for b in range(8):
        v = TT(
            tuple(c[b] for c in out.cores),
            out.ranks[b],
        )
        v_tt = np.asarray(tt_gather_eval(v, jnp.asarray(idx, jnp.int32)))
        err = np.abs(v_tt - v_dense).max() / np.abs(v_dense).max()
        assert err < 0.05, f"instance {b}: err {err:.3f}"
