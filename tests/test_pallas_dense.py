"""Pallas fused dense backup vs the XLA dense sweep (interpret mode on CPU;
compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_lq_problem, make_pendulum_problem
from c3sc_tpu.ops import mca
from c3sc_tpu.ops.pallas_dense import make_pallas_dense_backup
from c3sc_tpu.solvers.dense import _precompute, neighbor_values


def _xla_one_backup(problem, grid, controls, v):
    """One pure Bellman sweep (min over candidates) via the XLA path,
    with the same clamp/pin semantics as the kernel."""
    if problem.value_bounds is not None:
        v = jnp.clip(v, *problem.value_bounds)
    idx = jnp.asarray(
        np.stack(
            np.meshgrid(*[np.arange(m) for m in grid.shape], indexing="ij"), -1
        ).reshape(-1, grid.ndim),
        jnp.int32,
    )
    tm, tv = mca.node_terminal(problem, grid, idx, grid.index_to_state(idx))
    tm = tm.reshape(grid.shape)
    tv = tv.reshape(grid.shape).astype(jnp.float32)
    v = jnp.where(tm, tv, v)

    x, pp, pm, dt, g, term_mask, term_value = _precompute(
        problem, grid, controls, jnp.float32
    )
    vp, vm = neighbor_values(v, grid)
    rhs = g * dt + jnp.exp(-problem.beta * dt) * (
        jnp.einsum("cnd,nd->cn", pp, vp) + jnp.einsum("cnd,nd->cn", pm, vm)
    )
    out = jnp.min(rhs, axis=0).reshape(grid.shape)
    if problem.value_bounds is not None:
        out = jnp.clip(out, *problem.value_bounds)
    return jnp.where(tm, tv, out)


@pytest.mark.parametrize("make,n", [(make_pendulum_problem, 31), (make_lq_problem, 21)])
def test_pallas_backup_matches_xla(make, n):
    prob = make()
    grid = prob.default_grid(n)
    controls = prob.control_candidates(5)
    sweep = make_pallas_dense_backup(prob, grid, controls, interpret=True)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(0, 5, grid.shape), jnp.float32)
    got = np.asarray(sweep(v))
    want = np.asarray(_xla_one_backup(prob, grid, controls, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
