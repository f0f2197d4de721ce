"""Batched independent solves sharded over the device mesh ("solves/s").

BASELINE.md target: >= 80% solves/s scaling efficiency from 1 to N hosts.
A batch of independent VI solves (different RNG streams / scenario
instances) runs as ONE vmapped fused program with the batch axis sharded
over devices — embarrassingly parallel, so the only scaling losses are
lockstep convergence (vmapped while_loop runs until the LAST instance
converges) and launch overhead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.solvers.fused import FusedCarry, make_fused_vi


def solve_batch(
    problem: ControlProblem,
    grid: Grid,
    controls,
    keys,
    rmax: int = 16,
    mesh: Mesh | None = None,
    axis: str = "fibers",
    **fused_kwargs,
):
    """Run len(keys) independent fused VI solves, batch axis sharded.

    Returns the stacked final FusedCarry (leading axis = instance).
    """
    solve_fn, init_fn, _ = make_fused_vi(
        problem, grid, controls, rmax=rmax, **fused_kwargs
    )
    carries = [init_fn(k) for k in keys]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)
    vsolve = jax.jit(jax.vmap(solve_fn))
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis))
        stacked = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
            stacked,
        )
        del shard
    out = vsolve(stacked)
    jax.block_until_ready(out.residual)
    return out
