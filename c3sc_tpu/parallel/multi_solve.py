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
    solve_fn, init_fn, _, _ = make_fused_vi(
        problem, grid, controls, rmax=rmax, **fused_kwargs
    )
    carries = [init_fn(k) for k in keys]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)
    vsolve = jax.jit(jax.vmap(solve_fn))
    if mesh is not None:
        stacked = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
            stacked,
        )
    out = vsolve(stacked)
    jax.block_until_ready(out.residual)
    return out


def make_batch_stepper(
    problem: ControlProblem,
    grid: Grid,
    controls,
    rmax: int = 16,
    mesh: Mesh | None = None,
    axis: str = "fibers",
    **fused_kwargs,
):
    """Fixed-iteration batched fused-VI stepper for scaling measurements.

    Unlike ``solve_batch`` (vmapped while_loop — lockstep until the LAST
    instance converges), this runs an exact number of iterations per
    instance, so wall time measures pure throughput: the basis of the
    solves/s scaling-efficiency metric (BASELINE.md, >= 80% from 1 to
    N >= 2 hosts). Returns ``(init, step)``:

      init(keys [N]) -> stacked FusedCarry (batch axis sharded over `axis`)
      step(stacked, n_iters) -> stacked   (jitted; n_iters static)
    """
    _, init_fn, step_fn, _ = make_fused_vi(
        problem, grid, controls, rmax=rmax, tol=0.0, max_iters=10**9,
        **fused_kwargs,
    )

    def init(keys):
        carries = [init_fn(k) for k in keys]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)
        if mesh is not None:
            stacked = jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x,
                    NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))),
                ),
                stacked,
            )
        return stacked

    vstep = jax.jit(
        jax.vmap(step_fn, in_axes=(0, None)), static_argnums=1
    )

    def step(stacked, n_iters: int):
        out = vstep(stacked, n_iters)
        jax.block_until_ready(out.residual)
        return out

    return init, step
