"""shard_map'd Bellman backup and rollout steps over a device mesh.

The TPU-native replacement for the parallelism the reference never had
(SURVEY.md §2.3): Bellman fiber/node batches shard over the 'fibers' mesh
axis (data parallel), control candidates over 'ctrl' (each shard computes
its candidate block's RHS, then a ``pmin`` collective takes the global min
over ICI), TT cores stay replicated. Rollout scenarios shard over 'fibers'.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops import mca
from c3sc_tpu.ops.tt import TT, tt_gather_eval
from c3sc_tpu.solvers.ttvi import _neighbor_indices


def make_sharded_bellman(problem: ControlProblem, grid: Grid, mesh: Mesh,
                         dtype=jnp.float32):
    """Jitted sharded backup: (v_tt, idx [B, d], controls [C, du]) -> [B].

    B must divide the 'fibers' axis size, C the 'ctrl' axis size. Collective:
    per-shard min over its candidate block, then pmin over 'ctrl'.
    """
    d = problem.dx

    def local_backup(v_tt: TT, idx, uc):
        # idx: [B_local, d]; uc: [C_local, du]; v_tt replicated
        x = grid.index_to_state(idx).astype(dtype)
        nb = _neighbor_indices(grid, idx).reshape(-1, d)
        vn = tt_gather_eval(v_tt, nb)
        nx = grid.index_to_state(nb).astype(dtype)
        t_mask, t_val = mca.node_terminal(problem, grid, nb, nx)
        vn = jnp.where(t_mask, t_val.astype(dtype), vn).reshape(-1, 2, d)

        def rhs_for_control(u):
            pp, pm, dt = mca.transition_batch(
                problem, grid, x, jnp.broadcast_to(u, (x.shape[0],) + u.shape)
            )
            g = jax.vmap(lambda xx: problem.stage_cost(xx, u))(x)
            expect = jnp.sum(pp * vn[:, 0] + pm * vn[:, 1], axis=-1)
            return g * dt + jnp.exp(-problem.beta * dt) * expect

        rhs = jax.lax.map(rhs_for_control, uc)          # [C_local, B_local]
        val = jnp.min(rhs, axis=0)                      # local candidate min
        val = jax.lax.pmin(val, "ctrl")                 # global min over ICI
        tm, tv = mca.node_terminal(problem, grid, idx, x)
        return jnp.where(tm, tv.astype(dtype), val)

    smapped = shard_map(
        local_backup, mesh=mesh,
        in_specs=(P(), P("fibers", None), P("ctrl", None)),
        out_specs=P("fibers"),
    )
    return jax.jit(smapped)


def make_sharded_rollout(problem: ControlProblem, grid: Grid, mesh: Mesh,
                         policy, dt: float, n_steps: int):
    """Jitted sharded Monte-Carlo rollout: (x0 [B, d], keys [B]) -> Trajectory.

    Scenarios shard over 'fibers'; each shard runs the full scan locally
    (embarrassingly parallel — the reference loops these serially,
    SURVEY.md §2.3 'DP' row).
    """
    from c3sc_tpu.sim.integrators import Trajectory, rollout

    def local_roll(x0, key):
        return rollout(problem, grid, policy, x0, key[0], dt, n_steps)

    out_specs = Trajectory(
        xs=P(None, "fibers", None), us=P(None, "fibers", None),
        cost=P("fibers"), alive=P(None, "fibers"), exit_time=P("fibers"),
    )
    smapped = shard_map(
        local_roll, mesh=mesh,
        in_specs=(P("fibers", None), P("fibers")),
        out_specs=out_specs,
    )
    return jax.jit(smapped)
