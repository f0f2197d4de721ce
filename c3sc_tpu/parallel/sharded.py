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
from c3sc_tpu.solvers.ttvi import bellman_backup


def make_sharded_bellman(problem: ControlProblem, grid: Grid, mesh: Mesh,
                         dtype=jnp.float32):
    """Jitted sharded backup: (v_tt, idx [B, d], controls [C, du]) -> [B].

    B must divide the 'fibers' axis size, C the 'ctrl' axis size. Collective:
    per-shard min over its candidate block, then pmin over 'ctrl'.
    """
    def local_backup(v_tt: TT, idx, uc):
        # idx: [B_local, d]; uc: [C_local, du]; v_tt replicated.
        # Each shard mins over its candidate block (same fused backup as the
        # single-chip kernel), then a pmin collective takes the global min
        # over ICI. Terminal pinning/clamping are per-node and identical on
        # every shard, so they commute with pmin.
        val = bellman_backup(problem, grid, uc, v_tt, idx, dtype)
        return jax.lax.pmin(val, "ctrl")

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
