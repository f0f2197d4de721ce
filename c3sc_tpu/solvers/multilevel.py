"""Grid-multilevel VI: coarse-to-fine warm starting.

MCA value iteration contracts at ~exp(-beta * dt) per sweep with
dt = O(h^2 / sigma^2) — fine grids converge SLOWLY. The multilevel driver
solves a ladder of grids, prolonging the TT (linelm-exact lerp of cores)
to warm-start each finer level: coarse levels do the bulk of the value
convergence cheaply, fine levels only sharpen. The reference has no
analogue (single fixed grid) — this is free TPU-era acceleration on top of
the same discretization (the FINAL level's fixed point is identical to a
cold solve on that grid).
"""

from __future__ import annotations

import dataclasses

import jax

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops.tt import tt_refine_grid
from c3sc_tpu.solvers.fused import FusedVISolution, fused_tt_vi


@dataclasses.dataclass
class MultilevelSolution:
    final: FusedVISolution     # solution on the finest grid
    grid: Grid
    levels: list               # per-level (n, iterations, residual, wall)


def multilevel_tt_vi(
    problem: ControlProblem,
    ns: list,
    rmax: int = 16,
    key=None,
    tol: float = 3e-4,
    max_iters_coarse: int = 4000,
    max_iters_fine: int = 2000,
    **kwargs,
) -> MultilevelSolution:
    """Solve on grids of sizes ns[0] < ns[1] < ... (each int or tuple)."""
    if key is None:
        key = jax.random.key(0)
    v0 = None
    prev_grid = None
    stats = []
    sol = None
    for i, n in enumerate(ns):
        grid = problem.default_grid(n)
        if v0 is not None:
            v0 = tt_refine_grid(v0, prev_grid, grid)
        key, sk = jax.random.split(key)
        sol = fused_tt_vi(
            problem, grid, rmax=rmax, key=sk, tol=tol,
            max_iters=max_iters_fine if i == len(ns) - 1 else max_iters_coarse,
            v0=v0, **kwargs,
        )
        stats.append((n, sol.iterations, sol.residual, round(sol.wall_time, 2)))
        v0, prev_grid = sol.v, grid
    return MultilevelSolution(final=sol, grid=prev_grid, levels=stats)
