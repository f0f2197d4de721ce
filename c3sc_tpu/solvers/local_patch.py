"""Local dense completion: exact sub-grid solve around the operating point.

The round-4 frontier measurement (experiments/frontier_n*.json) isolated
the flagship parity blocker: closed-loop cost near a cost minimum is
decided by the value field's GRADIENT around the attractor, where the true
gradient vanishes — even SVD-optimal sub-0.2%-q95 truncations can park the
plant cells off-center (cost deviations 0.5-25%, quasi-random in rank).
No global low-rank representation controls that local gradient reliably.

TPU-native answer: keep the TT value as the GLOBAL solution and complete
it with an exact LOCAL solve where precision matters. On a sub-box of
grid nodes around the operating point (the hover basin), run dense value
iteration of the SAME discrete MCA Bellman operator (same nodes, same
spacing, same stencil) with Dirichlet data from the TT solve pinned on
the sub-box faces. Interior patch values converge to the exact discrete
solution GIVEN the TT boundary data; boundary error enters only through
discounted first-passage to the patch faces (E[e^(-beta tau)] << 1 from
the basin center), so near-attractor values become discretization-exact
and the greedy/MPC parking recovers the oracle's policy.

The TT solve stays load-bearing: it provides everything outside the patch
AND the patch boundary conditions — a bad global solve yields a bad
patch. The patch is O((2m+1)^d_local) nodes (15k at 9^6 defaults) vs the
full grid's 531k, and scales to grids where the full dense solve does not
exist. Reference: none (C3/c3sc have no local completion; SURVEY.md §2) —
this is a capability the TPU build adds on top of parity.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.solvers.dense import _precompute, neighbor_values


@dataclasses.dataclass
class LocalPatch:
    subgrid: Grid
    v: jnp.ndarray          # [*subgrid.shape] patch values (faces = TT data)
    lo: tuple               # per-dim first node index in the parent grid
    hi: tuple               # per-dim last node index (inclusive)
    residual: float
    sweeps: int


def default_patch_bounds(grid: Grid, margin: int = 2):
    """Central sub-box: drop ``margin`` nodes from each side per dim."""
    lo = tuple(margin for _ in grid.shape)
    hi = tuple(n - 1 - margin for n in grid.shape)
    assert all(h - l >= 2 for l, h in zip(lo, hi)), "patch too small"
    return lo, hi


def solve_local_patch(
    problem: ControlProblem,
    grid: Grid,
    value_fn: Callable,
    controls,
    lo: Sequence[int] | None = None,
    hi: Sequence[int] | None = None,
    margin: int = 2,
    tol: float = 1e-5,
    max_sweeps: int = 2000,
    chunk: int = 50,
    dtype=jnp.float32,
) -> LocalPatch:
    """Dense VI on the sub-box [lo, hi] (node indices, inclusive) of the
    parent grid, faces pinned to ``value_fn`` (the TT solve).

    The sub-box must not touch the parent grid's boundary (its stencil
    must be the parent's interior stencil) and must not contain periodic
    wrap-around — both hold for the default central patch.
    """
    if lo is None or hi is None:
        lo, hi = default_patch_bounds(grid, margin)
    lo, hi = tuple(lo), tuple(hi)
    assert all(l >= 1 and h <= n - 2 for l, h, n in zip(lo, hi, grid.shape))
    sub_shape = tuple(h - l + 1 for l, h in zip(lo, hi))
    nodes = [grid.nodes(k) for k in range(grid.ndim)]
    sub_nodes = [nodes[k][lo[k]:hi[k] + 1] for k in range(grid.ndim)]
    sub_lb = tuple(float(nk[0]) for nk in sub_nodes)
    sub_ub = tuple(float(nk[-1]) for nk in sub_nodes)
    # same nodes => same MCA stencil as the parent's interior (uniform
    # parents get the closed-form subgrid; non-uniform carry their slice)
    subgrid = Grid.create(sub_lb, sub_ub, sub_shape,
                          periodic=(False,) * grid.ndim, nodes=sub_nodes)
    if grid.uniform:
        assert np.allclose(subgrid.h, grid.h), (subgrid.h, grid.h)

    x, pp, pm, dt, g, _tm, _tv = _precompute(problem, subgrid, controls,
                                             dtype)
    # faces of the SUB-BOX are Dirichlet (TT data) — _precompute's terminal
    # classification treated them as the problem's absorbing faces, which
    # they are not. Interior terminal nodes (obstacle / goal regions per
    # mca.node_terminal, e.g. the Dubins goal disc at the domain center)
    # MUST keep the parent operator's pinning — the patch VI would
    # otherwise solve through them (ADVICE r4 medium finding).
    idx = np.stack([m.ravel() for m in np.meshgrid(
        *[np.arange(n) for n in sub_shape], indexing="ij")], -1)
    face = np.zeros(idx.shape[0], bool)
    for k, n in enumerate(sub_shape):
        face |= (idx[:, k] == 0) | (idx[:, k] == n - 1)
    face = jnp.asarray(face)
    in_obs = problem.in_obstacle(x)                      # [N] interior pins
    obs_val = problem.obstacle_cost(x).astype(dtype)

    v0 = value_fn(x).astype(dtype)                       # TT data everywhere
    stencil = dict(pp=pp, pm=pm, gdt=g * dt,
                   disc=jnp.exp(-problem.beta * dt))

    @jax.jit
    def sweep_block(st, v, v0_flat):
        def one(v, _):
            vp, vm = neighbor_values(v, subgrid)
            rhs = st["gdt"] + st["disc"] * (
                jnp.einsum("cnd,nd->cn", st["pp"], vp)
                + jnp.einsum("cnd,nd->cn", st["pm"], vm))
            vnew = jnp.min(rhs, axis=0)
            vnew = jnp.where(face, v0_flat, vnew)         # Dirichlet faces
            # obstacle/goal pinning takes precedence (mca.node_terminal)
            vnew = jnp.where(in_obs, obs_val, vnew)
            return vnew.reshape(sub_shape), None

        def body(_, carry):
            v, _ = carry
            vnew, _ = one(v, None)
            return vnew, jnp.max(jnp.abs(vnew - v))

        return jax.lax.fori_loop(0, chunk, body,
                                 (v, jnp.asarray(jnp.inf, dtype)))

    v = jnp.where(face, v0, v0).reshape(sub_shape)
    res = float("inf")
    done = 0
    while done < max_sweeps:
        v, res = sweep_block(stencil, v, v0)
        res = float(res)
        done += chunk
        if res < tol:
            break
    return LocalPatch(subgrid=subgrid, v=v, lo=lo, hi=hi, residual=res,
                      sweeps=done)


def make_patch_node_value_fn(patch: LocalPatch):
    """``node_value_fn(v_tt, idx [B, d] int) -> [B]``: TT gather with the
    patch's dense values substituted inside its sub-box (the two-level
    composite field at grid NODES; see ``two_level_solve``)."""
    from c3sc_tpu.ops.tt import tt_gather_eval

    lo = jnp.asarray(patch.lo, jnp.int32)
    hi = jnp.asarray(patch.hi, jnp.int32)
    sub_shape = patch.subgrid.shape
    strides = np.cumprod((sub_shape[1:] + (1,))[::-1])[::-1].copy()
    strides_j = jnp.asarray(strides, jnp.int32)
    v_flat_holder = patch.v.reshape(-1)

    def node_value_fn(v_tt, idx):
        v = tt_gather_eval(v_tt, idx)
        inside = jnp.all((idx >= lo) & (idx <= hi), axis=-1)
        local = jnp.clip(idx - lo, 0, jnp.asarray(sub_shape, jnp.int32) - 1)
        flat = jnp.sum(local * strides_j, axis=-1)
        return jnp.where(inside, v_flat_holder[flat], v)

    return node_value_fn


@dataclasses.dataclass
class TwoLevelResult:
    v: "object"                 # final TT (polish result)
    patch: LocalPatch
    history: list               # per-cycle polish/patch stats


def two_level_solve(
    problem: ControlProblem,
    grid: Grid,
    controls,
    v0,
    rmax: int = 64,
    cycles: int = 2,
    cycle_schedule=((10, 64),),
    margin: int = 1,
    patch_tol: float = 1e-5,
    key=None,
    verbose: bool = False,
    **polish_kwargs,
):
    """Two-level TT + local-patch iteration (FAS-flavored multigrid):

        patch  <- dense VI on the sub-box, Dirichlet faces from the TT
        TT     <- two-site polish of T(composite), composite = TT (+) patch

    The polish target evaluates the Bellman backup of the COMPOSITE field,
    so the TT's values at the patch ring (one node outside the sub-box)
    are refreshed from accurate patch-interior neighbors, which improves
    the next patch's Dirichlet data — each cycle contracts the ring error
    toward the two-site fit floor instead of the global TT error. The
    final composite is the production value field.
    """
    from c3sc_tpu.solvers.polish import tt_polish
    from c3sc_tpu.solvers.ttvi import make_bellman_kernel
    from c3sc_tpu.ops.tt import tt_lerp_eval

    if key is None:
        key = jax.random.key(0)
    uc = jnp.asarray(controls, jnp.float32)
    v_tt = v0
    state = None
    history = []
    patch = solve_local_patch(
        problem, grid, lambda p: tt_lerp_eval(v_tt, grid, p), controls,
        margin=margin, tol=patch_tol)
    for cycle in range(cycles):
        kernel = make_bellman_kernel(
            problem, grid, uc, chunk=polish_kwargs.get("chunk", 32768),
            node_value_fn=make_patch_node_value_fn(patch))
        psol = tt_polish(problem, grid, controls, v_tt, rmax=rmax,
                         schedule=cycle_schedule, kernel=kernel,
                         state=state, key=jax.random.fold_in(key, cycle),
                         **polish_kwargs)
        v_tt, state = psol.v, psol.state
        patch = solve_local_patch(
            problem, grid, lambda p: tt_lerp_eval(v_tt, grid, p), controls,
            margin=margin, tol=patch_tol)
        rec = {"cycle": cycle, "patch_res": patch.residual,
               "polish_best": psol.best_step,
               "bres": [h.get("bres") for h in psol.history
                        if "bres" in h]}
        history.append(rec)
        if verbose:
            print(f"[two_level] cycle={cycle} bres={rec['bres']}",
                  flush=True)
    return TwoLevelResult(v=v_tt, patch=patch, history=history)


def make_patched_value_fn(grid: Grid, value_fn: Callable, patch: LocalPatch):
    """Continuous value: dense patch inside its sub-box, ``value_fn``
    outside. The patch faces carry the TT data, so the piecewise-multilinear
    field is continuous across the seam."""
    sub_lb = jnp.asarray(patch.subgrid.lb, jnp.float32)
    sub_ub = jnp.asarray(patch.subgrid.ub, jnp.float32)

    def vfn(p):
        inside = jnp.all((p >= sub_lb) & (p <= sub_ub), axis=-1)
        v_loc = multilinear_interp(patch.subgrid, patch.v,
                                   jnp.clip(p, sub_lb, sub_ub))
        return jnp.where(inside, v_loc, value_fn(p))

    return vfn
