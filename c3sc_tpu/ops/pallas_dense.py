"""Pallas TPU kernel: fused dense-grid Bellman sweep (d <= 3).

The XLA dense path (``solvers/dense.py``) precomputes the stencil for all
(candidate, node) pairs — ~C x N x d floats streamed from HBM every sweep
(hundreds of MB for 3D grids). This kernel inverts the trade: the whole
value table lives in VMEM, the stencil is recomputed on the fly from the
problem's drift/diffusion/cost callables (VPU compute is cheaper than HBM
bandwidth on TPU), candidates are an unrolled running min, and one sweep
touches HBM only to read v and write v' (~2 x N floats).

Problem callables may close over device constants (gain matrices etc.);
Pallas forbids captured constants inside kernels, so ``jax.closure_convert``
hoists them into explicit kernel inputs automatically — no per-problem
kernel code.

Applicability: product(grid.shape) x 4 bytes must fit in VMEM alongside a
few temporaries (~<= 256^2 in 2D, ~<= 90^3 in 3D).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops import mca


def _neighbor_tables(v, grid: Grid):
    """Shifted value tables per dim under boundary rules (traced)."""
    vps, vms = [], []
    for j in range(grid.ndim):
        n = v.shape[j]
        if grid.periodic[j]:
            vp = jnp.roll(v, -1, axis=j)
            vm = jnp.roll(v, 1, axis=j)
        else:
            first = jax.lax.slice_in_dim(v, 0, 1, axis=j)
            last = jax.lax.slice_in_dim(v, n - 1, n, axis=j)
            vp = jnp.concatenate([jax.lax.slice_in_dim(v, 1, n, axis=j), last], axis=j)
            vm = jnp.concatenate([first, jax.lax.slice_in_dim(v, 0, n - 1, axis=j)], axis=j)
        vps.append(vp)
        vms.append(vm)
    return vps, vms


def make_pallas_dense_backup(problem: ControlProblem, grid: Grid, controls,
                             dtype=jnp.float32, interpret: bool = False):
    """Build the jitted fused sweep: v [grid.shape] -> (T v) [grid.shape]."""
    d = grid.ndim
    assert d <= 3, "whole-grid VMEM kernel supports d <= 3"
    shape = grid.shape
    N = int(np.prod(shape))
    assert N * 4 * (2 * d + 6) < 14 * 1024 * 1024, "grid too large for VMEM"
    uc = jnp.asarray(controls, dtype)
    C = uc.shape[0]
    lb_np = np.asarray(grid.lb, np.float32)
    assert grid.uniform, "pallas dense sweep: uniform grids only"
    h_np = np.asarray(grid.h, np.float32)
    beta = problem.beta
    vb = problem.value_bounds

    # hoist device constants captured by the user callables into inputs;
    # keep everything GRID-SHAPED (Mosaic forbids 2D->flat reshapes), so the
    # per-point callables are lifted with one nested vmap per grid dim
    def _stencil_all(xgrid, u):
        def per_point(xx):
            return (
                problem.drift(xx, u).astype(dtype),
                problem.sigma2_diag(xx, u).astype(dtype),
                problem.stage_cost(xx, u).astype(dtype),
            )

        fn = per_point
        for _ in range(d):
            fn = jax.vmap(fn)
        return fn(xgrid)  # f [*shape, d], s2 [*shape, d], g [*shape]

    # trace to a jaxpr and pass ALL its constants (including literal arrays
    # created inside the user callables) as explicit kernel inputs
    _closed = jax.make_jaxpr(_stencil_all)(
        jnp.zeros((*shape, d), dtype), jnp.zeros((problem.du,), dtype)
    )
    consts = [jnp.asarray(c) for c in _closed.consts]

    def stencil_fn(xgrid, u, *const_vals):
        f, s2, g = jax.core.eval_jaxpr(_closed.jaxpr, list(const_vals), xgrid, u)
        return f, s2, g

    # terminal classification is static per grid — precomputed inputs
    mesh_idx = jnp.asarray(
        np.stack(
            np.meshgrid(*[np.arange(n) for n in shape], indexing="ij"), -1
        ).reshape(-1, d),
        jnp.int32,
    )
    t_mask, t_val = mca.node_terminal(
        problem, grid, mesh_idx, grid.index_to_state(mesh_idx)
    )
    t_mask = jnp.asarray(np.asarray(t_mask).reshape(shape).astype(np.float32))
    t_val = jnp.asarray(np.asarray(t_val).reshape(shape).astype(np.float32))

    def kernel(v_ref, tmask_ref, tval_ref, uc_ref, *const_refs):
        out_ref = const_refs[-1]
        const_vals = [r[:] for r in const_refs[:-1]]
        v = v_ref[:]
        if vb is not None:
            v = jnp.clip(v, vb[0], vb[1])
        # pin terminal nodes before they are read as neighbors
        v = jnp.where(tmask_ref[:] > 0, tval_ref[:], v)
        vps, vms = _neighbor_tables(v, grid)
        xs = []
        for j in range(d):
            ii = jax.lax.broadcasted_iota(jnp.int32, shape, j)
            xs.append(float(lb_np[j]) + ii.astype(dtype) * float(h_np[j]))
        xgrid = jnp.stack(xs, axis=-1)  # [*shape, d] — no flat reshape

        def candidate_rhs(c, best):
            # single traced body regardless of C (keeps the Mosaic graph —
            # and its minutes-long remote compile — small)
            u = uc_ref[c, :]
            f, s2, g = stencil_fn(xgrid, u, *const_vals)
            q = jnp.zeros(shape, dtype)
            for j in range(d):
                hj = float(h_np[j])
                q = q + s2[..., j] / (hj * hj) + jnp.abs(f[..., j]) / hj
            q = q + 1e-10
            dt = 1.0 / q
            expect = jnp.zeros(shape, dtype)
            for j in range(d):
                hj = float(h_np[j])
                diffpart = 0.5 * s2[..., j] / (hj * hj)
                ppj = (diffpart + jnp.maximum(f[..., j], 0.0) / hj) / q
                pmj = (diffpart + jnp.maximum(-f[..., j], 0.0) / hj) / q
                expect = expect + ppj * vps[j] + pmj * vms[j]
            rhs = g * dt + jnp.exp(-beta * dt) * expect
            return jnp.minimum(best, rhs)

        big = jnp.full(shape, 3.4e38, dtype)
        best = jax.lax.fori_loop(0, C, candidate_rhs, big)
        if vb is not None:
            best = jnp.clip(best, vb[0], vb[1])
        out_ref[:] = jnp.where(tmask_ref[:] > 0, tval_ref[:], best)

    n_inputs = 4 + len(consts)

    @jax.jit
    def sweep(v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(v.astype(dtype), t_mask, t_val, uc, *consts)

    return sweep
