"""Multilinear interpolation on tensor-product grids.

The continuous-eval analogue of the reference's linear-element univariate
class (``C3 src/lib_funcs/linelm.c`` — line n/a, empty mount; SURVEY.md §2.2):
on-grid values + hat-function (lerp) interpolation between nodes, with
periodic wrap. Used by the closed-loop simulator for off-grid value queries
against a dense value table; the TT path has its own core-level lerp.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp

from c3sc_tpu.grids import Grid


def multilinear_interp(grid: Grid, values, x):
    """Interpolate dense `values` [*grid.shape] at points x [..., d].

    2^d-corner multilinear (hat-function) interpolation; periodic dims wrap
    the upper cell onto node 0; bounded dims clamp at the box edge.
    """
    d = grid.ndim
    cell, w = grid.state_to_cell(grid.wrap_state(x))  # [..., d]
    n = jnp.asarray(grid.shape, jnp.int32)
    out = jnp.zeros(x.shape[:-1], values.dtype)
    for corner in itertools.product((0, 1), repeat=d):
        idx = []
        weight = jnp.ones(x.shape[:-1], values.dtype)
        for k in range(d):
            j = cell[..., k] + corner[k]
            j = jnp.mod(j, n[k]) if grid.periodic[k] else jnp.clip(j, 0, n[k] - 1)
            idx.append(j)
            wk = w[..., k].astype(values.dtype)
            weight = weight * (wk if corner[k] else (1.0 - wk))
        out = out + weight * values[tuple(idx)]
    return out
