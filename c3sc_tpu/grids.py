"""Tensor-product state grids.

TPU-native replacement for the grid/index utilities of the reference
(``c3sc/src/nodeutil.c`` — line n/a, empty mount; see SURVEY.md §2.1): uniform
per-dimension node grids, vectorised index<->state conversion, and neighbor
index computation under boundary rules. Everything is static-shape and
vmappable so it can live inside jitted Bellman kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    """A uniform tensor-product grid over a box [lb, ub].

    For periodic dimensions the nodes cover [lb, ub) — node n would alias
    node 0 — matching the reference's convention for angle dimensions
    (pendulum theta, Dubins heading).

    Attributes:
      lb, ub: per-dim bounds, shape (d,) (python tuples — static).
      shape:  per-dim node counts (n_1, ..., n_d) (static).
      periodic: per-dim bool, True where the dimension wraps.
    """

    lb: tuple[float, ...]
    ub: tuple[float, ...]
    shape: tuple[int, ...]
    periodic: tuple[bool, ...]

    @staticmethod
    def create(
        lb: Sequence[float],
        ub: Sequence[float],
        shape: Sequence[int],
        periodic: Sequence[bool] | None = None,
    ) -> "Grid":
        d = len(shape)
        if periodic is None:
            periodic = (False,) * d
        assert len(lb) == len(ub) == len(periodic) == d
        return Grid(tuple(map(float, lb)), tuple(map(float, ub)), tuple(map(int, shape)), tuple(map(bool, periodic)))

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def h(self) -> np.ndarray:
        """Per-dim node spacing (static numpy — safe to close over in jit)."""
        out = np.empty(self.ndim)
        for k in range(self.ndim):
            n = self.shape[k]
            span = self.ub[k] - self.lb[k]
            # periodic: n nodes over [lb, ub) -> spacing span/n
            # bounded:  n nodes over [lb, ub] -> spacing span/(n-1)
            out[k] = span / n if self.periodic[k] else span / max(n - 1, 1)
        return out

    def nodes(self, k: int) -> np.ndarray:
        """The 1-D node array for dimension k (static numpy)."""
        n = self.shape[k]
        if self.periodic[k]:
            return self.lb[k] + np.arange(n) * (self.ub[k] - self.lb[k]) / n
        return np.linspace(self.lb[k], self.ub[k], n)

    def meshgrid(self) -> list[np.ndarray]:
        """Full dense meshgrid (oracle / d<=3 use only)."""
        return list(np.meshgrid(*[self.nodes(k) for k in range(self.ndim)], indexing="ij"))

    # ---- vectorised index <-> state (jit-safe) -------------------------------

    def index_to_state(self, idx):
        """idx [..., d] int -> x [..., d] float."""
        lb = jnp.asarray(self.lb)
        h = jnp.asarray(self.h)
        return lb + idx.astype(h.dtype) * h

    def state_to_cell(self, x):
        """x [..., d] -> (cell [..., d] int, w [..., d] in [0,1]) for lerp.

        cell k in [0, n_k-2] for bounded dims (clamped), [0, n_k-1] for
        periodic dims where the upper cell wraps to node 0.
        """
        lb = jnp.asarray(self.lb)
        h = jnp.asarray(self.h)
        t = (x - lb) / h
        cell = jnp.floor(t).astype(jnp.int32)
        n = jnp.asarray(self.shape, jnp.int32)
        per = jnp.asarray(self.periodic)
        hi = jnp.where(per, n - 1, n - 2)
        cell = jnp.clip(cell, 0, hi)
        w = t - cell.astype(t.dtype)
        w = jnp.clip(w, 0.0, 1.0)
        return cell, w

    def wrap_state(self, x):
        """Wrap periodic coordinates of x into [lb, ub)."""
        lb = jnp.asarray(self.lb)
        ub = jnp.asarray(self.ub)
        span = ub - lb
        wrapped = lb + jnp.mod(x - lb, span)
        per = jnp.asarray(self.periodic)
        return jnp.where(per, wrapped, x)

    def neighbor_index(self, idx, dim: int, step: int):
        """Index of the +-1 neighbor of `idx` along `dim` under boundary rules.

        Periodic dims wrap; bounded dims clamp (the MCA stencil masks
        probability on the boundary separately, so clamping is safe).
        idx: [..., d] int. Returns [..., d] int.
        """
        n = self.shape[dim]
        j = idx[..., dim] + step
        if self.periodic[dim]:
            j = jnp.mod(j, n)
        else:
            j = jnp.clip(j, 0, n - 1)
        return idx.at[..., dim].set(j)
