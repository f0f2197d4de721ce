"""Function train with orthonormal-polynomial cores (C3's FT proper).

The value path stores a *discrete* TT on grid nodes (linelm semantics:
``ops/tt.py`` + lerp). C3's ``struct FunctionTrain`` can also carry
polynomial cores (``lib_funcs/polynomials.c`` inside ``lib_clinalg/ft.c``
quasimatrices — line n/a, empty mount; SURVEY.md §2.2): each core entry is
a univariate orthonormal expansion, giving smooth off-grid evaluation and
exact integrals. This module is that object, TPU-first:

- ``PolyFT``: d coefficient cores ``[R, p_k, R]`` in the orthonormal
  Legendre basis of ``ops/funcs.py`` (the same basis ``poly_fit`` uses),
  plus static per-dim domains and periodicity flags;
- ``ft_from_tt``: least-squares projection of a nodal TT onto per-dim
  Legendre bases — one einsum per dim, no per-entry loops (the C version
  fits each quasimatrix entry separately; here the whole [R, n, R] core
  projects at once). Periodic dims fit over the FULL period with the wrap
  node appended so the seam interpolates toward v(lb);
- ``ft_eval``: batched continuous evaluation (chains of [R, R] matvecs, MXU
  work exactly like nodal TT eval), periodic dims wrapped like
  ``tt_lerp_eval``;
- ``ft_integrate``: exact — orthonormality makes the integral the constant-
  mode contraction.

Degree selection: full-degree (n-1) interpolation on EQUISPACED nodes is
numerically catastrophic beyond n ~ 20 in f32 (Runge + Vandermonde
conditioning: measured cond ~4e8 and O(1) node errors at n=41), so the
default degree caps at ``max(16, 2*sqrt(n))`` — an interpolant on small
grids, a least-squares smoothing fit on large ones (the standard stable
regime for equispaced LS poly fits).

This connects the ``funcs.py`` univariate toolbox to the value path
(VERDICT r1 missing #4 / next #10): a converged value TT upgrades to a
smooth FT for policy evaluation, giving lower off-grid interpolation error
than multilinear lerp on smooth problems (tested vs LQ in
``tests/test_ft.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.ops.funcs import _legendre_vander
from c3sc_tpu.ops.tt import TT


class PolyFT(NamedTuple):
    """Function train with orthonormal-Legendre coefficient cores."""

    coeff: tuple          # d x [R, p_k, R]
    ranks: jnp.ndarray    # [d+1] active ranks (padded-zero invariant kept)
    lb: tuple             # d static domain lower bounds
    ub: tuple             # d static domain upper bounds
    periodic: tuple       # d static bools — wrap x into [lb, ub) on eval

    @property
    def ndim(self) -> int:
        return len(self.coeff)


def _default_order(n: int) -> int:
    return min(n - 1, max(16, int(2 * np.sqrt(n))))


def ft_from_tt(v: TT, grid: Grid, order: int | None = None) -> PolyFT:
    """Project a nodal TT onto per-dim orthonormal Legendre bases.

    order: polynomial degree. Default: ``min(n-1, max(16, 2*sqrt(n)))`` —
    exact interpolation of the nodal values on small grids; a stable
    least-squares fit on large equispaced grids (see module docstring).
    Padded-zero columns of the TT cores project to exactly zero coefficient
    columns, so the active-rank invariant survives.

    Periodic dims (pendulum theta, Dubins heading): the grid's nodes cover
    [lb, ub) — the fit appends the wrap node (value at lb) at lb + period,
    so the polynomial covers the full period and interpolates across the
    seam; ``ft_eval`` wraps query points the same way ``tt_lerp_eval``
    does.
    """
    cores_out = []
    lb, ub = [], []
    for k, core in enumerate(v.cores):
        nodes = np.asarray(grid.nodes(k))
        if grid.periodic[k]:
            period = grid.ub[k] - grid.lb[k]
            nodes = np.append(nodes, grid.lb[k] + period)
            core = jnp.concatenate([core, core[:, :1, :]], axis=1)
        n = core.shape[1]
        p = min(n, (order + 1) if order is not None else _default_order(n) + 1)
        a, b = float(nodes[0]), float(nodes[-1])
        t = 2.0 * (nodes - a) / (b - a) - 1.0
        P = np.asarray(_legendre_vander(jnp.asarray(t), p))     # [n, p]
        # least-squares projector pinv(P) [p, n] — host-side, tiny
        Pp = np.linalg.pinv(P)
        cores_out.append(jnp.einsum(
            "pn,rns->rps", jnp.asarray(Pp, core.dtype), core))
        lb.append(a)
        ub.append(b)
    return PolyFT(tuple(cores_out), v.ranks, tuple(lb), tuple(ub),
                  tuple(bool(x) for x in grid.periodic))


def ft_eval(ft: PolyFT, pts) -> jnp.ndarray:
    """Continuous evaluation at pts [B, d] -> [B].

    Same contraction pattern as nodal TT eval: per dim, mix the coefficient
    core with the Legendre design row, then chain the [B, R, R] factors.
    Periodic dims wrap into [lb, lb + period) first.
    """
    pts = jnp.asarray(pts)
    B = pts.shape[0]
    R = ft.coeff[0].shape[0]
    vec = jnp.zeros((B, R), pts.dtype).at[:, 0].set(1.0)
    for k, core in enumerate(ft.coeff):
        p = core.shape[1]
        x = pts[:, k]
        if ft.periodic[k]:
            span = ft.ub[k] - ft.lb[k]
            x = ft.lb[k] + jnp.mod(x - ft.lb[k], span)
        t = 2.0 * (x - ft.lb[k]) / (ft.ub[k] - ft.lb[k]) - 1.0
        t = jnp.clip(t, -1.0, 1.0)
        phi = _legendre_vander(t, p)                 # [B, p]
        M = jnp.einsum("bp,rps->brs", phi, core)     # [B, R, R]
        vec = jnp.einsum("br,brs->bs", vec, M)
    return vec[:, 0]


def ft_integrate(ft: PolyFT) -> jnp.ndarray:
    """Exact integral over the full domain: only the constant Legendre mode
    integrates to a nonzero value (sqrt(2)/2 * (b - a) per dim)."""
    R = ft.coeff[0].shape[0]
    vec = jnp.zeros((R,), ft.coeff[0].dtype).at[0].set(1.0)
    for k, core in enumerate(ft.coeff):
        w = jnp.sqrt(2.0) * (ft.ub[k] - ft.lb[k]) / 2.0
        vec = vec @ (core[:, 0, :] * w)
    return vec[0]


def ft_grad_eval(ft: PolyFT, pts) -> jnp.ndarray:
    """Gradient of the smooth FT at pts [B, d] -> [B, d] via jax.jacfwd —
    the smooth interpolant makes value gradients well-defined everywhere
    (lerp gradients are piecewise constant and undefined on cell faces)."""
    g = jax.vmap(jax.grad(lambda x: ft_eval(ft, x[None])[0]))
    return g(jnp.asarray(pts))


def ft_save(path: str, ft: PolyFT) -> None:
    """Serialize a PolyFT to npz — the ``function_train_save`` equivalent
    for polynomial cores (``lib_clinalg/ft.c`` serialize — line n/a, empty
    mount; SURVEY.md §2.2/§5): coefficient cores + ranks + static domain."""
    import json

    arrays = {f"coeff_{k}": np.asarray(c) for k, c in enumerate(ft.coeff)}
    arrays["ranks"] = np.asarray(ft.ranks)
    meta = {"kind": "poly_ft", "d": ft.ndim, "lb": list(ft.lb),
            "ub": list(ft.ub), "periodic": [bool(p) for p in ft.periodic]}
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def ft_load(path: str) -> PolyFT:
    """Restore a PolyFT written by :func:`ft_save`."""
    import json

    data = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(data["meta"]).decode())
    if meta.get("kind") != "poly_ft":
        raise ValueError(f"{path} is not a PolyFT file "
                         f"(kind={meta.get('kind')!r})")
    d = meta["d"]
    return PolyFT(
        coeff=tuple(jnp.asarray(data[f"coeff_{k}"]) for k in range(d)),
        ranks=jnp.asarray(data["ranks"]),
        lb=tuple(meta["lb"]), ub=tuple(meta["ub"]),
        periodic=tuple(meta["periodic"]),
    )
