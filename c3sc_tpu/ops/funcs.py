"""Univariate function classes — C3 ``lib_funcs`` parity, batched for TPU.

Reference: C3 ``src/lib_funcs/`` — ``polynomials.c`` (orthonormal expansions),
``piecewisepoly.c``, ``linelm.c``, ``constelm.c``, ``kernels.c`` and the
``functions.c`` ``generic_function`` tagged-union dispatcher (line n/a, empty
mount; SURVEY.md §2.2). The TT value-function path uses the linear-element
class implicitly (cores on grid nodes + lerp, see ``ops/tt.py``); this module
provides the full set of 1-D function classes as standalone, vmappable
objects so cost models, initial guesses, and post-hoc analysis have the same
toolbox the reference exposes.

Design (TPU-first, not a translation):

- every class is a NamedTuple of coefficient *arrays* (jittable pytrees) plus
  static domain metadata; evaluation is batched over x by construction and
  differentiable with ``jax.grad``;
- fitting is quadrature projection / least squares over static node sets
  (no adaptive C recursion);
- ``GenericFunction`` dispatches on a static ``kind`` string at trace time
  (the tagged-union replaced by Python dispatch — zero runtime cost under
  jit, unlike the reference's per-call function pointers).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.ops.quadrature import gauss_legendre

# ---------------------------------------------------------------------------
# Orthonormal polynomial expansions (polynomials.c)
# ---------------------------------------------------------------------------


class OrthPolyExpansion(NamedTuple):
    """f(x) = Σₖ coeff[k] φₖ(t(x)), φₖ orthonormal Legendre on [-1, 1],
    t the affine map from [a, b]."""

    coeff: jnp.ndarray   # [n]
    a: float
    b: float


def _legendre_vander(t, n: int):
    """Orthonormal Legendre design matrix [..., n] on t ∈ [-1, 1]."""
    t = jnp.asarray(t)
    cols = [jnp.ones_like(t), t]
    for k in range(1, n - 1):
        cols.append(((2 * k + 1) * t * cols[k] - k * cols[k - 1]) / (k + 1))
    P = jnp.stack(cols[:n], axis=-1)
    norm = jnp.sqrt((2.0 * jnp.arange(n) + 1.0) / 2.0)
    return P * norm


def poly_fit(f: Callable, n: int, a: float, b: float,
             nquad: int | None = None) -> OrthPolyExpansion:
    """Project a callback onto the first n orthonormal Legendre polys."""
    x, w = gauss_legendre(nquad or (2 * n), a, b)
    t = 2.0 * (jnp.asarray(x) - a) / (b - a) - 1.0
    P = _legendre_vander(t, n)                        # [q, n]
    scale = 2.0 / (b - a)                              # dt/dx
    coeff = P.T @ (jnp.asarray(w) * jax.vmap(f)(jnp.asarray(x))) * scale
    return OrthPolyExpansion(coeff.astype(jnp.float32), float(a), float(b))


def poly_eval(p: OrthPolyExpansion, x):
    t = 2.0 * (jnp.asarray(x) - p.a) / (p.b - p.a) - 1.0
    return _legendre_vander(t, p.coeff.shape[0]) @ p.coeff


def poly_integrate(p: OrthPolyExpansion):
    """∫ₐᵇ f dx — only the constant mode survives: c₀·√(1/2)·(b-a)... in the
    orthonormal basis φ₀ = 1/√2, so ∫ = c₀ √2 · (b-a)/2."""
    return p.coeff[0] * jnp.sqrt(2.0) * (p.b - p.a) / 2.0


def poly_inner(p: OrthPolyExpansion, q: OrthPolyExpansion):
    """∫ₐᵇ p q dx via orthonormality (same domain required)."""
    n = min(p.coeff.shape[0], q.coeff.shape[0])
    return jnp.dot(p.coeff[:n], q.coeff[:n]) * (p.b - p.a) / 2.0


def poly_deriv(p: OrthPolyExpansion) -> OrthPolyExpansion:
    """d/dx as a new expansion (degree drops by one)."""
    n = p.coeff.shape[0]
    # host-side derivative matrix in the orthonormal basis
    norm = np.sqrt((2.0 * np.arange(n) + 1.0) / 2.0)
    D = np.zeros((max(n - 1, 1), n))
    for k in range(1, n):             # dP_k/dt = Σ_{j<k, j+k odd} (2j+1) P_j
        for j in range(k - 1, -1, -2):
            D[j, k] = (2 * j + 1) * norm[k] / norm[j]
    D *= 2.0 / (p.b - p.a)            # chain rule dt/dx
    return OrthPolyExpansion(jnp.asarray(D, p.coeff.dtype) @ p.coeff, p.a, p.b)


# ---------------------------------------------------------------------------
# Linear elements (linelm.c) — values on grid nodes, hat-function basis
# ---------------------------------------------------------------------------


class LinElem(NamedTuple):
    nodes: jnp.ndarray   # [m] sorted
    vals: jnp.ndarray    # [m]


def linelm_fit(f: Callable, nodes) -> LinElem:
    nodes = jnp.asarray(nodes)
    return LinElem(nodes, jax.vmap(f)(nodes))


def linelm_eval(le: LinElem, x):
    return jnp.interp(jnp.asarray(x), le.nodes, le.vals)


def linelm_integrate(le: LinElem):
    return jnp.trapezoid(le.vals, le.nodes)


def linelm_inner(a: LinElem, b: LinElem):
    """Exact ∫ a·b dx for piecewise-linear a, b on SHARED nodes:
    per segment h/6 · (2u₀v₀ + u₀v₁ + u₁v₀ + 2u₁v₁)."""
    h = jnp.diff(a.nodes)
    u0, u1 = a.vals[:-1], a.vals[1:]
    v0, v1 = b.vals[:-1], b.vals[1:]
    return jnp.sum(h / 6.0 * (2 * u0 * v0 + u0 * v1 + u1 * v0 + 2 * u1 * v1))


def linelm_deriv(le: LinElem) -> "ConstElem":
    """Exact derivative: piecewise constant on the cells."""
    slopes = jnp.diff(le.vals) / jnp.diff(le.nodes)
    return ConstElem(le.nodes, slopes)


# ---------------------------------------------------------------------------
# Constant elements (constelm.c) — piecewise constant on cells
# ---------------------------------------------------------------------------


class ConstElem(NamedTuple):
    edges: jnp.ndarray   # [m] cell edges (m-1 cells)
    vals: jnp.ndarray    # [m-1]


def constelm_eval(ce: ConstElem, x):
    i = jnp.clip(jnp.searchsorted(ce.edges, jnp.asarray(x), side="right") - 1,
                 0, ce.vals.shape[0] - 1)
    return ce.vals[i]


def constelm_integrate(ce: ConstElem):
    return jnp.sum(ce.vals * jnp.diff(ce.edges))


# ---------------------------------------------------------------------------
# Piecewise polynomials (piecewisepoly.c)
# ---------------------------------------------------------------------------


class PiecewisePoly(NamedTuple):
    """Per-cell monomial coeffs in the local coordinate s = x - edges[i],
    low order first: f(x) = Σⱼ coeff[i, j] sʲ on cell i."""

    edges: jnp.ndarray   # [m] (m-1 cells)
    coeff: jnp.ndarray   # [m-1, p]


def pwpoly_fit(f: Callable, edges, order: int = 3,
               npts_per_cell: int | None = None) -> PiecewisePoly:
    """Least-squares monomial fit per cell at Gauss points (host-side lstsq
    on static data — mirrors the reference's per-segment approximation)."""
    edges = np.asarray(edges, float)
    p = order + 1
    q = npts_per_cell or (2 * p)
    coeffs = []
    for i in range(len(edges) - 1):
        xs, _ = gauss_legendre(q, edges[i], edges[i + 1])
        s = xs - edges[i]
        V = np.vander(s, p, increasing=True)
        y = np.asarray(jax.vmap(f)(jnp.asarray(xs)))
        c, *_ = np.linalg.lstsq(V, y, rcond=None)
        coeffs.append(c)
    return PiecewisePoly(jnp.asarray(edges, jnp.float32),
                         jnp.asarray(np.stack(coeffs), jnp.float32))


def pwpoly_eval(pw: PiecewisePoly, x):
    x = jnp.asarray(x)
    i = jnp.clip(jnp.searchsorted(pw.edges, x, side="right") - 1,
                 0, pw.coeff.shape[0] - 1)
    s = x - pw.edges[i]
    c = pw.coeff[i]                                  # [..., p]
    powers = s[..., None] ** jnp.arange(pw.coeff.shape[1])
    return jnp.sum(c * powers, axis=-1)


def pwpoly_integrate(pw: PiecewisePoly):
    h = jnp.diff(pw.edges)                            # [m-1]
    j = jnp.arange(pw.coeff.shape[1])
    seg = jnp.sum(pw.coeff * h[:, None] ** (j + 1) / (j + 1), axis=1)
    return jnp.sum(seg)


def pwpoly_deriv(pw: PiecewisePoly) -> PiecewisePoly:
    p = pw.coeff.shape[1]
    if p == 1:
        return PiecewisePoly(pw.edges, jnp.zeros_like(pw.coeff))
    j = jnp.arange(1, p)
    return PiecewisePoly(pw.edges, pw.coeff[:, 1:] * j[None, :])


# ---------------------------------------------------------------------------
# Kernel (RBF) expansions (kernels.c)
# ---------------------------------------------------------------------------


class KernelExpansion(NamedTuple):
    """f(x) = Σᵢ coeff[i] exp(-(x - centers[i])² / (2 width²))."""

    centers: jnp.ndarray  # [m]
    coeff: jnp.ndarray    # [m]
    width: float


def kernel_eval(ke: KernelExpansion, x):
    x = jnp.asarray(x)
    K = jnp.exp(-((x[..., None] - ke.centers) ** 2) / (2.0 * ke.width ** 2))
    return K @ ke.coeff


def kernel_fit(f: Callable, centers, width: float,
               reg: float = 1e-8) -> KernelExpansion:
    """Regularized interpolation at the centers (ridge least squares)."""
    centers = jnp.asarray(centers)
    K = jnp.exp(-((centers[:, None] - centers[None, :]) ** 2)
                / (2.0 * width ** 2))
    y = jax.vmap(f)(centers)
    m = centers.shape[0]
    coeff = jnp.linalg.solve(K + reg * jnp.eye(m, dtype=K.dtype), y)
    return KernelExpansion(centers, coeff, float(width))


def kernel_integrate(ke: KernelExpansion, a: float, b: float):
    """Exact ∫ₐᵇ via the error function."""
    s = ke.width * jnp.sqrt(2.0)
    erf = jax.scipy.special.erf
    parts = erf((b - ke.centers) / s) - erf((a - ke.centers) / s)
    return jnp.sum(ke.coeff * parts) * ke.width * jnp.sqrt(jnp.pi / 2.0)


# ---------------------------------------------------------------------------
# Generic dispatcher (functions.c struct GenericFunction)
# ---------------------------------------------------------------------------

_KINDS = ("poly", "linelm", "constelm", "pwpoly", "kernel")


class GenericFunction(NamedTuple):
    """Tagged wrapper over any univariate class. ``kind`` is static — under
    jit the dispatch disappears at trace time."""

    kind: str
    obj: NamedTuple


def gf_eval(g: GenericFunction, x):
    return {"poly": poly_eval, "linelm": linelm_eval, "constelm": constelm_eval,
            "pwpoly": pwpoly_eval, "kernel": kernel_eval}[g.kind](g.obj, x)


def gf_integrate(g: GenericFunction, a: float | None = None,
                 b: float | None = None):
    if g.kind == "poly":
        return poly_integrate(g.obj)
    if g.kind == "linelm":
        return linelm_integrate(g.obj)
    if g.kind == "constelm":
        return constelm_integrate(g.obj)
    if g.kind == "pwpoly":
        return pwpoly_integrate(g.obj)
    if g.kind == "kernel":
        assert a is not None and b is not None, "kernel integrate needs [a,b]"
        return kernel_integrate(g.obj, a, b)
    raise ValueError(f"unknown kind {g.kind!r} (want one of {_KINDS})")


def gf_save(path: str, g: GenericFunction) -> None:
    arrays = {f"f{i}": np.asarray(a) for i, a in enumerate(g.obj)
              if isinstance(a, (jnp.ndarray, np.ndarray))}
    scalars = [a for a in g.obj if not isinstance(a, (jnp.ndarray, np.ndarray))]
    np.savez(path, kind=g.kind, scalars=np.asarray(scalars, float), **arrays)


def gf_load(path: str) -> GenericFunction:
    z = np.load(path, allow_pickle=False)
    kind = str(z["kind"])
    arrays = [jnp.asarray(z[k]) for k in sorted(
        (k for k in z.files if k.startswith("f")), key=lambda s: int(s[1:]))]
    scalars = [float(s) for s in z["scalars"]]
    cls = {"poly": OrthPolyExpansion, "linelm": LinElem, "constelm": ConstElem,
           "pwpoly": PiecewisePoly, "kernel": KernelExpansion}[kind]
    return GenericFunction(kind, cls(*arrays, *scalars))
