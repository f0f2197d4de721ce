"""Quasimatrix (matrix-of-functions) algebra — C3 ``qmarray.c`` parity.

Reference: C3 ``src/lib_clinalg/qmarray.c`` / ``quasimatrix.c`` — QR, LU and
maxvol of matrices whose entries are univariate functions; the engine under
FT rounding and cross approximation (line n/a, empty mount; SURVEY.md §2.2).

Here a QmArray is an r×c matrix of *linear-element* functions on shared
nodes (the class c3sc uses), stored as one dense tensor ``vals[r, m, c]``.
That makes every continuous operation an exact weighted matrix operation:

- continuous inner products use the exact piecewise-linear mass matrix
  (tridiagonal Gram of hat functions), so QR is orthonormal in the true
  L² function metric, not a grid approximation;
- Householder QR becomes a Cholesky-metric QR (one Gram + one triangular
  solve — two MXU-friendly ops instead of C3's column-by-column scalar
  sweep);
- ``maxvol1d`` selects (row, x-node) pivot pairs from the flattened
  evaluation tensor with the same LU/maxvol kernel the cross module uses.

The TT/cross path keeps its fused discrete algebra (``ops/tt.py``,
``ops/cross.py``); this module is the standalone continuous toolbox.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QmArray(NamedTuple):
    """r×c quasimatrix: entry (i, j) is the linelm function with node values
    ``vals[i, :, j]`` on the shared sorted ``nodes``."""

    nodes: jnp.ndarray   # [m]
    vals: jnp.ndarray    # [r, m, c]

    @property
    def shape(self) -> tuple:
        return (self.vals.shape[0], self.vals.shape[2])


def qm_from_callbacks(fs, nodes) -> QmArray:
    """Build from a nested list fs[i][j] of callables x -> scalar."""
    nodes = jnp.asarray(nodes)
    rows = []
    for frow in fs:
        rows.append(jnp.stack([jax.vmap(f)(nodes) for f in frow], axis=-1))
    return QmArray(nodes, jnp.stack(rows, axis=0))


def mass_matrix(nodes) -> jnp.ndarray:
    """Exact Gram of the hat-function basis: tridiagonal [m, m] with
    M[i,i] = (h_{i-1}+h_i)/3, M[i,i±1] = h/6."""
    nodes = np.asarray(nodes, float)
    h = np.diff(nodes)
    m = len(nodes)
    M = np.zeros((m, m))
    M[np.arange(m - 1), np.arange(1, m)] = h / 6.0
    M[np.arange(1, m), np.arange(m - 1)] = h / 6.0
    d = np.zeros(m)
    d[:-1] += h / 3.0
    d[1:] += h / 3.0
    M[np.arange(m), np.arange(m)] = d
    return jnp.asarray(M, jnp.float32)


def qm_eval(A: QmArray, x) -> jnp.ndarray:
    """Evaluate every entry at scalar x -> [r, c] (linear interpolation)."""
    i = jnp.clip(jnp.searchsorted(A.nodes, x, side="right") - 1,
                 0, A.nodes.shape[0] - 2)
    x0, x1 = A.nodes[i], A.nodes[i + 1]
    w = jnp.clip((x - x0) / (x1 - x0), 0.0, 1.0)
    return (1.0 - w) * A.vals[:, i, :] + w * A.vals[:, i + 1, :]


def qm_inner(A: QmArray, B: QmArray) -> jnp.ndarray:
    """Continuous column Gram: G[j,k] = Σᵢ ∫ A[i,·,j](x) B[i,·,k](x) dx —
    exact for the piecewise-linear class via the mass matrix."""
    M = mass_matrix(A.nodes).astype(A.vals.dtype)
    return jnp.einsum("imj,mn,ink->jk", A.vals, M, B.vals)


def qm_qr(A: QmArray):
    """Continuous QR: A = Q R with QᵀQ = I in the L² metric (``qm_inner``).

    Implemented as Cholesky-metric QR: G = AᵀA (continuous), G = RᵀR,
    Q = A R⁻¹. Returns (Q: QmArray, R [c, c] upper-triangular).
    """
    G = qm_inner(A, A)
    c = G.shape[0]
    # jitter for rank-deficient inputs keeps the solve finite
    R = jnp.linalg.cholesky(G + 1e-10 * jnp.eye(c, dtype=G.dtype)).T
    qvals = jax.scipy.linalg.solve_triangular(
        R.T, A.vals.reshape(-1, c).T, lower=True).T.reshape(A.vals.shape)
    return QmArray(A.nodes, qvals), R


def qm_lu(A: QmArray):
    """Continuous LU with (row, x-node) partial pivoting.

    Returns (L: QmArray [r, c] with L(pivots) = unit lower-triangular,
    U [c, c], pivots: list of (row i, node index t)).
    """
    r, m, c = A.vals.shape
    Lv = np.asarray(A.vals, float).copy()        # working function values
    U = np.zeros((c, c))
    pivots = []
    for j in range(c):
        flat = int(np.argmax(np.abs(Lv[:, :, j])))
        pi, pt = flat // m, flat % m
        pivots.append((pi, pt))
        U[j, j:] = Lv[pi, pt, j:]                # remaining columns at pivot
        piv = U[j, j] if abs(U[j, j]) > 1e-14 else 1e-14
        Lv[:, :, j] /= piv
        for k in range(j + 1, c):
            Lv[:, :, k] -= Lv[:, :, j] * U[j, k]
    return QmArray(A.nodes, jnp.asarray(Lv, A.vals.dtype)), \
        jnp.asarray(U, A.vals.dtype), pivots


def qm_maxvol1d(A: QmArray, max_iters: int = 50):
    """Select c (row, x-node) pivots approximately maximizing |det| of the
    evaluation matrix — ``qmarray_maxvol1d`` parity.

    Returns (pivots [(row, node_idx)], Eval [c, c] with
    Eval[p, j] = A[row_p, ·, j](x_p), interp: QmArray with
    interp(x_p)[row_p] = e_p — the CUR interpolation factor).
    """
    from c3sc_tpu.native import maxvol as _maxvol

    r, m, c = A.vals.shape
    F = np.asarray(A.vals).reshape(r * m, c)
    rows = _maxvol(F, max_iters=max_iters)
    pivots = [(int(t) // m, int(t) % m) for t in rows]
    E = F[rows]                                  # [c, c]
    G = np.linalg.solve(E.T, F.T).T              # [r*m, c]
    interp = QmArray(A.nodes, jnp.asarray(G.reshape(r, m, c), A.vals.dtype))
    return pivots, jnp.asarray(E, A.vals.dtype), interp
