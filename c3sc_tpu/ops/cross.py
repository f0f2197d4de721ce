"""Rank-adaptive TT-cross approximation with maxvol-style pivoting.

TPU-native re-design of C3's cross machinery (``Compressed-Continuous-
Computation/src/lib_clinalg`` ``ftapprox_cross`` / ``struct CrossIndex`` /
``qmarray_maxvol1d`` — line n/a, empty mount; SURVEY.md §2.2): build a TT of
a black-box f(multi-index) by alternating left/right sweeps that evaluate f
only on *fibers* through the current cross indices.

TPU-first choices vs the C reference:
- Fibers for a whole core are evaluated in ONE batched call
  (``r_left * n * r_right`` points), padded to a fixed chunk so the
  downstream Bellman kernel compiles once.
- Pivot selection = partial-pivoted LU (``jax.lax.linalg.lu`` returns the
  permutation directly) — one fused XLA op standing in for C3's scalar
  maxvol iteration; an optional few maxvol swap refinements run on top.
- Rank adaptation = SVD-based rank estimate + DMRG-style random *kick*
  columns orthogonalized into the QR basis; ranks shrink/grow per sweep.
  Index sets live on the host with exact shapes; each (r_l, n, r_r)
  signature compiles once and ranks stabilize quickly, so recompiles are
  bounded (SURVEY.md §7 hard part #1).

The solver warm-starts each value-iteration from the previous iteration's
``CrossState`` — the same trick c3sc uses by persisting ``CrossIndex`` across
Bellman iterations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.ops.tt import TT


@dataclasses.dataclass
class CrossState:
    """Nested cross index sets (host-side, exact shapes).

    left[k]:  [r_k, k]   multi-indices into dims 0..k-1   (left boundary k)
    right[k]: [r_k, d-k] multi-indices into dims k..d-1   (right boundary k)
    left[0] and right[d] are [1, 0] (empty prefix/suffix).
    """

    left: list
    right: list

    @property
    def ranks_left(self):
        return [a.shape[0] for a in self.left]

    @property
    def ranks_right(self):
        return [a.shape[0] for a in self.right]


@dataclasses.dataclass
class CrossResult:
    tt: TT
    state: CrossState
    n_evals: int
    sweeps: int
    converged: bool
    errors: list


def init_cross_state(key, shape: Sequence[int], r0: int) -> CrossState:
    """Random nested right index sets at rank r0 (left sets built on sweep 1)."""
    d = len(shape)
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    left = (
        [np.zeros((1, 0), np.int64)]
        + [
            np.stack([rng.integers(0, shape[j], size=r0) for j in range(k)], axis=-1)
            for k in range(1, d)
        ]
        + [np.zeros((1, 0), np.int64)]
    )
    right = (
        [np.zeros((1, d), np.int64)]  # right[0] unused
        + [
            np.stack([rng.integers(0, shape[j], size=r0) for j in range(k, d)], axis=-1)
            for k in range(1, d)
        ]
        + [np.zeros((1, 0), np.int64)]
    )
    return CrossState(left=left, right=right)


# --------------------------------------------------------------- jitted pieces


@partial(jax.jit, static_argnames=("r_new",))
def _select_and_core(C, noise, r_new: int):
    """From fiber matrix C [m, r_r]: orthogonalize, kick-enrich to r_new
    columns, pick r_new pivot rows, build interpolation core.

    Returns (rows [r_new] pivot row ids, G [m, r_new] core with G[rows] = I).
    """
    m = C.shape[0]
    q, _ = jnp.linalg.qr(C)  # [m, min(m, r_r)]
    k = q.shape[1]
    if r_new <= k:
        qe = q[:, :r_new]
    else:
        # kick: random directions orthogonalized against q
        extra = noise[:, : r_new - k]
        extra = extra - q @ (q.T @ extra)
        qe, _ = jnp.linalg.qr(jnp.concatenate([q, extra], axis=1))
        qe = qe[:, :r_new]
    # pivot rows via partial-pivoted LU (maxvol proxy)
    _, _, perm = jax.lax.linalg.lu(qe)
    rows = perm[:r_new]
    # maxvol refinement: G = qe @ inv(qe[rows]); swap worst row a few times
    def refine(carry, _):
        rows, = carry
        sub = qe[rows]  # [r_new, r_new]
        G = jnp.linalg.solve(sub.T, qe.T).T  # [m, r_new]
        flat = jnp.argmax(jnp.abs(G))
        i, j = flat // r_new, flat % r_new
        val = jnp.abs(G[i, j])
        rows = jnp.where(val > 1.05, rows.at[j].set(i), rows)
        return (rows,), None
    (rows,), _ = jax.lax.scan(refine, (rows,), None, length=3)
    sub = qe[rows]
    G = jnp.linalg.solve(sub.T, qe.T).T
    return rows, G


@jax.jit
def _rank_estimate(C):
    """Singular values of the fiber matrix (for adaptive rank choice)."""
    return jnp.linalg.svd(C, compute_uv=False)


def _choose_rank(s, eps: float, kick: int, rmax: int, m: int) -> int:
    s = np.asarray(s)
    smax = s[0] if s.size and s[0] > 0 else 1.0
    r_need = max(1, int(np.sum(s > eps * smax)))
    return int(min(r_need + kick, rmax, m))


# ------------------------------------------------------------------ the driver


def _pad_tt(cores: list, rmax: int, dtype) -> TT:
    """Pack exact-shape cores [r_l, n, r_r] into the padded-R TT container."""
    d = len(cores)
    out = []
    ranks = [1]
    for k, c in enumerate(cores):
        rl, n, rr = c.shape
        buf = np.zeros((rmax, n, rmax), dtype)
        buf[:rl, :, :rr] = np.asarray(c)
        out.append(jnp.asarray(buf))
        ranks.append(rr)
    ranks[-1] = 1
    return TT(tuple(out), jnp.asarray(ranks, jnp.int32))


def tt_cross(
    f: Callable,
    shape: Sequence[int],
    rmax: int,
    key,
    state: CrossState | None = None,
    r0: int = 3,
    kick: int = 2,
    tol: float = 1e-4,
    eps_rank: float = 1e-6,
    max_sweeps: int = 6,
    sample_idx=None,
    dtype=jnp.float32,
    verbose: bool = False,
) -> CrossResult:
    """Cross-approximate ``f(idx [B, d] int32) -> [B]`` as a padded TT.

    Convergence: relative sup-change of f's TT surrogate on a random sample
    set between sweeps < tol. Pass ``state`` to warm-start (VI reuses it).
    """
    d = len(shape)
    key, k0, k1 = jax.random.split(key, 3)
    if state is None:
        state = init_cross_state(k0, shape, r0)
    if sample_idx is None:
        rng = np.random.default_rng(12345)
        sample_idx = np.stack(
            [rng.integers(0, shape[j], size=256) for j in range(d)], axis=-1
        )
    sample_idx = jnp.asarray(sample_idx, jnp.int32)

    n_evals = 0
    prev_sample = None
    errors = []
    converged = False
    rng = np.random.default_rng(int(jax.random.randint(k1, (), 0, 2**31 - 1)))

    def eval_block(I, j_dim, J):
        """f on I x grid_j x J -> C [len(I)*n_j, len(J)] (host orchestration)."""
        nonlocal n_evals
        rl, rr, n = I.shape[0], J.shape[0], shape[j_dim]
        ii = np.repeat(np.repeat(I[:, None, None, :], n, 1), rr, 2)  # [rl,n,rr,k]
        mid = np.broadcast_to(np.arange(n)[None, :, None, None], (rl, n, rr, 1))
        jj = np.broadcast_to(J[None, None, :, :], (rl, n, rr, J.shape[1]))
        idx = np.concatenate([ii, mid, jj], axis=-1).reshape(-1, d)
        n_evals += idx.shape[0]
        vals = f(jnp.asarray(idx, jnp.int32))
        return jnp.asarray(vals, dtype).reshape(rl * n, rr)

    cores = [None] * d
    for sweep in range(max_sweeps):
        # ---------------- left-to-right: rebuild left sets + cores ----------
        for k in range(d - 1):
            I, J = state.left[k], state.right[k + 1]
            rl, n, rr = I.shape[0], shape[k], J.shape[0]
            C = eval_block(I, k, J)  # [rl*n, rr]
            s = _rank_estimate(C)
            r_new = _choose_rank(s, eps_rank, kick, rmax, rl * n)
            noise = jnp.asarray(rng.standard_normal((rl * n, max(kick, 1))), dtype)
            rows, G = _select_and_core(C, noise, r_new)
            rows = np.asarray(rows)
            # decode row = a * n + i  ->  I_{k+1} entries
            a, i = rows // n, rows % n
            state.left[k + 1] = np.concatenate([I[a], i[:, None]], axis=-1)
            cores[k] = np.asarray(G).reshape(rl, n, r_new)
        # final core: plain evaluation (interpolation exact at pivots)
        I = state.left[d - 1]
        C = eval_block(I, d - 1, state.right[d])  # [rl*n, 1]
        cores[d - 1] = np.asarray(C).reshape(I.shape[0], shape[d - 1], 1)

        # convergence check on the sample set
        tt = _pad_tt(cores, rmax, np.float32 if dtype == jnp.float32 else np.float64)
        from c3sc_tpu.ops.tt import tt_gather_eval

        cur = tt_gather_eval(tt, sample_idx)
        if prev_sample is not None:
            denom = float(jnp.max(jnp.abs(cur))) + 1e-12
            err = float(jnp.max(jnp.abs(cur - prev_sample))) / denom
            errors.append(err)
            if verbose:
                print(f"[cross] sweep={sweep} err={err:.3e} ranks={[c.shape[2] for c in cores]}")
            if err < tol:
                converged = True
                break
        prev_sample = cur

        # ---------------- right-to-left: rebuild right sets -----------------
        for k in range(d - 1, 0, -1):
            I, J = state.left[k], state.right[k + 1]
            rl, n, rr = I.shape[0], shape[k], J.shape[0]
            C = eval_block(I, k, J)  # [rl*n, rr]
            Ct = C.reshape(rl, n * rr).T  # [n*rr, rl]
            s = _rank_estimate(Ct)
            r_new = _choose_rank(s, eps_rank, kick, rmax, n * rr)
            noise = jnp.asarray(rng.standard_normal((n * rr, max(kick, 1))), dtype)
            rows, G = _select_and_core(Ct, noise, r_new)
            rows = np.asarray(rows)
            i, b = rows // rr, rows % rr
            state.right[k] = np.concatenate([i[:, None], J[b]], axis=-1)
            cores[k] = np.asarray(G.T).reshape(r_new, n, rr)
        # first core after R2L: exact evaluation
        J = state.right[1]
        C = eval_block(state.left[0], 0, J)  # [n, r]
        cores[0] = np.asarray(C).reshape(1, shape[0], J.shape[0])

    tt = _pad_tt(cores, rmax, np.float32 if dtype == jnp.float32 else np.float64)
    return CrossResult(tt=tt, state=state, n_evals=n_evals,
                       sweeps=sweep + 1, converged=converged, errors=errors)
