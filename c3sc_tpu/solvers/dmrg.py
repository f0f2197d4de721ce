"""Two-site DMRG cross approximation — C3 ``dmrg*.c`` parity.

Reference: C3 ``src/lib_clinalg/dmrg.c``/``dmrgprod.c`` (line n/a, empty
mount; SURVEY.md §2 L2 inventory): approximate a black-box tensor in TT form
by *two-site* sweeps — the rank between cores k and k+1 is revealed by an
SVD of the merged supercore, so ranks adapt in one shot instead of the
kick-and-round creep of single-site cross. C3 uses this for FT products and
black-box approximation; here it is the same algorithm over the discrete
(linelm-node) TT.

TPU-first choices: the supercore block (r_l · n_k · n_{k+1} · r_r points) is
evaluated in ONE batched call of the black box; SVD + maxvol pivoting are
single fused XLA ops (``jax.lax.linalg``); index bookkeeping stays on the
host with exact shapes (same compile-bounding strategy as ``ops/cross.py``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from c3sc_tpu.ops.cross import (
    CrossResult, CrossState, _pad_tt, init_cross_state,
)
from c3sc_tpu.ops.tt import tt_gather_eval


def _choose_rank_svd(s, eps: float, rmax: int) -> int:
    s = np.asarray(s)
    smax = s[0] if s.size and s[0] > 0 else 1.0
    return int(max(1, min(int(np.sum(s > eps * smax)), rmax)))


@partial(jax.jit, static_argnames=("r_new",))
def _svd_select(M, r_new: int):
    """Top-r_new left singular basis of M, maxvol pivot rows in it, and the
    CUR interpolation factor G = Uᵣ (Uᵣ[rows])⁻¹ (G[rows] = I)."""
    U, s, _ = jnp.linalg.svd(M, full_matrices=False)
    Ur = U[:, :r_new]
    _, _, perm = jax.lax.linalg.lu(Ur)
    rows = perm[:r_new]

    def refine(carry, _):
        (rows,) = carry
        sub = Ur[rows]
        G = jnp.linalg.solve(sub.T, Ur.T).T
        flat = jnp.argmax(jnp.abs(G))
        i, j = flat // r_new, flat % r_new
        rows = jnp.where(jnp.abs(G[i, j]) > 1.05, rows.at[j].set(i), rows)
        return (rows,), None

    (rows,), _ = jax.lax.scan(refine, (rows,), None, length=4)
    G = jnp.linalg.solve(Ur[rows].T, Ur.T).T
    return rows, G, s


def dmrg_cross(
    f: Callable,
    shape: Sequence[int],
    rmax: int,
    key,
    state: CrossState | None = None,
    r0: int = 2,
    tol: float = 1e-5,
    eps_rank: float = 1e-7,
    max_sweeps: int = 5,
    sample_idx=None,
    dtype=jnp.float32,
    verbose: bool = False,
) -> CrossResult:
    """Approximate ``f(idx [B, d] int32) -> [B]`` as a padded TT by two-site
    DMRG sweeps. Same contract as ``ops.cross.tt_cross``; ranks are revealed
    by supercore SVDs (no kick parameter needed).
    """
    d = len(shape)
    assert d >= 2, "dmrg_cross needs at least 2 dimensions"
    key, k0 = jax.random.split(key)
    if state is None:
        state = init_cross_state(k0, shape, r0)
    if sample_idx is None:
        rng = np.random.default_rng(54321)
        sample_idx = np.stack(
            [rng.integers(0, shape[j], size=256) for j in range(d)], axis=-1
        )
    sample_idx = jnp.asarray(sample_idx, jnp.int32)

    n_evals = 0

    def eval_block2(I, k, J):
        """f on I × grid_k × grid_{k+1} × J  ->  [rl·n_k, n_{k+1}·rr]."""
        nonlocal n_evals
        rl, rr = I.shape[0], J.shape[0]
        n0, n1 = shape[k], shape[k + 1]
        ii = np.broadcast_to(I[:, None, None, None, :], (rl, n0, n1, rr, I.shape[1]))
        m0 = np.broadcast_to(np.arange(n0)[None, :, None, None, None],
                             (rl, n0, n1, rr, 1))
        m1 = np.broadcast_to(np.arange(n1)[None, None, :, None, None],
                             (rl, n0, n1, rr, 1))
        jj = np.broadcast_to(J[None, None, None, :, :], (rl, n0, n1, rr, J.shape[1]))
        idx = np.concatenate([ii, m0, m1, jj], axis=-1).reshape(-1, d)
        n_evals += idx.shape[0]
        vals = f(jnp.asarray(idx, jnp.int32))
        return jnp.asarray(vals, dtype).reshape(rl * n0, n1 * rr)

    cores = [None] * d
    errors = []
    prev_sample = None
    converged = False

    for sweep in range(max_sweeps):
        # ---- left-to-right two-site sweep: updates cores k, left[k+1] ------
        for k in range(d - 1):
            I, J = state.left[k], state.right[k + 2]
            rl, rr = I.shape[0], J.shape[0]
            n0, n1 = shape[k], shape[k + 1]
            M = eval_block2(I, k, J)                       # [rl·n0, n1·rr]
            s = jnp.linalg.svd(M, compute_uv=False)
            r_new = _choose_rank_svd(s, eps_rank, rmax)
            r_new = min(r_new, rl * n0, n1 * rr)
            rows, G, _ = _svd_select(M, r_new)
            rows = np.asarray(rows)
            a, i = rows // n0, rows % n0
            state.left[k + 1] = np.concatenate([I[a], i[:, None]], axis=-1)
            cores[k] = np.asarray(G).reshape(rl, n0, r_new)
            # provisional next core from the pivot rows (exact interpolation):
            # M ≈ G @ M[rows]; M[rows] reshapes to core_{k+1} against right[k+2]
            cores[k + 1] = np.asarray(M[jnp.asarray(rows)]).reshape(r_new, n1, rr)

        # convergence check on the sample set
        tt = _pad_tt(cores, rmax, np.float32 if dtype == jnp.float32 else np.float64)
        cur = tt_gather_eval(tt, sample_idx)
        if prev_sample is not None:
            denom = float(jnp.max(jnp.abs(cur))) + 1e-12
            err = float(jnp.max(jnp.abs(cur - prev_sample))) / denom
            errors.append(err)
            if verbose:
                print(f"[dmrg] sweep={sweep} err={err:.3e} "
                      f"ranks={[c.shape[2] for c in cores[:-1]]}")
            if err < tol:
                converged = True
                break
        prev_sample = cur

        # ---- right-to-left two-site sweep: updates right[k+1] --------------
        for k in range(d - 2, -1, -1):
            I, J = state.left[k], state.right[k + 2]
            rl, rr = I.shape[0], J.shape[0]
            n0, n1 = shape[k], shape[k + 1]
            M = eval_block2(I, k, J)
            Mt = M.reshape(rl, n0, n1, rr).transpose(2, 3, 0, 1).reshape(
                n1 * rr, rl * n0)
            s = jnp.linalg.svd(Mt, compute_uv=False)
            r_new = _choose_rank_svd(s, eps_rank, rmax)
            r_new = min(r_new, rl * n0, n1 * rr)
            rows, G, _ = _svd_select(Mt, r_new)
            rows = np.asarray(rows)
            i, b = rows // rr, rows % rr
            state.right[k + 1] = np.concatenate([i[:, None], J[b]], axis=-1)
            cores[k + 1] = np.asarray(G.T).reshape(r_new, n1, rr)
            cores[k] = np.asarray(Mt[jnp.asarray(rows)].T).reshape(rl, n0, r_new)

    tt = _pad_tt(cores, rmax, np.float32 if dtype == jnp.float32 else np.float64)
    return CrossResult(tt=tt, state=state, n_evals=n_evals,
                       sweeps=sweep + 1, converged=converged, errors=errors)
