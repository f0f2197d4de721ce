"""TT policy iteration with DIRECT linear policy-evaluation solves (ALS-LS).

The round-4 polish (`solvers/polish.py`) is projected value iteration:
each step fits the backed-up target, v_{k+1} = Fit(T v_k), so the per-fit
error e_fit re-enters the fixed-point loop and accumulates to
~e_fit / (1 - gamma_eff) — measured ~14x on the 9^6 quadcopter, flooring
the value parity at q95 ~ 6.5% of range while the rank-64 TT manifold can
represent the oracle to 0.14% (experiments/artifacts/frontier_n9.json).

This module removes the amplification instead of fighting the per-fit
error: classic policy iteration (the reference's ``c3control_pi_solve``,
SURVEY.md §3.2 — alternate policy improvement with *linear* policy
evaluation), where the evaluation step solves the frozen-policy linear
Bellman system

    v(x) - e^{-beta dt(x)} sum_j p_j(x) v(nb_j(x)) = g(x, u*(x)) dt(x)

directly IN the TT manifold by alternating least squares: for one core at
a time (all other cores frozen and orthogonalized), v is linear in the
core, so the sampled equations become an ordinary least-squares problem
whose normal equations are assembled and solved ON DEVICE (f32 Cholesky +
iterative refinement). The residual of the solve is minimized — not
iterated through the contraction — so the error floor is the TT-manifold
error of v^pi plus LS sampling noise, not 14x the fit churn.

Scalability: everything is sampled — S = oversample x max-core-params
rows, each row touching the 2d+1 MCA stencil points. No O(n^d) pass
anywhere; cost per sweep is O(d * S * (2d+1) * r^2) frame evaluation plus
O(S P + P^3) normal-equation work per core (P = r * n * r), all on the
chip (answers VERDICT r4 weak #3: the accuracy stage no longer host-binds
on numpy f64 SVD loops).

Reference: ``c3sc/src/c3sc.c`` ``c3control_pi_solve`` + ``bellman.c``
policy-evaluation sweeps (line n/a, empty mount; SURVEY.md §3.2); C3
``dmrg.c`` for the one/two-site alternating scheme (SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops import mca
from c3sc_tpu.ops.tt import TT, tt_gather_eval
from c3sc_tpu.solvers.ttvi import _neighbor_indices, make_bellman_kernel


# ---------------------------------------------------------- frozen policy


def frozen_policy_rows(problem: ControlProblem, grid: Grid, uc, v_tt: TT,
                       idx, dtype=jnp.float32):
    """Linear Bellman rows at nodes ``idx`` [S, d] under the argmin policy
    of the CURRENT value ``v_tt`` (the policy-improvement step).

    Returns (pts [S, T, d], w [S, T], rhs [S]) with T = 2*d + 1 such that
    the frozen-policy Bellman equation at each sample reads

        sum_t w[s, t] * v(pts[s, t]) = rhs[s].

    pts[:, 0] is the node itself (w = 1); pts[:, 1:] are the 2d stencil
    neighbors with w = -gamma * p (zeroed at terminal neighbors, whose
    pinned exit value moves to the RHS). Terminal evaluation nodes get the
    pinned row v(s) = psi(s). Matches ``ttvi.bellman_backup`` semantics
    exactly (verified by ``tests/test_pials.py`` row-consistency test).
    """
    d = problem.dx
    S = idx.shape[0]
    x = grid.index_to_state(idx).astype(dtype)

    nb = _neighbor_indices(grid, idx)                     # [S, 2, d, d]
    nb_flat = nb.reshape(S, 2 * d, d)
    nx = grid.index_to_state(nb_flat).astype(dtype)
    t_nb, tv_nb = mca.node_terminal(problem, grid, nb_flat, nx)   # [S, 2d]

    # policy improvement: argmin over candidates with current v
    vn = tt_gather_eval(v_tt, nb_flat.reshape(-1, d)).astype(dtype)
    if problem.value_bounds is not None:
        vn = jnp.clip(vn, problem.value_bounds[0], problem.value_bounds[1])
    vn = jnp.where(t_nb.reshape(-1), tv_nb.reshape(-1).astype(dtype), vn)
    vn2 = vn.reshape(S, 2, d)

    pp, pm, dt = mca.transition_all_controls(problem, grid, x, uc)  # [C,S,d]
    g = mca.stage_cost_all(problem, x, uc)                          # [C,S]
    expect = jnp.sum(pp * vn2[None, :, 0] + pm * vn2[None, :, 1], axis=-1)
    rhs_all = g * dt + jnp.exp(-problem.beta * dt) * expect         # [C,S]
    c = jnp.argmin(rhs_all, axis=0)                                 # [S]

    take = lambda a: jnp.take_along_axis(a, c[None, :, None], axis=0)[0] \
        if a.ndim == 3 else jnp.take_along_axis(a, c[None, :], axis=0)[0]
    ppw, pmw = take(pp), take(pm)                                   # [S, d]
    dtw, gw = take(dt), take(g)                                     # [S]
    gamma = jnp.exp(-problem.beta * dtw)                            # [S]

    p_nb = jnp.concatenate([ppw, pmw], axis=-1)                     # [S, 2d]
    w_nb = -gamma[:, None] * p_nb
    # terminal neighbors: pinned value moves to the RHS
    rhs = gw * dtw + gamma * jnp.sum(
        jnp.where(t_nb, p_nb * tv_nb.astype(dtype), 0.0), axis=-1)
    w_nb = jnp.where(t_nb, 0.0, w_nb)

    # terminal evaluation nodes: row v(s) = psi(s)
    tm, tv = mca.node_terminal(problem, grid, idx, x)
    w_nb = jnp.where(tm[:, None], 0.0, w_nb)
    rhs = jnp.where(tm, tv.astype(dtype), rhs)

    pts = jnp.concatenate([idx[:, None, :], nb_flat], axis=1)       # [S,T,d]
    w = jnp.concatenate(
        [jnp.ones((S, 1), dtype), w_nb.astype(dtype)], axis=1)      # [S,T]
    return pts, w, rhs.astype(dtype)


# ------------------------------------------------------- host core algebra


def tt_to_blocks(v: TT):
    """Padded TT -> list of unpadded float64 numpy cores [r_l, n, r_r]."""
    ranks = [int(r) for r in np.asarray(v.ranks)]
    out = []
    for k, c in enumerate(v.cores):
        out.append(np.asarray(c, np.float64)[: ranks[k], :, : ranks[k + 1]])
    return out


def blocks_to_tt(blocks, rmax: int, dtype=jnp.float32) -> TT:
    ranks = [1] + [b.shape[2] for b in blocks[:-1]] + [1]
    cores = []
    for k, b in enumerate(blocks):
        full = np.zeros((rmax, b.shape[1], rmax), np.float32)
        full[: b.shape[0], :, : b.shape[2]] = b
        cores.append(jnp.asarray(full, dtype))
    return TT(tuple(cores), jnp.asarray(ranks, jnp.int32))


def _orthogonalize(blocks, center: int):
    """Left-orthogonalize cores < center, right-orthogonalize > center.

    Host float64 QR on tiny [r*n, r] matrices — O(d r^3 n) total,
    microseconds at production sizes; the heavy work stays on device.
    """
    d = len(blocks)
    for k in range(center):
        r_l, n, r_r = blocks[k].shape
        q, rr = np.linalg.qr(blocks[k].reshape(r_l * n, r_r))
        blocks[k] = q.reshape(r_l, n, q.shape[1])
        blocks[k + 1] = np.einsum("ij,jns->ins", rr, blocks[k + 1])
    for k in range(d - 1, center, -1):
        r_l, n, r_r = blocks[k].shape
        q, rr = np.linalg.qr(blocks[k].reshape(r_l, n * r_r).T)
        blocks[k] = q.T.reshape(q.shape[1], n, r_r)
        blocks[k - 1] = np.einsum("ins,js->inj", blocks[k - 1], rr)
    return blocks


def _move_center(blocks, k: int, forward: bool):
    """QR-shift the non-orthogonal center from core k to k+1 (or k-1)."""
    if forward:
        r_l, n, r_r = blocks[k].shape
        q, rr = np.linalg.qr(blocks[k].reshape(r_l * n, r_r))
        blocks[k] = q.reshape(r_l, n, q.shape[1])
        blocks[k + 1] = np.einsum("ij,jns->ins", rr, blocks[k + 1])
    else:
        r_l, n, r_r = blocks[k].shape
        q, rr = np.linalg.qr(blocks[k].reshape(r_l, n * r_r).T)
        blocks[k] = q.T.reshape(q.shape[1], n, r_r)
        blocks[k - 1] = np.einsum("ins,js->inj", blocks[k - 1], rr)
    return blocks


def inflate_ranks(blocks, target: Sequence[int], eps: float = 1e-3,
                  seed: int = 0):
    """Grow bond ranks toward ``target`` by appending small random
    directions (scale eps * core norm). ALS immediately refits the new
    capacity; the random seed content only conditions the first solve."""
    rng = np.random.default_rng(seed)
    d = len(blocks)
    for k in range(d - 1):
        r_now = blocks[k].shape[2]
        r_new = min(int(target[k + 1]),
                    blocks[k].shape[0] * blocks[k].shape[1] * 4)
        if r_new <= r_now:
            continue
        add = r_new - r_now
        sc = eps * max(np.linalg.norm(blocks[k]), 1e-12) / np.sqrt(add)
        ext = rng.standard_normal((blocks[k].shape[0], blocks[k].shape[1],
                                   add)) * sc
        blocks[k] = np.concatenate([blocks[k], ext], axis=2)
        zer = np.zeros((add, blocks[k + 1].shape[1], blocks[k + 1].shape[2]))
        blocks[k + 1] = np.concatenate([blocks[k + 1], zer], axis=0)
    return blocks


# ------------------------------------------------------------ device parts


def _frames(blocks_dev, pts_flat, k: int):
    """Left/right frame row-vectors at points [M, d] for center core k.

    L[m] = prod_{j<k} core_j[:, pts_j, :]  -> [M, r_{k-1}]
    R[m] = prod_{j>k} core_j[:, pts_j, :]  -> [M, r_k]
    Uses the matmul-then-select form (one dense contraction per core).
    Works with zero-PADDED cores too: the padded entries stay exactly
    zero through the products (the library's TT invariant).
    """
    d = len(blocks_dev)
    M = pts_flat.shape[0]
    r0 = blocks_dev[0].shape[0]
    L = jnp.zeros((M, r0), blocks_dev[0].dtype).at[:, 0].set(1.0)
    for j in range(k):
        c = blocks_dev[j]
        r_l, n, r_r = c.shape
        prod = (L @ c.reshape(r_l, n * r_r)).reshape(M, n, r_r)
        L = jnp.take_along_axis(prod, pts_flat[:, j][:, None, None],
                                axis=1)[:, 0]
    rl = blocks_dev[-1].shape[2]
    R = jnp.zeros((M, rl), blocks_dev[0].dtype).at[:, 0].set(1.0)
    for j in range(d - 1, k, -1):
        c = blocks_dev[j]
        r_l, n, r_r = c.shape
        # suffix product: core[:, i, :] @ R^T  -> select i
        prod = (c.reshape(r_l * n, r_r) @ R.T).reshape(r_l, n, M)
        R = jnp.take_along_axis(
            prod, pts_flat[:, j][None, None, :], axis=1)[:, 0].T
    return L, R


@dataclasses.dataclass
class PIALSResult:
    v: TT
    history: list
    best_outer: int
    n_evals: int
    wall_time: float


def _rows_chunk(L, R, islice, w, n: int):
    """Densified LS rows for one sample chunk.

    L [S, T, r1], R [S, T, r2], islice [S, T] (node index along the center
    dim), w [S, T]. Returns Z [S, P] with P = n * r1 * r2 (vec order
    (i, a, b)): Z[s] = sum_t w[s,t] e_{i_t} (x) (l_t r_t^T).
    """
    S, T, r1 = L.shape
    r2 = R.shape[2]
    O = jnp.einsum("sta,stb->stab", L, R) * w[:, :, None, None]
    Z = jnp.zeros((S, n, r1, r2), L.dtype)
    s_ix = jnp.broadcast_to(jnp.arange(S)[:, None], (S, T))
    Z = Z.at[s_ix.reshape(-1), islice.reshape(-1)].add(
        O.reshape(S * T, r1, r2))
    return Z.reshape(S, n * r1 * r2)


def _normal_eq_chunk(L, R, islice, w, rhs, n: int):
    """One chunk's contribution (G, b) to the normal equations."""
    Zf = _rows_chunk(L, R, islice, w, n)
    return Zf.T @ Zf, Zf.T @ rhs


def _row_grad_chunk(L, R, islice, w, rhs, x, n: int):
    """One chunk's contribution to (M^T (rhs - M x), ||rhs - M x||^2),
    with the residual computed against the EXACT rows (corrected-
    seminormal refinement: attainable error ~ kappa(M) * eps instead of
    kappa(M)^2 * eps — the MCA operator has sigma_min ~ beta*dt, so the
    squared conditioning of the f32 normal equations alone is fatal;
    measured in experiments/pials_debug2.py)."""
    Zf = _rows_chunk(L, R, islice, w, n)
    res = rhs - Zf @ x
    return Zf.T @ res, jnp.sum(res * res)


def pi_als(
    problem: ControlProblem,
    grid: Grid,
    controls,
    v0: TT,
    rmax: int = 48,
    schedule: Sequence[tuple] = ((2, 24), (3, 32), (10, 48)),
    n_samples: int | None = None,
    oversample: float = 3.0,
    sweeps: int = 1,
    lam_rel: float = 3e-2,
    refine_iters: int = 4,
    chunk: int = 4096,
    n_check: int = 4096,
    patience: int = 4,
    seed: int = 11,
    key=None,
    interior_frac: float = 0.5,
    dtype=jnp.float32,
    verbose: bool = False,
    kernel=None,
) -> PIALSResult:
    """Policy iteration with ALS-LS policy evaluation (module docstring).

    ``schedule``: ((outer_iters, rank_cap), ...) — ranks ramp as PI
    converges (conditioning + cost: the normal-equation work is O(P^3)).
    ``oversample``: LS rows per core parameter (counts ALL rows incl.
    terminal-pinning ones). ``interior_frac``: fraction of sample rows
    drawn from interior (non-face) nodes; the rest are uniform over the
    full grid so absorbing faces are fitted too (the deployed field is
    queried everywhere and face values feed interior stencils).

    Acceptance: tracks sampled sup|Tv - v| on a fixed CRN check set (the
    oracle-free contraction bound, as in ``polish.tt_polish``) and returns
    the best iterate — an outer iteration can never silently degrade the
    deliverable (VERDICT r4 weak #2 discipline).
    """
    t0 = time.time()
    d = problem.dx
    shape = tuple(grid.shape)
    uc = jnp.asarray(controls, dtype)
    if kernel is None:
        kernel = make_bellman_kernel(problem, grid, uc, chunk=32768,
                                     dtype=dtype)

    rng = np.random.default_rng(seed)
    check_idx = jnp.asarray(
        np.stack([rng.integers(0, n, n_check) for n in shape], -1), jnp.int32)
    geval = jax.jit(lambda tt: tt_gather_eval(tt, check_idx))

    rows_fn = jax.jit(
        lambda tt, ix: frozen_policy_rows(problem, grid, uc, tt, ix, dtype))
    neq = jax.jit(_normal_eq_chunk, static_argnames=("n",))
    rgrad = jax.jit(_row_grad_chunk, static_argnames=("n",))
    frames_fn = jax.jit(_frames, static_argnames=("k",))

    def sample_idx(S):
        S_int = int(round(S * interior_frac))
        cols_u = [rng.integers(0, n, S - S_int) for n in shape]
        cols_i = [rng.integers(1, max(n - 1, 2), S_int) for n in shape]
        return np.stack([np.concatenate([u, i])
                         for u, i in zip(cols_u, cols_i)], -1)

    blocks = tt_to_blocks(v0)
    history = []
    n_evals = 0
    # baseline acceptance: never return anything worse than the input
    v_in = blocks_to_tt(blocks, rmax, dtype)
    tv0 = np.asarray(kernel(v_in, check_idx))
    cur0 = np.asarray(geval(v_in))
    best = (float(np.max(np.abs(tv0 - cur0))), v_in, -1)
    outer = 0
    stall = 0
    for stage_iters, cap in schedule:
        # rank targets for this stage: min(cap, full left/right unfoldings)
        tgt = [1]
        for k in range(d - 1):
            tgt.append(min(cap, int(np.prod(shape[: k + 1])),
                           int(np.prod(shape[k + 1:]))))
        tgt.append(1)
        blocks = inflate_ranks(blocks, tgt, seed=seed + outer)
        for _ in range(stage_iters):
            P_max = max(b.shape[0] * b.shape[1] * b.shape[2] for b in blocks)
            S = n_samples or int(oversample * P_max)
            idx_np = sample_idx(S)
            idx = jnp.asarray(idx_np, jnp.int32)

            v_tt = blocks_to_tt(blocks, rmax, dtype)
            pts, w, rhs = rows_fn(v_tt, idx)            # [S,T,d],[S,T],[S]
            n_evals += S * (2 * d + 1)
            pts_flat = pts.reshape(-1, d)
            T = 2 * d + 1

            # ALS sweep(s): left-to-right then right-to-left
            order = list(range(d)) + list(range(d - 2, 0, -1))
            for swp in range(sweeps):
                blocks = _orthogonalize(blocks, order[0])
                pos = order[0]
                for step_i, k in enumerate(order):
                    if k != pos:
                        blocks = _move_center(blocks, pos, forward=(k > pos))
                        pos = k
                    # frames over cores PADDED to the static rmax, then
                    # sliced to the stage's per-bond target ranks: a few
                    # compiled graphs per STAGE instead of one per core
                    # shape (tunnel compiles are minutes each); padded
                    # directions have zero rows in G, so the proximal
                    # lambda holds them exactly at their x0 value (zero)
                    bd = blocks_to_tt(blocks, rmax, dtype).cores
                    Lf, Rf = frames_fn(bd, pts_flat, k=k)
                    r1 = blocks[k].shape[0]
                    r2 = blocks[k].shape[2]
                    n_k = shape[k]
                    rp1 = max(int(tgt[k]), r1)      # never drop active
                    rp2 = max(int(tgt[k + 1]), r2)  # frame columns
                    Lf = Lf[:, :rp1].reshape(S, T, rp1)
                    Rf = Rf[:, :rp2].reshape(S, T, rp2)
                    isl = pts[:, :, k]
                    P = n_k * rp1 * rp2
                    G = jnp.zeros((P, P), dtype)
                    for c0 in range(0, S, chunk):
                        c1 = min(c0 + chunk, S)
                        Gc, _ = neq(Lf[c0:c1], Rf[c0:c1], isl[c0:c1],
                                    w[c0:c1], rhs[c0:c1], n=n_k)
                        G = G + Gc
                    lam = lam_rel * (jnp.trace(G) / (n_k * r1 * r2))
                    cho = jax.scipy.linalg.cho_factor(
                        G + lam * jnp.eye(P, dtype=dtype))
                    # corrected-seminormal iterative refinement with a
                    # proximal pull toward the warm start (unsampled /
                    # weakly-constrained directions stay where they were
                    # instead of shrinking to zero)
                    x0_np = np.zeros((n_k, rp1, rp2))
                    x0_np[:, :r1, :r2] = blocks[k].transpose(1, 0, 2)
                    x0 = jnp.asarray(x0_np.reshape(P), dtype)
                    x = x0
                    best_x, best_res = x0, np.inf
                    for _r in range(refine_iters + 1):
                        gvec = -lam * (x - x0)
                        rsq = 0.0
                        for c0 in range(0, S, chunk):
                            c1 = min(c0 + chunk, S)
                            gc, rc = rgrad(
                                Lf[c0:c1], Rf[c0:c1], isl[c0:c1],
                                w[c0:c1], rhs[c0:c1], x, n=n_k)
                            gvec = gvec + gc
                            rsq += float(rc)
                        # keep the best row-residual iterate: with
                        # kappa(G) >> 1/eps_f32 the f32 preconditioner can
                        # over- or under-shoot; monitoring makes the
                        # refinement monotone in the TRUE objective
                        if rsq < best_res:
                            best_x, best_res = x, rsq
                        elif rsq > 1.2 * best_res:
                            break
                        if _r < refine_iters:
                            x = x + jax.scipy.linalg.cho_solve(cho, gvec)
                    blocks[k] = np.asarray(best_x, np.float64).reshape(
                        n_k, rp1, rp2)[:, :r1, :r2].transpose(1, 0, 2)

            # acceptance check on the fixed CRN set
            v_tt = blocks_to_tt(blocks, rmax, dtype)
            cur = np.asarray(geval(v_tt))
            tv = np.asarray(kernel(v_tt, check_idx))
            bres_abs = float(np.max(np.abs(tv - cur)))
            scale = max(float(np.max(np.abs(cur))), 1e-12)
            rec = {"outer": outer, "cap": cap, "S": S,
                   "ranks": [b.shape[0] for b in blocks] + [1],
                   "bres_abs": bres_abs, "bres": bres_abs / scale}
            history.append(rec)
            if verbose:
                print(f"[pi_als] outer={outer} cap={cap} S={S} "
                      f"bres={rec['bres']:.3e} ranks={rec['ranks']}",
                      flush=True)
            if bres_abs < best[0]:
                best = (bres_abs, v_tt, outer)
                stall = 0
            else:
                stall += 1
                if stall > patience:
                    return PIALSResult(best[1], history, best[2], n_evals,
                                       time.time() - t0)
            outer += 1
    return PIALSResult(best[1], history, best[2], n_evals,
                       time.time() - t0)
