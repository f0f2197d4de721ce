"""Fused on-device TT value iteration: the whole VI loop as ONE XLA program.

The host-orchestrated path (``solvers/ttvi.py`` + ``ops/cross.py``) pays
~30 host->device dispatches per VI iteration (eval, QR, SVD, LU, index
bookkeeping per core). This module is the TPU-native end-game promised in
SURVEY.md §7: cross index sets live on device as padded static-shape arrays,
every per-core operation is masked to the active rank block, and the entire
VI iteration — left-to-right + right-to-left cross sweeps over the Bellman
backup, rank adaptation, pivot selection, convergence sampling — runs inside
a single ``jax.lax.while_loop``. Zero host round-trips until convergence.

Key static-shape tricks (SURVEY.md §7 hard part #1):
- index sets: ``left/right [d+1, R, d]`` int32, column j holds the node
  index for *absolute* dim j; active row counts tracked in traced
  ``rl/rr [d+1]``.
- fiber matrices are always evaluated at the padded size ``[R*n_k, R]`` and
  masked; rank re-estimation = traced count of singular values above
  threshold; DMRG-style kick = masked random columns re-orthogonalized by a
  second QR.
- pivot rows come from the permutation of ``jax.lax.linalg.lu`` (maxvol
  proxy); the interpolation core ``G = Q inv(Q[rows])`` keeps the
  padded-zero invariant because inactive columns stay exactly zero.

Reference parity: this computes the same fixed point as
``c3control_vi_solve`` + C3 ``ftapprox_cross`` (SURVEY.md §3.1), validated
against the host path and the dense oracle in tests.
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops import mca
from c3sc_tpu.ops.tt import TT, tt_gather_eval
from c3sc_tpu.solvers.ttvi import bellman_backup


class FusedSolver(NamedTuple):
    """Bundle returned by ``make_fused_vi``.

    solve_fn(carry) -> carry        run to convergence (one dispatch)
    init_fn(key, v0=None) -> carry  fresh solver state
    step_fn(carry, n) -> carry      exactly n iterations (fori_loop; benches)
    run_fn(carry, n) -> carry       up to n iterations, stops early on the
                                    SAME conditions as solve_fn (chunked
                                    driving for metrics/checkpointing)
    """

    solve_fn: object
    init_fn: object
    step_fn: object
    run_fn: object


class FusedCarry(NamedTuple):
    cores: tuple          # d x [R, n_k, R] current value TT (padded-zero)
    ranks: jnp.ndarray    # [d+1] int32
    left: jnp.ndarray     # [d+1, R, d] int32
    right: jnp.ndarray    # [d+1, R, d] int32
    rl: jnp.ndarray       # [d+1] int32 active left-set sizes
    rr: jnp.ndarray       # [d+1] int32 active right-set sizes
    # FIT ranks per bond — equal to rl/rr in the square scheme; under
    # oversampling rl/rr hold the SAMPLE counts s = ceil((1+os) r) and the
    # fit rank is carried explicitly (r3 advisor: reconstructing it by
    # ceil-division is not invertible when s was clipped by the bond cap,
    # which made the hysteresis switch fire permanently at capped bonds)
    rlf: jnp.ndarray      # [d+1] int32 active left FIT ranks
    rrf: jnp.ndarray      # [d+1] int32 active right FIT ranks
    rows_l: jnp.ndarray     # [d, R] int32 — pivot rows per core (L2R)
    rows_r: jnp.ndarray     # [d, R] int32 — pivot rows per core (R2L)
    it: jnp.ndarray         # int32
    residual: jnp.ndarray   # float — per-iteration sample change
    long_res: jnp.ndarray   # float — sample change over the last window
    wstall: jnp.ndarray     # int32 — windows without long_res improvement
    v_sample: jnp.ndarray   # [S]
    sample_ref: jnp.ndarray # [S] — snapshot at the last window boundary
    # closed-loop probe harvesting (optional): realized probe cost is the
    # deliverable metric and is robust where sampled residuals are not
    probe_cost: jnp.ndarray # float — last probe's mean discounted cost
    best_cost: jnp.ndarray  # float — best probe cost seen
    cores_best: tuple       # cores snapshot at best_cost
    ranks_best: jnp.ndarray # [d+1]
    frozen: jnp.ndarray     # bool — sticky adaptation-freeze latch
    freeze_mark: jnp.ndarray  # float — long_res when the latch engaged
    best_long: jnp.ndarray  # float — best windowed residual seen (monotone)
    best_absdisp: jnp.ndarray  # float — best ABSOLUTE windowed displacement
    warm_until: jnp.ndarray # int32 — free-repivot warmup end (reset on growth)


def _cholqr2(C):
    """CholeskyQR2: q with colspace(q) = colspace(C), orthonormal columns,
    plus the singular values of C.

    The tall Householder QR is latency-bound on TPU (R sequential
    reflections over the [m, R] matrix); CholeskyQR2 replaces it with two
    MXU-friendly Gram matmuls + two tiny [R, R] Cholesky factorizations.
    The second pass squares away the cond(C)·eps orthogonality loss of
    single-pass CholeskyQR; a scaled ridge keeps rank-deficient blocks
    finite (their null columns carry no pivot weight downstream). Singular
    values come from eigvalsh of the first Gram (s = sqrt(eig)) — exact up
    to the same squaring, and the rank threshold compares RELATIVE
    magnitudes, which squaring preserves monotonically.
    """
    m, R = C.shape
    G = C.T @ C                                   # [R, R] (MXU)
    # f32 Cholesky needs a ridge comfortably above eps*||G|| or rank-
    # deficient fiber blocks produce NaN factors that poison the while_loop
    ridge = 1e-6 * jnp.maximum(jnp.trace(G) / R, 1e-30)
    ev = jnp.linalg.eigvalsh(G)                   # ascending
    s = jnp.sqrt(jnp.maximum(ev[::-1], 0.0))      # singular values of C
    L1 = jnp.linalg.cholesky(G + ridge * jnp.eye(R, dtype=C.dtype))
    q1 = jax.scipy.linalg.solve_triangular(L1, C.T, lower=True).T
    G2 = q1.T @ q1
    ridge2 = 1e-6 * jnp.maximum(jnp.trace(G2) / R, 1e-30)
    L2 = jnp.linalg.cholesky(G2 + ridge2 * jnp.eye(R, dtype=C.dtype))
    q = jax.scipy.linalg.solve_triangular(L2, q1.T, lower=True).T
    return q, s


def _orth_basis_and_rank(C, noise, eps_rank, kick, rmax_active, row_mask,
                         r_prev, frozen):
    """One (Cholesky-)QR of the fiber matrix serves both rank estimation and
    the (kick-enriched) orthonormal basis, with MONOTONE rank selection.

    - singular values come from the Gram eigenvalues inside ``_cholqr2``;
    - rank rule (see ``_hysteresis_rank``): grow by the kick width when the
      estimate saturates the current active size, never shrink;
    - the basis keeps REAL directions for all but the last ``kick`` active
      columns; random exploration noise is bounded at ``kick`` columns no
      matter how large the active rank grows (replacing every sub-threshold
      direction with noise would make the interpolation floor scale with
      rank), and it is Gram-Schmidt-orthogonalized against q instead of a
      second tall QR (colspace accuracy is all pivoting/interp need).
    Returns (qe [m, R], r_need, r_new).
    """
    m, R = C.shape
    col = jnp.arange(R)
    # Householder QR, NOT CholeskyQR2: the Gram ridge pollutes the trailing
    # (small-singular-value) directions of the column space, and since the
    # interpolation core only depends on colspace + pivots, that trailing
    # noise feeds straight into the assembled value. Singular values come
    # from the small [R, R] triangular factor (exact). _cholqr2 remains
    # available for problems whose spectra tolerate the squaring.
    q, rfac = jnp.linalg.qr(C)                   # [m, R], [R, R]
    s = jnp.linalg.svd(rfac, compute_uv=False)
    smax = jnp.maximum(s[0], 1e-30)
    r_need = jnp.maximum(jnp.sum(s > eps_rank * smax).astype(jnp.int32), 1)
    r_adapt = jnp.clip(r_need + kick, 1, rmax_active)
    r_new = jnp.where(frozen, r_prev,
                      _hysteresis_rank(r_need, r_adapt, r_prev))
    # noise only beyond the NEEDED directions, and at most `kick` columns:
    # at saturation (r_need == r_new, e.g. capped at rmax) this leaves ZERO
    # noise columns; frozen sweeps get pure real directions
    r_keep = jnp.clip(jnp.maximum(r_need, r_new - kick), 1, r_new)
    r_keep = jnp.where(frozen, r_new, r_keep)
    keepmask = (col < r_keep).astype(C.dtype)
    kickmask = ((col >= r_keep) & (col < r_new)).astype(C.dtype)
    z = noise * row_mask[:, None]
    z = z - q @ (q.T @ z)                        # orthogonalize vs q
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=0, keepdims=True), 1e-12)
    qe = q * keepmask[None, :] + z * kickmask[None, :]
    qe = qe * row_mask[:, None]
    return qe, r_need, r_new


def _interp_from_rows(qe, rows, r_new):
    """Interpolation core G = qe inv(qe[rows]) [m, R]; G[rows] = I on the
    active block, padded cols exactly zero.

    A small scaled ridge keeps the solve finite when the pivot submatrix is
    (near-)singular — a transiently bad pivot then yields a poor but FINITE
    core instead of NaN-poisoning the whole while_loop state.

    (Clipping G's entries was tried as an overflow guard and REVERTED at
    both +-16 and +-128: transiently singular pivot sets legitimately emit
    large-|G| cores that the next sweep re-fits, and clipping them
    degraded LQ's fixed point 1e-4 -> 1e-2. Overflow/NaN protection lives
    at the fitting boundary instead — see the nan_to_num in
    ``_eval_fibers``.)
    """
    R = qe.shape[1]
    col = jnp.arange(R)
    sub = qe[rows]                               # [R, R]
    sub = sub + jnp.diag((col >= r_new).astype(qe.dtype))
    ridge = 1e-6 * jnp.maximum(jnp.max(jnp.abs(sub)), 1.0)
    sub = sub + ridge * jnp.eye(R, dtype=qe.dtype)
    return jnp.linalg.solve(sub.T, qe.T).T


def _interp_from_rows_ls(qe, rows, r_new, s_rows):
    """Rectangular-maxvol core G = qe pinv(qe[rows]) [m, R] with
    ``s_rows >= r_new`` active sample rows (Mikhalev-Oseledets
    rect-maxvol).

    The square interpolation core is an OBLIQUE projector whose norm the
    d-fold core chain amplifies — measured on the 9^6 quadcopter, the
    assembled sweep operator diverges outright when its pivot/rank
    adaptation is frozen (res 0.05 -> 1.5) and churns at ~11% of the value
    range when coupled, independent of rank cap. Oversampling replaces the
    inverse with a least-squares fit onto the same column basis: with ~2x
    rows the fit approaches an orthogonal projection on the sampled rows
    and the chain's amplification collapses. ``s_rows == r_new`` recovers
    the square scheme exactly (pinv of a square nonsingular matrix).

    The bond then CARRIES s_rows columns (rank r_new content, zero-padded
    beyond s_rows); the active-row mask lives in the rows' one-hot pattern:
    rows beyond s_rows map to sub-rows that are zeroed before the normal
    equations.
    """
    m, R = qe.shape
    col = jnp.arange(R)
    sub = qe[rows]                               # [R(s-pad), R(col-pad)]
    sub = sub * (jnp.arange(R) < s_rows).astype(qe.dtype)[:, None]
    sub = sub * (col < r_new).astype(qe.dtype)[None, :]
    # normal equations with scaled ridge; inactive cols get identity so the
    # solve stays nonsingular and their G columns are exactly zero below
    Gm = sub.T @ sub
    ridge = 1e-6 * jnp.maximum(jnp.trace(Gm) / jnp.maximum(r_new, 1), 1e-30)
    Gm = Gm + ridge * jnp.eye(R, dtype=qe.dtype)
    Gm = Gm + jnp.diag((col >= r_new).astype(qe.dtype))
    X = jnp.linalg.solve(Gm, sub.T)              # [R(col), R(s)] = pinv(sub)
    G = (qe * (col < r_new).astype(qe.dtype)[None, :]) @ X   # [m, R(s-pad)]
    return G * (jnp.arange(R) < s_rows).astype(qe.dtype)[None, :]


def _extend_rows(qe, rows, r_new, s_rows):
    """Extend r_new maxvol rows to ``s_rows`` total by top leverage (row
    norm of the orthonormal basis), excluding already-selected rows."""
    m, R = qe.shape
    lev = jnp.sum(qe * qe, axis=1)
    sel_mask = jnp.arange(R) < r_new
    # conflict-free scatter (r3 advisor): the maxvol swap can emit duplicate
    # row ids, and XLA scatter-SET with duplicates is order-undefined — a
    # padding position's False could overwrite a selected row's True and the
    # row would re-enter as a leverage extension. scatter-MAX cannot clear.
    taken = (jnp.zeros((m,), jnp.int32)
             .at[rows].max(sel_mask.astype(jnp.int32))) > 0
    lev = jnp.where(taken, -jnp.inf, lev)
    _, extra = jax.lax.top_k(lev, R)             # [R] candidate extensions
    ext_col = jnp.arange(R)
    # positions [r_new, s_rows) take extension rows; beyond s_rows keep 0
    ext_idx = jnp.clip(ext_col - r_new, 0, R - 1)
    out = jnp.where(ext_col < r_new, rows,
                    jnp.where(ext_col < s_rows, extra[ext_idx], 0))
    return out.astype(jnp.int32)


def _pivot_rows(qe, r_new, n_swaps: int | None = None):
    """Maxvol pivot rows: partial-pivoted LU seed + greedy swap refinement.

    The LU seed runs on a top-8R row subset (by row norm) instead of the
    full [m, R] matrix — the tall LU's m-row elimination is latency-bound on
    TPU, and large-norm rows are where volume-maximizing pivots live; the
    greedy swaps below still scan ALL m rows, so a pivot outside the subset
    can always enter.

    Each refinement: build G = qe inv(qe[rows]); if max |G_ij| > 1 + tol,
    row j of the pivot set is replaced by the offending row i — this is the
    classic maxvol iteration and directly bounds the interpolation norm
    (without it, occasional bad LU pivots give |G| >> 1 and the assembled
    TT oscillates wildly between pivots).
    """
    m, R = qe.shape
    if n_swaps is None:
        # NOTE: scaling swaps with R (n_swaps = max(8, R)) was tried and
        # REVERTED — aggressive per-sweep refinement makes the pivot sets
        # churn harder under hysteresis (pendulum 41^2 rmax=24 parity
        # regressed 0.6% -> 2.8%); 6 greedy swaps + volume hysteresis is
        # the measured sweet spot
        n_swaps = 6
    K = min(m, 8 * R)
    norms = jnp.sum(qe * qe, axis=1)
    _, cand = jax.lax.top_k(norms, K)            # [K] row ids
    _, _, perm = jax.lax.linalg.lu(qe[cand])     # LU on the [K, R] subset
    rows = cand[perm[:R]].astype(jnp.int32)

    def step(rows, _):
        G = _interp_from_rows(qe, rows, r_new)
        flat = jnp.argmax(jnp.abs(G))
        i, j = flat // R, flat % R
        do_swap = (jnp.abs(G[i, j]) > 1.05) & (j < r_new)
        rows = jnp.where(do_swap, rows.at[j].set(i.astype(jnp.int32)), rows)
        return rows, None

    rows, _ = jax.lax.scan(step, rows, None, length=n_swaps)
    return rows


def _logvol(qe, rows, r_new):
    """log |det| of the active pivot submatrix (inactive block -> identity)."""
    R = qe.shape[1]
    col = jnp.arange(R)
    sub = qe[rows] + jnp.diag((col >= r_new).astype(qe.dtype))
    _, logdet = jnp.linalg.slogdet(sub)
    return logdet


def _hysteresis_rank(r_need, r_adapt, r_prev):
    """MONOTONE rank selection (never shrink, grow on saturation).

    Shrinking is never worth it under padded static shapes — the compute
    cost is identical at any active rank <= R, while a rank drop resets the
    pivot set and kick columns, which can tip an almost-converged solve
    into a permanent limit cycle (observed on LQ: residual 2e-3 and
    falling, then a 10 -> 9 shrink destabilized it to a 0.4-residual
    cycle). The f32 singular-value tail also jitters the raw need-count by
    +-1-2 per sweep, so shrink decisions were noise-driven to begin with.

    Growth trigger: ``r_need`` is counted from the singular values of the
    ACTIVE fiber block, so it can never exceed the current active rank —
    growth must come through the kick columns. The classic kick-rank rule:
    when the estimate SATURATES the active size (r_need >= r_prev), enlarge
    by the kick; once the estimate stabilizes below the active size (true
    rank found, kick-width headroom on top), the rank freezes for good."""
    saturated = r_need >= r_prev
    return jnp.where(saturated, jnp.maximum(r_adapt, r_prev), r_prev)


def _hysteresis_rows(qe, rows_prev, r_new, r_prev, in_warmup, frozen,
                     log_gain: float = 0.4):
    """Pivot selection with hysteresis + convergence freeze.

    Fresh LU/maxvol pivots every sweep inject approximation noise that VI
    amplifies by 1/(1-gamma); hard-frozen pivots go unstable when the value
    drifts. Hysteresis keeps the PREVIOUS pivot set unless the fresh one
    improves submatrix volume by exp(log_gain) (or the rank changed, or
    we're still in the adaptation warmup) — near the fixed point the sweep
    becomes deterministic, far from it pivots still track the function.

    ``frozen`` (traced bool): once the sample residual is small, pivot
    adaptation stops ENTIRELY. Adaptation is only needed far from the fixed
    point; with frozen index sets the sweep is a deterministic interpolated
    Bellman operator that contracts cleanly. Without the freeze, basin
    selection between "converges to 1e-5" and "churns at 1e-2" was
    decided by f32 tie-breaking noise — any reordering of einsum
    accumulation flipped it (measured on pendulum 2026-08-18).
    """
    rows_new = _pivot_rows(qe, r_new)
    switch = (~frozen) & (
        in_warmup
        | (r_new != r_prev)
        | (_logvol(qe, rows_new, r_new) > _logvol(qe, rows_prev, r_new) + log_gain)
    )
    return jnp.where(switch, rows_new, rows_prev)


def _shift_coord(j, m: int, sign: int, grid: Grid):
    """Neighbor coordinate under boundary rules (matches Grid.neighbor_index)."""
    n = grid.shape[m]
    if grid.periodic[m]:
        return jnp.mod(j + sign, n)
    return jnp.clip(j + sign, 0, n - 1)


def make_structured_fiber_eval(grid: Grid, k: int, rmax: int, dtype=jnp.float32):
    """Structured TT evaluation on a cross-fiber block + ALL +-1 neighbors.

    The TPU-native ``valuef_eval_fiber_ind_nn`` (reference:
    ``c3sc/src/valuefunc.c`` — line n/a, empty mount; SURVEY.md §2.1 L5 —
    "this is what makes MCA+FT fast"): the evaluation set I_k x grid_k x
    J_{k+1} is a structured block, so prefix/suffix partial products are
    shared across the whole block. Per left row we cache forward interface
    vectors and backward suffix matrices; a dim-m neighbor then costs two
    small matvecs instead of a fresh d-core chain, and each of the 2d+1
    value tensors assembles with ONE [R,R] x [R,n,R] x [R,R] einsum —
    O(d n R^3) total vs O(d^2 n R^4) for independent gather-evals, with no
    [B, R, R] gather materialization (the HBM-bandwidth killer).

    Returns fn(cores, left_k [R,d], right_k1 [R,d]) ->
      (vp [d, R, n, R], vm [d, R, n, R]) neighbor values (+ and - per dim).
    """
    d = grid.ndim
    R = rmax
    n = shape_k = grid.shape[k]
    plus_map = np.arange(n) + 1
    minus_map = np.arange(n) - 1
    if grid.periodic[k]:
        plus_map %= n
        minus_map %= n
    else:
        plus_map = np.clip(plus_map, 0, n - 1)
        minus_map = np.clip(minus_map, 0, n - 1)
    plus_map = jnp.asarray(plus_map)
    minus_map = jnp.asarray(minus_map)

    def fn(cores, left_k, right_k1):
        e0 = jnp.zeros((R,), dtype).at[0].set(1.0)

        def left_row(idxrow):
            p = e0
            ps = []
            for j in range(k):
                ps.append(p)
                p = p @ cores[j][:, idxrow[j], :]
            S = jnp.eye(R, dtype=dtype)
            Ss = [None] * k
            for j in range(k - 1, -1, -1):
                Ss[j] = S
                S = cores[j][:, idxrow[j], :] @ S
            pp, pm = [], []
            for m in range(k):
                for sign, acc in ((1, pp), (-1, pm)):
                    jn = _shift_coord(idxrow[m], m, sign, grid)
                    acc.append((ps[m] @ cores[m][:, jn, :]) @ Ss[m])
            stack = lambda xs: (jnp.stack(xs) if xs else jnp.zeros((0, R), dtype))
            return p, stack(pp), stack(pm)

        def right_row(idxrow):
            s = e0
            sa = [None] * d  # sa[j]: suffix vector for cores j+1..d-1
            for j in range(d - 1, k, -1):
                sa[j] = s
                s = cores[j][:, idxrow[j], :] @ s
            T = jnp.eye(R, dtype=dtype)
            Ts = [None] * d  # Ts[j]: prefix matrix cores k+1..j-1
            for j in range(k + 1, d):
                Ts[j] = T
                T = T @ cores[j][:, idxrow[j], :]
            sp, sm = [], []
            for m in range(k + 1, d):
                for sign, acc in ((1, sp), (-1, sm)):
                    jn = _shift_coord(idxrow[m], m, sign, grid)
                    acc.append(Ts[m] @ (cores[m][:, jn, :] @ sa[m]))
            stack = lambda xs: (jnp.stack(xs) if xs else jnp.zeros((0, R), dtype))
            return s, stack(sp), stack(sm)

        p0, Pp, Pm = jax.vmap(left_row)(left_k)     # [R,R], [R,k,R], [R,k,R]
        s0, Sp, Sm = jax.vmap(right_row)(right_k1)  # [R,R], [R,d-k-1,R] x2

        G = cores[k]
        # ONE batched einsum per neighbor group (left dims / dim k / right
        # dims) instead of 4d separate [R,R]x[R,n,R]x[R,R] mixes — the
        # per-op dispatch overhead of ~4d tiny contractions dominated this
        # evaluator's runtime inside the fused loop.
        Gs0 = jnp.einsum("rns,bs->rnb", G, s0)       # shared right product
        parts_p, parts_m = [], []
        if k > 0:
            parts_p.append(jnp.einsum("amr,rnb->manb", Pp, Gs0))
            parts_m.append(jnp.einsum("amr,rnb->manb", Pm, Gs0))
        parts_p.append(jnp.einsum("ar,rnb->anb", p0, Gs0[:, plus_map])[None])
        parts_m.append(jnp.einsum("ar,rnb->anb", p0, Gs0[:, minus_map])[None])
        if k < d - 1:
            p0G = jnp.einsum("ar,rns->ans", p0, G)   # shared left product
            parts_p.append(jnp.einsum("ans,bms->manb", p0G, Sp))
            parts_m.append(jnp.einsum("ans,bms->manb", p0G, Sm))
        vp = jnp.concatenate(parts_p, axis=0)
        vm = jnp.concatenate(parts_m, axis=0)
        # center values at the block nodes themselves, one extra einsum on
        # the shared right product — a per-point gather-eval here would
        # materialize [B, R, R] gathered cores (at the 9^6 base-mode solve:
        # 36.9k x 64 x 64 f32 = 604 MB per dim, which faulted the chip)
        v0 = jnp.einsum("ar,rnb->anb", p0, Gs0)
        return vp, vm, v0  # [d, R, n, R] x2, [R, n, R]

    return fn


def make_fused_vi(
    problem: ControlProblem,
    grid: Grid,
    controls,
    rmax: int = 16,
    kick: int = 2,
    eps_rank: float = 1e-4,
    tol: float = 1e-4,
    max_iters: int = 2000,
    sample_size: int = 256,
    window: int = 50,
    patience: int = 6,
    freeze_res: float = 1e-2,
    freeze_after: int = 2,
    probe_rollouts: int = 0,
    probe_steps: int = 200,
    probe_dt: float = 0.01,
    probe_x0=None,
    dtype=jnp.float32,
    mesh=None,
    refine_steps: int = 0,
    refine_method: str = "pgd",
    target_mode: str = "self",
    n_inner: int = 1,
    debug_identity: bool = False,
    base: TT | None = None,
    oversample: float = 0.0,
):
    """Build the jitted fused solver. Returns a ``FusedSolver`` bundle.

    ``oversample``: rectangular-maxvol oversampling factor. 0 (default) is
    the square interpolation scheme; ``os > 0`` carries
    ``s = ceil((1+os) r)`` sample rows per bond and builds cores by
    least-squares onto the fitted basis (``_interp_from_rows_ls``) — the
    projector norm collapses toward an orthogonal projection's, stabilizing
    deep (6D+) sweeps whose square-interpolation chain is unstable. Fit
    ranks are capped at R/(1+os) so the extended rows fit the padding.

    ``base``: optional FIXED value-function TT. When given, the solver
    solves the RESIDUAL fixed point w = T(base + w) - base: fiber
    evaluation backs up the TOTAL value (base neighbors added, terminal
    pinning and value bounds applied to the total) and fits only the
    correction w. This is the engine of iterative refinement
    (``fused_tt_vi_refined``): the cross projector's fit error scales with
    the FITTED function's own magnitude, so solving for a small correction
    against a frozen base contracts the total error geometrically where a
    direct solve floors at fit-error x 1/(1-gamma).

    ``target_mode``: ``'self'`` (default) couples fitting and evaluation —
    each half sweep evaluates the backup of the evolving iterate; cheapest,
    converges on 2-4D problems. ``'frozen'`` evaluates every fiber of an
    iteration against the FIXED sweep-entry iterate (the reference's
    ``ftapprox_cross``-per-VI-step structure, SURVEY.md §3.1), running
    ``n_inner`` index-refinement sweeps per iteration. Use for 6D+ where
    the coupled scheme's pivot/fit feedback floors the value error at ~11%
    regardless of rank cap (measured, 9^6 quadcopter vs dense oracle).

    ``freeze_after``: windows without long-residual improvement before the
    sticky adaptation-freeze latch engages (see ``body``); the frozen sweep
    is a deterministic contraction, which is what lets saturated-rank
    solves converge instead of churning at the pivot-noise floor.

    ``refine_steps > 0``: after the brute-force candidate argmin, polish
    each fiber node's control with that many batched projected-gradient
    (or L-BFGS) steps of the continuous Bellman RHS — the reference's
    per-node ``c3opt_minimize`` inner solve running INSIDE the fused sweep
    (SURVEY.md §3.1 HOTTEST loop; VERDICT r1 missing #2).

    ``mesh``: optional ``jax.sharding.Mesh``. When given, the Bellman fiber
    block — the solve's dominant compute — carries GSPMD sharding
    constraints: evaluation nodes shard over the mesh axis ``'fibers'``
    (data parallel) and, if the mesh has a ``'ctrl'`` axis, the per-
    candidate RHS shards over it too; XLA partitions the stencil math and
    inserts the ICI collectives (the min-reduction over candidates and the
    gather feeding the tiny per-core decompositions) automatically
    (SURVEY.md §2.3 / §7 item 9). TT cores and index sets stay replicated —
    they are KB-scale.

    init_fn(key, v0=None) -> FusedCarry;  solve_fn(carry) -> FusedCarry
    (runs while_loop to convergence). Both jittable; solve_fn is jitted.

    Stopping (any of):
      - per-iteration sample residual < tol;
      - change over a whole ``window`` of iterations < tol (slowly
        contracting VI converges even when per-iteration noise from pivot
        re-selection dominates the single-step residual);
      - ``patience`` consecutive windows without 2% long-residual
        improvement — the plateau at the TT truncation floor.

    ``probe_rollouts > 0`` enables closed-loop probe harvesting: at every
    window boundary a fixed-seed batch of Euler-Maruyama rollouts under the
    implicit policy of the CURRENT iterate runs in-graph; the iterate with
    the best realized discounted cost is snapshotted and returned. For
    problems whose backup has a heavy TT-rank tail (6D quadcopter: ~5-8%
    irreducible sup error at practical ranks) the projected VI hovers in a
    limit cycle — the probe harvests its best visit, measured by the
    deliverable metric itself.
    """
    d = problem.dx
    R = rmax
    shape = grid.shape
    # static feasible bond dimensions: the TT rank at bond k can never
    # exceed min(prod(shape[:k]), prod(shape[k:])). Each half sweep only
    # bounds the rank through ITS side's recursion (rl[k]*n / rr[k+1]*n),
    # so without this clamp the R2L pass can assign an edge bond a rank
    # above the OTHER side's feasible dimension — measured on the 9^6
    # quadcopter at rmax 16: bond 1 adapted to rank 10 > n_0 = 9, i.e. one
    # exactly-redundant column of f32 noise, and the solve churned at
    # res 3e-2 instead of converging.
    import math

    bond_cap = [min(math.prod(shape[:k]), math.prod(shape[k:]), R)
                for k in range(d + 1)]
    fit_cap = int(R / (1.0 + oversample)) if oversample > 0 else R
    uc = jnp.asarray(controls, dtype)
    rng = np.random.default_rng(777)
    sample_idx = jnp.asarray(
        np.stack([rng.integers(0, n, size=sample_size) for n in shape], -1),
        jnp.int32,
    )
    dimcol = jnp.arange(d)
    # DETERMINISTIC kick-enrichment directions, fixed across iterations: a
    # fresh random kick every sweep makes the pivot sets churn forever and
    # the residual floors at the TT truncation error; with fixed directions
    # the VI body is a deterministic map and contracts to its fixed point.
    noise_l2r = [
        jnp.asarray(rng.standard_normal((R * n, R)), dtype) for n in shape
    ]
    noise_r2l = [
        jnp.asarray(rng.standard_normal((n * R, R)), dtype) for n in shape
    ]

    if probe_rollouts > 0:
        from c3sc_tpu.ops.tt import tt_lerp_eval
        from c3sc_tpu.sim.integrators import rollout as _rollout
        from c3sc_tpu.sim.policy import make_implicit_policy

        if probe_x0 is None:
            prng = np.random.default_rng(4242)
            lbn, ubn = np.asarray(problem.lb), np.asarray(problem.ub)
            mid, span = (lbn + ubn) / 2, (ubn - lbn) / 2
            probe_x0 = mid + 0.5 * span * prng.uniform(-1, 1, (probe_rollouts, d))
        probe_x0 = jnp.asarray(probe_x0, dtype)
        probe_key = jax.random.key(31337)

        def _probe_cost(v_tt: TT):
            if base is not None:
                vfn = lambda p: (tt_lerp_eval(v_tt, grid, p)
                                 + tt_lerp_eval(TT(base_cores, base_ranks),
                                                grid, p))
            else:
                vfn = lambda p: tt_lerp_eval(v_tt, grid, p)
            pol = make_implicit_policy(problem, grid, vfn, uc)
            traj = _rollout(problem, grid, pol, probe_x0, probe_key,
                            probe_dt, probe_steps, policy_every=2)
            return jnp.mean(traj.cost).astype(dtype)

    def _build_idx(k, left_k, right_k1):
        """Evaluation multi-indices [R, n_k, R, d] for core k."""
        n = shape[k]
        A = jnp.broadcast_to(left_k[:, None, None, :], (R, n, R, d))
        B = jnp.broadcast_to(right_k1[None, None, :, :], (R, n, R, d))
        I = jnp.broadcast_to(jnp.arange(n)[None, :, None, None], (R, n, R, d))
        idx = jnp.where(dimcol < k, A, jnp.where(dimcol == k, I, B))
        return idx.astype(jnp.int32)

    struct_eval = [
        make_structured_fiber_eval(grid, k, R, dtype) for k in range(d)
    ]
    vb = problem.value_bounds
    if base is not None:
        R_base = base.cores[0].shape[0]
        base_cores = tuple(jnp.asarray(c, dtype) for c in base.cores)
        base_ranks = jnp.asarray(base.ranks, jnp.int32)
        # the base may be padded differently from the correction's cap;
        # its structured evaluator is built at ITS padding and shares the
        # correction's index sets (row counts are free axes)
        struct_eval_base = [
            make_structured_fiber_eval(grid, k, R_base, dtype)
            for k in range(d)
        ]

    def _eval_fibers(cores, ranks, k, left_k, right_k1):
        """Bellman backup on the structured fiber block via the amortized
        neighbor evaluator (no per-point TT gathers)."""
        if debug_identity:
            # diagnostic mode: fit the TARGET ITSELF (no Bellman backup) —
            # isolates the cross fitting/pivoting machinery from the
            # operator. An exactly-representable target must reconstruct
            # to ~f32; anything worse is a fitting defect.
            flat_idx = _build_idx(k, left_k, right_k1).reshape(-1, d)
            val = tt_gather_eval(TT(cores, ranks), flat_idx)
            return val.astype(dtype).reshape(R, shape[k], R)
        del ranks  # padded-zero cores make the products exact on their own
        n = shape[k]
        vp, vm, _ = struct_eval[k](cores, left_k, right_k1)  # [d, R, n, R]
        if base is not None:
            # back up the TOTAL value: neighbors of base + correction
            vpb, vmb, base_v0 = struct_eval_base[k](base_cores, left_k,
                                                    right_k1)
            vp, vm = vp + vpb, vm + vmb
        B = R * n * R
        flat_idx = _build_idx(k, left_k, right_k1).reshape(-1, d)
        x = grid.index_to_state(flat_idx).astype(dtype)    # [B, d]
        vn = jnp.stack([vp, vm], axis=0).reshape(2, d, B).transpose(2, 0, 1)
        if vb is not None:
            vn = jnp.clip(vn, vb[0], vb[1])
        # pin neighbor values at terminal neighbor nodes — ALL 2d neighbor
        # sets classified in one batched node_terminal call (the former
        # per-(sign, dim) loop was ~2d x 10 scatter/gather ops per core-step)
        shifted = jnp.stack(
            [jnp.stack([_shift_coord(flat_idx[:, m], m, sg, grid)
                        for m in range(d)], axis=-1)
             for sg in (1, -1)], axis=0)              # [2, B, d]
        eye_d = jnp.eye(d, dtype=bool)
        nb_all = jnp.where(eye_d[None, :, None, :],
                           shifted[:, None, :, :],
                           flat_idx[None, None, :, :])  # [2, d, B, d]
        nb_flat2 = nb_all.reshape(-1, d)
        nxs = grid.index_to_state(nb_flat2).astype(dtype)
        tmn, tvn = mca.node_terminal(problem, grid, nb_flat2, nxs)
        tmn = tmn.reshape(2, d, B).transpose(2, 0, 1)   # [B, 2, d]
        tvn = tvn.reshape(2, d, B).transpose(2, 0, 1).astype(dtype)
        vn = jnp.where(tmn, tvn, vn)

        if mesh is not None:
            # GSPMD hints: nodes shard over 'fibers' (DP); XLA partitions
            # the stencil math below and inserts ICI collectives
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("fibers", None)))
            vn = jax.lax.with_sharding_constraint(
                vn, NamedSharding(mesh, P("fibers", None, None)))

        # all-candidates stencil + cost: one drift contraction for all C
        # when the problem declares control-affine structure (MXU-batched)
        pp, pm, dtt = mca.transition_all_controls(problem, grid, x, uc)
        g = mca.stage_cost_all(problem, x, uc)             # [C, B]
        if mesh is not None and "ctrl" in mesh.axis_names:
            from jax.sharding import NamedSharding, PartitionSpec as P

            g = jax.lax.with_sharding_constraint(
                g, NamedSharding(mesh, P("ctrl", "fibers")))
        expect = jnp.sum(pp * vn[None, :, 0] + pm * vn[None, :, 1], axis=-1)
        rhs = g * dtt + jnp.exp(-problem.beta * dtt) * expect
        val = jnp.min(rhs, axis=0)
        if refine_steps > 0:
            from c3sc_tpu.solvers.ttvi import refine_controls

            u0 = uc[jnp.argmin(rhs, axis=0)]                   # [B, du]
            _, val = refine_controls(problem, grid, x, vn, u0, val,
                                     refine_steps, refine_method)
        if vb is not None:
            val = jnp.clip(val, vb[0], vb[1])
        tm, tv = mca.node_terminal(problem, grid, flat_idx, x)
        val = jnp.where(tm, tv.astype(dtype), val)
        # finite-state guarantee: a transiently singular pivot set emits a
        # huge-|G| core whose d-fold chain products overflow f32 to inf,
        # and inf - inf / 0 * inf in the next einsum turns NaN; value
        # clamping cannot catch it (clip(NaN) = NaN). Scrubbing HERE — at
        # the fitting boundary — is the one guarantee the while_loop state
        # stays finite: a scrubbed fiber value is just one bad sample the
        # next sweep re-fits (measured: 6D quadcopter 17^6 rmax=16 NaN-
        # poisoned at it 88 without this; LQ/pendulum trajectories are
        # untouched since the scrub is the identity on finite values)
        # 1e12 (not bigger): the fitting QR squares column entries — a
        # 1e20 replacement overflows the f32 norm computation itself.
        # NaN -> UPPER bound when bounds exist (r2 advisor): 0.0 can sit
        # below vb[0] for positive running costs — a spuriously LOW value
        # is optimistic and ATTRACTS the Bellman min toward the scrubbed
        # node; the pessimistic bound is self-correcting for a min.
        val = jnp.nan_to_num(val, nan=vb[1] if vb is not None else 0.0,
                             posinf=vb[1] if vb is not None else 1e12,
                             neginf=vb[0] if vb is not None else -1e12)
        if base is not None:
            # fit only the correction: w-block = (pinned, bounded) total
            # backup minus the frozen base at the block nodes (center
            # values from the structured evaluator — NOT a gather-eval)
            val = val - base_v0.reshape(-1)
        return val.astype(dtype).reshape(R, n, R)

    def one_sweep(st, tgt_cores, tgt_ranks, frozen, in_warmup,
                  self_targeted: bool):
        """One full cross sweep (L2R + R2L) fitting the Bellman backup of a
        TARGET value function.

        ``self_targeted=True`` is the original coupled scheme: the L2R half
        evaluates the backup of the sweep-entry iterate and the R2L half
        evaluates the backup of the just-fitted mid-sweep TT (Gauss-Seidel
        flavored, cheapest per sweep). ``False`` evaluates BOTH halves
        against the fixed (tgt_cores, tgt_ranks) — the reference's
        ``ftapprox_cross`` semantics where the cross target is the frozen
        previous iterate (SURVEY.md §3.1: cross per VI iteration runs
        against bellman_fiber of v_k). The frozen-target form is what keeps
        the projector error from compounding through the iteration map —
        measured on the 9^6 quadcopter, the coupled scheme's pivot/fit
        feedback floors at ~11% value error at EVERY rank cap while its
        latched-frozen operator diverges outright (res 0.05 -> 1.5)."""
        (cores_prev, ranks_prev, left, right, rl, rr, rlf, rrf,
         rows_l, rows_r) = st
        new_cores = list(cores_prev)
        new_ranks = [jnp.asarray(1, jnp.int32)] * (d + 1)

        def fit_core(qe, rows_prev, r_new, r_prev_fit, cap, s_prev):
            """Pivot rows + core for the selected scheme; returns
            (rows, G, bond_new, fit_new)."""
            if oversample <= 0:
                rows = _hysteresis_rows(qe, rows_prev, r_new, r_prev_fit,
                                        in_warmup, frozen)
                return rows, _interp_from_rows(qe, rows, r_new), r_new, r_new
            s_new = jnp.clip(
                jnp.ceil((1.0 + oversample) * r_new).astype(jnp.int32),
                r_new, jnp.minimum(cap, R))
            # a frozen sweep must hold the bond size exactly (a changed
            # sample mask re-excites the oscillation the freeze exists to
            # kill)
            s_new = jnp.where(frozen, s_prev, s_new)
            # the leverage EXTENSION must live inside the hysteresis/freeze
            # decision: recomputing it from each sweep's fresh basis made
            # the "frozen" rect operator nondeterministic — measured on the
            # 9^6 quadcopter, a latched-frozen rect solve still oscillated
            # at res 0.04-0.18 because its extension rows churned
            rows_new = _extend_rows(qe, _pivot_rows(qe, r_new), r_new, s_new)
            switch = (~frozen) & (
                in_warmup
                | (r_new != r_prev_fit)
                | (_logvol(qe, rows_new, r_new)
                   > _logvol(qe, rows_prev, r_new) + 0.4)
            )
            rows = jnp.where(switch, rows_new, rows_prev)
            return (rows, _interp_from_rows_ls(qe, rows, r_new, s_new),
                    s_new, r_new)

        # ---------------- left-to-right half sweep ----------------
        for k in range(d - 1):
            n = shape[k]
            vals = _eval_fibers(tgt_cores, tgt_ranks, k, left[k], right[k + 1])
            row_mask = jnp.repeat((jnp.arange(R) < rl[k]), n).astype(dtype)
            col_mask = (jnp.arange(R) < rr[k + 1]).astype(dtype)
            C = vals.reshape(R * n, R) * row_mask[:, None] * col_mask[None, :]
            cap_k = jnp.minimum(rl[k] * n, bond_cap[k + 1])
            # with oversampling the fit rank must leave room for its
            # extended sample rows within the static padding
            cap_fit = jnp.minimum(cap_k, fit_cap)
            qe, r_need, r_new = _orth_basis_and_rank(
                C, noise_l2r[k], eps_rank, kick, cap_fit, row_mask,
                rlf[k + 1], frozen,
            )
            rows, G, bond_new, fit_new = fit_core(qe, rows_l[k], r_new,
                                                  rlf[k + 1], cap_k,
                                                  rl[k + 1])
            rows_l = rows_l.at[k].set(rows)
            rlf = rlf.at[k + 1].set(fit_new)
            new_cores[k] = G.reshape(R, n, R)
            a, i = rows // n, rows % n
            newleft = jnp.where(
                dimcol[None, :] < k, left[k][a],
                jnp.where(dimcol[None, :] == k, i[:, None], 0),
            ).astype(jnp.int32)
            left = left.at[k + 1].set(newleft)
            rl = rl.at[k + 1].set(bond_new)
            new_ranks[k + 1] = bond_new
        # last core: direct evaluation
        n = shape[d - 1]
        vals = _eval_fibers(tgt_cores, tgt_ranks, d - 1, left[d - 1], right[d])
        row_mask = jnp.repeat((jnp.arange(R) < rl[d - 1]), n).astype(dtype)
        C = vals.reshape(R * n, R) * row_mask[:, None]
        C = C * (jnp.arange(R) < 1).astype(dtype)[None, :]
        new_cores[d - 1] = C.reshape(R, n, R)
        ranks_mid = jnp.stack(
            [jnp.asarray(1, jnp.int32)] + [rl[k + 1] for k in range(d - 1)]
            + [jnp.asarray(1, jnp.int32)]
        )
        # mid-sweep TT (left-interpolatory)
        cores_mid = tuple(new_cores)
        if self_targeted:
            r2l_cores, r2l_ranks = cores_mid, ranks_mid
        else:
            r2l_cores, r2l_ranks = tgt_cores, tgt_ranks

        # ---------------- right-to-left half sweep ----------------
        for k in range(d - 1, 0, -1):
            n = shape[k]
            vals = _eval_fibers(r2l_cores, r2l_ranks, k, left[k], right[k + 1])
            # rows = (i, b), cols = a
            M = vals.transpose(1, 2, 0).reshape(n * R, R)
            row_mask = jnp.tile((jnp.arange(R) < rr[k + 1]), n).astype(dtype)
            col_mask = (jnp.arange(R) < rl[k]).astype(dtype)
            M = M * row_mask[:, None] * col_mask[None, :]
            cap_k = jnp.minimum(rr[k + 1] * n, bond_cap[k])
            cap_fit = jnp.minimum(cap_k, fit_cap)
            qe, r_need, r_new = _orth_basis_and_rank(
                M, noise_r2l[k], eps_rank, kick, cap_fit, row_mask,
                rrf[k], frozen,
            )
            rows, G, bond_new, fit_new = fit_core(qe, rows_r[k], r_new,
                                                  rrf[k], cap_k, rr[k])
            rows_r = rows_r.at[k].set(rows)
            rrf = rrf.at[k].set(fit_new)
            # core k: [c, i, b] = G[(i, b), c]
            new_cores[k] = G.reshape(n, R, R).transpose(2, 0, 1)
            i, b = rows // R, rows % R
            newright = jnp.where(
                dimcol[None, :] > k, right[k + 1][b],
                jnp.where(dimcol[None, :] == k, i[:, None], 0),
            ).astype(jnp.int32)
            right = right.at[k].set(newright)
            rr = rr.at[k].set(bond_new)
            new_ranks[k] = bond_new
        # first core: direct evaluation against new right sets
        n = shape[0]
        vals = _eval_fibers(r2l_cores, r2l_ranks, 0, left[0], right[1])
        col_mask = (jnp.arange(R) < rr[1]).astype(dtype)
        C0 = vals[:1] * col_mask[None, None, :]  # row 0 only
        new_cores[0] = jnp.concatenate(
            [C0, jnp.zeros((R - 1, n, R), dtype)], axis=0
        )
        new_ranks[0] = jnp.asarray(1, jnp.int32)
        new_ranks[d] = jnp.asarray(1, jnp.int32)
        ranks_new = jnp.stack(new_ranks)
        return (tuple(new_cores), ranks_new, left, right, rl, rr, rlf, rrf,
                rows_l, rows_r)

    def body(carry: FusedCarry) -> FusedCarry:
        # Adaptation freeze — two triggers:
        # (1) residual gate: stop pivot/rank adaptation while the previous
        #     iteration's sample residual is below freeze_res (transient,
        #     self-correcting — resumes if the residual climbs back).
        # (2) sticky plateau latch (carry.frozen): when the windowed
        #     long-residual fails to improve for `freeze_after` consecutive
        #     windows, adaptation has stopped progressing — at a SATURATED
        #     rank cap the pivot reselection noise alone floors the
        #     residual at 3e-2..1e-1 (measured, pendulum 61^2 rmax=12:
        #     identical churn on CPU and TPU, so not an arithmetic issue).
        #     Latching the freeze turns the sweep into a deterministic
        #     interpolated Bellman operator that contracts to ITS fixed
        #     point (within truncation error of the best attainable). The
        #     latch releases only on divergence (long_res > 2x its value at
        #     engagement) — an unconditional scheduled freeze mid-churn
        #     diverged (residual 0.39 -> 37 on TPU), so the plateau
        #     precondition + divergence exit are both essential.
        # emergency release EVERY iteration: a latched freeze whose
        # operator turns out unstable grows the residual geometrically —
        # it must unlatch before values overflow (NaN comparisons are all
        # False, so a NaN-poisoned state can never exit via the boundary
        # test; measured: LQ rmax=10 latched at res 2.6e-3 and went NaN
        # within 32 sweeps)
        emergency = carry.frozen & (
            ~jnp.isfinite(carry.residual)
            | (carry.residual > 10.0 * freeze_res)
        )
        frozen_latch = carry.frozen & ~emergency
        frozen = frozen_latch | (carry.residual < freeze_res)
        in_warmup = carry.it < carry.warm_until
        st = (carry.cores, carry.ranks, carry.left, carry.right,
              carry.rl, carry.rr, carry.rlf, carry.rrf,
              carry.rows_l, carry.rows_r)
        if target_mode == "frozen":
            # reference semantics: all fiber evaluations across the
            # n_inner sweeps target the backup of the SWEEP-ENTRY iterate;
            # inner sweeps only refine index sets/ranks for that fixed
            # target (classic cross-on-a-static-function, which converges
            # where the coupled scheme churns)
            for _ in range(n_inner):
                st = one_sweep(st, carry.cores, carry.ranks, frozen,
                               in_warmup, self_targeted=False)
        else:
            st = one_sweep(st, carry.cores, carry.ranks, frozen,
                           in_warmup, self_targeted=True)
        (new_cores, ranks_new, left, right, rl, rr, rlf, rrf,
         rows_l, rows_r) = st
        new_cores = list(new_cores)

        v_new = TT(tuple(new_cores), ranks_new)
        new_sample = tt_gather_eval(v_new, sample_idx)
        # a transiently singular pivot set emits a huge-|G| core; its chain
        # products can overflow the SAMPLED values to inf and the residual
        # to inf/inf = NaN, which halts the while_loop (NaN compares
        # False). The fitted fiber values are already scrubbed; the sample
        # vector needs the same guarantee. (Clipping G itself was tried
        # and degraded healthy solves — see _interp_from_rows.)
        new_sample = jnp.nan_to_num(
            new_sample,
            nan=vb[1] if vb is not None else 0.0,  # pessimistic (see above)
            posinf=vb[1] if vb is not None else 1e12,
            neginf=vb[0] if vb is not None else -1e12,
        )
        scale = jnp.maximum(jnp.max(jnp.abs(new_sample)), 1e-12)
        residual = jnp.max(jnp.abs(new_sample - carry.v_sample)) / scale
        # windowed long-baseline residual (robust to per-iteration pivot noise)
        at_boundary = jnp.mod(carry.it + 1, window) == 0
        long_new = jnp.max(jnp.abs(new_sample - carry.sample_ref)) / scale
        # improvement = beating the BEST window so far (monotone baseline):
        # an oscillating churn floor (long_res bouncing 0.05 <-> 0.1) must
        # count as stalled, not as improvement every other window — with the
        # last-window baseline the stall patience never fired mid-churn and
        # neither the freeze latch nor rank-cap growth could engage.
        # improvement/stall tracking runs on the ABSOLUTE windowed
        # displacement, not the relative one: a transiently blown-up
        # iterate (samples ~1e6) scores a deceptively small RELATIVE
        # displacement, poisoning the monotone baseline so genuine
        # recovery windows read as "no improvement" and patience fires
        # mid-recovery (measured on 31^2 LQ seed matrix: one seed stopped
        # at rel err 1.16 that way). best_long (relative) is still
        # tracked for the freeze logic and diagnostics.
        abs_disp = jnp.max(jnp.abs(new_sample - carry.sample_ref))
        improved = abs_disp < carry.best_absdisp * 0.98
        best_long = jnp.where(
            at_boundary, jnp.minimum(carry.best_long, long_new),
            carry.best_long)
        best_absdisp = jnp.where(
            at_boundary, jnp.minimum(carry.best_absdisp, abs_disp),
            carry.best_absdisp)
        wstall = jnp.where(
            at_boundary, jnp.where(improved, 0, carry.wstall + 1), carry.wstall
        )
        # sticky freeze latch: engage after `freeze_after` stalled windows
        # (adaptation plateaued); release on divergence under the freeze.
        # Both transitions reset wstall so the new regime gets fresh
        # stopping patience.
        # Entry at UNSATURATED ranks is unconditional on the residual
        # level. At a SATURATED cap the pivots carry O(truncation)
        # interpolation error and the frozen operator can have spectral
        # radius > 1 when that truncation is large (measured: freeze at
        # saturated rmax=12 from res 5e-2 diverged 0.05 -> 0.97 before the
        # exit fired) — but a saturated stall at LOW residual
        # (< freeze_res) is the cap == epsilon-rank regime, where pivot
        # churn is f32 noise and only which LINEAGE settles is seed-
        # dependent; freezing there converges it deterministically
        # (measured on 41^2 pendulum rmax=16: the key(0) lineage churned
        # at 4e-3 for 2500 iterations, frozen it converges to tol). Large-
        # truncation saturation stays excluded and is handled by rank-cap
        # GROWTH in fused_tt_vi instead.
        unsaturated = jnp.max(ranks_new) < R
        enter_stall = (at_boundary & (~frozen_latch)
                       & (wstall >= freeze_after)
                       & (unsaturated | (long_new < freeze_res)))
        # (a residual-dip latch entry was tried and REVERTED: latching on
        # transient dips destabilized configs the per-iteration gate
        # handled — LQ rmax=10 went NaN, pendulum rmax=24 parity regressed;
        # the transient gate plus the plateau latch below are sufficient)
        enter = enter_stall
        leave = (
            at_boundary & frozen_latch
            & (long_new > 2.0 * carry.freeze_mark)
            & (long_new > freeze_res)
        )
        frozen_next = (frozen_latch | enter) & ~leave
        freeze_mark = jnp.where(
            enter, jnp.maximum(long_new, 1e-12), carry.freeze_mark)
        wstall = jnp.where(enter | leave, 0, wstall)
        long_res = jnp.where(at_boundary, long_new, carry.long_res)
        sample_ref = jnp.where(at_boundary, new_sample, carry.sample_ref)
        if probe_rollouts > 0:
            pc = jax.lax.cond(
                at_boundary,
                lambda: _probe_cost(v_new),
                lambda: jnp.asarray(jnp.inf, dtype),
            )
            is_best = pc < carry.best_cost
            best_cost = jnp.where(is_best, pc, carry.best_cost)
            cores_best = tuple(
                jnp.where(is_best, nc, cb)
                for nc, cb in zip(new_cores, carry.cores_best)
            )
            ranks_best = jnp.where(is_best, ranks_new, carry.ranks_best)
            probe_cost_out = jnp.where(at_boundary, pc, carry.probe_cost)
        else:
            # no probe: harvest the iterate with the smallest ABSOLUTE
            # windowed displacement (the contraction-mapping error proxy:
            # ||v_k - v*|| <= ||T v_k - v_k|| / (1 - gamma)). In the churn
            # regime (cap off the problem's epsilon-rank; which lineages
            # churn is SEED-dependent) the final iterate can sit on an
            # oscillation far from the fixed point — measured on 31^2 LQ at
            # rmax 10: final-iterate error across 6 seeds ranged 0.07..243x
            # the value scale; harvest brings every seed to 0.06..0.10.
            # ABSOLUTE, not relative-to-current-scale: a blown-up iterate
            # (samples ~1e6) scores a small RELATIVE displacement and
            # out-ranked healthy windows (measured err 1556x from exactly
            # that selection) — absolute displacement ranks it last.
            is_best = at_boundary & (abs_disp < carry.best_absdisp)
            best_cost = carry.best_cost
            cores_best = tuple(
                jnp.where(is_best, nc, cb)
                for nc, cb in zip(new_cores, carry.cores_best)
            )
            ranks_best = jnp.where(is_best, ranks_new, carry.ranks_best)
            probe_cost_out = carry.probe_cost
        return FusedCarry(
            cores=tuple(new_cores), ranks=ranks_new, left=left, right=right,
            rl=rl, rr=rr, rlf=rlf, rrf=rrf, rows_l=rows_l, rows_r=rows_r,
            it=carry.it + 1, residual=residual,
            long_res=long_res, wstall=wstall, v_sample=new_sample,
            sample_ref=sample_ref, probe_cost=probe_cost_out,
            best_cost=best_cost, cores_best=cores_best, ranks_best=ranks_best,
            frozen=frozen_next, freeze_mark=freeze_mark,
            best_long=best_long, best_absdisp=best_absdisp,
            warm_until=carry.warm_until,
        )

    def init_fn(key, v0: TT | None = None) -> FusedCarry:
        if v0 is None:
            cores = tuple(jnp.zeros((R, n, R), dtype) for n in shape)
            ranks = jnp.ones(d + 1, jnp.int32)
        else:
            cores, ranks = v0.cores, v0.ranks
        # seed the initial cross pivot sets from the caller's key so
        # batched "independent solves" (parallel/multi_solve.py) explore
        # genuinely different pivot lineages per instance (the r2 dead-key
        # finding: the key used to be stored in the carry and never read,
        # while every instance started from one fixed host seed)
        if key is None:
            seed = 999
        else:
            kd = (jax.random.key_data(key)
                  if jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key)
                  else key)  # old-style uint32 keys have no key_data
            seed = int(np.asarray(kd).ravel()[-1])
        host_rng = np.random.default_rng(seed)
        def distinct_rows(dims):
            """[R, len(dims)] multi-indices with DISTINCT tuples. Duplicate
            pivot rows make the initial cross submatrix exactly singular and
            can latch a churning lineage the rank-adaptive sweep never
            escapes — measured on 31^2 LQ: iid-uniform init diverges
            outright for some seeds (rel err 2.6 at rmax 10) while distinct
            rows converge for every seed tried."""
            space = 1
            for j in dims:
                space *= shape[j]
            rows = np.stack([host_rng.integers(0, shape[j], size=R)
                             for j in dims], axis=-1)
            if space < R:
                return rows  # tiny space: duplicates unavoidable
            for _ in range(64):
                flat = np.ravel_multi_index(
                    rows.T, [shape[j] for j in dims])
                _, first = np.unique(flat, return_index=True)
                dup = np.setdiff1d(np.arange(R), first)
                if dup.size == 0:
                    break
                rows[dup] = np.stack(
                    [host_rng.integers(0, shape[j], size=dup.size)
                     for j in dims], axis=-1)
            return rows

        left = np.zeros((d + 1, R, d), np.int32)
        right = np.zeros((d + 1, R, d), np.int32)
        for k in range(1, d):
            left[k, :, :k] = distinct_rows(range(k))
            right[k, :, k:] = distinct_rows(range(k, d))
        r0 = np.ones(d + 1, np.int32) * min(3, R)
        r0[0] = r0[d] = 1
        v_sample = tt_gather_eval(TT(cores, ranks), sample_idx)
        return FusedCarry(
            cores=cores, ranks=ranks,
            left=jnp.asarray(left), right=jnp.asarray(right),
            rl=jnp.asarray(r0), rr=jnp.asarray(r0),
            rlf=jnp.asarray(r0), rrf=jnp.asarray(r0),
            rows_l=jnp.zeros((d, R), jnp.int32),
            rows_r=jnp.zeros((d, R), jnp.int32),
            it=jnp.asarray(0, jnp.int32),
            residual=jnp.asarray(jnp.inf, dtype),
            long_res=jnp.asarray(jnp.inf, dtype),
            wstall=jnp.asarray(0, jnp.int32), v_sample=v_sample,
            sample_ref=v_sample,
            probe_cost=jnp.asarray(jnp.inf, dtype),
            best_cost=jnp.asarray(jnp.inf, dtype),
            cores_best=cores, ranks_best=ranks,
            frozen=jnp.asarray(False),
            freeze_mark=jnp.asarray(jnp.inf, dtype),
            best_long=jnp.asarray(jnp.inf, dtype),
            best_absdisp=jnp.asarray(jnp.inf, dtype),
            warm_until=jnp.asarray(60, jnp.int32),
        )

    # under the freeze the iteration is a FIXED interpolation operator:
    # it either contracts to tol within a few windows (abs displacement
    # halving keeps resetting wstall) or it has hit its lineage's refit-
    # noise floor and further iterations are pure waste (measured on 41^2
    # pendulum: a frozen lineage sat at res 6e-3 for 800+ iterations).
    # Stopping early there hands the remaining budget to a fresh-lineage
    # restart in fused_tt_vi. The UNFROZEN stall patience stays the
    # caller's: capping it was tried and REVERTED — churn-phase "snap"
    # times are heavy-tailed (one key snapped to tol after 17 stalled
    # windows) and a 12-window cap killed that run's snap while its warm
    # restarts re-floored in the same basin.
    frozen_patience = min(patience, 6)

    def cond(c):
        return (
            (c.it < max_iters)
            & (c.residual > tol)
            & (c.long_res > tol)
            & (c.wstall < jnp.where(c.frozen, frozen_patience, patience))
        )

    @jax.jit
    def solve_fn(carry: FusedCarry) -> FusedCarry:
        return jax.lax.while_loop(cond, body, carry)

    @jax.jit
    def step_fn(carry: FusedCarry, n_iters: int = 1) -> FusedCarry:
        return jax.lax.fori_loop(0, n_iters, lambda _, c: body(c), carry)

    @jax.jit
    def run_fn(carry: FusedCarry, n_iters: int = 1) -> FusedCarry:
        """Up to n_iters iterations with solve_fn's stopping conditions —
        the chunked driver behind per-window metrics + mid-run checkpoints
        (the reference's ``struct Diag`` contract, SURVEY.md §5)."""
        limit = carry.it + n_iters
        return jax.lax.while_loop(
            lambda c: cond(c) & (c.it < limit), body, carry
        )

    return FusedSolver(solve_fn, init_fn, step_fn, run_fn)


@dataclasses.dataclass
class FusedVISolution:
    v: TT
    residual: float
    iterations: int
    wall_time: float
    carry: FusedCarry
    controls: np.ndarray
    probe_cost: float = float("inf")


def pad_fused_carry(carry: FusedCarry, R_new: int) -> FusedCarry:
    """Zero-pad a FusedCarry to a larger rank cap (cores keep the padded-
    zero invariant, so TT products are unchanged; index sets and pivot rows
    pad with zeros — callers that continue adaptation at the new cap,
    i.e. the growth path in ``fused_tt_vi``, re-draw them via ``init_fn``
    anyway, and masked rows are inert)."""
    R_old = carry.cores[0].shape[0]
    if R_new == R_old:
        return carry
    assert R_new > R_old, (R_old, R_new)
    dR = R_new - R_old

    def padcore(c):
        return jnp.pad(c, ((0, dR), (0, 0), (0, dR)))

    return carry._replace(
        cores=tuple(padcore(c) for c in carry.cores),
        cores_best=tuple(padcore(c) for c in carry.cores_best),
        left=jnp.pad(carry.left, ((0, 0), (0, dR), (0, 0))),
        right=jnp.pad(carry.right, ((0, 0), (0, dR), (0, 0))),
        rows_l=jnp.pad(carry.rows_l, ((0, 0), (0, dR))),
        rows_r=jnp.pad(carry.rows_r, ((0, 0), (0, dR))),
    )


def fused_tt_vi(
    problem: ControlProblem,
    grid: Grid,
    controls=None,
    n_controls: int = 9,
    rmax: int = 16,
    rmax_max: int | None = None,
    key=None,
    tol: float = 1e-4,
    max_iters: int = 2000,
    kick: int = 2,
    eps_rank: float = 1e-4,
    sample_size: int = 256,
    window: int = 50,
    patience: int = 6,
    freeze_after: int = 2,
    probe_rollouts: int = 0,
    probe_steps: int = 200,
    probe_dt: float = 0.01,
    probe_x0=None,
    dtype=jnp.float32,
    v0: TT | None = None,
    carry: FusedCarry | None = None,
    mesh=None,
    refine_steps: int = 0,
    refine_method: str = "pgd",
    target_mode: str = "self",
    n_inner: int = 1,
    base: TT | None = None,
    oversample: float = 0.0,
    metrics=None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
    resume_from: str | None = None,
    log_every: int = 0,
) -> FusedVISolution:
    """One-call fused VI solve (single XLA program, zero host round-trips).

    ``mesh``: optional device mesh — shards the Bellman fiber block over
    the 'fibers' (and optional 'ctrl') axes; see ``make_fused_vi``.

    Observability + failure recovery (reference ``struct Diag`` +
    checkpoint-restart, SURVEY.md §5): when ``metrics`` (a
    ``MetricsLogger``), ``checkpoint_path`` or ``log_every`` is given the
    solve runs in on-device chunks of ``log_every`` iterations (default:
    the stopping ``window``) via ``run_fn`` — identical stopping semantics,
    one host sync per chunk — emitting per-chunk records (iteration,
    residual, long-window residual, active ranks, probe cost) and saving a
    resumable full-state checkpoint every ``checkpoint_every`` iterations.
    ``resume_from`` restores a saved ``FusedCarry`` and continues.

    ``rmax_max``: enables RANK-CAP GROWTH (the reference's kick-rank
    semantics — C3's cross grows ranks until the approximation stops
    improving, SURVEY.md §2.2; the §7 plan: "re-jit only when r_max grows,
    geometric schedule"). When a solve stalls with its active ranks
    saturating the current cap, the solver rebuilds at
    ``min(rmax_max, rmax + max(2*kick, 4))``, zero-pads the carry, and
    continues — one recompile per growth step. Steps are small and
    additive: caps far beyond the problem's epsilon-rank fit f32 noise
    columns and churn as badly as starved ones."""
    if key is None:
        key = jax.random.key(0)
    if controls is None:
        controls = problem.control_candidates(n_controls)

    def build(R):
        return make_fused_vi(
            problem, grid, controls, rmax=R, kick=kick, eps_rank=eps_rank,
            tol=tol, max_iters=max_iters, sample_size=sample_size,
            window=window, patience=patience, freeze_after=freeze_after,
            probe_rollouts=probe_rollouts,
            probe_steps=probe_steps, probe_dt=probe_dt, probe_x0=probe_x0,
            dtype=dtype, mesh=mesh,
            refine_steps=refine_steps, refine_method=refine_method,
            target_mode=target_mode, n_inner=n_inner, base=base,
            oversample=oversample,
        )

    cur_rmax = rmax
    solver = build(cur_rmax)
    if resume_from is not None:
        from c3sc_tpu.utils.checkpoint import fused_context, load_fused_carry

        carry = load_fused_carry(
            resume_from, expect=fused_context(problem, grid, cur_rmax))
        ck_R = carry.cores[0].shape[0]
        if ck_R != cur_rmax:
            cur_rmax = ck_R
            solver = build(cur_rmax)
    if carry is None:
        if v0 is not None:
            from c3sc_tpu.ops.tt import _concrete_ranks, _repad

            R_v0 = v0.cores[0].shape[0]
            if R_v0 != cur_rmax:
                # warm-start values may come from a run at a different cap
                # (CLI --load vf.npz); normalize the static padding. Down-
                # padding is lossless only if the active ranks fit.
                cr = _concrete_ranks(v0)
                if R_v0 > cur_rmax and cr is not None and cr.max() > cur_rmax:
                    raise ValueError(
                        f"v0 has active ranks up to {int(cr.max())} but "
                        f"rmax={cur_rmax}; raise rmax (or rmax_max)")
                v0 = _repad(v0, cur_rmax)
        carry = solver.init_fn(key, v0)
    else:
        # fresh stopping state for the warm restart
        carry = carry._replace(
            wstall=jnp.zeros_like(carry.wstall),
            long_res=jnp.full_like(carry.long_res, jnp.inf),
            best_long=jnp.full_like(carry.best_long, jnp.inf),
            best_absdisp=jnp.full_like(carry.best_absdisp, jnp.inf),
        )
    chunked = metrics is not None or checkpoint_path is not None or log_every > 0

    def drive(solver, carry):
        if not chunked:
            out = solver.solve_fn(carry)
            jax.block_until_ready(out.residual)
            return out
        chunk = log_every if log_every > 0 else window
        out = carry
        last_saved = int(jax.device_get(out.it))
        while True:
            prev_it = int(jax.device_get(out.it))
            out = solver.run_fn(out, chunk)
            jax.block_until_ready(out.residual)
            it = int(out.it)
            if it == prev_it:
                # stopping condition already met on entry (incl. NaN
                # residual, whose comparisons are all False) — done
                break
            if metrics is not None:
                rec = dict(
                    iter=it,
                    residual=float(out.residual),
                    long_res=float(out.long_res),
                    wstall=int(out.wstall),
                    frozen=bool(out.frozen),
                    ranks=[int(r) for r in np.asarray(out.ranks)],
                )
                if probe_rollouts > 0:
                    rec["probe_cost"] = float(out.probe_cost)
                    rec["best_cost"] = float(out.best_cost)
                metrics.log("fused_vi", **rec)
            if checkpoint_path is not None and checkpoint_every > 0 and (
                it - last_saved >= checkpoint_every
            ):
                from c3sc_tpu.utils.checkpoint import (fused_context,
                                                       save_fused_carry)

                save_fused_carry(checkpoint_path, out,
                                 context=fused_context(problem, grid,
                                                       cur_rmax))
                last_saved = it
            stop = (
                it >= max_iters
                or float(out.residual) <= tol
                or float(out.long_res) <= tol
                or int(out.wstall) >= (min(patience, 6) if bool(out.frozen)
                                       else patience)
            )
            if stop:
                break
        return out

    t0 = time.time()
    best_out, best_metric = None, float("inf")
    lineage_retries = 0
    # cross-stage probe harvest: the best-by-realized-cost iterate must
    # survive growth (each stage's init_fn resets best_cost/cores_best)
    gbest_cost, gbest_cores, gbest_ranks = float("inf"), None, None
    while True:
        out = drive(solver, carry)
        if probe_rollouts > 0 and float(out.best_cost) < gbest_cost:
            gbest_cost = float(out.best_cost)
            gbest_cores, gbest_ranks = out.cores_best, out.ranks_best
        # stage quality = best ABSOLUTE windowed displacement it reached
        # (monotone; scale-robust — see the body() improvement comment)
        metric = float(out.best_absdisp)
        improving = metric < 0.8 * best_metric
        if best_out is None or metric < best_metric:
            best_out, best_metric = out, min(metric, best_metric)
        saturated = int(np.max(np.asarray(out.ranks))) >= cur_rmax
        unconverged = (
            float(out.residual) > tol and float(out.long_res) > tol
            and int(out.it) < max_iters
        )
        if (rmax_max is not None and cur_rmax < rmax_max
                and saturated and unconverged and improving):
            # small additive steps: overshooting the problem's epsilon-
            # rank is as bad as undershooting (caps beyond it fit f32
            # noise columns and the pivot churn returns — measured on the
            # 61^2 pendulum: rank 20 converges, rank 24 churns)
            new_R = min(rmax_max, cur_rmax + max(2 * kick, 4))
            if metrics is not None:
                metrics.log("fused_rank_growth", rmax_from=cur_rmax,
                            rmax_to=new_R, iter=int(out.it),
                            residual=float(out.residual))
            solver = build(new_R)
            # fresh cross state, warm VALUE: carrying the churned pivot/
            # index lineage into the grown cap measurably underperforms a
            # fresh adaptation started from the current value (the padded
            # carry kept stalling where fresh solves at the same cap
            # converge); init_fn re-draws index sets and re-adapts within
            # a few hundred iterations
            padded = pad_fused_carry(out, new_R)
            key, sk = jax.random.split(key)
            carry = solver.init_fn(
                sk, TT(padded.cores, padded.ranks))._replace(
                it=out.it, warm_until=out.it + 60)
            cur_rmax = new_R
            continue
        if unconverged and lineage_retries < 8:
            # same-cap lineage RESTART: which pivot lineage a cross solve
            # settles into is seed-dependent, and a bad one floors above
            # tol even under the freeze (measured on 41^2 pendulum rmax=16:
            # 3 of 4 keys converge to 2e-4, one floors at 6e-3). Re-drawing
            # the index sets warm-started on the harvested best iterate
            # re-rolls the lineage within the same max_iters budget (the
            # frozen-floor early stop above is what leaves budget for it).
            lineage_retries += 1
            if metrics is not None:
                metrics.log("fused_lineage_restart", iter=int(out.it),
                            retry=lineage_retries,
                            residual=float(out.residual))
            key, sk = jax.random.split(key)
            # alternate warm / cold retries: a warm start (harvested best
            # value) converges fastest when the PIVOTS were the problem,
            # but when the harvested value itself carries the floor the
            # fresh lineage freezes onto it within two windows and every
            # warm retry inherits the same basin (measured: 8 warm retries
            # all refloored at 3e-3). Cold retries are independent draws.
            warm = (TT(out.cores_best, out.ranks_best)
                    if lineage_retries % 2 == 1 else None)
            carry = solver.init_fn(sk, warm)._replace(
                it=out.it, warm_until=out.it + 60)
            continue
        break
    # the on-disk resumable state must reflect the LATEST progress, not the
    # returned (possibly earlier best) stage — save before any rollback
    if chunked and checkpoint_path is not None:
        from c3sc_tpu.utils.checkpoint import (fused_context,
                                               save_fused_carry)

        save_fused_carry(checkpoint_path, out,
                         context=fused_context(problem, grid, cur_rmax))
    # a grown stage that failed to pay (best_long not improved 20%) means
    # the cap overshot the problem's epsilon-rank — return the BEST stage's
    # iterate, not the last one
    if best_out is not None and float(best_out.best_absdisp) < float(out.best_absdisp):
        out = best_out
    # re-attach the cross-stage probe harvest (pad to the returned cap)
    if probe_rollouts > 0 and gbest_cores is not None and (
        gbest_cost < float(out.best_cost)
    ):
        from c3sc_tpu.ops.tt import _repad

        R_out = out.cores[0].shape[0]
        R_g = gbest_cores[0].shape[0]
        if R_g > R_out:
            # harvest came from a LARGER-cap stage than the rolled-back
            # best stage: pad the whole carry up so cores/cores_best stay
            # consistent (a mixed-padding carry fails at trace on resume)
            out = pad_fused_carry(out, R_g)
        elif R_g < R_out:
            gbest = _repad(TT(gbest_cores, gbest_ranks), R_out)
            gbest_cores = gbest.cores
        out = out._replace(
            best_cost=jnp.asarray(gbest_cost, out.best_cost.dtype),
            cores_best=gbest_cores, ranks_best=gbest_ranks,
        )
    # WINNER'S-CURSE GUARD (measured on the 31^6 quadcopter): the in-loop
    # probe SELECTS the best iterate over ~dozens of window boundaries on
    # one fixed-seed batch; the winning score overfits that seed — a
    # harvest scoring 8.6 evaluated 73% worse on an independent rollout
    # set than one scoring 10.3. A final VALIDATION probe on a fresh seed
    # and a 4x batch chooses between just two candidates (harvested vs
    # final iterate), bounding the selection bias, and the reported
    # probe_cost becomes an unbiased estimate of the returned policy. The
    # validation horizon is 2x probe_steps: the in-loop probe's horizon
    # systematically underestimates discounted exit costs that materialize
    # just past it (measured: an iterate scoring 12.4 at 250 steps cost
    # 29.0 at 400 — late exits were invisible to the selection).
    if probe_rollouts > 0:
        from c3sc_tpu.ops.tt import tt_lerp_eval as _tle
        from c3sc_tpu.sim.integrators import rollout as _roll
        from c3sc_tpu.sim.policy import make_implicit_policy as _mip

        # seed MUST differ from the in-loop probe's (4242): with the same
        # seed the first probe_rollouts validation states are byte-
        # identical to the selection batch and the winner's curse leaks
        # straight back into the "unbiased" estimate
        vrng = np.random.default_rng(987654321)
        lbn, ubn = np.asarray(problem.lb), np.asarray(problem.ub)
        if probe_x0 is None:
            mid, span = (lbn + ubn) / 2, (ubn - lbn) / 2
            vx0 = mid + 0.5 * span * vrng.uniform(
                -1, 1, (4 * probe_rollouts, problem.dx))
        else:
            px = np.asarray(probe_x0)
            vx0 = px[vrng.integers(0, px.shape[0], 4 * probe_rollouts)]
            vx0 = vx0 + 0.05 * (ubn - lbn) * vrng.uniform(-1, 1, vx0.shape)
        # keep validation starts inside the box: a jittered point past an
        # ABSORB face dies at step 0 and charges a spurious exit cost
        vx0 = np.clip(vx0, lbn, ubn)
        vx0 = jnp.asarray(vx0, dtype)
        vkey = jax.random.key(271828)

        def _vcost(cores, ranks):
            vtt = TT(cores, ranks)
            if base is not None:
                vfn = lambda p: _tle(vtt, grid, p) + _tle(base, grid, p)
            else:
                vfn = lambda p: _tle(vtt, grid, p)
            pol = _mip(problem, grid, vfn, jnp.asarray(controls, dtype))
            tr = _roll(problem, grid, pol, vx0, vkey, probe_dt,
                       2 * probe_steps, policy_every=2)
            return float(np.asarray(tr.cost).mean())

        c_harvest = _vcost(out.cores_best, out.ranks_best)
        c_final = _vcost(out.cores, out.ranks)
        if metrics is not None:
            metrics.log("fused_validation_probe",
                        harvested=c_harvest, final=c_final)
        if c_final < c_harvest:
            out = out._replace(cores_best=out.cores, ranks_best=out.ranks,
                               best_cost=jnp.asarray(c_final, dtype))
        else:
            out = out._replace(best_cost=jnp.asarray(c_harvest, dtype))
    wall = time.time() - t0
    if probe_rollouts == 0 and (
        float(out.residual) <= tol or float(out.long_res) <= tol
    ):
        # converged: return the final iterate — it carries up to window-1
        # iterations of progress past the last harvest boundary. The
        # harvested snapshot is only returned for a run that STOPPED
        # unconverged (patience/max_iters — the churn regime), where it is
        # the measured save (see body()).
        out = out._replace(cores_best=out.cores, ranks_best=out.ranks)
    # cores_best: probe-harvested best iterate when probing, best-residual
    # harvest (or final, above) otherwise
    v = TT(out.cores_best, out.ranks_best)
    return FusedVISolution(
        v=v, residual=float(out.residual), iterations=int(out.it),
        wall_time=wall, carry=out, controls=np.asarray(controls),
        probe_cost=float(out.best_cost),
    )


def fused_tt_vi_refined(
    problem: ControlProblem,
    grid: Grid,
    controls=None,
    n_controls: int = 9,
    rounds: int = 2,
    rmax: int = 16,
    total_round_tol: float = 1e-6,
    key=None,
    **kw,
) -> FusedVISolution:
    """Residual-corrected fused VI — iterative refinement over the cross
    projector's error floor.

    A single projected solve's fixed point carries the cross fit error
    amplified by ~1/(1 - gamma_eff): measured on the 9^6 quadcopter at
    rank 32, a one-shot cross fit of the backup reaches q95 ~0.8% of the
    value range (2x the SVD-optimal 0.38%), but the solve floors at ~11% —
    a ~14x amplification no per-sweep accuracy can close. Because the
    cross fit error is RELATIVE to the fitted function's own scale, solving
    the residual equation

        w_i = T(vbar_i + w_i) - vbar_i,   vbar_{i+1} = vbar_i + w_i

    with the SAME solver contracts the total error by the same amplified-
    fit factor per round (~7x/round measured). The total is accumulated
    exactly (block-diagonal tt_add at growing padding) and compressed with
    one final TT-round. The reference has no analogue — C3's cross simply
    floors (SURVEY.md §2.2); this is the TPU build's answer to the 6D
    parity requirement (BASELINE.json north_star <=1%; VERDICT r2 next #1).

    ``rounds``: number of correction solves after the base solve. ``kw``
    is passed to every ``fused_tt_vi`` call (probe_rollouts, tol, mesh,
    target_mode, ...).
    """
    if key is None:
        key = jax.random.key(0)
    if controls is None:
        controls = problem.control_candidates(n_controls)
    keys = jax.random.split(key, rounds + 1)
    sol = fused_tt_vi(problem, grid, controls=controls, rmax=rmax,
                      key=keys[0], **kw)
    total = sol.v
    iters = sol.iterations
    walls = sol.wall_time
    from c3sc_tpu.ops.tt import _repad, tt_add, tt_round
    from c3sc_tpu.solvers.ttvi import bellman_residual_sample

    bres, bscale = bellman_residual_sample(problem, grid, controls, total)
    # accept/reject on the UNNORMALIZED sup|Tv - v| (r3 advisor): each
    # candidate's relative residual is normalized by its OWN scale, so a
    # poisoned correction that inflates max|v| deflates its relative
    # residual — exactly the overshooting-w failure this guard exists for
    bres_abs = float(bres) * float(bscale)
    history = [dict(round=0, residual=sol.residual,
                    bellman_res=float(bres), bellman_res_abs=bres_abs,
                    probe_cost=sol.probe_cost, wall_s=sol.wall_time)]
    acc_residual, acc_probe = sol.residual, sol.probe_cost
    accepted_rounds, attempts = 0, 0
    rkey = keys[-1]
    while accepted_rounds < rounds and attempts < 2 * rounds:
        attempts += 1
        rkey, sk = jax.random.split(rkey)
        sol_w = fused_tt_vi(problem, grid, controls=controls, rmax=rmax,
                            key=sk, base=total, **kw)
        # exact block-diagonal sum at a padding that fits both
        Rt = total.rmax + sol_w.v.rmax
        cand = tt_add(_repad(total, Rt), _repad(sol_w.v, Rt),
                      on_overflow="raise")
        iters += sol_w.iterations
        walls += sol_w.wall_time
        # accept/reject on the MEASURED sampled Bellman residual — the
        # oracle-free contraction bound ||v - v*|| <= ||Tv - v||/(1-gamma).
        # A correction solve that churned above its fixed point's scale
        # (measured: square-scheme w on the 9^6 quadcopter overshot 4x and
        # DEGRADED the total 11% -> 26%) must never poison the result. A
        # rejected round costs one retry with a fresh pivot lineage.
        bres_c, cscale = bellman_residual_sample(problem, grid, controls,
                                                 cand)
        bres_c_abs = float(bres_c) * float(cscale)
        accepted = bres_c_abs < bres_abs
        history.append(dict(round=accepted_rounds + 1,
                            residual=sol_w.residual,
                            bellman_res=float(bres_c),
                            bellman_res_abs=bres_c_abs, accepted=accepted,
                            probe_cost=sol_w.probe_cost,
                            wall_s=sol_w.wall_time))
        if accepted:
            accepted_rounds += 1
            total, bres_abs = cand, bres_c_abs
            # the returned solution's metrics must describe the ACCEPTED
            # state, not a possibly-rejected last attempt (r3 advisor)
            acc_residual, acc_probe = sol_w.residual, sol_w.probe_cost
    # one compression pass: the exact sum usually carries redundant rank
    total = tt_round(total, total_round_tol)
    out = FusedVISolution(
        v=total, residual=acc_residual, iterations=iters,
        wall_time=walls, carry=sol.carry, controls=sol.controls,
        probe_cost=acc_probe,
    )
    out.refine_history = history
    return out
