"""Global two-grid (coarse-grid) correction for the smooth error modes.

WHY (the round-4/5 floor anatomy): value iteration — and every
residual/defect-driven fit including the frozen-target polish and the
PI-ALS linear solves — is a SMOOTHER: the operator gamma*P contracts
rough error modes quickly (diffusion damps high frequency) but smooth
modes only at gamma_bar = e^{-beta dt} ~ 0.996/step, and a smooth value
error of several % of range produces a Bellman defect of only
(1-gamma_bar) * error — invisible to any sampled-residual objective
(measured: experiments/pials_debug*.py — bres drops 3x while q95 does
not move). This is exactly the elliptic-PDE situation, and the textbook
cure is a coarse-grid correction: smooth error is well represented on a
grid with doubled spacing, where the SAME frozen-policy linear system is
tiny enough to solve EXACTLY.

The cycle (Newton/two-grid, the global analogue of the round-4 local
patch FAS iteration in ``solvers/local_patch.py``):

1. defect at every coarse node:  d(x) = (T v)(x) - v(x)  — evaluated with
   the production fine-grid kernel (chip);
2. error equation, frozen policy pi = argmin of current v:
   continuous  (beta - L^pi) e = d / dt_fine;  discretized on the COARSE
   grid:  (I - gamma_c P_c^pi) e_c = (dt_c / dt_f) * d_c — a 2d+1-point
   sparse system over prod(n_c) ~ 5^6 nodes, solved exactly (scipy
   sparse LU, float64, host — milliseconds);
3. prolong e_c to the fine grid (TT-SVD of the dense coarse correction +
   ``tt_refine_grid`` — linelm-exact) and add to v;
4. gate: keep only if the sampled Bellman defect does not regress
   (the correction targets defect-invisible smooth error, so the gate is
   one-sided: it must not HURT; VERDICT r4 weak #2 discipline).

Terminal (absorbing/obstacle) coarse nodes carry the pinned equation
e_c = psi - v directly, so face error is corrected too.

Reference: no equivalent exists in the reference (single-grid VI/PI,
SURVEY.md §3.1-3.2) — this is TPU-era numerics replacing the reference's
"run VI until rough convergence, then PI to polish" recipe; the coarse
solve IS a policy-iteration polish on the coarse grid.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import Boundary, ControlProblem
from c3sc_tpu.ops import mca
from c3sc_tpu.ops.tt import (TT, _repad, tt_add, tt_from_dense,
                             tt_gather_eval, tt_refine_grid, tt_round)
from c3sc_tpu.solvers.ttvi import make_bellman_kernel


def coarse_grid(grid: Grid,
                boundary_layer: bool = False) -> tuple[Grid, list]:
    """Coarse grid + per-dim fine indices of the coarse nodes.

    Bounded dims with odd n coarsen to every-other-node ((n+1)/2 nodes,
    spacing exactly doubles). Periodic dims and even-n dims are NOT
    coarsened (an odd periodic ring has no uniform every-other subset).

    ``boundary_layer=True`` (round-5): bounded dims KEEP the distance-1
    nodes next to each face — indices [0, 1, 2, 4, ..., n-3, n-2, n-1] —
    producing a NON-UNIFORM coarse grid (the round-4 unequal-spacing
    Kushner-Dupuis stencil handles it). Rationale, measured on the 9^6
    quad (experiments/ring_diag.py): the every-other-node grid CANNOT
    represent a one-cell boundary layer, and exactly there the TT error
    concentrates (ring q50 1.6% signed -1.8% vs interior 0.8% q95) —
    the layer is where absorbing-boundary value error lives, and it is
    what the local-patch Dirichlet data and the deployment controller
    feel first.

    Returns (coarse Grid, fine_index[k] arrays).
    """
    fine_ix = []
    any_nonuniform = False
    for k in range(grid.ndim):
        n = grid.shape[k]
        if (not grid.periodic[k]) and n % 2 == 1 and grid.uniform:
            if boundary_layer and n >= 9:
                ix = np.concatenate([[0, 1], np.arange(2, n - 2, 2),
                                     [n - 2, n - 1]])
                any_nonuniform = True
            elif n >= 5:
                ix = np.arange(0, n, 2)
            else:
                ix = np.arange(n)
        else:
            ix = np.arange(n)
        fine_ix.append(ix)
    if any_nonuniform:
        nodes = [np.asarray(grid.nodes(k))[fine_ix[k]]
                 for k in range(grid.ndim)]
        # periodic dims must stay uniform -> they were not subsampled
        gc = Grid.create(grid.lb, grid.ub, [len(ix) for ix in fine_ix],
                         grid.periodic,
                         nodes=[nk.tolist() for nk in nodes])
    else:
        gc = Grid.create(grid.lb, grid.ub, [len(ix) for ix in fine_ix],
                         grid.periodic)
    return gc, fine_ix


def _coarse_neighbor_linear(gc: Grid, idx: np.ndarray, dim: int, step: int):
    """Linear index of the +-step neighbor under the coarse grid's rules."""
    n = gc.shape[dim]
    j = idx[:, dim] + step
    if gc.periodic[dim]:
        j = np.mod(j, n)
    else:
        j = np.clip(j, 0, n - 1)
    out = idx.copy()
    out[:, dim] = j
    strides = np.cumprod([1] + list(gc.shape[::-1][:-1]))[::-1]
    return out @ strides


@jax.jit
def _blend(vt: TT, et: TT, alpha):
    """v + alpha * e, rounded back to v's padding — ONE compiled program.

    Eagerly, tt_add's traced-rank path + tt_round are ~40 small QR/SVD
    ops; on the axon backend that is ~40 tunnel round-trips (~40 s) PER
    step-size candidate."""
    from c3sc_tpu.ops.tt import tt_scale

    R = vt.cores[0].shape[0]
    return tt_round(tt_add(vt, tt_scale(et, alpha), on_overflow="round"),
                    1e-8, R)


@dataclasses.dataclass
class TwoGridInfo:
    defect_rms_before: float
    defect_rms_after: float
    bres_before: float
    bres_after: float
    correction_scale: float
    accepted: bool


def coarse_correct(
    problem: ControlProblem,
    grid: Grid,
    controls,
    v: TT,
    kernel=None,
    rmax_corr: int = 24,
    corr_tol: float = 1e-6,
    n_check: int = 4096,
    seed: int = 29,
    chunk: int = 32768,
    gate: bool = True,
    gate_slack: float = 1.05,
    boundary_layer: bool = True,
    clip_mult: float | None = None,
    alphas: Sequence[float] = (1.0, 0.5, 0.25),
    verbose: bool = False,
    node_value_fn=None,
):
    """One global coarse-grid correction of ``v`` (module docstring).

    Returns (v_new, TwoGridInfo). With ``gate=True`` the correction is
    kept only if the sampled sup-defect does not regress more than
    ``gate_slack`` (one-sided: the target error is defect-invisible);
    step sizes ``alphas`` are tried in order and the first that passes
    wins (backtracking — a large coarse step from a rough base can
    overshoot).

    ``boundary_layer=True`` uses the layer-keeping non-uniform coarse
    grid (see ``coarse_grid``): the distance-1 nodes next to each bounded
    face stay IN the coarse grid, so the boundary-layer error — where
    absorbing-boundary TT error concentrates (ring signed -1.8% on the
    9^6 quad while the interior sits at 0.8%, experiments/ring_diag.py)
    — is representable and corrected instead of clipped away.

    ``clip_mult``: robust clipping of the restricted defect rate at
    clip_mult x (1.48 median |d|) on the terminal-ADJACENT ring. On an
    every-other coarse grid the ring layer is unrepresentable and its C0
    exit-cost jump poisons the whole solve (measured: |e|_max 240 on a
    value range of 22); with the layer-keeping grid the ring is genuine
    signal. Default (None): 0 when ``boundary_layer`` else 6.
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    d = problem.dx
    uc = jnp.asarray(controls, jnp.float32)
    if kernel is None:
        kernel = make_bellman_kernel(problem, grid, uc, chunk=chunk,
                                     node_value_fn=node_value_fn)
    if clip_mult is None:
        clip_mult = 0.0 if boundary_layer else 6.0
    gc, fine_ix = coarse_grid(grid, boundary_layer=boundary_layer)
    shape_c = gc.shape
    N_c = int(np.prod(shape_c))

    # all coarse nodes, their fine indices and states
    mesh = np.meshgrid(*[np.arange(n) for n in shape_c], indexing="ij")
    idx_c = np.stack([m.ravel() for m in mesh], -1)            # [N_c, d]
    idx_f = np.stack([fine_ix[k][idx_c[:, k]] for k in range(d)], -1)
    jidx_f = jnp.asarray(idx_f, jnp.int32)
    x = np.asarray(grid.index_to_state(jidx_f), np.float64)    # [N_c, d]
    jx = jnp.asarray(x, jnp.float32)

    # fine defect at coarse nodes (production kernel, chip)
    tv = np.asarray(kernel(v, jidx_f), np.float64)
    if node_value_fn is None:
        vv = np.asarray(tt_gather_eval(v, jidx_f), np.float64)
    else:
        vv = np.asarray(node_value_fn(v, jidx_f), np.float64)
    d_f = tv - vv                                              # [N_c]

    # frozen policy at coarse nodes: argmin of the current backup
    @jax.jit
    def _policy(v_tt, ii):
        from c3sc_tpu.solvers.ttvi import _pinned_neighbor_values
        xx, vn = _pinned_neighbor_values(problem, grid, v_tt, ii,
                                         jnp.float32, node_value_fn)
        pp, pm, dtt = mca.transition_all_controls(problem, grid, xx, uc)
        g = mca.stage_cost_all(problem, xx, uc)
        expect = jnp.sum(pp * vn[None, :, 0] + pm * vn[None, :, 1], axis=-1)
        rhs = g * dtt + jnp.exp(-problem.beta * dtt) * expect
        c = jnp.argmin(rhs, axis=0)
        return c, jnp.take_along_axis(dtt, c[None], axis=0)[0]

    cix, dt_f = [], []
    for c0 in range(0, N_c, chunk):
        cc, dtt = _policy(v, jidx_f[c0:c0 + chunk])
        cix.append(np.asarray(cc))
        dt_f.append(np.asarray(dtt, np.float64))
    cix = np.concatenate(cix)
    dt_f = np.concatenate(dt_f)
    u_star = jnp.asarray(np.asarray(controls)[cix], jnp.float32)

    # coarse stencil at the frozen policy
    pp_c, pm_c, dt_c = mca.transition_batch(problem, gc, jx, u_star)
    pp_c = np.asarray(pp_c, np.float64)
    pm_c = np.asarray(pm_c, np.float64)
    dt_c = np.asarray(dt_c, np.float64)
    gam_c = np.exp(-problem.beta * dt_c)

    tm, _tval = mca.node_terminal(problem, gc, jnp.asarray(idx_c, jnp.int32),
                                  jx)
    tm = np.asarray(tm)

    # sparse system (I - gamma_c P_c) e = (dt_c/dt_f) d ; terminal: e = d
    rows, cols, vals = [np.arange(N_c)], [np.arange(N_c)], [np.ones(N_c)]
    for k in range(d):
        for sgn, p in ((+1, pp_c[:, k]), (-1, pm_c[:, k])):
            j = _coarse_neighbor_linear(gc, idx_c, k, sgn)
            coef = np.where(tm, 0.0, -gam_c * p)
            rows.append(np.arange(N_c))
            cols.append(j)
            vals.append(coef)
    A = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(N_c, N_c))
    rate = (dt_c / np.maximum(dt_f, 1e-30)) * d_f
    # robust clip of the defect rate ON THE TERMINAL-ADJACENT RING ONLY
    # (see docstring): the C0 exit-cost jump of absorbing-boundary
    # problems is rough-mode content for the smoother, not smooth defect
    # for this solve; away from the ring the defect is real signal
    # (clipping it globally measurably hurt the pendulum cycle)
    ring = np.zeros(N_c, bool)
    for k in range(d):
        for sgn in (+1, -1):
            j = _coarse_neighbor_linear(gc, idx_c, k, sgn)
            ring |= tm[j]
    ring &= ~tm
    sig = 1.48 * np.median(np.abs(rate[~tm & ~ring])) \
        if (~tm & ~ring).any() else 0.0
    if clip_mult > 0 and sig > 0:
        rate = np.where(ring, np.clip(rate, -clip_mult * sig,
                                      clip_mult * sig), rate)
    rhs = np.where(tm, d_f, rate)
    if N_c <= 40_000:
        e_c = spla.spsolve(A.tocsc(), rhs)
    else:
        # direct LU fill-in explodes with the d-dimensional stencil's
        # bandwidth (~prod of trailing dims): the 7^6 layer-keeping system
        # hit 9+ GB and minutes (measured). (I - gamma_c P_c) has
        # kappa ~ 1/(beta dt_c) ~ 1e2, so a Krylov solve needs only
        # ~1e2 thirteen-point matvecs.
        Acsr = A.tocsr()
        e_c, ok = spla.bicgstab(Acsr, rhs, rtol=1e-10, atol=0.0,
                                maxiter=2000)
        if ok != 0:
            e_c, ok = spla.gmres(Acsr, rhs, rtol=1e-10, atol=0.0,
                                 restart=50, maxiter=40, x0=e_c)
            if ok != 0:
                # unconverged correction is untrustworthy — let the gate
                # see a zero correction rather than noise
                e_c = np.zeros_like(rhs)
    e_dense = e_c.reshape(shape_c)

    # prolong: TT-SVD of the coarse correction, linelm-exact refinement
    R = v.rmax
    e_tt_c = tt_from_dense(jnp.asarray(e_dense, jnp.float32),
                           rmax=min(rmax_corr, R), tol=corr_tol)
    e_tt = tt_refine_grid(_repad(e_tt_c, R), gc, grid)

    # gate on the sampled sup-defect (one-sided), backtracking step sizes
    rng = np.random.default_rng(seed)
    check = jnp.asarray(np.stack([rng.integers(0, n, n_check)
                                  for n in grid.shape], -1), jnp.int32)

    def _bres(vt):
        tvv = np.asarray(kernel(vt, check))
        if node_value_fn is None:
            vvv = np.asarray(tt_gather_eval(vt, check))
        else:
            vvv = np.asarray(node_value_fn(vt, check))
        return float(np.max(np.abs(tvv - vvv)))

    b0 = _bres(v)
    accepted, b1, v_out, alpha_used = False, b0, v, 0.0
    for alpha in (alphas if gate else alphas[:1]):
        v_try = _blend(v, e_tt, jnp.asarray(float(alpha), jnp.float32))
        b_try = _bres(v_try)
        if (not gate) or b_try <= gate_slack * b0:
            accepted, b1, v_out, alpha_used = True, b_try, v_try, alpha
            break
    info = TwoGridInfo(
        defect_rms_before=float(np.sqrt((d_f ** 2).mean())),
        defect_rms_after=float("nan"),
        bres_before=b0, bres_after=b1,
        correction_scale=float(np.abs(e_c).max()) * (alpha_used or 1.0),
        accepted=bool(accepted))
    if verbose:
        print(f"[twogrid] |e|_max={float(np.abs(e_c).max()):.4f} "
              f"alpha={alpha_used} bres {b0:.4f} -> {b1:.4f} "
              f"accepted={accepted}", flush=True)
    return v_out, info
