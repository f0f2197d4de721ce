"""TT value iteration: the production solver (c3sc's hot path, TPU-first).

Reference pipeline (SURVEY.md §3.1, ``c3sc/src/c3sc.c`` ``c3control_vi_solve``
→ ``bellman.c`` fiber evaluators → C3 ``ftapprox_cross`` — line n/a, empty
mount): each VI iteration cross-approximates the *backed-up* value function

    (T v)(x) = min_u [ g(x,u) dt(x,u) + e^{-beta dt} sum_j p_j(x,u) v(x_j) ]

where the cross evaluates T v only on adaptively chosen fibers.

TPU-first re-design:
- The Bellman black box is ONE jitted kernel over a fixed-size chunk of
  nodes x all control candidates x all 2d neighbors — batched stencil +
  batched TT gather-eval (chains of MXU matvecs). No per-node c3opt calls.
- The kernel closes over nothing: TT cores are traced arguments, so the
  SAME compiled kernel serves every VI iteration.
- Cross index sets persist across VI iterations (warm start), exactly like
  the reference's persistent ``CrossIndex`` sets — after the first
  iteration each cross converges in ~1 sweep.
- Terminal (absorbing/obstacle) nodes are pinned both at evaluation nodes
  and at neighbor lookups, matching the dense oracle's semantics.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops import mca
from c3sc_tpu.ops.cross import CrossState, tt_cross
from c3sc_tpu.ops.tt import TT, tt_gather_eval, tt_round


def _neighbor_indices(grid: Grid, idx):
    """idx [B, d] -> neighbors [B, 2, d, d] (sign, which-dim, coords)."""
    ups = jnp.stack([grid.neighbor_index(idx, j, +1) for j in range(grid.ndim)], axis=1)
    dns = jnp.stack([grid.neighbor_index(idx, j, -1) for j in range(grid.ndim)], axis=1)
    return jnp.stack([ups, dns], axis=1)  # [B, 2, d, d]


def rhs_continuous(problem: ControlProblem, grid: Grid, x, vn):
    """Bellman RHS as a differentiable function of arbitrary controls.

    Given fixed evaluation states x [B, d] and (already terminal-pinned)
    neighbor values vn [B, 2, d], returns ``f(u [B, du]) -> rhs [B]`` — the
    objective the reference hands to ``c3opt_minimize`` per node
    (``c3sc/src/bellman.c`` ``bellmanrhs`` — line n/a, empty mount;
    SURVEY.md §3.1 HOTTEST loop). Gradients w.r.t. u come from ``jax.grad``
    through the whole stencil (drift, diffusion, dt, discount), replacing
    the reference's hand-assembled chain rule.
    """

    def f(u):
        pp, pm, dtt = mca.transition_batch(problem, grid, x, u)
        g = jax.vmap(problem.stage_cost)(x, u)
        expect = jnp.sum(pp * vn[:, 0] + pm * vn[:, 1], axis=-1)
        return g * dtt + jnp.exp(-problem.beta * dtt) * expect

    return f


def refine_controls(problem: ControlProblem, grid: Grid, x, vn, u0, f0,
                    refine_steps: int, method: str = "pgd"):
    """Continuous inner-minimization polish of the brute-force winner.

    The solver-side ``c3opt_minimize`` equivalent (SURVEY.md §2.2 c3opt row):
    starting from the best control candidate u0 [B, du] with objective value
    f0 [B], run ``refine_steps`` batched projected-gradient (or L-BFGS)
    iterations of the continuous Bellman RHS under box bounds. Monotone by
    construction (the incumbent is always a candidate), so the returned
    objective is <= f0 elementwise. Returns (u_opt, f_opt).
    """
    from c3sc_tpu.ops.argmin import lbfgs_minimize, pgd_minimize

    f = rhs_continuous(problem, grid, x, vn)
    if method == "lbfgs":
        u_opt, f_opt = lbfgs_minimize(
            f, u0, problem.ulb, problem.uub, n_iters=refine_steps)
    else:
        u_opt, f_opt = pgd_minimize(
            f, u0, problem.ulb, problem.uub, n_iters=refine_steps)
    return u_opt, jnp.minimum(f_opt, f0)


def _pinned_neighbor_values(problem, grid, v_tt, idx, dtype,
                            node_value_fn=None):
    """TT neighbor values with value-bounds clamping + terminal pinning.

    ``node_value_fn(v_tt, idx [B, d] int) -> [B]`` overrides the plain TT
    gather (e.g. the two-level composite TT+patch field).
    Returns (x [B, d], vn [B, 2, d])."""
    d = problem.dx
    x = grid.index_to_state(idx).astype(dtype)  # [B, d]
    nb = _neighbor_indices(grid, idx)           # [B, 2, d, d]
    nb_flat = nb.reshape(-1, d)
    if node_value_fn is None:
        vn = tt_gather_eval(v_tt, nb_flat)      # [B*2*d]
    else:
        vn = node_value_fn(v_tt, nb_flat)
    if problem.value_bounds is not None:
        # clamp TT evals into the provable value range: rank-limited
        # approximation outliers cannot feed back through the backup
        vn = jnp.clip(vn, problem.value_bounds[0], problem.value_bounds[1])
    # pin neighbor values at terminal neighbor nodes
    nx = grid.index_to_state(nb_flat).astype(dtype)
    t_mask, t_val = mca.node_terminal(problem, grid, nb_flat, nx)
    vn = jnp.where(t_mask, t_val.astype(dtype), vn)
    return x, vn.reshape(-1, 2, d)              # [B, 2, d]


def bellman_backup(problem: ControlProblem, grid: Grid, uc, v_tt: TT, idx,
                   dtype=jnp.float32, refine_steps: int = 0,
                   refine_method: str = "pgd", node_value_fn=None):
    """Traced fused Bellman backup at nodes idx [B, d] -> [B].

    min over candidate controls uc [C, du] of the MCA RHS, with TT neighbor
    evaluation and terminal pinning (both at evaluated nodes and at
    neighbors). Pure function — reused by the chunked kernel, the fused
    cross sweep, and the sharded multi-chip step.

    ``refine_steps > 0`` polishes the brute-force winner with that many
    batched projected-gradient (or L-BFGS, ``refine_method='lbfgs'``) steps
    of the continuous RHS — the reference's per-node ``c3opt_minimize``
    BFGS inner solve (SURVEY.md §3.1 HOTTEST loop), recovering control
    accuracy beyond the candidate spacing INSIDE the solve.
    """
    x, vn = _pinned_neighbor_values(problem, grid, v_tt, idx, dtype,
                                    node_value_fn)

    # all-candidates stencil + cost (uses the problem's declared affine/
    # separable structure when present — ONE drift contraction for all C)
    pp, pm, dt = mca.transition_all_controls(problem, grid, x, uc)   # [C,B,d]
    g = mca.stage_cost_all(problem, x, uc)                           # [C,B]
    expect = jnp.sum(pp * vn[None, :, 0] + pm * vn[None, :, 1], axis=-1)
    rhs = g * dt + jnp.exp(-problem.beta * dt) * expect              # [C,B]
    val = jnp.min(rhs, axis=0)
    if refine_steps > 0:
        u0 = uc[jnp.argmin(rhs, axis=0)]                             # [B,du]
        _, val = refine_controls(problem, grid, x, vn, u0, val,
                                 refine_steps, refine_method)
    if problem.value_bounds is not None:
        val = jnp.clip(val, problem.value_bounds[0], problem.value_bounds[1])
    # pin terminal evaluation nodes
    tm, tv = mca.node_terminal(problem, grid, idx, x)
    # force the requested dtype: under jax_enable_x64 problem callables may
    # produce f64 constants that would otherwise promote the whole chain
    return jnp.where(tm, tv.astype(dtype), val).astype(dtype)


def bellman_residual_sample(problem: ControlProblem, grid: Grid, controls,
                            v_tt: TT, n_samples: int = 4096, seed: int = 7,
                            dtype=jnp.float32):
    """Sampled Bellman residual sup|T v - v| / scale at random nodes.

    The oracle-free convergence measure: the contraction bound
    ``||v - v*|| <= ||T v - v||/(1 - gamma)`` makes this the honest
    quality metric when no dense solve exists (6D+). Used by
    ``fused_tt_vi_refined`` to accept/reject correction rounds and by the
    Diag stream (reference ``struct Diag``, SURVEY.md §5).
    Returns (residual_rel, scale): max |T v - v| over the sample and the
    value scale it was normalized by.
    """
    rng = np.random.default_rng(seed)
    idx = jnp.asarray(
        np.stack([rng.integers(0, n, n_samples) for n in grid.shape], -1),
        jnp.int32)
    uc = jnp.asarray(controls, dtype)
    tv = bellman_backup(problem, grid, uc, v_tt, idx, dtype)
    v = tt_gather_eval(v_tt, idx).astype(dtype)
    scale = jnp.maximum(jnp.max(jnp.abs(v)), 1e-12)
    return (jnp.max(jnp.abs(tv - v)) / scale).astype(dtype), scale


def make_bellman_kernel(problem: ControlProblem, grid: Grid, controls,
                        chunk: int = 4096, dtype=jnp.float32,
                        refine_steps: int = 0, refine_method: str = "pgd",
                        node_value_fn=None):
    """Build the jitted fused Bellman-backup kernel.

    Returns bellman(v_tt: TT, idx [B, d] int32) -> [B] float — handles any B
    by padding to `chunk` multiples (one compile total).
    ``refine_steps``: continuous inner-min polish per node (see
    ``bellman_backup``)."""
    uc = jnp.asarray(controls, dtype)
    d = problem.dx

    @jax.jit
    def _chunk_kernel(v_tt: TT, idx):
        return bellman_backup(problem, grid, uc, v_tt, idx, dtype,
                              refine_steps=refine_steps,
                              refine_method=refine_method,
                              node_value_fn=node_value_fn)

    def bellman(v_tt: TT, idx):
        B = idx.shape[0]
        pad = (-B) % chunk
        idxp = jnp.concatenate([idx, jnp.zeros((pad, d), idx.dtype)], 0) if pad else idx
        pieces = [
            _chunk_kernel(v_tt, idxp[i * chunk : (i + 1) * chunk])
            for i in range((B + pad) // chunk)
        ]
        out = jnp.concatenate(pieces, 0) if len(pieces) > 1 else pieces[0]
        return out[:B]

    return bellman


@dataclasses.dataclass
class TTVISolution:
    v: TT
    state: CrossState
    residual: float
    iterations: int
    residual_history: list
    ranks: list
    n_evals: int
    wall_time: float
    controls: np.ndarray


def tt_vi(
    problem: ControlProblem,
    grid: Grid,
    controls=None,
    n_controls: int = 9,
    rmax: int = 20,
    key=None,
    tol: float = 1e-4,
    max_iters: int = 500,
    cross_tol: float = 1e-4,
    cross_sweeps_first: int = 5,
    cross_sweeps: int = 2,
    r0: int = 3,
    kick: int = 2,
    eps_rank: float = 1e-5,
    round_tol: float | None = None,
    chunk: int = 4096,
    sample_size: int = 512,
    dtype=jnp.float32,
    v0: TT | None = None,
    state: CrossState | None = None,
    verbose: bool = False,
    callback: Callable | None = None,
    metrics=None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 50,
    resume_from: str | None = None,
    cross_method: str = "cross",
    refine_steps: int = 0,
    refine_method: str = "pgd",
) -> TTVISolution:
    """Solve the MCA Bellman fixed point with a TT-compressed value function.

    The reference's ``c3control_vi_solve`` equivalent (SURVEY.md §3.1).
    Pass ``checkpoint_path`` to save full solver state every
    ``checkpoint_every`` iterations; ``resume_from`` restarts a saved run.
    ``cross_method``: 'cross' (single-site, kick-rank) or 'dmrg' (two-site
    SVD rank revelation — C3's dmrg path).
    ``refine_steps``: per-node continuous inner-min polish inside the
    backup (the reference's c3opt BFGS mode; 0 = brute force only).
    """
    if key is None:
        key = jax.random.key(0)
    if controls is None:
        controls = problem.control_candidates(n_controls)
    start_iter = 0
    if resume_from is not None:
        from c3sc_tpu.utils.checkpoint import load_solver_state

        ck = load_solver_state(resume_from)
        v0 = ck["v"]
        state = ck.get("state", state)
        start_iter = ck["iteration"] + 1
        key = ck.get("key", key)
    bellman = make_bellman_kernel(problem, grid, controls, chunk, dtype,
                                  refine_steps=refine_steps,
                                  refine_method=refine_method)

    rng = np.random.default_rng(777)
    sample_idx = np.stack(
        [rng.integers(0, n, size=sample_size) for n in grid.shape], axis=-1
    )
    sample_jx = jnp.asarray(sample_idx, jnp.int32)

    from c3sc_tpu.ops.tt import tt_zeros

    v = v0 if v0 is not None else tt_zeros(grid.shape, rmax, dtype)
    v_sample = tt_gather_eval(v, sample_jx)

    history, ranks_hist = [], []
    n_evals = 0
    t0 = time.time()
    residual = float("inf")
    it = start_iter
    for it in range(start_iter, max_iters):
        key, sk = jax.random.split(key)
        f = partial(bellman, v)
        n_sw = cross_sweeps_first if state is None else cross_sweeps
        if cross_method == "dmrg":
            from c3sc_tpu.solvers.dmrg import dmrg_cross

            res = dmrg_cross(
                f, grid.shape, rmax=rmax, key=sk, state=state, r0=r0,
                tol=cross_tol, eps_rank=eps_rank, max_sweeps=n_sw,
                sample_idx=sample_idx, dtype=dtype,
            )
        else:
            res = tt_cross(
                f, grid.shape, rmax=rmax, key=sk, state=state,
                r0=r0, kick=kick, tol=cross_tol, eps_rank=eps_rank,
                max_sweeps=n_sw, sample_idx=sample_idx, dtype=dtype,
            )
        v_new, state = res.tt, res.state
        if round_tol is not None:
            v_new = tt_round(v_new, round_tol, rmax)
        n_evals += res.n_evals
        new_sample = tt_gather_eval(v_new, sample_jx)
        scale = float(jnp.max(jnp.abs(new_sample))) + 1e-12
        residual = float(jnp.max(jnp.abs(new_sample - v_sample))) / scale
        history.append(residual)
        ranks_hist.append([int(r) for r in np.asarray(v_new.ranks)])
        v, v_sample = v_new, new_sample
        if verbose and (it % 10 == 0 or residual < tol):
            print(
                f"[tt_vi:{problem.name}] it={it} res={residual:.3e} "
                f"ranks={ranks_hist[-1]} evals={n_evals}"
            )
        if metrics is not None:
            metrics.log(
                "vi_iter", iter=it, residual=residual,
                ranks=ranks_hist[-1], evals=n_evals,
            )
        if callback is not None:
            callback(it, v, residual)
        if checkpoint_path is not None and (
            (it + 1) % checkpoint_every == 0 or residual < tol
        ):
            from c3sc_tpu.utils.checkpoint import save_solver_state

            save_solver_state(
                checkpoint_path, v, state, it, key,
                extras={"residual": residual, "problem": problem.name},
            )
        if residual < tol:
            break
    return TTVISolution(
        v=v, state=state, residual=residual, iterations=it + 1,
        residual_history=history, ranks=ranks_hist, n_evals=n_evals,
        wall_time=time.time() - t0, controls=np.asarray(controls),
    )
