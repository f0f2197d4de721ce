"""TT policy iteration: the ``c3control_pi_solve`` equivalent (SURVEY.md
§3.2).

Alternates:
  (a) policy improvement — cross-fit the greedy policy u*(x) = argmin_u
      Bellman RHS as one TT per control dimension;
  (b) policy evaluation — ``eval_iters`` cross sweeps of the *linear* backup
      v <- g(x, pi(x)) dt + e^{-beta dt} sum_j p_j(x, pi(x)) v(x_j)
      with the control read from the policy TTs (no inner min) — each
      evaluation sweep costs 1/C of an improvement sweep.

The reference keeps the policy implicit and re-derives it per node
(SURVEY.md §3.2 [M]); representing it as TTs is the TPU-native equivalent
that keeps policy evaluation fully batched.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops import mca
from c3sc_tpu.ops.cross import tt_cross
from c3sc_tpu.ops.tt import TT, tt_gather_eval
from c3sc_tpu.solvers.ttvi import _neighbor_indices, make_bellman_kernel


def make_policy_kernel(problem: ControlProblem, grid: Grid, controls,
                       chunk: int = 4096, dtype=jnp.float32):
    """Greedy-policy black box: (v_tt, idx [B,d]) -> u* [B, du]."""
    uc = jnp.asarray(controls, dtype)
    d = problem.dx

    @jax.jit
    def _chunk_kernel(v_tt: TT, idx):
        x = grid.index_to_state(idx).astype(dtype)
        nb = _neighbor_indices(grid, idx).reshape(-1, d)
        vn = tt_gather_eval(v_tt, nb)
        nx = grid.index_to_state(nb).astype(dtype)
        t_mask, t_val = mca.node_terminal(problem, grid, nb, nx)
        vn = jnp.where(t_mask, t_val.astype(dtype), vn).reshape(-1, 2, d)

        def rhs_for_control(u):
            pp, pm, dt = mca.transition_batch(
                problem, grid, x, jnp.broadcast_to(u, (x.shape[0],) + u.shape)
            )
            g = jax.vmap(lambda xx: problem.stage_cost(xx, u))(x)
            expect = jnp.sum(pp * vn[:, 0] + pm * vn[:, 1], axis=-1)
            return g * dt + jnp.exp(-problem.beta * dt) * expect

        rhs = jax.lax.map(rhs_for_control, uc)
        return uc[jnp.argmin(rhs, axis=0)]  # [B, du]

    def policy(v_tt: TT, idx):
        B = idx.shape[0]
        pad = (-B) % chunk
        idxp = jnp.concatenate([idx, jnp.zeros((pad, d), idx.dtype)], 0) if pad else idx
        pieces = [
            _chunk_kernel(v_tt, idxp[i * chunk : (i + 1) * chunk])
            for i in range((B + pad) // chunk)
        ]
        out = jnp.concatenate(pieces, 0) if len(pieces) > 1 else pieces[0]
        return out[:B]

    return policy


def make_policy_eval_kernel(problem: ControlProblem, grid: Grid,
                            chunk: int = 4096, dtype=jnp.float32):
    """Fixed-policy backup: (v_tt, policy_tts, idx) -> [B] (no inner min)."""
    d = problem.dx
    ulb = jnp.asarray(problem.ulb, dtype)
    uub = jnp.asarray(problem.uub, dtype)

    @jax.jit
    def _chunk_kernel(v_tt: TT, policy_tts, idx):
        x = grid.index_to_state(idx).astype(dtype)
        u = jnp.stack([tt_gather_eval(p, idx) for p in policy_tts], axis=-1)
        u = jnp.clip(u, ulb, uub)  # [B, du]
        nb = _neighbor_indices(grid, idx).reshape(-1, d)
        vn = tt_gather_eval(v_tt, nb)
        if problem.value_bounds is not None:
            vn = jnp.clip(vn, problem.value_bounds[0], problem.value_bounds[1])
        nx = grid.index_to_state(nb).astype(dtype)
        t_mask, t_val = mca.node_terminal(problem, grid, nb, nx)
        vn = jnp.where(t_mask, t_val.astype(dtype), vn).reshape(-1, 2, d)
        pp, pm, dt = mca.transition_batch(problem, grid, x, u)
        g = jax.vmap(problem.stage_cost)(x, u)
        expect = jnp.sum(pp * vn[:, 0] + pm * vn[:, 1], axis=-1)
        val = g * dt + jnp.exp(-problem.beta * dt) * expect
        if problem.value_bounds is not None:
            val = jnp.clip(val, problem.value_bounds[0], problem.value_bounds[1])
        tm, tv = mca.node_terminal(problem, grid, idx, x)
        return jnp.where(tm, tv.astype(dtype), val)

    def backup(v_tt: TT, policy_tts, idx):
        B = idx.shape[0]
        pad = (-B) % chunk
        idxp = jnp.concatenate([idx, jnp.zeros((pad, d), idx.dtype)], 0) if pad else idx
        pieces = [
            _chunk_kernel(v_tt, policy_tts, idxp[i * chunk : (i + 1) * chunk])
            for i in range((B + pad) // chunk)
        ]
        out = jnp.concatenate(pieces, 0) if len(pieces) > 1 else pieces[0]
        return out[:B]

    return backup


@dataclasses.dataclass
class TTPISolution:
    v: TT
    policy: tuple      # one TT per control dim
    residual: float
    outer_iters: int
    residual_history: list
    n_evals: int
    wall_time: float
    controls: np.ndarray


def tt_pi(
    problem: ControlProblem,
    grid: Grid,
    controls=None,
    n_controls: int = 9,
    rmax: int = 20,
    policy_rmax: int | None = None,
    key=None,
    tol: float = 1e-4,
    outer_iters: int = 30,
    eval_iters: int = 20,
    cross_tol: float = 1e-4,
    r0: int = 3,
    kick: int = 2,
    eps_rank: float = 1e-5,
    chunk: int = 4096,
    sample_size: int = 512,
    dtype=jnp.float32,
    v0: TT | None = None,
    verbose: bool = False,
    metrics=None,
) -> TTPISolution:
    if key is None:
        key = jax.random.key(0)
    if controls is None:
        controls = problem.control_candidates(n_controls)
    if policy_rmax is None:
        policy_rmax = rmax
    du = problem.du

    bellman = make_bellman_kernel(problem, grid, controls, chunk, dtype)
    pol_kernel = make_policy_kernel(problem, grid, controls, chunk, dtype)
    pol_eval = make_policy_eval_kernel(problem, grid, chunk, dtype)

    rng = np.random.default_rng(778)
    sample_idx = np.stack(
        [rng.integers(0, n, size=sample_size) for n in grid.shape], axis=-1
    )
    sample_jx = jnp.asarray(sample_idx, jnp.int32)

    from c3sc_tpu.ops.tt import tt_zeros

    v = v0 if v0 is not None else tt_zeros(grid.shape, rmax, dtype)
    v_state = None
    pol_states = [None] * du
    v_sample = tt_gather_eval(v, sample_jx)
    history = []
    n_evals = 0
    t0 = time.time()
    residual = float("inf")
    outer = 0
    for outer in range(outer_iters):
        # ---- improvement: one min-backup cross + greedy policy TT fit ----
        key, k1, k2 = jax.random.split(key, 3)
        res = tt_cross(
            partial(bellman, v), grid.shape, rmax=rmax, key=k1, state=v_state,
            r0=r0, kick=kick, tol=cross_tol, eps_rank=eps_rank,
            max_sweeps=4 if v_state is None else 2, sample_idx=sample_idx,
            dtype=dtype,
        )
        v, v_state = res.tt, res.state
        n_evals += res.n_evals
        policy_tts = []
        for m in range(du):
            km = jax.random.fold_in(k2, m)
            pres = tt_cross(
                lambda idx, m=m: pol_kernel(v, idx)[:, m],
                grid.shape, rmax=policy_rmax, key=km, state=pol_states[m],
                r0=r0, kick=kick, tol=max(cross_tol, 1e-3), eps_rank=1e-4,
                max_sweeps=3 if pol_states[m] is None else 2,
                sample_idx=sample_idx, dtype=dtype,
            )
            policy_tts.append(pres.tt)
            pol_states[m] = pres.state
            n_evals += pres.n_evals
        policy_tts = tuple(policy_tts)
        # ---- evaluation: cheap fixed-policy crosses ----
        for _ in range(eval_iters):
            key, ke = jax.random.split(key)
            eres = tt_cross(
                partial(pol_eval, v, policy_tts), grid.shape, rmax=rmax,
                key=ke, state=v_state, r0=r0, kick=kick, tol=cross_tol,
                eps_rank=eps_rank, max_sweeps=1, sample_idx=sample_idx,
                dtype=dtype,
            )
            v, v_state = eres.tt, eres.state
            n_evals += eres.n_evals
        new_sample = tt_gather_eval(v, sample_jx)
        scale = float(jnp.max(jnp.abs(new_sample))) + 1e-12
        residual = float(jnp.max(jnp.abs(new_sample - v_sample))) / scale
        v_sample = new_sample
        history.append(residual)
        if verbose:
            print(f"[tt_pi:{problem.name}] outer={outer} res={residual:.3e} "
                  f"ranks={[int(r) for r in np.asarray(v.ranks)]}")
        if metrics is not None:
            metrics.log("pi_outer", iter=outer, residual=residual, evals=n_evals)
        if residual < tol:
            break
    return TTPISolution(
        v=v, policy=policy_tts, residual=residual, outer_iters=outer + 1,
        residual_history=history, n_evals=n_evals,
        wall_time=time.time() - t0, controls=np.asarray(controls),
    )
