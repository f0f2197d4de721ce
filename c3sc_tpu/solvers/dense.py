"""Dense-grid value iteration — the correctness oracle (no TT).

The reference has no dense path (the FT *is* the representation); this module
is the TPU build's stand-in oracle for <=3D problems mandated by SURVEY.md §4:
a full-grid Markov-chain-approximation Bellman solve whose node values the TT
path must reproduce. It doubles as a fast production solver for 2–3D systems:
one jitted sweep = a brute-force min over control candidates of
``g*dt + exp(-beta*dt) * sum_j (p+_j v(x+h_j e_j) + p-_j v(x-h_j e_j))``
over every node at once — pure batched VPU/MXU work.

Bellman semantics match ``c3sc/src/bellman.c`` ``bellmanrhs`` (line n/a,
empty mount; SURVEY.md §3.1). Uses *modified policy iteration*: each outer
sweep does one argmin (improvement) + ``eval_sweeps`` cheap fixed-policy
backups — same fixed point, far fewer argmin evaluations than pure VI.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops import mca


@dataclasses.dataclass
class DenseSolution:
    v: jnp.ndarray            # [*grid.shape] value at nodes
    residual: float           # final sup-norm sweep residual
    sweeps: int               # outer sweeps executed
    residual_history: list    # residual after each outer chunk
    controls: np.ndarray      # [C, du] candidate set used
    floored: bool = False     # stopped at the f32 residual floor, not tol


def neighbor_values(v, grid: Grid):
    """Per-dim +-1-node neighbor value tensors of a dense v.

    Periodic dims wrap; bounded dims clamp (clamping = reflect 'stick' at the
    face; absorbing faces are pinned to psi separately so clamp is also
    correct for them). Returns (vp [N, d], vm [N, d]), N = prod(shape).
    """
    vps, vms = [], []
    for j in range(grid.ndim):
        n = v.shape[j]
        if grid.periodic[j]:
            vp = jnp.roll(v, -1, axis=j)
            vm = jnp.roll(v, 1, axis=j)
        else:
            first = jax.lax.slice_in_dim(v, 0, 1, axis=j)
            last = jax.lax.slice_in_dim(v, n - 1, n, axis=j)
            vp = jnp.concatenate([jax.lax.slice_in_dim(v, 1, n, axis=j), last], axis=j)
            vm = jnp.concatenate([first, jax.lax.slice_in_dim(v, 0, n - 1, axis=j)], axis=j)
        vps.append(vp.reshape(-1))
        vms.append(vm.reshape(-1))
    return jnp.stack(vps, axis=-1), jnp.stack(vms, axis=-1)


def _precompute(problem: ControlProblem, grid: Grid, controls, dtype):
    """Stencil quantities for all (candidate, node) — independent of v."""
    mesh = grid.meshgrid()
    x = jnp.asarray(np.stack([m.ravel() for m in mesh], axis=-1), dtype)  # [N, d]
    idx = jnp.asarray(
        np.stack([m.ravel() for m in np.meshgrid(*[np.arange(n) for n in grid.shape], indexing="ij")], -1),
        jnp.int32,
    )
    uc = jnp.asarray(controls, dtype)  # [C, du]

    def per_control(u):
        pp, pm, dt = jax.vmap(lambda xx: mca.transition(problem, grid, xx, u))(x)
        g = jax.vmap(lambda xx: problem.stage_cost(xx, u))(x)
        return pp, pm, dt, g

    pp, pm, dt, g = jax.lax.map(per_control, uc)  # [C,N,d] x2, [C,N], [C,N]
    term_mask, term_value = mca.node_terminal(problem, grid, idx, x)
    return x, pp, pm, dt, g, term_mask, term_value.astype(dtype)


def make_dense_step(problem: ControlProblem, grid: Grid, controls, dtype=jnp.float32,
                    eval_sweeps: int = 10):
    """Build the jitted outer-sweep function.

    Returns (step, init_v) where step(v, n_outer) runs n_outer modified-PI
    sweeps and returns (v_new, residual_of_last_sweep).
    """
    x, pp, pm, dt, g, term_mask, term_value = _precompute(problem, grid, controls, dtype)
    shape = grid.shape
    # the stencil is passed as an ARGUMENT pytree, never closed over: a jit
    # closure constant is inlined into the serialized HLO, and at 9^6 the
    # [C, N, d] tensors are ~320 MB each — the axon remote-compile endpoint
    # rejects the program body outright (HTTP 413), and any backend pays the
    # constant re-hash per compile. As arguments they live on device once.
    stencil = dict(
        pp=pp, pm=pm, gdt=g * dt, disc=jnp.exp(-problem.beta * dt),
        term_mask=term_mask, term_value=term_value,
    )

    def apply_terminal(st, vflat):
        return jnp.where(st["term_mask"], st["term_value"], vflat)

    def improve(st, v):
        vp, vm = neighbor_values(v, grid)     # [N, d]
        rhs = st["gdt"] + st["disc"] * (
            jnp.einsum("cnd,nd->cn", st["pp"], vp)
            + jnp.einsum("cnd,nd->cn", st["pm"], vm)
        )                                     # [C, N]
        best = jnp.argmin(rhs, axis=0)        # [N]
        vnew = apply_terminal(st, jnp.min(rhs, axis=0)).reshape(shape)
        return vnew, best

    def gather_policy(st, best):
        take = lambda a: jnp.take_along_axis(a, best[None, :], axis=0)[0]
        pol_pp = jnp.take_along_axis(st["pp"], best[None, :, None], axis=0)[0]
        pol_pm = jnp.take_along_axis(st["pm"], best[None, :, None], axis=0)[0]
        return pol_pp, pol_pm, take(st["gdt"]), take(st["disc"])

    def evaluate(st, v, pol):
        pol_pp, pol_pm, pol_gdt, pol_disc = pol
        vp, vm = neighbor_values(v, grid)
        expect = jnp.sum(pol_pp * vp + pol_pm * vm, axis=-1)
        return apply_terminal(st, pol_gdt + pol_disc * expect).reshape(shape)

    def one_outer(st, v):
        vnew, best = improve(st, v)
        pol = gather_policy(st, best)
        vnew = jax.lax.fori_loop(
            0, eval_sweeps, lambda _, vv: evaluate(st, vv, pol), vnew)
        return vnew

    @partial(jax.jit, static_argnames="n_outer")
    def _step(st, v, n_outer: int):
        def body(_, carry):
            v, _ = carry
            vnew = one_outer(st, v)
            res = jnp.max(jnp.abs(vnew - v))
            return vnew, res
        return jax.lax.fori_loop(0, n_outer, body, (v, jnp.asarray(jnp.inf, dtype)))

    def step(v, n_outer: int):
        return _step(stencil, v, n_outer)

    init_v = jnp.where(term_mask, term_value,
                       jnp.zeros(int(np.prod(shape)), dtype)).reshape(shape)
    return step, init_v


def dense_vi(
    problem: ControlProblem,
    grid: Grid,
    controls=None,
    n_controls: int = 11,
    tol: float = 1e-5,
    max_outer: int = 2000,
    chunk: int = 50,
    eval_sweeps: int = 10,
    dtype=jnp.float32,
    v0=None,
    verbose: bool = False,
) -> DenseSolution:
    """Solve the MCA Bellman equation on the full grid.

    Outer sweeps run in jitted chunks; convergence when the sup-norm change
    of one outer sweep < tol.
    """
    if controls is None:
        controls = problem.control_candidates(n_controls)
    step, init_v = make_dense_step(problem, grid, controls, dtype, eval_sweeps)
    v = init_v if v0 is None else jnp.asarray(v0, dtype)
    history = []
    done = 0
    best_res, stall = float("inf"), 0
    floored = False
    while done < max_outer:
        n = min(chunk, max_outer - done)
        v, res = step(v, n)
        res = float(res)
        done += n
        history.append(res)
        if verbose:
            print(f"[dense_vi:{problem.name}] outer={done} residual={res:.3e}")
        if res < tol:
            break
        # plateau stop: in f32 the sup-norm residual bottoms out at the value
        # scale's quantization floor (measured 1.5e-5 on the 9^6 quadcopter)
        # and never reaches a tighter tol — stop once it stops improving.
        # GUARDED near the floor (r3 advisor): a weakly discounted problem
        # (per-chunk contraction > 0.99) improves <1%/chunk while still far
        # from converged, so the plateau may only engage once res sits
        # within a modest factor of the quantization floor or of tol.
        scale = float(jnp.max(jnp.abs(v)))
        floor_gate = max(100.0 * np.finfo(np.float32).eps * scale, 100.0 * tol)
        if res < best_res * 0.99:
            best_res, stall = res, 0
        elif res < floor_gate:
            stall += 1
            if stall >= 3:
                floored = True
                if verbose:
                    print(f"[dense_vi:{problem.name}] residual floor "
                          f"{res:.3e} (no improvement for {stall} chunks)")
                break
    return DenseSolution(v=v, residual=res, sweeps=done, residual_history=history,
                         controls=np.asarray(controls), floored=floored)


def dense_policy(problem: ControlProblem, grid: Grid, v, controls, dtype=jnp.float32,
                 refine_steps: int = 0, refine_method: str = "pgd"):
    """Greedy policy u*(node) = argmin_u Bellman RHS against a dense v.

    ``refine_steps > 0`` polishes the brute-force winner per node with
    batched projected-gradient/L-BFGS steps of the continuous RHS under box
    bounds — the reference's ``c3opt_minimize`` continuous mode, removing
    the candidate-spacing quantization of the policy.
    Returns u [*grid.shape, du].
    """
    x, pp, pm, dt, g, term_mask, term_value = _precompute(problem, grid, controls, dtype)
    vp, vm = neighbor_values(jnp.asarray(v, dtype), grid)
    rhs = g * dt + jnp.exp(-problem.beta * dt) * (
        jnp.einsum("cnd,nd->cn", pp, vp) + jnp.einsum("cnd,nd->cn", pm, vm)
    )
    best = jnp.argmin(rhs, axis=0)  # [N]
    u = jnp.asarray(controls, dtype)[best]  # [N, du]
    if refine_steps > 0:
        from c3sc_tpu.solvers.ttvi import refine_controls

        # dense v is already terminal-pinned at nodes, so its neighbor
        # values need no extra pinning
        vn = jnp.stack([vp, vm], axis=1)               # [N, 2, d]
        f0 = jnp.min(rhs, axis=0)
        u, _ = jax.jit(
            lambda u0, f0, vn: refine_controls(
                problem, grid, x, vn, u0, f0, refine_steps, refine_method)
        )(u, f0, vn)
    return u.reshape(*grid.shape, problem.du)
