"""Implicit feedback policy: u*(x) = argmin_u Bellman RHS against a value fn.

Reference: the implicit-policy controller of ``c3sc/src/simulate.c`` /
``bellman_optimal`` (line n/a, empty mount; SURVEY.md §3.3) — there, a fresh
``c3opt`` solve per simulation step; here, a *batched* brute-force argmin over
a control-candidate set evaluated for thousands of rollout states at once
(pure vmap — the TPU-optimal backend, SURVEY.md §7 item 6a).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import ControlProblem
from c3sc_tpu.ops import mca


def q_values(
    problem: ControlProblem,
    grid: Grid,
    value_fn: Callable,
    controls,
    x,
):
    """Bellman RHS Q(x, u) for every control candidate: [B, C].

    The per-candidate objective ``bellman_optimal`` scans in the reference
    (``c3sc/src/bellman.c`` — line n/a, empty mount; SURVEY.md §3.1),
    exposed batched so policy-agreement analyses can measure the Q-gap
    between two policies' picks under ONE value function (the oracle's).
    value_fn: batched points [..., d] -> values [...].
    """
    uc = jnp.asarray(controls)
    d = problem.dx
    xf = x.reshape(-1, d)
    hp, hm = grid.local_h(xf)                                # [B, d] each
    eye = jnp.eye(d, dtype=xf.dtype)
    nb = jnp.stack([xf[:, None, :] + hp[:, :, None] * eye,
                    xf[:, None, :] - hm[:, :, None] * eye], axis=1)
    vnb = value_fn(nb.reshape(-1, d)).reshape(-1, 2, d)      # [B, 2, d]
    pp, pm, dt = mca.transition_all_controls(problem, grid, xf, uc)
    g = mca.stage_cost_all(problem, xf, uc)                  # [C, B]
    expect = jnp.sum(pp * vnb[None, :, 0] + pm * vnb[None, :, 1], axis=-1)
    rhs = (g * dt + jnp.exp(-problem.beta * dt) * expect).T  # [B, C]
    return rhs.reshape(*x.shape[:-1], len(uc))


def make_implicit_policy(
    problem: ControlProblem,
    grid: Grid,
    value_fn: Callable,
    controls,
    refine_steps: int = 0,
    refine_method: str = "pgd",
    value_grad_fn: Callable | None = None,
):
    """Build policy(x [..., d]) -> u [..., du].

    value_fn: batched points [..., d] -> values [...] (dense-interp or TT).
    controls: [C, du] candidate set.
    refine_steps > 0 polishes the brute-force winner with that many batched
    optimizer steps (continuous-control accuracy beyond the candidate grid
    spacing — the reference's c3opt continuous modes, SURVEY.md §2.2, as
    fixed-iteration batched optimizers). refine_method: 'pgd' (projected
    gradient, parallel line search) or 'lbfgs' (box L-BFGS — the c3opt BFGS
    analogue; better on ill-conditioned control landscapes).

    value_grad_fn (pts [B, d] -> [B, d], e.g. ``ft_grad_eval`` on a PolyFT):
    when given, refinement minimizes the continuous HJB Hamiltonian
    ``g(x, u) + grad v(x) . f(x, u)`` instead of the MCA stencil RHS — the
    u-dependence of the discounted HJB at a point is exactly this term
    (the diffusion contribution is u-independent for sigma(x) models), and
    the smooth gradient removes the stencil's h-quantized u-sensitivity.
    Requires a basis with well-defined gradients (poly FT; lerp gradients
    are piecewise-constant in x but the objective is still smooth in u).
    """
    uc = jnp.asarray(controls)
    d = problem.dx

    def rhs_one(x, vx_neighbors, u):
        """Bellman RHS at one state against neighbor values [2, d]."""
        pp, pm, dt = mca.transition(problem, grid, x, u)
        g = problem.stage_cost(x, u)
        expect = jnp.sum(pp * vx_neighbors[0] + pm * vx_neighbors[1])
        return g * dt + jnp.exp(-problem.beta * dt) * expect

    def policy(x):
        """x [..., d] -> u [..., du]."""
        batch_shape = x.shape[:-1]
        xf = x.reshape(-1, d)  # [B, d]
        # neighbor points x +- h_j(x) e_j -> [B, 2, d(which), d(coord)];
        # local spacing so the stencil's neighbors match non-uniform grids
        hp, hm = grid.local_h(xf)
        eye = jnp.eye(d, dtype=xf.dtype)
        nb = jnp.stack([xf[:, None, :] + hp[:, :, None] * eye,
                        xf[:, None, :] - hm[:, :, None] * eye], axis=1)
        vnb = value_fn(nb.reshape(-1, d)).reshape(-1, 2, d)  # [B, 2, d]
        # all-candidates stencil (affine fast path when declared)
        pp, pm, dt = mca.transition_all_controls(problem, grid, xf, uc)
        g = mca.stage_cost_all(problem, xf, uc)              # [C, B]
        expect = jnp.sum(pp * vnb[None, :, 0] + pm * vnb[None, :, 1], axis=-1)
        rhs = (g * dt + jnp.exp(-problem.beta * dt) * expect).T  # [B, C]
        best = jnp.argmin(rhs, axis=-1)
        u = uc[best]  # [B, du]
        if refine_steps > 0:
            from c3sc_tpu.ops.argmin import lbfgs_minimize, pgd_minimize

            minimize = lbfgs_minimize if refine_method == "lbfgs" else pgd_minimize
            if value_grad_fn is not None:
                # continuous HJB Hamiltonian: grad v is u-independent, so
                # compute it ONCE per state and refine the smooth objective
                gv = value_grad_fn(xf)                       # [B, d]
                f = lambda ub: jax.vmap(
                    lambda x, g, uu: problem.stage_cost(x, uu)
                    + jnp.dot(g, problem.drift(x, uu)))(xf, gv, ub)
            else:
                f = lambda ub: jax.vmap(rhs_one)(xf, vnb, ub)
            u, _ = minimize(
                f, u, jnp.asarray(problem.ulb, u.dtype),
                jnp.asarray(problem.uub, u.dtype), n_iters=refine_steps,
            )
        return u.reshape(*batch_shape, problem.du)

    return policy
