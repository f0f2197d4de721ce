"""Batched inner minimization over controls — the ``c3Opt`` equivalent.

Reference: C3 ``src/lib_optimization/optimization.c`` ``c3opt_minimize``
(BFGS / projected gradient / brute force over candidates; box bounds —
line n/a, empty mount; SURVEY.md §2.2). The reference runs one scalar
optimizer per grid node; here every node optimizes simultaneously:

- brute force: vmap over a candidate set + argmin (the kernels' default,
  matching the reference's ``c3opt_set_brute_force_vals`` mode);
- projected gradient with PARALLEL line search: per iteration evaluate all
  trial step sizes at once and keep the best — fixed iteration count,
  no data-dependent control flow, gradients from ``jax.grad`` (replacing
  the reference's hand-assembled Bellman RHS gradients);
- hybrid refine: brute-force winner as the start point for a few projected
  gradient steps — recovers continuous-control accuracy beyond the
  candidate grid spacing.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

DEFAULT_STEPS = (1.0, 0.3, 0.1, 0.03, 0.01)


def pgd_minimize(
    f: Callable,
    u0,
    lb,
    ub,
    n_iters: int = 10,
    step_sizes=DEFAULT_STEPS,
):
    """Batched box-constrained minimization.

    f: [B, du] -> [B] (traceable, differentiable). u0: [B, du] starts.
    Per iteration: compute the batched gradient, propose
    clip(u - s * g * scale) for every trial step s (scaled per-node by the
    box span), evaluate all proposals in parallel, keep the argmin (current
    point included, so the objective never increases).
    Returns (u_opt [B, du], f_opt [B]).
    """
    lb = jnp.asarray(lb, u0.dtype)
    ub = jnp.asarray(ub, u0.dtype)
    span = ub - lb
    steps = jnp.asarray(step_sizes, u0.dtype)
    grad_f = jax.grad(lambda u: jnp.sum(f(u)))

    def body(_, carry):
        u, fu = carry
        g = grad_f(u)  # [B, du]
        gn = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-12)
        # proposals: [S, B, du]
        props = jnp.clip(u[None] - steps[:, None, None] * gn[None] * span, lb, ub)
        fp = jax.vmap(f)(props)  # [S, B]
        all_f = jnp.concatenate([fu[None], fp], axis=0)          # [S+1, B]
        all_u = jnp.concatenate([u[None], props], axis=0)        # [S+1, B, du]
        best = jnp.argmin(all_f, axis=0)                          # [B]
        fu = jnp.take_along_axis(all_f, best[None], axis=0)[0]
        u = jnp.take_along_axis(all_u, best[None, :, None], axis=0)[0]
        return u, fu

    u0 = jnp.clip(u0, lb, ub)
    return jax.lax.fori_loop(0, n_iters, body, (u0, f(u0)))


def lbfgs_minimize(
    f: Callable,
    u0,
    lb,
    ub,
    n_iters: int = 15,
    history: int = 5,
    step_sizes=(1.0, 0.5, 0.1, 0.03, 0.01),
):
    """Batched box-constrained L-BFGS — the ``c3opt_create(BFGS)`` backend.

    Reference: C3 ``lib_optimization/optimization.c`` BFGS/LBFGS modes
    (line n/a, empty mount; SURVEY.md §2.2). The reference runs one scalar
    quasi-Newton per node with a Wolfe line search; here every node runs
    simultaneously: a limited-memory two-loop recursion vectorized over the
    batch, a PARALLEL line search (all trial steps evaluated at once, best
    kept, current point included so the objective is monotone), and box
    bounds enforced by projection of every trial. Fixed iteration count —
    no data-dependent control flow, so the whole solve jits into one XLA
    program.

    f: [B, du] -> [B]. Returns (u_opt [B, du], f_opt [B]).
    """
    lb = jnp.asarray(lb, u0.dtype)
    ub = jnp.asarray(ub, u0.dtype)
    steps = jnp.asarray(step_sizes, u0.dtype)
    grad_f = jax.grad(lambda u: jnp.sum(f(u)))
    B, du = u0.shape
    m = history

    def direction(g, S, Y, rho):
        # two-loop recursion, batched; invalid history rows have rho=0 and
        # contribute exactly nothing.
        q = g
        alphas = []
        for i in range(m - 1, -1, -1):
            a = rho[i] * jnp.sum(S[i] * q, axis=-1)      # [B]
            q = q - a[:, None] * Y[i]
            alphas.append(a)
        alphas = alphas[::-1]
        yy = jnp.sum(Y[m - 1] * Y[m - 1], axis=-1)
        sy = jnp.sum(S[m - 1] * Y[m - 1], axis=-1)
        gamma = jnp.where(yy > 1e-12, sy / (yy + 1e-12), 1.0)  # [B]
        r = gamma[:, None] * q
        for i in range(m):
            b = rho[i] * jnp.sum(Y[i] * r, axis=-1)
            r = r + S[i] * (alphas[i] - b)[:, None]
        return -r

    def body(_, carry):
        u, fu, g, S, Y, rho = carry
        d = direction(g, S, Y, rho)
        # normalize so unit step ~ box span (same convention as pgd)
        dn = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
        span = ub - lb
        props = jnp.clip(u[None] + steps[:, None, None] * dn[None] * span,
                         lb, ub)                                   # [S, B, du]
        # projected-gradient fallback proposals guard against bad curvature
        gn = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-12)
        props_g = jnp.clip(u[None] - steps[:, None, None] * gn[None] * span,
                           lb, ub)
        all_u = jnp.concatenate([u[None], props, props_g], axis=0)
        all_f = jnp.concatenate([fu[None], jax.vmap(f)(props),
                                 jax.vmap(f)(props_g)], axis=0)
        best = jnp.argmin(all_f, axis=0)
        fn = jnp.take_along_axis(all_f, best[None], axis=0)[0]
        un = jnp.take_along_axis(all_u, best[None, :, None], axis=0)[0]
        gnew = grad_f(un)
        s_vec = un - u
        y_vec = gnew - g
        sy = jnp.sum(s_vec * y_vec, axis=-1)
        rho_new = jnp.where(sy > 1e-10, 1.0 / (sy + 1e-12), 0.0)   # [B]
        S = jnp.concatenate([S[1:], s_vec[None]], axis=0)
        Y = jnp.concatenate([Y[1:], y_vec[None]], axis=0)
        rho = jnp.concatenate([rho[1:], rho_new[None]], axis=0)
        return un, fn, gnew, S, Y, rho

    u0 = jnp.clip(u0, lb, ub)
    g0 = grad_f(u0)
    S0 = jnp.zeros((m, B, du), u0.dtype)
    Y0 = jnp.zeros((m, B, du), u0.dtype)
    rho0 = jnp.zeros((m, B), u0.dtype)
    u, fu, *_ = jax.lax.fori_loop(0, n_iters, body,
                                  (u0, f(u0), g0, S0, Y0, rho0))
    return u, fu


def brute_force_minimize(f: Callable, candidates):
    """f: [C, ...] -> [C, B] evaluated rhs per candidate; returns
    (u_best [B, du], f_best [B])."""
    vals = f(candidates)  # [C, B]
    best = jnp.argmin(vals, axis=0)
    return candidates[best], jnp.min(vals, axis=0)
