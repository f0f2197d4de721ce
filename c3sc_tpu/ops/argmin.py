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


def brute_force_minimize(f: Callable, candidates):
    """f: [C, ...] -> [C, B] evaluated rhs per candidate; returns
    (u_best [B, du], f_best [B])."""
    vals = f(candidates)  # [C, B]
    best = jnp.argmin(vals, axis=0)
    return candidates[best], jnp.min(vals, axis=0)
