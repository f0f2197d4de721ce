"""Batched iLQR trajectory optimizer over differentiable JAX dynamics.

The trajectory-optimization engine of the flagship deployment mode
(BASELINE.json north_star: "a TPU-native stochastic MPC / trajectory-
optimization engine"; configs[4] "receding-horizon replan"). First-order
shooting cannot optimize long horizons through open-loop-unstable plants —
measured on the 6D quadcopter, gradients through a 256-step horizon explode
and every projected-Adam step is rejected (sim/mpc_shoot.py keeps the
monotone guard). iLQR solves this the classical way: linearize the dynamics
along the nominal trajectory, quadraticize the discounted cost, run a
Riccati backward pass for feedforward k / FEEDBACK gains K, and roll the
forward pass closed-loop — the gains absorb the instability, so the local
model stays valid at any horizon.

TPU-first: everything is batched over scenarios with ``vmap`` and scanned
over time with ``lax.scan`` inside one jit; dynamics/cost derivatives come
from ``jax.jacfwd``/``jax.hessian`` of the problem callables (the reference
hand-assembles none of this — its c3opt minimizes per-node scalars,
SURVEY.md §2.2). The terminal cost-to-go is the learned value function:
its lerp gradient feeds Qx at the horizon; its curvature is absorbed by
the Levenberg regularization mu (a piecewise-multilinear V has no usable
Hessian).

Box control bounds: clamped in the forward pass (naive box-DDP); with the
per-sample line-search acceptance this is monotone in the true objective.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from c3sc_tpu.models.base import Boundary, ControlProblem


def make_ilqr_plan(
    problem: ControlProblem,
    value_fn: Callable,
    dt: float,
    horizon: int,
    n_iters: int = 10,
    mu0: float = 1.0,
    alphas=(1.0, 0.3, 0.1, 0.03, 0.01, 0.003),
):
    """Build ``plan(x0 [B, d], u_init [B, H, du]) -> u [B, H, du]``.

    Minimizes  sum_t e^(-beta t dt) g(x_t, u_t) dt + e^(-beta H dt) V(x_H)
    subject to x_{t+1} = clip(x_t + dt f(x_t, u_t)) (non-periodic dims) and
    u in [ulb, uub]. Per-sample line search keeps the iteration monotone.
    """
    d, du = problem.dx, problem.du
    dtf = jnp.float32(dt)
    beta = jnp.float32(problem.beta)
    ulb = jnp.asarray(problem.ulb, jnp.float32)
    uub = jnp.asarray(problem.uub, jnp.float32)
    lb = jnp.asarray(problem.lb, jnp.float32)
    ub = jnp.asarray(problem.ub, jnp.float32)
    periodic = jnp.asarray(
        [b == Boundary.PERIODIC for b in problem.boundary])
    w_t = jnp.exp(-beta * dtf * jnp.arange(horizon)).astype(jnp.float32)
    w_H = jnp.exp(-beta * dtf * horizon)

    def fstep(x, u):
        xn = x + problem.drift(x, u) * dtf
        return jnp.where(periodic, xn, jnp.clip(xn, lb, ub))

    fx_fn = jax.jacfwd(fstep, argnums=0)
    fu_fn = jax.jacfwd(fstep, argnums=1)
    g_fn = problem.stage_cost
    gx_fn = jax.grad(g_fn, argnums=0)
    gu_fn = jax.grad(g_fn, argnums=1)
    gxx_fn = jax.jacfwd(gx_fn, argnums=0)
    guu_fn = jax.jacfwd(gu_fn, argnums=1)
    gux_fn = jax.jacfwd(gu_fn, argnums=0)
    vgrad = jax.grad(lambda x: value_fn(x[None])[0])

    def rollout_open(x0, us):
        """Nominal forward: us [B, H, du] -> xs [H+1, B, d], J [B]."""

        def step(carry, inp):
            x, J = carry
            u, w = inp
            J = J + w * jax.vmap(g_fn)(x, u) * dtf
            xn = jax.vmap(fstep)(x, u)
            return (xn, J), x

        (xH, J), xs = jax.lax.scan(
            step, (x0, jnp.zeros(x0.shape[0], jnp.float32)),
            (jnp.swapaxes(us, 0, 1), w_t))
        J = J + w_H * value_fn(xH)
        return jnp.concatenate([xs, xH[None]], 0), J

    def backward(xs, us, mu):
        """Riccati sweep -> (k [H, B, du], K [H, B, du, d])."""
        xH = xs[-1]
        uH = jnp.swapaxes(us, 0, 1)[-1]
        Vx = w_H * jax.vmap(vgrad)(xH)                    # [B, d]
        # terminal curvature: a piecewise-multilinear V has no usable
        # Hessian, but the stationary cost-to-go of parking at x is
        # ~ g(x, u)/beta, whose exact Hessian gxx/beta is a smooth,
        # correctly-scaled curvature estimate — with Vxx_H = 0 the
        # backward pass underestimates Quu so badly that only
        # alpha <= 0.01 steps survive the line search (measured, 6D quad)
        Vxx = (w_H / beta) * jax.vmap(gxx_fn)(xH, uH)     # [B, d, d]

        def bstep(carry, inp):
            Vx, Vxx = carry
            x, u, w = inp                                  # [B, d], [B, du]
            A = jax.vmap(fx_fn)(x, u)                      # [B, d, d]
            Bm = jax.vmap(fu_fn)(x, u)                     # [B, d, du]
            lx = w * dtf * jax.vmap(gx_fn)(x, u)
            lu = w * dtf * jax.vmap(gu_fn)(x, u)
            lxx = w * dtf * jax.vmap(gxx_fn)(x, u)
            luu = w * dtf * jax.vmap(guu_fn)(x, u)
            lux = w * dtf * jax.vmap(gux_fn)(x, u)
            Qx = lx + jnp.einsum("bij,bi->bj", A, Vx)
            Qu = lu + jnp.einsum("bij,bi->bj", Bm, Vx)
            Qxx = lxx + jnp.einsum("bia,bij,bjc->bac", A, Vxx, A)
            Quu = luu + jnp.einsum("bia,bij,bjc->bac", Bm, Vxx, Bm)
            Qux = lux + jnp.einsum("bia,bij,bjc->bac", Bm, Vxx, A)
            Quu_reg = Quu + mu[:, None, None] * jnp.eye(du, dtype=jnp.float32)
            k = -jnp.linalg.solve(Quu_reg, Qu[..., None])[..., 0]
            K = -jnp.linalg.solve(Quu_reg, Qux)
            Vx_n = (Qx + jnp.einsum("bui,buv,bv->bi", K, Quu, k)
                    + jnp.einsum("bui,bu->bi", K, Qu)
                    + jnp.einsum("bui,bu->bi", Qux, k))
            Vxx_n = (Qxx + jnp.einsum("bui,buv,bvj->bij", K, Quu, K)
                     + jnp.einsum("bui,buj->bij", K, Qux)
                     + jnp.einsum("bui,buj->bji", K, Qux))
            Vxx_n = 0.5 * (Vxx_n + jnp.swapaxes(Vxx_n, -1, -2))
            return (Vx_n, Vxx_n), (k, K)

        (_, _), (ks, Ks) = jax.lax.scan(
            bstep, (Vx, Vxx),
            (xs[:-1], jnp.swapaxes(us, 0, 1), w_t), reverse=True)
        return ks, Ks

    def forward(x0, xs, us, ks, Ks, alpha):
        """Closed-loop forward with feedback -> (us_new [B, H, du], J [B])."""

        def step(carry, inp):
            x, J = carry
            x_nom, u_nom, k, K, w = inp
            un = u_nom + alpha * k + jnp.einsum("bij,bj->bi", K, x - x_nom)
            un = jnp.clip(un, ulb, uub)
            J = J + w * jax.vmap(g_fn)(x, un) * dtf
            xn = jax.vmap(fstep)(x, un)
            return (xn, J), un

        (xH, J), us_new = jax.lax.scan(
            step, (x0, jnp.zeros(x0.shape[0], jnp.float32)),
            (xs[:-1], jnp.swapaxes(us, 0, 1), ks, Ks, w_t))
        J = J + w_H * value_fn(xH)
        return jnp.swapaxes(us_new, 0, 1), J

    def plan(x0, u_init):
        def it(carry, _):
            us, J, mu = carry
            xs, _ = rollout_open(x0, us)
            ks, Ks = backward(xs, us, mu)
            # per-sample line search over alphas, monotone vs current J
            best_us, best_J = us, J
            for a in alphas:
                us_a, J_a = forward(x0, xs, us, ks, Ks, jnp.float32(a))
                better = J_a < best_J
                best_us = jnp.where(better[:, None, None], us_a, best_us)
                best_J = jnp.where(better, J_a, best_J)
            # adaptive Levenberg: per-sample mu shrinks on acceptance,
            # grows when every alpha was rejected (local model invalid)
            accepted = best_J < J
            mu = jnp.clip(jnp.where(accepted, mu / 3.0, mu * 5.0),
                          1e-3, 1e6)
            return (best_us, best_J, mu), None

        _, J0 = rollout_open(x0, u_init)
        mu = jnp.full(x0.shape[0], jnp.float32(mu0))
        (us, _, _), _ = jax.lax.scan(it, (u_init, J0, mu), None,
                                     length=n_iters)
        return us

    return plan, lambda us, x0: rollout_open(x0, us)[1]
