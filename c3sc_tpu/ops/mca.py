"""Kushner–Dupuis Markov-chain-approximation transition stencil.

TPU-native re-design of the reference's MCA core (``c3sc/src/tensmarkov.c``
``transition_assemble`` — line n/a, empty mount; SURVEY.md §2.1): from drift
f(x,u), diagonal diffusion variance sigma^2(x,u) and grid spacings h, build
the locally consistent upwind transition probabilities to the 2*dx axis
neighbors and the interpolation interval dt(x,u):

    Q_j  = sigma2_j / h_j^2 + |f_j| / h_j,        Q = sum_j Q_j
    p+_j = (sigma2_j / (2 h_j^2) + max(f_j, 0) / h_j) / Q
    p-_j = (sigma2_j / (2 h_j^2) + max(-f_j, 0) / h_j) / Q
    dt   = 1 / Q

Probabilities are nonnegative and sum to exactly 1 (no self transition);
local consistency: E[dx] = f dt, E[dx^2] = sigma2 dt + O(h dt).

Unlike the reference — which hand-codes d(p)/du and d(dt)/du
(``tensmarkov.c`` gradient variants) — everything here is plain JAX, so
gradients w.r.t. u come from ``jax.grad`` for free and the whole stencil is
vmappable over nodes x controls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c3sc_tpu.grids import Grid
from c3sc_tpu.models.base import Boundary, ControlProblem

_EPS = 1e-10


def transition(problem: ControlProblem, grid: Grid, x, u):
    """Unbatched stencil at one (x [d], u [m]).

    Returns (p_plus [d], p_minus [d], dt scalar). Non-uniform grids use
    the unequal-spacing upwind scheme (see ``_stencil_from_fs2``).
    """
    f = problem.drift(x, u)
    s2 = problem.sigma2_diag(x, u)
    if grid.uniform:
        h = jnp.asarray(grid.h, dtype=f.dtype)
        diffpart = 0.5 * s2 / h**2
        qj = 2.0 * diffpart + jnp.abs(f) / h
        q = jnp.sum(qj) + _EPS
        p_plus = (diffpart + jnp.maximum(f, 0.0) / h) / q
        p_minus = (diffpart + jnp.maximum(-f, 0.0) / h) / q
        return p_plus, p_minus, 1.0 / q
    hp, hm = grid.local_h(x)
    return _stencil_nonuniform(f, s2, hp.astype(f.dtype),
                               hm.astype(f.dtype))


def _stencil_nonuniform(f, s2, hp, hm):
    """Kushner–Dupuis upwind stencil with unequal spacings h+ / h-
    (reference: C3 linelm operates on arbitrary node sets — SURVEY.md
    §2.2; the scheme is the standard non-uniform-grid generalization):

        Q_j  = s2_j/(h+ h-) + f+_j/h+ + f-_j/h-,    Q = sum_j Q_j
        p+_j = (s2_j/(h+ (h+ + h-)) + f+_j/h+) / Q
        p-_j = (s2_j/(h- (h+ + h-)) + f-_j/h-) / Q,   dt = 1/Q

    Exactly locally consistent: probabilities sum to 1,
    E[dx] = f dt, E[dx^2] = s2 dt + O(h f dt); reduces to the uniform
    scheme when h+ == h-. All shapes broadcast over leading axes.
    """
    fp = jnp.maximum(f, 0.0)
    fm = jnp.maximum(-f, 0.0)
    qj = s2 / (hp * hm) + fp / hp + fm / hm
    q = jnp.sum(qj, axis=-1, keepdims=True) + _EPS
    p_plus = (s2 / (hp * (hp + hm)) + fp / hp) / q
    p_minus = (s2 / (hm * (hp + hm)) + fm / hm) / q
    return p_plus, p_minus, 1.0 / q[..., 0]


def transition_batch(problem: ControlProblem, grid: Grid, x, u):
    """Stencil batched over arbitrary leading axes of x [..., d], u [..., m]."""
    fn = lambda xx, uu: transition(problem, grid, xx, uu)
    for _ in range(x.ndim - 1):
        fn = jax.vmap(fn)
    return fn(x, u)


def _stencil_from_fs2(f, s2, h):
    """Elementwise Kushner–Dupuis stencil given drift f [..., d] and
    variance s2 (broadcastable to f). Returns (p_plus, p_minus, dt)."""
    diffpart = 0.5 * s2 / h**2
    qj = 2.0 * diffpart + jnp.abs(f) / h
    q = jnp.sum(qj, axis=-1, keepdims=True) + _EPS
    p_plus = (diffpart + jnp.maximum(f, 0.0) / h) / q
    p_minus = (diffpart + jnp.maximum(-f, 0.0) / h) / q
    return p_plus, p_minus, 1.0 / q[..., 0]


def transition_all_controls(problem: ControlProblem, grid: Grid, x, uc):
    """Stencil for ALL control candidates at once: x [B, d], uc [C, du] ->
    (p_plus [C, B, d], p_minus [C, B, d], dt [C, B]).

    The hot-loop form of the reference's per-(node, control) scalar
    ``transition_assemble`` (SURVEY.md §3.1). When the problem declares
    control-affine drift (``drift_f0``/``drift_G``), the drift for every
    candidate comes from ONE batched [B, d, du] x [C, du] contraction that
    XLA maps onto the MXU, and control-independent diffusion (``sigma2_x``)
    is computed once instead of C times. Falls back to a vmap over
    candidates for fully nonlinear problems (e.g. the glider's angle-of-
    attack controls).
    """
    B = x.shape[0]
    C = uc.shape[0]
    if problem.drift_f0 is not None and problem.drift_G is not None:
        f0 = jax.vmap(problem.drift_f0)(x)                   # [B, d]
        G = jax.vmap(problem.drift_G)(x)                     # [B, d, du]
        f = f0[None] + jnp.einsum("bdm,cm->cbd", G, uc)      # [C, B, d]
    else:
        f = jax.vmap(
            lambda u: jax.vmap(lambda xx: problem.drift(xx, u))(x)
        )(uc)                                                # [C, B, d]
    if problem.sigma2_x is not None:
        s2 = jax.vmap(problem.sigma2_x)(x)[None]             # [1, B, d]
    else:
        s2 = jax.vmap(
            lambda u: jax.vmap(lambda xx: problem.sigma2_diag(xx, u))(x)
        )(uc)                                                # [C, B, d]
    if grid.uniform:
        h = jnp.asarray(grid.h, dtype=f.dtype)
        return _stencil_from_fs2(f, s2, h)
    hp, hm = grid.local_h(x)                                 # [B, d] each
    return _stencil_nonuniform(f, s2, hp[None].astype(f.dtype),
                               hm[None].astype(f.dtype))


def stage_cost_all(problem: ControlProblem, x, uc):
    """g(x, u) for all candidates: x [B, d], uc [C, du] -> [C, B].

    Separable costs (``cost_q``/``cost_r``) evaluate the state part once and
    the control part once (outer sum); otherwise vmap over both."""
    if problem.cost_q is not None and problem.cost_r is not None:
        q = jax.vmap(problem.cost_q)(x)                      # [B]
        r = jax.vmap(problem.cost_r)(uc)                     # [C]
        return r[:, None] + q[None, :]
    return jax.vmap(
        lambda u: jax.vmap(lambda xx: problem.stage_cost(xx, u))(x)
    )(uc)


def node_terminal(problem: ControlProblem, grid: Grid, idx, x):
    """Classify grid nodes as terminal (absorbing) and give their pinned value.

    Reference: boundary-regime queries in ``c3sc/src/boundary.c`` (line n/a;
    SURVEY.md §2.1). A node is terminal iff it lies on the face of a
    dimension whose external boundary is ABSORB, or inside an obstacle
    rectangle. Terminal value: obstacle cost if inside an obstacle (obstacles
    take precedence — they are *internal* absorbing regions), else the
    boundary exit cost psi(x).

    Args:
      idx: [..., d] int node indices.  x: [..., d] node states.
    Returns:
      (terminal_mask [...], terminal_value [...]).
    """
    n = jnp.asarray(grid.shape, jnp.int32)
    on_face = jnp.zeros(idx.shape[:-1], dtype=bool)
    for k in range(problem.dx):
        if problem.boundary[k] == Boundary.ABSORB:
            on_face = on_face | (idx[..., k] == 0) | (idx[..., k] == n[k] - 1)
    in_obs = problem.in_obstacle(x)
    psi = jax.vmap(problem.boundary_cost)(x.reshape(-1, problem.dx)).reshape(x.shape[:-1])
    value = jnp.where(in_obs, problem.obstacle_cost(x), psi)
    return on_face | in_obs, value
