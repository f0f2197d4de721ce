"""Terminal basin controller: exact discounted LQR around the goal
equilibrium — the second mode of a dual-mode receding-horizon deployment.

Why this exists (measured, round 5). The flagship deployment bar compares
the production-field MPC against the oracle-field MPC under common random
numbers. The parking diagnosis (``experiments/park_diag.py``) showed the
ENTIRE seed-0 gap (+12.5%) lives in the parked-phase tail, and virtually
all of it in ONE state dimension (altitude): the realized cost is decided
by where the plant dithers between near-tied thrust candidates, and value
fields accurate to 1-3% of range draw that lottery quasi-randomly (the
round-4 frontier measured 0.5-25% greedy deviation for SVD-OPTIMAL 0.1%
truncations). Planner-strength ablations (horizon 128->192, 2x iLQR
iterations) moved nothing: with discount ``beta=0.2`` the terminal-value
tilt dominates the horizon stage cost for any tractable horizon.

The control-engineering answer is standard dual-mode MPC (Mayne et al.,
"Constrained model predictive control: Stability and optimality",
Automatica 2000): inside a terminal basin of the goal, switch to the
terminal controller whose existence the MPC's stability argument assumes
anyway. Near the equilibrium the problem IS a discounted LQR — the
linearized dynamics plus the (here exactly) quadratic stage cost — and
its Riccati solution is computable in closed form from the problem spec
alone, with no dependence on the learned value field. Under CRN both the
production and oracle deployments use the identical terminal controller,
so the parked phase stops being a field-error lottery and the comparison
measures what the north star actually cares about: the transient driven
by the learned cost-to-go.

The reference's deployment is a per-step ``c3opt`` argmin against the
value function (``c3sc/src/simulate.c`` — line n/a, empty mount;
SURVEY.md §3.3); it has no terminal controller because its examples stop
at greedy extraction. This module is a deployment-layer addition, not a
parity shim — the solver output is unchanged, and the pure-MPC numbers
are still reported alongside (``NORTHSTAR*.json`` ``deployment_mpc.
pure_mpc``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models.base import ControlProblem


class TerminalLQR(NamedTuple):
    """Gains + basin geometry for the terminal mode.

    u(x) = clip(u_eq - K (x - x_eq)) applied where
    || (x - x_eq) / scale ||_2 < radius.
    """

    x_eq: jax.Array      # [dx]
    u_eq: jax.Array      # [du]
    K: jax.Array         # [du, dx] feedback gains
    scale: jax.Array     # [dx] per-dim normalization (half-widths)
    radius: float


def find_equilibrium_control(problem: ControlProblem, x_eq) -> np.ndarray:
    """Least-squares u_eq with drift(x_eq, u_eq) ~ 0, clipped to U.

    Control-affine problems solve G(x_eq) u = -f0(x_eq) directly; the
    general path does a few Gauss-Newton steps on ||drift||^2 from the
    box midpoint.
    """
    x_eq = jnp.asarray(np.asarray(x_eq, np.float32))
    ulb = np.asarray(problem.ulb, np.float64)
    uub = np.asarray(problem.uub, np.float64)
    if problem.drift_f0 is not None and problem.drift_G is not None:
        G = np.asarray(problem.drift_G(x_eq), np.float64)
        f0 = np.asarray(problem.drift_f0(x_eq), np.float64)
        u, *_ = np.linalg.lstsq(G, -f0, rcond=None)
        return np.clip(u, ulb, uub)
    u = 0.5 * (ulb + uub)
    jac = jax.jacobian(problem.drift, argnums=1)
    for _ in range(20):
        r = np.asarray(problem.drift(x_eq, jnp.asarray(u)), np.float64)
        J = np.asarray(jac(x_eq, jnp.asarray(u)), np.float64)
        du, *_ = np.linalg.lstsq(J, -r, rcond=None)
        u = np.clip(u + du, ulb, uub)
        if np.linalg.norm(du) < 1e-12:
            break
    return u


def make_terminal_lqr(
    problem: ControlProblem,
    dt: float,
    x_eq=None,
    u_eq=None,
    radius: float = 0.35,
    n_iters: int = 5000,
    tol: float = 1e-12,
) -> TerminalLQR:
    """Discounted discrete-time LQR gains at the goal equilibrium.

    Linearizes drift at (x_eq, u_eq), Euler-discretizes at the plant dt
    (A_d = I + dt A, B_d = dt B — matching the deployed integrator), takes
    the exact stage-cost Hessian blocks (Q, R, cross S) via ``jax.hessian``,
    and iterates the discounted Riccati recursion with per-step discount
    ``gamma = exp(-beta dt)`` to its fixed point in float64 on the host
    (microseconds; done once per deployment).

    Everything is derived from the problem spec — the learned value field
    is never consulted, which is the point (module docstring).
    """
    if x_eq is None:
        x_eq = np.zeros(problem.dx)
    x_eq = np.asarray(x_eq, np.float64)
    # everything here is microscopic host math (6x6 jacobians, a Riccati
    # fixed point) — pin it to the CPU backend so a tunneled TPU is never
    # in the loop (a [6,2] device->host readback over the axon relay was
    # measured hanging indefinitely; the gains are consumed as constants
    # by the deployment jit anyway)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        if u_eq is None:
            u_eq = find_equilibrium_control(problem, x_eq)
        u_eq = np.asarray(u_eq, np.float64)

        xj = jnp.asarray(x_eq, jnp.float32)
        uj = jnp.asarray(u_eq, jnp.float32)
        A = np.asarray(jax.jacobian(problem.drift, 0)(xj, uj), np.float64)
        B = np.asarray(jax.jacobian(problem.drift, 1)(xj, uj), np.float64)
        # stage-cost quadratic model: g ~ g0 + 0.5 [dx du] H [dx; du]
        Qxx = np.asarray(
            jax.hessian(problem.stage_cost, 0)(xj, uj), np.float64)
        Ruu = np.asarray(
            jax.hessian(problem.stage_cost, 1)(xj, uj), np.float64)
        Sxu = np.asarray(
            jax.jacobian(jax.grad(problem.stage_cost, 0), 1)(xj, uj),
            np.float64)

    dx = problem.dx
    Ad = np.eye(dx) + dt * A
    Bd = dt * B
    Qd = 0.5 * Qxx * dt
    Rd = 0.5 * Ruu * dt + 1e-10 * np.eye(problem.du)
    Sd = 0.5 * Sxu * dt
    gam = float(np.exp(-problem.beta * dt))

    P = Qd.copy()
    K = np.zeros((problem.du, dx))
    for _ in range(n_iters):
        BtP = Bd.T @ (gam * P)
        Huu = Rd + BtP @ Bd
        Hux = BtP @ Ad + Sd.T
        K_new = np.linalg.solve(Huu, Hux)
        P_new = (Qd + gam * Ad.T @ P @ Ad
                 - K_new.T @ Huu @ K_new)
        P_new = 0.5 * (P_new + P_new.T)
        if np.max(np.abs(P_new - P)) < tol * max(1.0, np.max(np.abs(P))):
            P = P_new
            K = K_new
            break
        P, K = P_new, K_new

    scale = 0.5 * (np.asarray(problem.ub, np.float64)
                   - np.asarray(problem.lb, np.float64))
    return TerminalLQR(
        x_eq=jnp.asarray(x_eq, jnp.float32),
        u_eq=jnp.asarray(u_eq, jnp.float32),
        K=jnp.asarray(K, jnp.float32),
        scale=jnp.asarray(scale, jnp.float32),
        radius=float(radius),
    )


def terminal_control(tlqr: TerminalLQR, x, ulb, uub):
    """Batched terminal-mode action + basin mask.

    x [B, dx] -> (u_lqr [B, du], in_basin [B]).
    """
    dxs = x - tlqr.x_eq[None, :]
    r = jnp.linalg.norm(dxs / tlqr.scale[None, :], axis=-1)
    u = jnp.clip(tlqr.u_eq[None, :] - dxs @ tlqr.K.T, ulb, uub)
    return u, r < tlqr.radius
