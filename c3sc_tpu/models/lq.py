"""2D stochastic double-integrator LQ problem + analytic Riccati oracle.

Reference: the LQ/double-integrator example of ``c3sc/examples`` (line n/a,
empty mount; SURVEY.md §2.1) — the canonical analytic-validation config
(BASELINE.json configs[0]).

    dx1 = x2 dt
    dx2 = u dt + sigma dw
    g(x, u) = x' Q x + u' R u,  discounted at rate beta.

Discounted-LQR oracle: V(x) = x' P x + tr(S P)/beta with P solving the
discounted CARE (A - beta/2 I)'P + P(A - beta/2 I) - P B R^-1 B' P + Q = 0,
and u*(x) = -R^-1 B' P x.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from c3sc_tpu.models.base import Boundary, ControlProblem

A = np.array([[0.0, 1.0], [0.0, 0.0]])
B = np.array([[0.0], [1.0]])


def make_lq_problem(
    q: float = 1.0,
    r: float = 1.0,
    sigma: float = 1.0,
    beta: float = 1.0,
    xmax: float = 2.0,
    umax: float = 6.0,
) -> ControlProblem:
    Q = np.eye(2) * q
    R = np.eye(1) * r

    def drift(x, u):
        return jnp.stack([x[1], u[0]])

    def diff(x, u):
        return jnp.array([[0.0], [sigma]])

    def stage_cost(x, u):
        return x @ (Q @ x) + u @ (R @ u)

    def boundary_cost(x):
        # absorbing box edge: charge the analytic interior value so the
        # boundary perturbs the interior solution as little as possible
        P, c, _ = lqr_solution(q=q, r=r, sigma=sigma, beta=beta)
        return x @ (jnp.asarray(P) @ x) + c

    return ControlProblem(
        dx=2, du=1, dw=1,
        lb=(-xmax, -xmax), ub=(xmax, xmax),
        boundary=(Boundary.ABSORB, Boundary.ABSORB),
        ulb=(-umax,), uub=(umax,),
        drift=drift, diff=diff,
        stage_cost=stage_cost, boundary_cost=boundary_cost,
        drift_f0=lambda x: jnp.stack([x[1], jnp.zeros(())]),
        drift_G=lambda x: jnp.array([[0.0], [1.0]]),
        sigma2_x=lambda x: jnp.array([0.0, sigma**2]),
        cost_q=lambda x: x @ (jnp.asarray(Q) @ x),
        cost_r=lambda u: u @ (jnp.asarray(R) @ u),
        beta=beta, name="lq",
    )


def make_lq_family(
    q: float = 1.0,
    r: float = 1.0,
    sigma: float = 1.0,
    beta: float = 1.0,
    xmax: float = 2.0,
    umax: float = 6.0,
):
    """Setpoint-tracking LQ problem FAMILY: ``family(theta) ->
    ControlProblem`` with stage cost (x - theta)' Q (x - theta) + u' R u.

    theta [2] may be a traced array — the closures are pure JAX functions
    of (x, u, theta), which is what lets ``sim/tracking.py`` re-solve a
    cost change as a dispatch of one compiled program instead of a
    recompile (the time-varying-cost north-star sentence).
    """
    Q = np.eye(2) * q
    R = np.eye(1) * r
    P, c, _ = lqr_solution(q=q, r=r, sigma=sigma, beta=beta)

    def family(theta):
        theta = jnp.asarray(theta)

        def stage_cost(x, u):
            e = x - theta
            return e @ (jnp.asarray(Q) @ e) + u @ (jnp.asarray(R) @ u)

        def boundary_cost(x):
            e = x - theta
            return e @ (jnp.asarray(P) @ e) + c

        return ControlProblem(
            dx=2, du=1, dw=1,
            lb=(-xmax, -xmax), ub=(xmax, xmax),
            boundary=(Boundary.ABSORB, Boundary.ABSORB),
            ulb=(-umax,), uub=(umax,),
            drift=lambda x, u: jnp.stack([x[1], u[0]]),
            diff=lambda x, u: jnp.array([[0.0], [sigma]]),
            stage_cost=stage_cost, boundary_cost=boundary_cost,
            drift_f0=lambda x: jnp.stack([x[1], jnp.zeros(())]),
            drift_G=lambda x: jnp.array([[0.0], [1.0]]),
            sigma2_x=lambda x: jnp.array([0.0, sigma**2]),
            cost_q=lambda x: (x - theta) @ (jnp.asarray(Q) @ (x - theta)),
            cost_r=lambda u: u @ (jnp.asarray(R) @ u),
            beta=beta, name="lq_tracking",
        )

    return family


def lqr_solution(q: float = 1.0, r: float = 1.0, sigma: float = 1.0, beta: float = 1.0):
    """Analytic discounted stochastic LQR: returns (P [2,2], const, K [1,2])
    with V(x) = x'Px + const and u*(x) = -K x."""
    import scipy.linalg

    Q = np.eye(2) * q
    R = np.eye(1) * r
    Ad = A - 0.5 * beta * np.eye(2)
    P = scipy.linalg.solve_continuous_are(Ad, B, Q, R)
    K = np.linalg.solve(R, B.T @ P)
    S = np.array([[0.0], [sigma]]) @ np.array([[0.0, sigma]])
    const = float(np.trace(S @ P) / beta) if beta > 0 else 0.0
    return P, const, K
