"""Problem specification for continuous-time stochastic optimal control.

TPU-native re-design of the reference's problem-definition API
(``c3sc/src/c3sc.c`` ``struct C3Control`` + ``dynamics.c`` ``struct Dyn`` +
``cost.c`` + ``boundary.c`` — line n/a, empty mount; SURVEY.md §2.1).

The controlled diffusion is

    dx = f(x, u) dt + L(x, u) dw,   x in X subset R^dx, u in U = [ulb, uub]

with discounted cost

    J(x) = E[ ∫_0^tau e^{-beta t} g(x_t, u_t) dt + e^{-beta tau} psi(x_tau) ]

where tau is the exit time through an absorbing boundary / obstacle.

Unlike the reference's callback-pointer design, everything here is a pure
JAX-traceable function of (x, u): the whole spec is vmappable and
differentiable, so MCA stencil gradients w.r.t. u come from ``jax.grad``
instead of the reference's hand-coded Jacobian plumbing
(``tensmarkov.c`` gradient variants).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid

Array = jnp.ndarray


class Boundary(enum.IntEnum):
    """Per-dimension external boundary regime.

    Reference: ``c3control_set_external_boundary(dim, "absorb"|"reflect"|
    "periodic")`` in ``c3sc/src/boundary.c`` (line n/a; SURVEY.md §2.1).
    """

    ABSORB = 0   # exit: value at the boundary node is the exit cost psi(x)
    REFLECT = 1  # outward transition mass sticks at the node (projection)
    PERIODIC = 2  # wraps (angles)


@dataclasses.dataclass(frozen=True)
class Obstacle:
    """Internal absorbing hyper-rectangle with its own exit cost.

    Reference: ``c3control_add_obstacle`` / ``boundary_add_obstacle``
    (``c3sc/src/boundary.c`` — line n/a).
    """

    lb: tuple[float, ...]
    ub: tuple[float, ...]
    cost: float  # value assigned on absorption into the obstacle

    def contains(self, x: Array) -> Array:
        """Boolean mask [...] of states inside the (closed) rectangle."""
        lb = jnp.asarray(self.lb)
        ub = jnp.asarray(self.ub)
        return jnp.all((x >= lb) & (x <= ub), axis=-1)


@dataclasses.dataclass(frozen=True)
class ControlProblem:
    """Complete SOC problem definition (the `struct C3Control` equivalent).

    All callables take unbatched (x[dx], u[du]) and are vmapped by the
    framework; they must be jit-traceable (no python control flow on values).
    """

    dx: int
    du: int
    dw: int
    # state box; per-dim boundary regime
    lb: tuple[float, ...]
    ub: tuple[float, ...]
    boundary: tuple[Boundary, ...]
    # control box U = [ulb, uub]
    ulb: tuple[float, ...]
    uub: tuple[float, ...]
    # dynamics: f(x,u) -> [dx], L(x,u) -> [dx, dw]
    drift: Callable[[Array, Array], Array]
    diff: Callable[[Array, Array], Array]
    # costs
    stage_cost: Callable[[Array, Array], Array]       # g(x,u) -> scalar
    boundary_cost: Callable[[Array], Array]           # psi(x) -> scalar
    beta: float = 0.0                                  # discount rate
    obstacles: tuple[Obstacle, ...] = ()
    name: str = "problem"
    # provable value-function range (lo, hi): for discounted exit problems
    # v* in [0, max(sup psi, sup g / beta)]. When set, solvers clamp both
    # backup targets and TT neighbor evaluations into it — a strong
    # stabilizer for rank-limited TT approximation (outliers cannot feed
    # back through the Bellman operator).
    value_bounds: tuple | None = None
    # ---- optional structure declarations (performance fast paths) ----
    # Control-affine drift: f(x, u) = drift_f0(x) + drift_G(x) @ u. When
    # both are set, the Bellman kernels evaluate the drift for ALL control
    # candidates with ONE [B, dx, du] x [C, du] contraction (MXU) instead of
    # re-running the full dynamics per candidate. Must satisfy
    # drift(x, u) == drift_f0(x) + drift_G(x) @ u exactly (tested).
    drift_f0: Optional[Callable[[Array], Array]] = None   # x -> [dx]
    drift_G: Optional[Callable[[Array], Array]] = None    # x -> [dx, du]
    # Control-independent diffusion: sigma2_x(x) == diag(L L^T)(x, ·).
    sigma2_x: Optional[Callable[[Array], Array]] = None   # x -> [dx]
    # Separable stage cost: g(x, u) = cost_q(x) + cost_r(u).
    cost_q: Optional[Callable[[Array], Array]] = None     # x -> scalar
    cost_r: Optional[Callable[[Array], Array]] = None     # u -> scalar

    def sigma2_diag(self, x: Array, u: Array) -> Array:
        """diag(L L^T)(x, u) — the per-dim diffusion variances the MCA
        stencil consumes (reference assumes diagonal covariance in
        ``tensmarkov.c``; SURVEY.md §2.1)."""
        L = self.diff(x, u)
        return jnp.sum(L * L, axis=-1)

    def in_obstacle(self, x: Array) -> Array:
        """Mask [...] — inside any obstacle."""
        if not self.obstacles:
            return jnp.zeros(x.shape[:-1], dtype=bool)
        masks = [ob.contains(x) for ob in self.obstacles]
        return jnp.any(jnp.stack(masks, axis=0), axis=0)

    def obstacle_cost(self, x: Array) -> Array:
        """Exit cost for obstacle absorption, [...] (0 outside obstacles)."""
        if not self.obstacles:
            return jnp.zeros(x.shape[:-1], dtype=jnp.result_type(float))
        cost = jnp.zeros(x.shape[:-1], dtype=jnp.result_type(float))
        for ob in self.obstacles:
            cost = jnp.where(ob.contains(x), ob.cost, cost)
        return cost

    def default_grid(self, n: int | tuple[int, ...]) -> Grid:
        if isinstance(n, int):
            n = (n,) * self.dx
        periodic = tuple(b == Boundary.PERIODIC for b in self.boundary)
        return Grid.create(self.lb, self.ub, n, periodic)

    def control_candidates(self, n: int | tuple[int, ...]) -> np.ndarray:
        """Tensor-product brute-force control candidate set [N, du].

        Reference analogue: ``c3opt_set_brute_force_vals`` candidate lists
        (``C3 src/lib_optimization/optimization.c`` — line n/a).
        """
        if isinstance(n, int):
            n = (n,) * self.du
        axes = [np.linspace(self.ulb[k], self.uub[k], n[k]) for k in range(self.du)]
        mesh = np.meshgrid(*axes, indexing="ij")
        return np.stack([m.ravel() for m in mesh], axis=-1)
