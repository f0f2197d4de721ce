"""Continuous inner-minimization backends (c3opt parity): projected gradient
beats the coarse candidate grid on LQ."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import lqr_solution, make_lq_problem
from c3sc_tpu.ops.argmin import lbfgs_minimize, pgd_minimize
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.sim import make_implicit_policy
from c3sc_tpu.solvers import dense_vi


def test_pgd_minimize_quadratic():
    # min over [-1, 1]^2 of (u - t)^T A (u - t), batched targets
    A = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    t = jnp.array([[0.4, -0.2], [0.9, 0.9], [-2.0, 0.0]])  # last clips to box

    def f(u):
        d = u - t
        return jnp.einsum("bi,ij,bj->b", d, A, d)

    u0 = jnp.zeros((3, 2))
    u, fu = pgd_minimize(f, u0, lb=(-1.0, -1.0), ub=(1.0, 1.0), n_iters=30)
    np.testing.assert_allclose(np.asarray(u[0]), [0.4, -0.2], atol=2e-2)
    np.testing.assert_allclose(np.asarray(u[1]), [0.9, 0.9], atol=2e-2)
    assert float(u[2, 0]) <= -0.95  # clipped at the box


def test_lbfgs_minimize_quadratic_and_box():
    A = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    t = jnp.array([[0.4, -0.2], [0.9, 0.9], [-2.0, 0.0]])

    def f(u):
        d = u - t
        return jnp.einsum("bi,ij,bj->b", d, A, d)

    u0 = jnp.zeros((3, 2))
    u, fu = jax.jit(
        lambda u0: lbfgs_minimize(f, u0, lb=(-1.0, -1.0), ub=(1.0, 1.0),
                                  n_iters=25)
    )(u0)
    np.testing.assert_allclose(np.asarray(u[0]), [0.4, -0.2], atol=2e-2)
    np.testing.assert_allclose(np.asarray(u[1]), [0.9, 0.9], atol=2e-2)
    assert float(u[2, 0]) <= -0.95


def test_lbfgs_beats_pgd_on_ill_conditioned():
    # diag(100, 1) quadratic: curvature information should pay off
    t = jnp.array([[0.35, -0.55]])

    def f(u):
        d = u - t
        return 100.0 * d[:, 0] ** 2 + d[:, 1] ** 2

    u0 = jnp.full((1, 2), 0.9)
    _, f_pgd = pgd_minimize(f, u0, lb=(-1, -1), ub=(1, 1), n_iters=12)
    _, f_lb = lbfgs_minimize(f, u0, lb=(-1, -1), ub=(1, 1), n_iters=12)
    assert float(f_lb[0]) <= float(f_pgd[0]) + 1e-6
    assert float(f_lb[0]) < 1e-3


def test_refined_policy_beats_coarse_grid_on_lq():
    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(41)
    # fine-candidate solve for an accurate value fn
    dense = dense_vi(prob, grid, n_controls=41, tol=1e-5, max_outer=400, chunk=100)
    value_fn = lambda p: multilinear_interp(grid, dense.v, p)
    coarse = prob.control_candidates(5)  # spacing = 3.0
    pol0 = make_implicit_policy(prob, grid, value_fn, coarse)
    pol1 = make_implicit_policy(prob, grid, value_fn, coarse, refine_steps=10)

    P, c, K = lqr_solution(sigma=1.0, beta=1.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(128, 2)), jnp.float32)
    u_true = -(np.asarray(x) @ K.T)
    e0 = np.abs(np.asarray(pol0(x)) - u_true).mean()
    e1 = np.abs(np.asarray(pol1(x)) - u_true).mean()
    # refinement recovers accuracy below the candidate spacing (3.0); the
    # floor is the O(h) resolution of the MCA stencil itself, not the grid
    assert e1 < e0 * 0.75, f"refined {e1:.3f} vs coarse {e0:.3f}"
    assert e1 < 0.4
