"""C3Control builder API parity (c3control_* method-for-method) +
deterministic integrators."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.control import C3Control
from c3sc_tpu.models import lqr_solution
from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.sim.integrators import rollout


def build_lq():
    P, c, K = lqr_solution(sigma=1.0, beta=1.0)
    return (
        C3Control(dx=2, du=1, dw=1, lb=[-2, -2], ub=[2, 2], beta=1.0,
                  ulb=[-6], uub=[6], name="lq_builder")
        .add_drift(lambda x, u: jnp.stack([x[1], u[0]]))
        .add_diff(lambda x, u: jnp.array([[0.0], [1.0]]))
        .add_stagecost(lambda x, u: x @ x + u @ u)
        .add_boundcost(lambda x: x @ (jnp.asarray(P) @ x) + c)
        .set_external_boundary(0, "absorb")
        .set_external_boundary(1, "absorb")
    )


def test_builder_vi_solve_matches_riccati():
    ctrl = build_lq()
    sol = ctrl.vi_solve(ngrid=31, rmax=10, n_controls=15, tol=2e-4,
                        max_iters=1500, key=jax.random.key(0))
    P, c, K = lqr_solution(sigma=1.0, beta=1.0)
    grid = sol.grid
    idx = np.stack(np.meshgrid(np.arange(31), np.arange(31), indexing="ij"), -1).reshape(-1, 2)
    x = np.asarray(grid.index_to_state(jnp.asarray(idx)))
    v = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_true = np.einsum("ni,ij,nj->n", x, P, x) + c
    interior = np.all(np.abs(x) < 1.0, axis=-1)
    rel = np.abs(v - v_true)[interior].max() / np.abs(v_true[interior]).max()
    assert rel < 0.08, f"builder VI vs Riccati: {rel:.3f}"


def test_builder_obstacles_and_policy():
    ctrl = build_lq().add_obstacle(lb=[0.5, 0.5], ub=[1.0, 1.0], cost=50.0)
    prob = ctrl.problem()
    assert len(prob.obstacles) == 1
    assert bool(prob.in_obstacle(jnp.array([0.7, 0.7])))
    sol = ctrl.vi_solve(ngrid=21, rmax=8, tol=1e-3, max_iters=400)
    policy = ctrl.implicit_policy(sol, refine_steps=3)
    u = policy(jnp.array([[1.0, 0.0]]))
    assert u.shape == (1, 1) and np.isfinite(float(u[0, 0]))


def test_rk4_and_euler_deterministic():
    ctrl = build_lq()
    prob = ctrl.problem()
    grid = prob.default_grid(21)
    pol = lambda x: jnp.full((x.shape[0], 1), 0.5)
    x0 = jnp.array([[0.5, 0.0]])
    tr_rk4 = rollout(prob, grid, pol, x0, jax.random.key(0), dt=0.1,
                     n_steps=10, method="rk4")
    tr_eul = rollout(prob, grid, pol, x0, jax.random.key(1), dt=0.1,
                     n_steps=10, method="euler")
    # deterministic: key-independent
    tr_rk4b = rollout(prob, grid, pol, x0, jax.random.key(9), dt=0.1,
                      n_steps=10, method="rk4")
    np.testing.assert_allclose(np.asarray(tr_rk4.xs), np.asarray(tr_rk4b.xs))
    # analytic: x2(t) = 0.5 t, x1(t) = 0.25 t^2 for u=0.5
    t = 1.0
    np.testing.assert_allclose(float(tr_rk4.xs[-1, 0, 1]), 0.5 * t, rtol=1e-5)
    np.testing.assert_allclose(float(tr_rk4.xs[-1, 0, 0]), 0.5 + 0.25 * t**2, atol=2e-2)
    # euler close to rk4 for this linear system
    np.testing.assert_allclose(
        np.asarray(tr_eul.xs[-1]), np.asarray(tr_rk4.xs[-1]), atol=0.05
    )
    # rkf45 (5th-order Fehlberg): matches rk4 to tighter tolerance on the
    # polynomial-exact LQ dynamics
    tr_f45 = rollout(prob, grid, pol, x0, jax.random.key(2), dt=0.1,
                     n_steps=10, method="rkf45")
    np.testing.assert_allclose(float(tr_f45.xs[-1, 0, 1]), 0.5 * t, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tr_f45.xs[-1]), np.asarray(tr_rk4.xs[-1]), atol=1e-4
    )


def test_builder_policy_poly_basis():
    """implicit_policy(basis='poly') — the polynomial-core FT upgrade —
    produces controls close to the linelm policy on smooth LQ (identical
    away from cell boundaries, where the smooth interpolant is strictly
    better)."""
    import jax.numpy as jnp

    ctrl = build_lq()
    sol = ctrl.vi_solve(ngrid=21, rmax=8, n_controls=9, tol=2e-4,
                        max_iters=800, key=jax.random.key(0))
    pol_lin = ctrl.implicit_policy(sol, n_controls=9)
    pol_fts = ctrl.implicit_policy(sol, n_controls=9, basis="poly")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (256, 2)), jnp.float32)
    u_lin = np.asarray(pol_lin(x))
    u_fts = np.asarray(pol_fts(x))
    assert np.all(np.isfinite(u_fts))
    # same candidate at >= 80% of states (near-ties at cell faces differ)
    agree = (np.abs(u_lin - u_fts) < 1e-6).all(axis=-1).mean()
    assert agree > 0.8, agree


def test_poly_policy_closed_loop_beats_lerp():
    """Closed-loop rollout with basis='poly' (r2 verdict next #7): on smooth
    LQ the FT policy must realize cost <= lerp, and the Hamiltonian refine
    driven by ft_grad_eval must beat BOTH the unrefined policy and the
    MCA-stencil refine. Measured: lerp 2.012, lerp+refine 1.878,
    poly+refine 1.799 (8 PGD steps, 128 rollouts, 400 steps)."""
    import jax
    import jax.numpy as jnp

    from c3sc_tpu.sim import rollout

    ctrl = build_lq()
    sol = ctrl.vi_solve(ngrid=21, rmax=8, n_controls=9, tol=2e-4,
                        max_iters=800, key=jax.random.key(0))
    prob = ctrl.problem()
    grid = sol.grid
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.uniform(-1.2, 1.2, (128, 2)), jnp.float32)
    key = jax.random.key(11)

    def realized(**kw):
        pol = ctrl.implicit_policy(sol, n_controls=9, **kw)
        tr = rollout(prob, grid, pol, x0, key, dt=0.01, n_steps=400)
        return float(np.asarray(tr.cost).mean())

    c_lerp = realized()
    c_lref = realized(refine_steps=8)
    c_poly = realized(basis="poly")
    c_pref = realized(basis="poly", refine_steps=8)
    assert c_poly <= 1.02 * c_lerp, (c_poly, c_lerp)
    assert c_pref <= 0.95 * c_lerp, (c_pref, c_lerp)
    assert c_pref <= 1.005 * c_lref, (c_pref, c_lref)
