"""MCA stencil property tests (SURVEY.md §4: probabilities sum to 1,
nonnegativity, local consistency, differentiability w.r.t. u)."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_pendulum_problem, make_quadcopter_problem
from c3sc_tpu.ops import mca


def test_probabilities_sum_to_one_and_nonneg():
    prob = make_pendulum_problem()
    grid = prob.default_grid(31)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(prob.lb, prob.ub, size=(64, 2)))
    u = jnp.asarray(rng.uniform(prob.ulb, prob.uub, size=(64, 1)))
    pp, pm, dt = mca.transition_batch(prob, grid, x, u)
    assert pp.shape == (64, 2) and dt.shape == (64,)
    total = jnp.sum(pp + pm, axis=-1)
    np.testing.assert_allclose(np.asarray(total), 1.0, atol=1e-5)
    assert np.all(np.asarray(pp) >= 0) and np.all(np.asarray(pm) >= 0)
    assert np.all(np.asarray(dt) > 0)


def test_local_consistency():
    """E[dx] = f dt exactly; E[(dx)^2] = sigma2 dt + h |f| dt."""
    prob = make_pendulum_problem()
    grid = prob.default_grid(41)
    h = jnp.asarray(grid.h)
    x = jnp.array([0.7, -1.3])
    u = jnp.array([2.0])
    pp, pm, dt = mca.transition(prob, grid, x, u)
    f = prob.drift(x, u)
    s2 = prob.sigma2_diag(x, u)
    mean = (pp - pm) * h
    np.testing.assert_allclose(np.asarray(mean), np.asarray(f * dt), atol=1e-6)
    second = (pp + pm) * h**2
    np.testing.assert_allclose(
        np.asarray(second), np.asarray(s2 * dt + h * jnp.abs(f) * dt), atol=1e-6
    )


def test_stencil_differentiable_wrt_u():
    prob = make_quadcopter_problem()
    grid = prob.default_grid(9)
    x = jnp.zeros(6)

    def dt_of_u(u):
        _, _, dt = mca.transition(prob, grid, x, u)
        return dt

    u = jnp.array([2.0, 2.5])
    g = jax.grad(dt_of_u)(u)
    eps = 1e-3
    for k in range(2):
        fd = (dt_of_u(u.at[k].add(eps)) - dt_of_u(u.at[k].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=2e-2, atol=1e-6)


def test_node_terminal_classification():
    from c3sc_tpu.models import make_dubins_problem

    prob = make_dubins_problem()
    grid = prob.default_grid((9, 9, 8))
    idx = jnp.array(
        [
            [0, 4, 3],   # on absorbing x-face -> terminal, exit cost
            [4, 4, 0],   # center x/y, theta face — theta periodic -> goal obstacle!
            [4, 4, 3],   # center -> inside goal obstacle, cost 0
            [2, 2, 3],   # interior, outside obstacles
        ],
        jnp.int32,
    )
    x = grid.index_to_state(idx)
    term, val = mca.node_terminal(prob, grid, idx, x)
    assert bool(term[0]) and np.isclose(float(val[0]), 50.0)
    assert bool(term[2]) and np.isclose(float(val[2]), 0.0)
    assert not bool(term[3])


def test_transition_all_controls_matches_per_candidate():
    """The fast all-candidates path (affine/separable structure) must agree
    with the generic per-candidate stencil on every registered model."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from c3sc_tpu.models import make_problem
    from c3sc_tpu.ops import mca

    for name in ("lq", "pendulum", "dubins", "glider", "quadcopter"):
        prob = make_problem(name)
        grid = prob.default_grid(9)
        rng = np.random.default_rng(0)
        B, C = 64, 7
        x = jnp.asarray(
            rng.uniform(prob.lb, prob.ub, size=(B, prob.dx)), jnp.float32)
        uc = jnp.asarray(
            rng.uniform(prob.ulb, prob.uub, size=(C, prob.du)), jnp.float32)
        pp, pm, dt = mca.transition_all_controls(prob, grid, x, uc)
        g = mca.stage_cost_all(prob, x, uc)
        for c in range(C):
            u = jnp.broadcast_to(uc[c], (B, prob.du))
            pp1, pm1, dt1 = mca.transition_batch(prob, grid, x, u)
            g1 = jax.vmap(prob.stage_cost)(x, u)
            np.testing.assert_allclose(pp[c], pp1, atol=1e-5, err_msg=name)
            np.testing.assert_allclose(pm[c], pm1, atol=1e-5, err_msg=name)
            np.testing.assert_allclose(dt[c], dt1, rtol=1e-5, err_msg=name)
            np.testing.assert_allclose(g[c], g1, rtol=2e-5, atol=1e-6,
                                       err_msg=name)


def test_declared_affine_structure_matches_drift():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from c3sc_tpu.models import make_problem

    for name in ("lq", "pendulum", "dubins", "quadcopter"):
        prob = make_problem(name)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(prob.lb, prob.ub, size=(prob.dx,)),
                        jnp.float32)
        u = jnp.asarray(rng.uniform(prob.ulb, prob.uub, size=(prob.du,)),
                        jnp.float32)
        f_direct = prob.drift(x, u)
        f_affine = prob.drift_f0(x) + prob.drift_G(x) @ u
        np.testing.assert_allclose(np.asarray(f_affine), np.asarray(f_direct),
                                   atol=1e-5, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(prob.sigma2_x(x)), np.asarray(prob.sigma2_diag(x, u)),
            atol=1e-6, err_msg=name)
