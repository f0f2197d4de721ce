import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import REGISTRY, make_problem


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_problem_shapes(name):
    prob = make_problem(name)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(prob.lb, prob.ub))
    u = jnp.asarray(rng.uniform(prob.ulb, prob.uub))
    f = prob.drift(x, u)
    L = prob.diff(x, u)
    assert f.shape == (prob.dx,)
    assert L.shape == (prob.dx, prob.dw)
    g = prob.stage_cost(x, u)
    psi = prob.boundary_cost(x)
    assert g.shape == () and psi.shape == ()
    assert np.isfinite(float(g)) and np.isfinite(float(psi))
    s2 = prob.sigma2_diag(x, u)
    assert s2.shape == (prob.dx,) and np.all(np.asarray(s2) >= 0)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_problem_vmappable_and_differentiable(name):
    prob = make_problem(name)
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.uniform(prob.lb, prob.ub, size=(16, prob.dx)))
    us = jnp.asarray(rng.uniform(prob.ulb, prob.uub, size=(16, prob.du)))
    fs = jax.vmap(prob.drift)(xs, us)
    assert fs.shape == (16, prob.dx)
    # drift must be differentiable w.r.t. u (AD replaces reference Jacobians)
    jac = jax.jacobian(prob.drift, argnums=1)(xs[0], us[0])
    assert jac.shape == (prob.dx, prob.du)
    assert np.all(np.isfinite(np.asarray(jac)))


def test_control_candidates():
    prob = make_problem("quadcopter")
    cand = prob.control_candidates(5)
    assert cand.shape == (25, 2)
    assert cand.min() >= 0.0 and cand.max() <= 6.0


def test_lq_oracle_sane():
    from c3sc_tpu.models import lqr_solution

    P, c, K = lqr_solution()
    assert P.shape == (2, 2) and np.allclose(P, P.T)
    assert np.all(np.linalg.eigvalsh(P) > 0)
    assert c > 0
