"""Dubins car 3D reach-avoid: fused TT-VI vs dense oracle with obstacles +
periodic heading (SURVEY.md §7 hard part #3: boundary semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_dubins_problem
from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.solvers import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi


@pytest.fixture(scope="module")
def dubins():
    prob = make_dubins_problem(beta=0.5)
    grid = prob.default_grid((25, 25, 16))
    controls = prob.control_candidates(7)
    return prob, grid, controls


def test_dubins_fused_matches_dense(dubins):
    prob, grid, controls = dubins
    dense = dense_vi(prob, grid, controls=controls, tol=1e-4, max_outer=200, chunk=50)
    sol = fused_tt_vi(
        prob, grid, controls=controls, rmax=20, key=jax.random.key(0),
        tol=3e-4, max_iters=1500, patience=100,
    )
    idx = np.stack(
        np.meshgrid(*[np.arange(n) for n in grid.shape], indexing="ij"), -1
    ).reshape(-1, 3)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_dense = np.asarray(dense.v).ravel()
    scale = np.abs(v_dense).max()
    # sup error is dominated by the discontinuous obstacle boundary; use a
    # high quantile + interior mean instead
    err = np.abs(v_tt - v_dense) / scale
    assert np.quantile(err, 0.95) < 0.05, f"q95 err {np.quantile(err, 0.95):.3f}"
    assert err.mean() < 0.02, f"mean err {err.mean():.3f}"


def test_dubins_dense_goal_reachable(dubins):
    """Value near goal is ~0; far from goal is positive; obstacle nodes carry
    the obstacle cost."""
    prob, grid, controls = dubins
    dense = dense_vi(prob, grid, controls=controls, tol=1e-4, max_outer=300, chunk=75)
    v = np.asarray(dense.v)
    # node nearest the goal center (0,0,*)
    i0 = np.argmin(np.abs(grid.nodes(0)))
    j0 = np.argmin(np.abs(grid.nodes(1)))
    assert v[i0, j0].max() < 1.0  # inside goal -> absorbed at cost ~0
    # obstacle interior pins at obstacle cost
    oi = np.argmin(np.abs(grid.nodes(0) - 1.7))
    oj = np.argmin(np.abs(grid.nodes(1) + 1.7))
    assert v[oi, oj].min() > 50.0
    assert np.isfinite(v).all()


def test_dubins_control_sequence_parity(dubins):
    """3D leg of the north-star ladder: closed-loop parity vs the dense
    oracle under identical noise keys.

    The Dubins steering policy is BANG-BANG: a TT value error of a few %
    near the discontinuous obstacle/goal boundaries shifts switching
    surfaces, so pointwise control deviation has a measured floor of
    ~2-4% (rmax 28-40 sweep; the dense oracle's SELF-parity at two
    tolerances is exactly 0, so the floor is TT-approximation, not
    ill-posedness). The deliverable criteria here are realized cost
    within 1% (measured 0.0-0.1%) and per-step candidate agreement
    >= 94% (measured 96-97%); the <1% pointwise criterion holds on the
    smooth-policy legs (2D pendulum, 4D glider)."""
    from c3sc_tpu.ops.interp import multilinear_interp
    from c3sc_tpu.ops.tt import tt_lerp_eval
    from c3sc_tpu.sim import make_implicit_policy, rollout

    prob, grid, controls = dubins
    dense = dense_vi(prob, grid, controls=controls, tol=1e-4,
                     max_outer=200, chunk=50)
    sol = fused_tt_vi(prob, grid, controls=controls, rmax=28, eps_rank=1e-5,
                      key=jax.random.key(0), tol=2e-4, max_iters=2500,
                      patience=100)

    pol_d = make_implicit_policy(
        prob, grid, lambda p: multilinear_interp(grid, dense.v, p), controls)
    pol_t = make_implicit_policy(
        prob, grid, lambda p: tt_lerp_eval(sol.v, grid, p), controls)
    B, T = 32, 300
    rng = np.random.default_rng(11)
    # launch ring: outside the goal, away from obstacles, heading inward
    ang = rng.uniform(0, 2 * np.pi, B)
    r = rng.uniform(2.2, 3.2, B)
    x0 = jnp.asarray(np.stack([
        r * np.cos(ang), r * np.sin(ang),
        np.arctan2(-np.sin(ang), -np.cos(ang))
        + rng.uniform(-0.4, 0.4, B)], -1), jnp.float32)
    key = jax.random.key(21)
    tr_d = rollout(prob, grid, pol_d, x0, key, dt=0.02, n_steps=T)
    tr_t = rollout(prob, grid, pol_t, x0, key, dt=0.02, n_steps=T)

    alive = (np.asarray(tr_d.alive[:-1]) & np.asarray(tr_t.alive[:-1]))[..., None]
    u_range = prob.uub[0] - prob.ulb[0]
    du = np.abs(np.asarray(tr_t.us) - np.asarray(tr_d.us))
    dev = (du * alive).sum() / max(alive.sum(), 1) / u_range
    assert dev < 0.05, f"3D control-sequence deviation {dev:.4f} >= 5%"
    agree = (((du < 1e-6) | ~alive)).mean()
    assert agree > 0.94, f"per-step candidate agreement {agree:.3f} < 94%"
    c_d = float(np.asarray(tr_d.cost).mean())
    c_t = float(np.asarray(tr_t.cost).mean())
    assert abs(c_t - c_d) / max(abs(c_d), 1e-9) < 0.01, (c_d, c_t)
