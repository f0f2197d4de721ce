"""Dense-oracle VI integration tests (SURVEY.md §4: LQ/Riccati oracle is the
canonical end-to-end check)."""

import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import lqr_solution, make_lq_problem, make_pendulum_problem
from c3sc_tpu.solvers import dense_policy, dense_vi


@pytest.fixture(scope="module")
def lq_solution():
    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(51)
    sol = dense_vi(prob, grid, n_controls=41, tol=1e-6, max_outer=400, chunk=100)
    return prob, grid, sol


def test_lq_matches_riccati(lq_solution):
    prob, grid, sol = lq_solution
    P, c, K = lqr_solution(sigma=1.0, beta=1.0)
    xs = grid.meshgrid()
    X = np.stack([m.ravel() for m in xs], -1)
    v_true = np.einsum("ni,ij,nj->n", X, P, X) + c
    v = np.asarray(sol.v).ravel()
    # compare in the interior (boundary truncation perturbs the edge)
    interior = np.all(np.abs(X) < 1.0, axis=-1)
    err = np.abs(v[interior] - v_true[interior])
    rel = err.max() / np.abs(v_true[interior]).max()
    assert rel < 0.05, f"relative sup error {rel:.3f}"


def test_lq_policy_matches_lqr_gain(lq_solution):
    prob, grid, sol = lq_solution
    P, c, K = lqr_solution(sigma=1.0, beta=1.0)
    u = np.asarray(dense_policy(prob, grid, sol.v, sol.controls))
    xs = grid.meshgrid()
    X = np.stack([m.ravel() for m in xs], -1)
    u_true = -(X @ K.T)
    interior = np.all(np.abs(X) < 1.0, axis=-1)
    # brute-force candidates quantize u; allow one candidate-spacing of slack
    spacing = 12.0 / 40
    err = np.abs(u.reshape(-1, 1)[interior] - u_true[interior])
    assert np.quantile(err, 0.9) < spacing * 1.5


def test_lq_refined_policy_beats_candidate_spacing(lq_solution):
    """Continuous inner min (c3opt equivalent) inside the policy removes the
    candidate-grid quantization: error must drop WELL below one candidate
    spacing (VERDICT r1 item 4 — slack removed)."""
    prob, grid, sol = lq_solution
    P, c, K = lqr_solution(sigma=1.0, beta=1.0)
    u = np.asarray(dense_policy(prob, grid, sol.v, sol.controls,
                                refine_steps=10))
    xs = grid.meshgrid()
    X = np.stack([m.ravel() for m in xs], -1)
    u_true = -(X @ K.T)
    interior = np.all(np.abs(X) < 1.0, axis=-1)
    spacing = 12.0 / 40
    err = np.abs(u.reshape(-1, 1)[interior] - u_true[interior])
    # no quantization slack: sub-candidate-spacing accuracy (the residual
    # error is the value function's own grid/boundary error, not spacing)
    assert np.quantile(err, 0.9) < spacing * 0.5
    # and strictly better than the unrefined brute-force policy
    u_bf = np.asarray(dense_policy(prob, grid, sol.v, sol.controls))
    err_bf = np.abs(u_bf.reshape(-1, 1)[interior] - u_true[interior])
    assert np.quantile(err, 0.9) < np.quantile(err_bf, 0.9)


def test_pendulum_converges_and_value_shape():
    prob = make_pendulum_problem(beta=0.5)
    grid = prob.default_grid(41)
    sol = dense_vi(prob, grid, n_controls=9, tol=1e-4, max_outer=600, chunk=150)
    v = np.asarray(sol.v)
    assert v.shape == (41, 41)
    assert np.all(np.isfinite(v))
    assert sol.residual < 1e-3
    # value is lowest near the upright equilibrium (theta=0, omega=0)
    i0 = 20  # theta = 0 row (lb=-pi, periodic, node 20 of 41 ~ 0... node k*2pi/41)
    # find actual node nearest theta=0 and omega=0
    th = grid.nodes(0)
    om = grid.nodes(1)
    i0 = int(np.argmin(np.abs(th)))
    j0 = int(np.argmin(np.abs(om)))
    assert v[i0, j0] <= np.percentile(v, 10)
