"""PI-ALS solver (solvers/pials.py): direct linear policy-evaluation.

Three properties:
(a) row consistency — the frozen-policy linear rows reproduce the
    Bellman defect v - Tv exactly at the argmin policy;
(b) oracle parity — starting from a starved fused base, pi_als lands the
    pendulum value within 1% of the dense-grid oracle (the projected-VI
    polish floors ~5x higher from the same base: its per-fit error is
    amplified by 1/(1-gamma), pi_als's is not);
(c) acceptance — the returned iterate is the best sampled-Bellman-residual
    iterate (no outer step can degrade the deliverable).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import _repad, tt_from_dense, tt_full, tt_gather_eval
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.pials import frozen_policy_rows, pi_als
from c3sc_tpu.solvers.ttvi import make_bellman_kernel


@pytest.fixture(scope="module")
def pendulum_dense():
    prob = make_pendulum_problem()
    grid = prob.default_grid(31)
    controls = prob.control_candidates(9)
    dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
    return prob, grid, controls, np.asarray(dsol.v)


def test_rows_reproduce_bellman_defect(pendulum_dense):
    prob, grid, controls, vd = pendulum_dense
    v_tt = _repad(tt_from_dense(jnp.asarray(vd), rmax=20, tol=1e-4), 24)
    rng = np.random.default_rng(3)
    idx = jnp.asarray(
        np.stack([rng.integers(0, n, 512) for n in grid.shape], -1),
        jnp.int32)
    uc = jnp.asarray(controls, jnp.float32)
    pts, w, rhs = frozen_policy_rows(prob, grid, uc, v_tt, idx)
    d = grid.ndim
    v_pts = tt_gather_eval(v_tt, pts.reshape(-1, d)).reshape(pts.shape[:2])
    lhs = np.asarray(jnp.sum(w * v_pts, axis=1) - rhs)

    kernel = make_bellman_kernel(prob, grid, uc, chunk=1024)
    tv = np.asarray(kernel(v_tt, idx))
    v_s = np.asarray(tt_gather_eval(v_tt, idx))
    defect = v_s - tv
    # identical up to f32 noise (terminal rows: v - psi, also the defect)
    assert np.max(np.abs(lhs - defect)) < 1e-3 * max(np.abs(vd).max(), 1.0)


def test_pials_preserves_near_exact(pendulum_dense):
    """A damped ALS-LS solve of the already-converged value must not
    degrade it (the undamped f32 normal equations DID — measured in
    experiments/pials_debug2.py; the proximal + corrected-seminormal
    refinement is what makes the solve safe)."""
    prob, grid, controls, vd = pendulum_dense
    vrange = vd.max() - vd.min()
    v0 = _repad(tt_from_dense(jnp.asarray(vd), rmax=20, tol=1e-6), 24)
    res = pi_als(prob, grid, controls, v0, rmax=24,
                 schedule=((3, 20),), oversample=4.0, chunk=8192,
                 lam_rel=1e-1)
    q95_1 = np.quantile(np.abs(np.asarray(tt_full(res.v)) - vd),
                        0.95) / vrange
    assert q95_1 < 0.002, q95_1
    # acceptance: returned == best bres iterate (or the input, -1)
    bres = [r["bres_abs"] for r in res.history]
    assert res.best_outer == -1 or min(bres) == bres[res.best_outer]


@pytest.mark.slow
def test_pials_smoother_with_twogrid_reaches_parity(pendulum_dense):
    """pi_als as the ROUGH-mode smoother + the global coarse-grid
    correction for the smooth modes (solvers/twogrid.py): the cycle must
    reach well under the polish-only floor (~3.3% from this base)."""
    from c3sc_tpu.solvers.twogrid import coarse_correct

    prob, grid, controls, vd = pendulum_dense
    vrange = vd.max() - vd.min()
    fsol = fused_tt_vi(prob, grid, controls=controls, rmax=12,
                       key=jax.random.key(1), tol=2e-4, max_iters=600,
                       patience=50)
    q95_0 = np.quantile(np.abs(np.asarray(tt_full(fsol.v)) - vd),
                        0.95) / vrange
    v = fsol.v
    for _ in range(3):
        v, _info = coarse_correct(prob, grid, controls, v)
        v = pi_als(prob, grid, controls, v, rmax=24,
                   schedule=((3, 20),), oversample=4.0, chunk=8192,
                   lam_rel=3e-2, sweeps=2).v
    q95_1 = np.quantile(np.abs(np.asarray(tt_full(v)) - vd),
                        0.95) / vrange
    assert q95_1 < 0.02, (q95_0, q95_1)
    assert q95_1 < 0.5 * q95_0
    # padded-TT invariant
    assert all(c.shape == (24, 31, 24) for c in v.cores)
