"""Frozen-target two-site polish (solvers/polish.py).

The polish ladder must (a) produce valid padded TTs, (b) contract the
sampled Bellman residual from a churned/starved base, and (c) move the
solution measurably toward the dense oracle — the property the coupled
fused solver's floor lacks (VERDICT r3 missing #1 diagnosis)."""

import jax
import numpy as np
import pytest

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import tt_full
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.polish import _maxvol, tt_polish


def test_maxvol_bounded_interpolation():
    rng = np.random.default_rng(0)
    U, _ = np.linalg.qr(rng.standard_normal((200, 12)))
    rows, G = _maxvol(U, tol=1.02)
    assert len(set(rows.tolist())) == 12  # distinct rows
    assert np.abs(G).max() <= 1.02 + 1e-9
    assert np.allclose(G[rows], np.eye(12), atol=1e-10)


@pytest.mark.slow
def test_polish_contracts_starved_pendulum():
    prob = make_pendulum_problem()
    grid = prob.default_grid(31)
    controls = prob.control_candidates(9)
    dsol = dense_vi(prob, grid, controls=controls, tol=1e-5, max_outer=3000)
    vd = np.asarray(dsol.v)
    vrange = vd.max() - vd.min()
    # starved rank-6 base: floors well above its epsilon-rank quality
    fsol = fused_tt_vi(prob, grid, controls=controls, rmax=6,
                       key=jax.random.key(1), tol=2e-4, max_iters=400,
                       patience=50)
    q95_0 = np.quantile(np.abs(np.asarray(tt_full(fsol.v)) - vd), 0.95) / vrange
    psol = tt_polish(prob, grid, controls, fsol.v, rmax=20,
                     schedule=((8, 10), (24, 16)), chunk=8192, check_every=4)
    q95_1 = np.quantile(np.abs(np.asarray(tt_full(psol.v)) - vd), 0.95) / vrange
    # Bellman residual of the harvested iterate contracts vs the first step
    bres = [r["bres_abs"] for r in psol.history if "bres_abs" in r]
    assert bres[-1] < 0.5 * bres[0], bres
    # and the polished value is measurably closer to the oracle
    assert q95_1 < 0.6 * q95_0, (q95_0, q95_1)
    # padded-TT invariant: ranks populated, shapes static
    assert all(c.shape == (20, 31, 20) for c in psol.v.cores)


def test_level_correct_recovers_constant_shift():
    """The scalar slow-mode correction must pull a deliberately level-
    shifted value back toward the fixed point (the value LEVEL is the
    slowest VI mode; see polish.level_correct)."""
    import jax.numpy as jnp

    from c3sc_tpu.ops.tt import _repad, tt_add, tt_constant, tt_from_dense
    from c3sc_tpu.solvers.polish import level_correct

    prob = make_pendulum_problem()
    grid = prob.default_grid(31)
    controls = prob.control_candidates(9)
    dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
    v_tt = _repad(tt_from_dense(jnp.asarray(dsol.v), rmax=20, tol=1e-9), 24)
    shift = 3.0
    v_bad = tt_add(v_tt, tt_constant(grid.shape, shift, 24))
    v_fix, hist = level_correct(prob, grid, controls, v_bad, iters=4,
                                chunk=8192)
    total = sum(h["shift"] for h in hist)
    # recovered shift ~ -3 (within the dense/TT truncation tolerance)
    assert abs(total + shift) < 0.5, (total, hist)
    assert abs(hist[-1]["mean_defect"]) < abs(hist[0]["mean_defect"])
