"""Global two-grid correction (solvers/twogrid.py).

The decisive property (measured in experiments/twogrid_debug*.py): the
smooth value error that defect-driven fits cannot see — the polish floor
— is crushed by the coarse-grid solve. The cycle
(coarse_correct -> polish smoothing) must reach well below the
polish-only floor from the same base.
"""

import jax
import numpy as np
import pytest

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import tt_full
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.polish import tt_polish
from c3sc_tpu.solvers.twogrid import coarse_correct, coarse_grid


def test_coarse_grid_shapes():
    prob = make_pendulum_problem()
    grid = prob.default_grid(31)       # (periodic theta, bounded omega)
    gc, fi = coarse_grid(grid)
    assert gc.shape == (31, 16)        # periodic dims are not coarsened
    assert np.allclose(fi[1], np.arange(0, 31, 2))
    assert np.isclose(gc.h[1], 2 * grid.h[1])


@pytest.fixture(scope="module")
def pendulum_base():
    prob = make_pendulum_problem()
    grid = prob.default_grid(31)
    controls = prob.control_candidates(9)
    dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
    fsol = fused_tt_vi(prob, grid, controls=controls, rmax=12,
                       key=jax.random.key(1), tol=2e-4, max_iters=600,
                       patience=50)
    return prob, grid, controls, np.asarray(dsol.v), fsol.v


@pytest.mark.slow
def test_twogrid_cycle_breaks_smooth_floor(pendulum_base):
    prob, grid, controls, vd, v = pendulum_base
    vrange = vd.max() - vd.min()

    def q95(vt):
        return np.quantile(np.abs(np.asarray(tt_full(vt)) - vd),
                           0.95) / vrange

    q_base = q95(v)
    for _ in range(2):
        v, info = coarse_correct(prob, grid, controls, v)
        v = tt_polish(prob, grid, controls, v, rmax=24,
                      schedule=((6, 20),), chunk=8192, check_every=3).v
    q_end = q95(v)
    # the polish-only floor from this base is ~3.3% (same schedule);
    # the two-grid cycle must land well below it
    assert q_end < 0.012, (q_base, q_end)
    assert q_end < 0.25 * q_base


def test_gate_rejects_harmful_correction(pendulum_base):
    """With an already-converged v (dense-oracle TT), a coarse correction
    cannot help; the gate must keep bres from regressing materially."""
    import jax.numpy as jnp

    from c3sc_tpu.ops.tt import _repad, tt_from_dense

    prob, grid, controls, vd, _ = pendulum_base
    v = _repad(tt_from_dense(jnp.asarray(vd), rmax=20, tol=1e-7), 24)
    v_new, info = coarse_correct(prob, grid, controls, v)
    assert info.correction_scale < 0.2 * (vd.max() - vd.min())
    if not info.accepted:
        assert v_new is v        # rejected => input returned untouched
