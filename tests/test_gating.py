"""Stage gating (solvers/gating.py) — VERDICT r4 next #2.

On the pendulum: a HARMFUL 'correction' (large random TT perturbation)
must be rejected by the defect gate; a genuinely helpful stage
(level_correct of a level-shifted value) must be accepted; and the probe
gate must reject a stage that corrupts the policy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import (_repad, tt_add, tt_constant, tt_from_dense,
                             tt_random)
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.gating import gated_apply, make_greedy_probe
from c3sc_tpu.solvers.polish import level_correct


@pytest.fixture(scope="module")
def pendulum_v():
    prob = make_pendulum_problem()
    grid = prob.default_grid(31)
    controls = prob.control_candidates(9)
    dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
    v = _repad(tt_from_dense(jnp.asarray(np.asarray(dsol.v)), rmax=20,
                             tol=1e-7), 24)
    return prob, grid, controls, v


def test_gate_rejects_harmful_stage(pendulum_v):
    prob, grid, controls, v = pendulum_v

    def harmful(vt):
        noise = tt_random(jax.random.key(3), grid.shape, [1, 4, 1], 24)
        return tt_add(vt, noise, on_overflow="round")

    v_out, rec = gated_apply(prob, grid, controls, v, harmful,
                             name="harmful")
    assert not rec.accepted
    assert v_out is v
    assert rec.bres_after > rec.bres_before


def test_gate_accepts_helpful_stage(pendulum_v):
    prob, grid, controls, v = pendulum_v
    v_bad = tt_add(v, tt_constant(grid.shape, 3.0, 24),
                   on_overflow="round")

    def helpful(vt):
        out, _ = level_correct(prob, grid, controls, vt, iters=4,
                               chunk=8192)
        return out

    v_out, rec = gated_apply(prob, grid, controls, v_bad, helpful,
                             name="level")
    assert rec.accepted
    assert rec.bres_after < 0.7 * rec.bres_before


def test_probe_gate_catches_policy_damage(pendulum_v):
    prob, grid, controls, v = pendulum_v
    probe = make_greedy_probe(prob, grid, controls, n_rollouts=16,
                              n_steps=200)

    # a stage that zeroes the value (defect-plausible scale but policy-
    # destroying) must fail the PROBE gate even with a loose defect slack
    def zero_stage(vt):
        from c3sc_tpu.ops.tt import tt_scale
        return tt_scale(vt, 0.0)

    v_out, rec = gated_apply(prob, grid, controls, v, zero_stage,
                             name="zero", bres_slack=1e9, probe_fn=probe)
    assert not rec.accepted
    assert v_out is v


@pytest.mark.slow
def test_probe_trim_recovers_injected_tilt(pendulum_v):
    """probe_trim must claw back probe cost after an injected ramp tilt
    (the parking-offset mechanism, in miniature) and never return a
    worse-probing iterate than its input."""
    import jax.numpy as jnp

    from c3sc_tpu.ops.tt import tt_rank1, tt_scale
    from c3sc_tpu.solvers.gating import probe_trim
    from c3sc_tpu.solvers.twogrid import _blend

    prob, grid, controls, v = pendulum_v
    probe = make_greedy_probe(prob, grid, controls, n_rollouts=16,
                              n_steps=200)
    c_clean = probe(v)
    # inject a 6%-of-range tilt along omega
    nk = np.asarray(grid.nodes(1), np.float32)
    ramp = (nk - nk.mean()) / (nk.max() - nk.min())
    tilt = tt_rank1([jnp.ones(grid.shape[0], jnp.float32),
                     jnp.asarray(ramp)], v.rmax)
    vals = np.asarray(
        np.abs(np.asarray(v.cores[0])).max())  # scale proxy unused
    v_bad = _blend(v, tilt, jnp.asarray(0.06 * 21.0, jnp.float32))
    c_bad = probe(v_bad)
    v_fix, hist = probe_trim(prob, grid, controls, v_bad, probe_fn=probe,
                             dims=[1], rounds=2)
    c_fix = probe(v_fix)
    assert c_fix <= c_bad + 1e-6
    # recovered at least half of the injected damage (if any)
    if c_bad > c_clean * 1.02:
        assert c_fix < c_clean + 0.5 * (c_bad - c_clean)
