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
