"""Checkpoint/resume + metrics tests (SURVEY.md §5)."""

import jax
import numpy as np

from c3sc_tpu.models import make_lq_problem
from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.solvers.ttvi import tt_vi
from c3sc_tpu.utils import MetricsLogger, load_solver_state, save_solver_state


def test_checkpoint_resume_continues_convergence(tmp_path):
    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    ck = str(tmp_path / "vi.npz")
    # run 40 iterations, checkpointing
    sol1 = tt_vi(
        prob, grid, n_controls=9, rmax=8, key=jax.random.key(0),
        tol=0.0, max_iters=40, cross_sweeps=1, chunk=1024,
        checkpoint_path=ck, checkpoint_every=40,
    )
    loaded = load_solver_state(ck)
    assert loaded["iteration"] == 39
    # resume and keep converging
    sol2 = tt_vi(
        prob, grid, n_controls=9, rmax=8, key=jax.random.key(0),
        tol=1e-4, max_iters=400, cross_sweeps=1, chunk=1024,
        resume_from=ck,
    )
    assert sol2.residual <= sol1.residual
    assert sol2.iterations > 40  # continued beyond checkpoint


def test_metrics_logger(tmp_path):
    import json

    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(p)
    m.log("vi_iter", iter=0, residual=0.5)
    m.log("vi_iter", iter=1, residual=0.25)
    m.close()
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 2
    assert lines[1]["residual"] == 0.25
    assert lines[0]["phase"] == "vi_iter"


def test_save_load_solver_state_roundtrip(tmp_path):
    from c3sc_tpu.ops.tt import tt_random

    v = tt_random(jax.random.key(3), (5, 6, 7), (1, 2, 3, 1), rmax=4)
    path = str(tmp_path / "s.npz")
    save_solver_state(path, v, None, 7, key=jax.random.key(9), extras={"a": 1})
    out = load_solver_state(path)
    assert out["iteration"] == 7
    assert out["extras"] == {"a": 1}
    idx = np.zeros((1, 3), np.int32)
    import jax.numpy as jnp

    np.testing.assert_allclose(
        np.asarray(tt_gather_eval(out["v"], jnp.asarray(idx))),
        np.asarray(tt_gather_eval(v, jnp.asarray(idx))),
    )
