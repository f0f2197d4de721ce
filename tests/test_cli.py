"""Registry CLI end-to-end: solve, artifacts on disk, --load in both modes
(fused checkpoint resume AND plain value-file warm start)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_fused_solve_and_load_modes(tmp_path):
    from c3sc_tpu.cli import main

    outdir = str(tmp_path / "lq_run")
    summary = main([
        "lq", "--n", "21", "--solver", "fused", "--rmax", "8",
        "--max-iters", "120", "--save-every", "50",
        "--rollouts", "8", "--steps", "50", "--outdir", outdir,
    ])
    assert summary["solver"] == "fused"
    assert np.isfinite(summary["residual"])
    assert os.path.exists(os.path.join(outdir, "vf.npz"))
    assert os.path.exists(os.path.join(outdir, "solver_state.npz"))
    assert os.path.exists(os.path.join(outdir, "traj.npz"))
    # metrics.jsonl is STRICT json (no bare Infinity/NaN tokens)
    for line in open(os.path.join(outdir, "metrics.jsonl")):
        json.loads(line)
        assert "Infinity" not in line and "NaN" not in line

    # --load mode 1: resume from the fused checkpoint
    out2 = str(tmp_path / "lq_resume")
    s2 = main([
        "lq", "--n", "21", "--solver", "fused", "--rmax", "8",
        "--max-iters", "200", "--outdir", out2,
        "--load", os.path.join(outdir, "solver_state.npz"),
    ])
    assert s2["iterations"] >= summary["iterations"]

    # --load mode 2: warm-start from the plain value file (vf.npz)
    out3 = str(tmp_path / "lq_warm")
    s3 = main([
        "lq", "--n", "21", "--solver", "fused", "--rmax", "8",
        "--max-iters", "150", "--outdir", out3,
        "--load", os.path.join(outdir, "vf.npz"),
    ])
    assert np.isfinite(s3["residual"])


@pytest.mark.slow
def test_cli_c3tt_format_and_poly_policy(tmp_path):
    """VERDICT r4 next #8: the native compact c3tt binary and the PolyFT
    policy basis are reachable from the documented CLI entry point —
    solve with --save-format c3tt --policy-basis poly, then reload the
    .c3tt file as a warm start."""
    from c3sc_tpu.cli import main

    outdir = str(tmp_path / "lq_c3tt")
    summary = main([
        "lq", "--n", "21", "--solver", "fused", "--rmax", "8",
        "--max-iters", "150", "--rollouts", "8", "--steps", "50",
        "--outdir", outdir, "--save-format", "c3tt",
        "--policy-basis", "poly",
    ])
    tt_path = os.path.join(outdir, "vf.c3tt")
    assert summary["c3tt_file"] == tt_path and os.path.exists(tt_path)
    assert np.isfinite(summary["mean_cost"])

    # compact binary round-trips through --load as a warm start
    out2 = str(tmp_path / "lq_from_c3tt")
    s2 = main([
        "lq", "--n", "21", "--solver", "fused", "--rmax", "8",
        "--max-iters", "100", "--outdir", out2, "--load", tt_path,
    ])
    assert np.isfinite(s2["residual"])
