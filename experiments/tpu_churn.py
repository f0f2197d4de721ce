"""Experiment: root-cause the TPU convergence churn (VERDICT r1 next #3).

Round-1 finding (docs/DESIGN.md): identical fused-VI code converges to 9e-6
on CPU but churns at 3e-2..1.4 on TPU; the adaptation freeze never engages
because it gates on the NOISY per-iteration sample residual. This script
traces residual/long_res/ranks per window on the pendulum to (a) reproduce,
(b) evaluate candidate fixes.

Run: PYTHONPATH=. python experiments/tpu_churn.py [--freeze-mode long|res]
"""

import argparse
import json

import jax
import numpy as np

from c3sc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.utils import MetricsLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=41)
    ap.add_argument("--rmax", type=int, default=16)
    ap.add_argument("--rmax-max", type=int, default=None)
    ap.add_argument("--tol", type=float, default=2e-4)
    ap.add_argument("--max-iters", type=int, default=2500)
    ap.add_argument("--patience", type=int, default=40)
    ap.add_argument("--eps-rank", type=float, default=1e-5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    prob = make_pendulum_problem(beta=0.5, sigma=0.5)
    grid = prob.default_grid(args.n)
    metrics = MetricsLogger()
    sol = fused_tt_vi(
        prob, grid, n_controls=9, rmax=args.rmax, key=jax.random.key(0),
        tol=args.tol, max_iters=args.max_iters, eps_rank=args.eps_rank,
        rmax_max=args.rmax_max,
        patience=args.patience, metrics=metrics, log_every=50,
    )
    recs = [r for r in metrics.records if r["phase"] == "fused_vi"]
    for r in recs:
        print(f"it={r['iter']:5d} res={r['residual']:.3e} "
              f"long={r['long_res']:.3e} wstall={r['wstall']} "
              f"ranks={r['ranks']}")
    stop = ("tol" if sol.residual <= args.tol
            else "long_tol" if float(sol.carry.long_res) <= args.tol
            else "stall" if int(sol.carry.wstall) >= args.patience
            else "max_iters")
    print(json.dumps(dict(
        backend=jax.default_backend(), stop=stop,
        final_res=float(sol.residual),
        final_long=float(sol.carry.long_res),
        iters=sol.iterations, wall=round(sol.wall_time, 1),
        min_res=min(r["residual"] for r in recs),
    )))


if __name__ == "__main__":
    main()
