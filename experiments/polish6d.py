"""Round-4 production recipe rehearsal on the 9^6 quadcopter:

    fused cross-VI  ->  frozen-target two-site polish  ->  local dense
    completion patch  ->  greedy + receding-horizon-iLQR parity vs the
    dense oracle (CRN, chunked rollouts).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/polish6d.py
"""

import argparse
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from c3sc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.models.base import Boundary
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_full, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.local_patch import (make_patched_value_fn,
                                          solve_local_patch,
                                          two_level_solve)
from c3sc_tpu.solvers.polish import tt_polish

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=9)
    ap.add_argument("--rmax", type=int, default=16)
    ap.add_argument("--polish-rmax", type=int, default=64)
    ap.add_argument("--schedule", type=str, default="10:24,10:40,20:64")
    ap.add_argument("--margin", type=int, default=1)
    ap.add_argument("--cycles", type=int, default=2)
    ap.add_argument("--cycle-steps", type=int, default=10)
    ap.add_argument("--average-tail", type=int, default=0)
    ap.add_argument("--reroll-every", type=int, default=0)
    ap.add_argument("--rollouts", type=int, default=256)
    ap.add_argument("--chunk-roll", type=int, default=64)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--horizon", type=int, default=128)
    ap.add_argument("--max-iters", type=int, default=1500)
    ap.add_argument("--skip-mpc", action="store_true")
    args = ap.parse_args()
    schedule = tuple(tuple(map(int, s.split(":"))) for s in
                     args.schedule.split(","))

    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(args.n)
    controls = prob.control_candidates(5)
    with np.load(os.path.join(HERE, "artifacts",
                              f"quad_dense_v{args.n}.npz")) as z:
        v_dense = jnp.asarray(z["v"])
    vrange = float(np.asarray(v_dense).max() - np.asarray(v_dense).min())
    sl = tuple(slice(1, -1) if b == Boundary.ABSORB else slice(None)
               for b in prob.boundary)

    def q95_vs_dense(tt):
        e = np.abs(np.asarray(tt_full(tt)) - np.asarray(v_dense))[sl]
        return float(np.quantile(e, 0.95)) / vrange

    # --- stage 1: fused cross-VI (flagship recipe) ---
    t0 = time.time()
    fsol = fused_tt_vi(prob, grid, controls=controls, rmax=args.rmax,
                       key=jax.random.key(0), tol=2e-4,
                       max_iters=args.max_iters, patience=25,
                       probe_rollouts=32, probe_steps=500, probe_dt=0.01)
    print(f"fused: it={fsol.iterations} res={fsol.residual:.2e} "
          f"q95={q95_vs_dense(fsol.v):.3%} [{time.time()-t0:.0f}s]",
          flush=True)

    # --- stage 2: frozen-target two-site polish ---
    t0 = time.time()
    psol = tt_polish(prob, grid, controls, fsol.v, rmax=args.polish_rmax,
                     schedule=schedule, check_every=2, verbose=True,
                     average_tail=args.average_tail,
                     reroll_every=args.reroll_every)
    print(f"polish: best_step={psol.best_step} evals={psol.n_evals:,} "
          f"q95={q95_vs_dense(psol.v):.3%} [{time.time()-t0:.0f}s]",
          flush=True)

    # --- stage 3: two-level TT + local patch cycles ---
    t0 = time.time()
    tl = two_level_solve(prob, grid, controls, psol.v,
                         rmax=args.polish_rmax, cycles=args.cycles,
                         cycle_schedule=((args.cycle_steps, args.polish_rmax),),
                         margin=args.margin, verbose=True)
    vfn_tt = lambda p: tt_lerp_eval(tl.v, grid, p)
    vfn_p = make_patched_value_fn(grid, vfn_tt, tl.patch)
    print(f"two_level: cycles={args.cycles} q95={q95_vs_dense(tl.v):.3%} "
          f"[{time.time()-t0:.0f}s]", flush=True)

    # --- parity evals (CRN, chunked) ---
    vfn_d = lambda p: multilinear_interp(grid, v_dense, p)
    rng = np.random.default_rng(4242)
    B, CH = args.rollouts, args.chunk_roll
    x0 = jnp.asarray(
        0.4 * rng.uniform(-1, 1, (B, 6))
        * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)

    def eval_greedy(vfn):
        pol = make_implicit_policy(prob, grid, vfn, controls)
        cs, al = [], []
        for i in range(B // CH):
            tr = rollout(prob, grid, pol, x0[i*CH:(i+1)*CH],
                         jax.random.key(1000 + i), dt=0.01,
                         n_steps=args.steps)
            cs.append(np.asarray(tr.cost)); al.append(np.asarray(tr.alive[-1]))
        return float(np.concatenate(cs).mean()), float(np.concatenate(al).mean())

    def eval_mpc(vfn):
        cs, al = [], []
        for i in range(B // CH):
            tr = receding_horizon_rollout(
                prob, grid, vfn, x0[i*CH:(i+1)*CH], jax.random.key(1000 + i),
                dt=0.01, n_steps=args.steps, horizon=args.horizon,
                replan_every=4, opt_iters=8, controls=controls)
            cs.append(np.asarray(tr.cost)); al.append(np.asarray(tr.alive[-1]))
        return float(np.concatenate(cs).mean()), float(np.concatenate(al).mean())

    out = {"fused_q95": q95_vs_dense(fsol.v),
           "polish_q95": q95_vs_dense(psol.v),
           "two_level_q95": q95_vs_dense(tl.v),
           "polish_history": psol.history,
           "two_level_history": tl.history}
    cd, _ = eval_greedy(vfn_d)
    out["greedy"] = {"dense": cd}
    for name, vfn in [("tt", vfn_tt), ("tt+patch", vfn_p)]:
        c, s = eval_greedy(vfn)
        out["greedy"][name] = c
        print(f"greedy {name}: {c:.4f} rel={abs(c-cd)/cd:.2%} surv={s:.0%}",
              flush=True)
    if not args.skip_mpc:
        cdm, _ = eval_mpc(vfn_d)
        out["mpc"] = {"dense": cdm}
        for name, vfn in [("tt", vfn_tt), ("tt+patch", vfn_p)]:
            c, s = eval_mpc(vfn)
            out["mpc"][name] = c
            print(f"mpc {name}: {c:.4f} rel={abs(c-cdm)/cdm:.2%} "
                  f"surv={s:.0%}", flush=True)
    with open(os.path.join(HERE, "artifacts", f"polish6d_n{args.n}.json"),
              "w") as f:
        json.dump(out, f, indent=1, default=float)
    print("done", flush=True)


if __name__ == "__main__":
    main()
