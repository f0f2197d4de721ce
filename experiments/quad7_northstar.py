"""7D flagship artifact (NORTHSTAR7.json) — VERDICT r3 next #5.

Quadcopter7 (planar quadrotor + Ornstein-Uhlenbeck wind state) at the
round-4 recipe: fused cross-VI -> frozen-target two-site polish -> local
dense completion. Graded by:

  - a FULL 9^7 dense oracle when HBM admits it (4.78M nodes x 25
    candidates: ~8.5 GB stencil on a 16 GB chip) — attempted first;
  - otherwise the oracle-free ladder the r3 verdict prescribed: sampled
    Bellman residual (contraction bound), fresh-seed validation rollout
    cost + survival, wall time.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/quad7_northstar.py
"""

import argparse
import json
import os
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

from c3sc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from c3sc_tpu.models import make_quadcopter7_problem
from c3sc_tpu.models.base import Boundary
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_full, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.local_patch import (make_patched_value_fn,
                                          solve_local_patch)
from c3sc_tpu.solvers.polish import level_correct, tt_polish
from c3sc_tpu.solvers.ttvi import bellman_residual_sample

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=9)
    ap.add_argument("--rmax", type=int, default=16)
    ap.add_argument("--polish-rmax", type=int, default=64)
    ap.add_argument("--schedule", type=str, default="6:24,8:40,24:64")
    ap.add_argument("--margin", type=int, default=1)
    ap.add_argument("--max-iters", type=int, default=1500)
    ap.add_argument("--rollouts", type=int, default=256)
    ap.add_argument("--chunk-roll", type=int, default=64)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()
    schedule = tuple(tuple(map(int, s.split(":")))
                     for s in args.schedule.split(","))

    prob = make_quadcopter7_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(args.n)
    controls = prob.control_candidates(5)
    N = int(np.prod(grid.shape))
    print(f"quadcopter7, grid {grid.shape} ({N:,} nodes), backend "
          f"{jax.default_backend()}", flush=True)

    # --- production pipeline ---
    t0 = time.time()
    fsol = fused_tt_vi(prob, grid, controls=controls, rmax=args.rmax,
                       key=jax.random.key(0), tol=2e-4,
                       max_iters=args.max_iters, patience=25,
                       probe_rollouts=32, probe_steps=500, probe_dt=0.01)
    wall_fused = time.time() - t0
    print(f"fused: it={fsol.iterations} res={fsol.residual:.2e} "
          f"probe={fsol.probe_cost:.3f} [{wall_fused:.0f}s]", flush=True)
    t0 = time.time()
    psol = tt_polish(prob, grid, controls, fsol.v, rmax=args.polish_rmax,
                     schedule=schedule, check_every=2)
    wall_polish = time.time() - t0
    bres_tail = [r["bres"] for r in psol.history if "bres" in r]
    print(f"polish: bres {bres_tail[0]:.3e} -> {bres_tail[-1]:.3e} "
          f"[{wall_polish:.0f}s]", flush=True)
    v_lc, lc_hist = level_correct(prob, grid, controls, psol.v)
    psol.v = v_lc
    vfn_tt = lambda p: tt_lerp_eval(psol.v, grid, p)
    t0 = time.time()
    patch = solve_local_patch(prob, grid, vfn_tt, controls,
                              margin=args.margin, tol=1e-5)
    vfn_prod = make_patched_value_fn(grid, vfn_tt, patch)
    wall_patch = time.time() - t0
    print(f"patch: {int(np.prod(patch.subgrid.shape)):,} nodes "
          f"res={patch.residual:.1e} [{wall_patch:.0f}s]", flush=True)

    bres, bscale = bellman_residual_sample(prob, grid, controls, psol.v,
                                           n_samples=8192)

    # --- rollout eval (CRN chunks) ---
    rng = np.random.default_rng(4242)
    B, CH = args.rollouts, args.chunk_roll
    x0 = jnp.asarray(
        0.4 * rng.uniform(-1, 1, (B, 7))
        * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0, 1.5]), jnp.float32)

    def eval_greedy(vfn):
        pol = make_implicit_policy(prob, grid, vfn, controls)
        cs, al = [], []
        for i in range(B // CH):
            tr = rollout(prob, grid, pol, x0[i*CH:(i+1)*CH],
                         jax.random.key(1000 + i), dt=0.01,
                         n_steps=args.steps)
            cs.append(np.asarray(tr.cost))
            al.append(np.asarray(tr.alive[-1]))
        return (float(np.concatenate(cs).mean()),
                float(np.concatenate(al).mean()))

    c_p, surv_p = eval_greedy(vfn_prod)
    print(f"production greedy: cost={c_p:.4f} surv={surv_p:.2%}", flush=True)

    # --- oracle attempt ---
    oracle = None
    if not args.skip_oracle:
        cache = os.path.join(HERE, "artifacts", f"quad7_dense_v{args.n}.npz")
        try:
            if os.path.exists(cache):
                with np.load(cache) as z:
                    v_dense = jnp.asarray(z["v"])
                    dense_wall = float(z["wall_s"])
            else:
                t0 = time.time()
                sol = dense_vi(prob, grid, controls=controls, tol=1e-5,
                               max_outer=3000, chunk=25, eval_sweeps=10,
                               verbose=True)
                dense_wall = time.time() - t0
                np.savez_compressed(cache, v=np.asarray(sol.v),
                                    residual=sol.residual, sweeps=sol.sweeps,
                                    wall_s=dense_wall)
                v_dense = sol.v
            vrange = float(np.asarray(v_dense).max()
                           - np.asarray(v_dense).min())
            sl = tuple(slice(1, -1) if b == Boundary.ABSORB else slice(None)
                       for b in prob.boundary)
            mesh_x = jnp.asarray(
                np.stack([m.ravel() for m in grid.meshgrid()], -1),
                jnp.float32)
            # composite eval in chunks (4.8M points)
            vs = []
            jfn = jax.jit(vfn_prod)
            for i in range(0, N, 1 << 20):
                vs.append(np.asarray(jfn(mesh_x[i:i + (1 << 20)])))
            v_comp = np.concatenate(vs).reshape(grid.shape)
            rel = np.abs(v_comp - np.asarray(v_dense)) / vrange
            q95 = float(np.quantile(rel[sl], 0.95))
            vfn_dense = lambda p: multilinear_interp(grid, v_dense, p)
            c_o, surv_o = eval_greedy(vfn_dense)
            oracle = {
                "kind": "dense_vi 9^7 full grid", "nodes": N,
                "wall_s": round(dense_wall, 1), "mean_cost": c_o,
                "survival": surv_o,
                "interior_value_q95": q95,
                "cost_rel_deviation": abs(c_p - c_o) / max(abs(c_o), 1e-9),
            }
            print(f"ORACLE 9^7: cost={c_o:.4f} q95={q95:.3%} "
                  f"cost_rel={oracle['cost_rel_deviation']:.2%}", flush=True)
        except Exception:
            print("9^7 dense oracle failed (expected if HBM-bound):",
                  flush=True)
            traceback.print_exc()

    result = {
        "metric": "quadcopter_7d_flagship",
        "config": {"grid": list(grid.shape), "rmax": args.rmax,
                   "polish_rmax": args.polish_rmax,
                   "schedule": args.schedule, "patch_margin": args.margin,
                   "controls": len(controls), "rollouts": args.rollouts,
                   "rollout_steps": args.steps,
                   "backend": jax.default_backend()},
        "production": {
            "mean_cost": c_p, "survival": surv_p,
            "fused": {"iterations": fsol.iterations,
                      "residual": float(fsol.residual),
                      "probe_cost": float(fsol.probe_cost),
                      "wall_s": round(wall_fused, 1)},
            "polish": {"bres_first": bres_tail[0],
                       "bres_last": bres_tail[-1],
                       "wall_s": round(wall_polish, 1)},
            "level_correction": lc_hist,
            "patch": {"nodes": int(np.prod(patch.subgrid.shape)),
                      "residual": float(patch.residual),
                      "wall_s": round(wall_patch, 1)},
            "bellman_residual_sampled": float(bres),
            "value_scale": float(bscale),
        },
        "oracle": oracle,
        "tolerance": {"survival_min": 0.9, "bellman_residual_max": 0.02},
        "pass": bool(surv_p >= 0.9 and float(bres) <= 0.02
                     and (oracle is None
                          or oracle["cost_rel_deviation"] <= 0.05)),
    }
    out = os.path.join(os.path.dirname(HERE), "NORTHSTAR7.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("metric", "pass")}), flush=True)


if __name__ == "__main__":
    main()
