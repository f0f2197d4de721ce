"""7D flagship artifact (NORTHSTAR7.json) — round-5 revision.

Quadcopter7 (planar quadrotor + Ornstein-Uhlenbeck wind state) at the
round-5 recipe: fused cross-VI -> [two-site polish smoothing + global
coarse-grid correction] cycles -> gated level correction -> local dense
completion. Graded by:

  - INDEPENDENT sub-box oracle (VERDICT r4 next #6): dense VI of the
    SAME 7D MCA operator on the centered 7^7 sub-box with TT Dirichlet
    faces (``solve_local_patch`` at a tighter tolerance), scoring the
    production TT on the patch's INNER region (2 node-layers in from the
    Dirichlet faces, where discounted first passage to the boundary
    suppresses the boundary-data error);
  - a FULL 9^7 dense oracle when HBM admits it — attempted if requested;
  - the oracle-free ladder (sampled Bellman residual, validation
    rollouts) retained as secondary evidence.

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
    ap.add_argument("--cycles", type=int, default=5)
    ap.add_argument("--cycle-steps", type=int, default=10)
    ap.add_argument("--margin", type=int, default=1)
    ap.add_argument("--max-iters", type=int, default=1500)
    ap.add_argument("--rollouts", type=int, default=256)
    ap.add_argument("--chunk-roll", type=int, default=64)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--try-full-oracle", action="store_true",
                    help="also attempt the FULL 9^7 dense oracle")
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

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
    from c3sc_tpu.ops.tt import _repad
    from c3sc_tpu.solvers.gating import gated_apply
    from c3sc_tpu.solvers.twogrid import coarse_correct
    from c3sc_tpu.solvers.ttvi import make_bellman_kernel

    kernel = make_bellman_kernel(prob, grid,
                                 jnp.asarray(controls, jnp.float32),
                                 chunk=32768)
    t0 = time.time()
    v = _repad(fsol.v, args.polish_rmax)
    state = None
    cyc_hist = []
    for cyc in range(args.cycles):
        ps = tt_polish(prob, grid, controls, v, rmax=args.polish_rmax,
                       schedule=((args.cycle_steps, args.polish_rmax),),
                       check_every=4, kernel=kernel, state=state,
                       key=jax.random.key(100 + cyc))
        v, state = ps.v, ps.state
        v, cinfo = coarse_correct(prob, grid, controls, v, kernel=kernel,
                                  rmax_corr=32, verbose=True)
        cyc_hist.append({"cycle": cyc, "coarse_accepted": cinfo.accepted,
                         "bres": cinfo.bres_after})
    wall_polish = time.time() - t0
    bres_tail = [c["bres"] for c in cyc_hist]
    print(f"cycles: bres -> {bres_tail[-1]:.3e} [{wall_polish:.0f}s]",
          flush=True)
    lc_hist = []

    def _lc(vt):
        out, h = level_correct(prob, grid, controls, vt, kernel=kernel)
        lc_hist.extend(h)
        return out

    v, g_lc = gated_apply(prob, grid, controls, v, _lc, name="level",
                          kernel=kernel, verbose=True)

    class _P:                     # minimal holder for downstream fields
        pass

    psol = _P()
    psol.v = v
    psol.history = []
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

    # --- INDEPENDENT sub-box oracle (VERDICT r4 next #6): dense VI of
    # the SAME operator on the centered sub-box, TT Dirichlet faces,
    # tighter tolerance than the production patch; the production TT is
    # scored on the INNER region (2 node-layers in from the faces) ---
    patch_oracle = None
    if not args.skip_oracle:
        t0 = time.time()
        oracle_patch = solve_local_patch(prob, grid, vfn_tt, controls,
                                         margin=args.margin, tol=1e-6,
                                         max_sweeps=4000)
        wall_po = time.time() - t0
        sub_shape = oracle_patch.subgrid.shape
        inner = tuple(slice(2, s - 2) for s in sub_shape)
        # TT values on the oracle sub-box
        mesh_sub = np.stack([m.ravel() for m in
                             oracle_patch.subgrid.meshgrid()], -1)
        v_tt_sub = []
        jfn = jax.jit(vfn_tt)
        for i in range(0, mesh_sub.shape[0], 1 << 19):
            v_tt_sub.append(np.asarray(jfn(
                jnp.asarray(mesh_sub[i:i + (1 << 19)], jnp.float32))))
        v_tt_sub = np.concatenate(v_tt_sub).reshape(sub_shape)
        v_po = np.asarray(oracle_patch.v, np.float64)
        vrange_po = float(v_po.max() - v_po.min())
        rel_in = np.abs(v_tt_sub[inner] - v_po[inner]) / vrange_po
        patch_oracle = {
            "kind": ("dense VI on the centered sub-box, TT Dirichlet "
                     "faces, tol 1e-6 (solve_local_patch)"),
            "sub_shape": list(sub_shape),
            "nodes": int(np.prod(sub_shape)),
            "inner_nodes": int(np.prod([s - 4 for s in sub_shape])),
            "residual": float(oracle_patch.residual),
            "wall_s": round(wall_po, 1),
            "inner_value_q50": float(np.quantile(rel_in, 0.5)),
            "inner_value_q95": float(np.quantile(rel_in, 0.95)),
            "inner_value_max": float(rel_in.max()),
        }
        print(f"patch oracle: {patch_oracle['nodes']:,} nodes "
              f"res={patch_oracle['residual']:.1e} inner q95="
              f"{patch_oracle['inner_value_q95']:.3%} [{wall_po:.0f}s]",
              flush=True)

    oracle = None
    if args.try_full_oracle and not args.skip_oracle:
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
                   "cycles": args.cycles, "cycle_steps": args.cycle_steps,
                   "patch_margin": args.margin,
                   "controls": len(controls), "rollouts": args.rollouts,
                   "rollout_steps": args.steps,
                   "backend": jax.default_backend()},
        "production": {
            "mean_cost": c_p, "survival": surv_p,
            "fused": {"iterations": fsol.iterations,
                      "residual": float(fsol.residual),
                      "probe_cost": float(fsol.probe_cost),
                      "wall_s": round(wall_fused, 1)},
            "cycles": cyc_hist,
            "cycle_wall_s": round(wall_polish, 1),
            "level_correction": {"accepted": g_lc.accepted,
                                 "history": lc_hist},
            "patch": {"nodes": int(np.prod(patch.subgrid.shape)),
                      "residual": float(patch.residual),
                      "wall_s": round(wall_patch, 1)},
            "bellman_residual_sampled": float(bres),
            "value_scale": float(bscale),
        },
        "oracle": patch_oracle,
        "oracle_full": oracle,
        "tolerance": {"survival_min": 0.9, "bellman_residual_max": 0.02,
                      "oracle_inner_q95_max": 0.05,
                      "note": ("oracle_inner_q95_max: the 6D value bar "
                               "applied to the sub-box oracle's inner "
                               "region (VERDICT r4 next #6)")},
        "pass": bool(surv_p >= 0.9 and float(bres) <= 0.02
                     and (patch_oracle is None
                          or patch_oracle["inner_value_q95"] <= 0.05)
                     and (oracle is None
                          or oracle["cost_rel_deviation"] <= 0.05)),
    }
    out = os.path.join(os.path.dirname(HERE), "NORTHSTAR7.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("metric", "pass")}), flush=True)


if __name__ == "__main__":
    main()
