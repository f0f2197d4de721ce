"""North-star artifact v2: 6D quadcopter vs an INDEPENDENT dense-grid oracle.

Round-2 verdict: the TT-vs-TT self-consistency north star shares any
systematic error of the fused cross/MCA implementation between both sides.
This experiment retires it: the oracle is ``dense_vi`` — a full-grid
(no TT anywhere) modified-policy-iteration solve of the SAME discrete MCA
Bellman equation on the SAME grid — run on the TPU chip, where the
9^6 = 531k-node (or 11^6 = 1.77M-node) stencil arrays fit in HBM.

Reported (NORTHSTAR.json):
  - node-value parity: TT full contraction vs dense v over ALL nodes
  - closed-loop realized cost + survival under identical noise keys,
    tolerance tightened from 10% (r2) to <= 3%
  - control agreement at matched states, measured in raw candidates AND in
    the degeneracy-collapsing coordinates (u1+u2, u1-u2)
  - the Q-gap Q_oracle(u_prod) - Q_oracle(u_oracle) at disagreeing states,
    relative to the per-state Q-range — quantifying (or killing) the
    "near-optimal degeneracy" claim of round 2

Reference: BASELINE.json north_star ("quadcopter (6D) ... closed-loop
control sequence within 1% of reference"); SURVEY.md §4 oracle strategy
(dense_dp stands in for the absent reference binary — mount still empty
this round, 0 files).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/quad_dense_oracle.py
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from c3sc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_full, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.sim.policy import q_values
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


def dense_solve(prob, grid, controls, tol, cache):
    if os.path.exists(cache):
        with np.load(cache) as z:
            print(f"dense oracle: loaded {cache} "
                  f"(residual={z['residual']:.2e}, sweeps={z['sweeps']}, "
                  f"wall={z['wall_s']:.0f}s)", flush=True)
            return jnp.asarray(z["v"]), float(z["wall_s"])
    t0 = time.time()
    sol = dense_vi(prob, grid, controls=controls, tol=tol, max_outer=3000,
                   chunk=25, eval_sweeps=10, verbose=True)
    wall = time.time() - t0
    os.makedirs(ART, exist_ok=True)
    np.savez_compressed(cache, v=np.asarray(sol.v), residual=sol.residual,
                        sweeps=sol.sweeps, wall_s=wall)
    print(f"dense oracle: residual={sol.residual:.2e} sweeps={sol.sweeps} "
          f"wall={wall:.0f}s -> {cache}", flush=True)
    return sol.v, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=9)
    ap.add_argument("--rmax", type=int, default=16)
    ap.add_argument("--max-iters", type=int, default=1500)
    ap.add_argument("--probe", type=int, default=32)
    ap.add_argument("--rollouts", type=int, default=64)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--dense-tol", type=float, default=1e-5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(args.n)
    controls = prob.control_candidates(5)  # 25 candidates
    print(f"quadcopter 6D, grid {grid.shape} "
          f"({int(np.prod(grid.shape)):,} nodes), backend "
          f"{jax.default_backend()}", flush=True)

    # --- oracle: dense full-grid solve of the same MCA fixed point ---
    cache = os.path.join(ART, f"quad_dense_v{args.n}.npz")
    v_dense, dense_wall = dense_solve(prob, grid, controls, args.dense_tol,
                                      cache)

    # --- production: fused TT solve, flagship recipe ---
    t0 = time.time()
    sol = fused_tt_vi(
        prob, grid, controls=controls, rmax=args.rmax, key=jax.random.key(0),
        tol=2e-4, max_iters=args.max_iters, patience=25,
        probe_rollouts=args.probe, probe_steps=500, probe_dt=0.01,
    )
    tt_wall = time.time() - t0
    print(f"fused TT: it={sol.iterations} res={sol.residual:.2e} "
          f"probe_cost={sol.probe_cost:.3f} "
          f"ranks={[int(r) for r in np.asarray(sol.v.ranks)]} "
          f"wall={tt_wall:.0f}s", flush=True)

    # --- node-value parity over the ENTIRE grid ---
    v_tt = tt_full(sol.v)                      # 9^6 f32 = 2 MB: cheap
    dv = np.abs(np.asarray(v_tt) - np.asarray(v_dense))
    vrange = float(np.asarray(v_dense).max() - np.asarray(v_dense).min())
    rel = dv / max(vrange, 1e-9)
    val_q50, val_q95, val_max = (float(np.quantile(rel, 0.5)),
                                 float(np.quantile(rel, 0.95)),
                                 float(rel.max()))
    # interior parity: >= 1 node away from the absorbing faces, where the
    # dense v is pinned to the exit cost — a C0 discontinuity a lerp-basis
    # TT smooths over one cell by construction; the closed loop never acts
    # from the pinned face (exit has already happened there)
    from c3sc_tpu.models.base import Boundary
    sl = tuple(slice(1, -1) if b == Boundary.ABSORB else slice(None)
               for b in prob.boundary)
    rel_int = rel[sl]
    int_q50, int_q95, int_max = (float(np.quantile(rel_int, 0.5)),
                                 float(np.quantile(rel_int, 0.95)),
                                 float(rel_int.max()))
    print(f"value parity (rel to range {vrange:.1f}): "
          f"full q50={val_q50:.2%} q95={val_q95:.2%} max={val_max:.2%} | "
          f"interior q50={int_q50:.2%} q95={int_q95:.2%} max={int_max:.2%}",
          flush=True)

    # --- closed loop under identical noise ---
    rng = np.random.default_rng(4242)
    x0 = jnp.asarray(
        0.4 * rng.uniform(-1, 1, (args.rollouts, 6))
        * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)
    key = jax.random.key(9)
    vfn_tt = lambda p: tt_lerp_eval(sol.v, grid, p)
    vfn_dense = lambda p: multilinear_interp(grid, v_dense, p)
    pol_tt = make_implicit_policy(prob, grid, vfn_tt, controls)
    pol_dense = make_implicit_policy(prob, grid, vfn_dense, controls)
    tr_p = rollout(prob, grid, pol_tt, x0, key, dt=0.01, n_steps=args.steps)
    tr_o = rollout(prob, grid, pol_dense, x0, key, dt=0.01, n_steps=args.steps)
    c_p = float(np.asarray(tr_p.cost).mean())
    c_o = float(np.asarray(tr_o.cost).mean())
    surv_p = float(np.asarray(tr_p.alive[-1]).mean())
    surv_o = float(np.asarray(tr_o.alive[-1]).mean())
    cost_rel = abs(c_p - c_o) / max(abs(c_o), 1e-9)
    print(f"closed loop: cost tt={c_p:.3f} dense={c_o:.3f} "
          f"rel={cost_rel:.2%}; survival tt={surv_p:.2%} "
          f"dense={surv_o:.2%}", flush=True)

    # --- matched-state control agreement + Q-gap under the ORACLE Q ---
    xs = np.asarray(tr_o.xs[:-1]).reshape(-1, 6)
    alive_m = np.asarray(tr_o.alive[:-1]).reshape(-1)
    xs = jnp.asarray(xs[alive_m][:4096], jnp.float32)
    u_p = np.asarray(pol_tt(xs))
    u_o = np.asarray(pol_dense(xs))
    agree = float((np.abs(u_p - u_o) < 1e-6).all(axis=-1).mean())
    urange = float(prob.uub[0] - prob.ulb[0])
    u_dev = float(np.abs(u_p - u_o).mean() / urange)
    # degeneracy-collapsing coordinates: total thrust s = u1+u2 (the
    # physically binding input) and differential m = u1-u2 (torque)
    s_dev = float(np.abs((u_p.sum(-1)) - (u_o.sum(-1))).mean() / (2 * urange))
    m_dev = float(np.abs((u_p[:, 0] - u_p[:, 1])
                         - (u_o[:, 0] - u_o[:, 1])).mean() / (2 * urange))
    # Q-gap: how suboptimal (under the ORACLE value) is the production pick?
    q = np.asarray(q_values(prob, grid, vfn_dense, controls, xs))  # [B, C]
    uc = np.asarray(controls)
    pick_p = np.argmin(np.abs(u_p[:, None, :] - uc[None]).sum(-1), axis=1)
    q_gap = q[np.arange(len(q)), pick_p] - q.min(axis=1)
    q_span = q.max(axis=1) - q.min(axis=1)
    q_gap_rel = q_gap / np.maximum(q_span, 1e-9)
    disagree = ~(np.abs(u_p - u_o) < 1e-6).all(axis=-1)
    dis_gap = q_gap_rel[disagree] if disagree.any() else np.zeros(1)
    qg_q50, qg_q95 = (float(np.quantile(dis_gap, 0.5)),
                      float(np.quantile(dis_gap, 0.95)))
    qg_small = float((dis_gap < 0.005).mean())
    print(f"agreement: candidate={agree:.2%} u_dev={u_dev:.2%} "
          f"thrust-sum dev={s_dev:.2%} differential dev={m_dev:.2%}",
          flush=True)
    print(f"Q-gap at disagreeing states (rel to Q-span): q50={qg_q50:.3%} "
          f"q95={qg_q95:.3%} frac<0.5%={qg_small:.2%}", flush=True)

    tol_cost, tol_surv = 0.03, 0.90
    result = {
        "metric": "quadcopter_6d_vs_dense_oracle",
        "oracle": {
            "kind": "dense_vi (full-grid modified PI, no TT anywhere)",
            "nodes": int(np.prod(grid.shape)),
            "residual_tol": args.dense_tol,
            "wall_s": round(dense_wall, 1),
            "mean_cost": c_o, "survival": surv_o,
        },
        "config": {"grid": list(grid.shape), "rmax": args.rmax,
                   "controls": len(controls), "rollouts": args.rollouts,
                   "rollout_steps": args.steps,
                   "backend": jax.default_backend()},
        "production": {"mean_cost": c_p, "survival": surv_p,
                       "probe_cost": sol.probe_cost,
                       "iterations": sol.iterations,
                       "ranks": [int(r) for r in np.asarray(sol.v.ranks)],
                       "wall_s": round(tt_wall, 1)},
        "value_parity_rel_to_range": {
            "full": {"q50": val_q50, "q95": val_q95, "max": val_max},
            "interior": {"q50": int_q50, "q95": int_q95, "max": int_max},
            "note": "interior excludes absorbing-face nodes (v pinned to "
                    "exit cost; C0 jump a lerp-basis TT smooths over 1 cell)",
        },
        "cost_rel_deviation": cost_rel,
        "control_agreement": {
            "candidate_exact": agree,
            "mean_u_deviation_of_range": u_dev,
            "thrust_sum_deviation_of_range": s_dev,
            "differential_deviation_of_range": m_dev,
            "q_gap_at_disagreements_rel_to_span": {
                "q50": qg_q50, "q95": qg_q95, "frac_below_0.5%": qg_small},
        },
        "tolerance": {"cost_rel": tol_cost, "survival_min": tol_surv,
                      "value_q95_max": 0.05},
        "pass": bool(cost_rel <= tol_cost and surv_p >= tol_surv
                     and surv_o >= tol_surv and int_q95 <= 0.05),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "NORTHSTAR.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
