"""North-star artifact v3: 6D quadcopter vs an INDEPENDENT dense oracle.

v2 (round 3) retired the TT-vs-TT self-consistency harness: the oracle is
``dense_vi`` — a full-grid (no TT anywhere) modified-policy-iteration solve
of the SAME discrete MCA Bellman equation on the SAME grid, on the chip.

v3 (round 4) upgrades the PRODUCTION side to the measured recipe
(docs/DESIGN.md round-4 campaign):

    fused cross-VI  ->  frozen-target two-site polish  ->  two-level
    TT + local-dense-completion cycles

and grades BOTH readouts under common random numbers:
  - greedy: the one-step implicit policy (identical machinery both
    sides) — reported in full, with its own two-sided <=3% boolean;
  - deployment: batched iLQR receding-horizon MPC (identical machinery
    both sides) — the COST criterion of the pass, one-sided (production
    must not be WORSE than the oracle-value controller by more than 3%;
    being better passes).

Why the cost criterion moved from greedy to the deployment controller
(measured, not asserted — experiments/frontier_n{9,11}.json): greedy
one-step cost deviation is NOT a function of value accuracy on this
problem. SVD-OPTIMAL truncations of the oracle's own solution realize
0.5%-25% greedy cost deviation quasi-randomly in rank (rank 81 at 11^6:
q95 0.117% of range yet 25% cost), because the hover basin's true value
gradient vanishes and WHERE a residual tilt parks the plant is a
lottery. A criterion that the oracle's own near-exact compressions fail
measures conditioning, not solver quality. The deployment controller is
the mode BASELINE configs[4] prescribes for this flagship ("stochastic
MPC ... receding-horizon replan"), and its one-sided check preserves the
original 3% tolerance. The value bar (interior q95 <= 5% of range) and
the survival bar are unchanged from v2.

Reported (NORTHSTAR.json): node-value parity per stage (fused / polished
TT / deployed composite), closed-loop cost + survival per readout,
control agreement + oracle-Q gap at matched states.

Reference: BASELINE.json north_star; SURVEY.md §4 oracle strategy (mount
still empty this round, 0 files).

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
from c3sc_tpu.models.base import Boundary
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_full, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.sim.policy import q_values
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.gating import gated_apply, make_greedy_probe
from c3sc_tpu.solvers.local_patch import (make_patched_value_fn,
                                          solve_local_patch)
from c3sc_tpu.solvers.polish import level_correct, mode_correct, tt_polish
from c3sc_tpu.solvers.twogrid import coarse_correct
from c3sc_tpu.solvers.ttvi import make_bellman_kernel

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
    ap.add_argument("--seed", type=int, default=0,
                    help="solver lineage key (VERDICT r4 next #1: the "
                         "pass must hold on >=3 independent keys)")
    ap.add_argument("--rmax", type=int, default=16)
    ap.add_argument("--polish-rmax", type=int, default=64)
    ap.add_argument("--cycles", type=int, default=7,
                    help="[polish-smooth + coarse-grid-correct] cycles")
    ap.add_argument("--cycle-steps", type=int, default=10)
    ap.add_argument("--margin", type=int, default=1)
    ap.add_argument("--max-iters", type=int, default=1500)
    ap.add_argument("--probe", type=int, default=32)
    ap.add_argument("--rollouts", type=int, default=256)
    ap.add_argument("--chunk-roll", type=int, default=64)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--horizon", type=int, default=128)
    ap.add_argument("--dense-tol", type=float, default=1e-5)
    ap.add_argument("--terminal-radius", type=float, default=0.4,
                    help="dual-mode MPC terminal-LQR basin radius (scaled "
                         "2-norm); 0 disables — see sim/terminal.py for "
                         "the measured parking-lottery rationale")
    ap.add_argument("--skip-mpc", action="store_true")
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
    vrange = float(np.asarray(v_dense).max() - np.asarray(v_dense).min())
    sl = tuple(slice(1, -1) if b == Boundary.ABSORB else slice(None)
               for b in prob.boundary)

    def parity(v_full):
        rel = np.abs(v_full - np.asarray(v_dense)) / max(vrange, 1e-9)
        return {
            "full": {"q50": float(np.quantile(rel, 0.5)),
                     "q95": float(np.quantile(rel, 0.95)),
                     "max": float(rel.max())},
            "interior": {"q50": float(np.quantile(rel[sl], 0.5)),
                         "q95": float(np.quantile(rel[sl], 0.95)),
                         "max": float(rel[sl].max())},
        }

    # --- production (round-5 recipe): fused -> [polish-smooth +
    # global coarse-grid correction] cycles -> gated level/mode
    # corrections -> local patch completion ---
    from c3sc_tpu.ops.tt import _repad

    t0 = time.time()
    fsol = fused_tt_vi(
        prob, grid, controls=controls, rmax=args.rmax,
        key=jax.random.key(args.seed),
        tol=2e-4, max_iters=args.max_iters, patience=25,
        probe_rollouts=args.probe, probe_steps=500, probe_dt=0.01,
    )
    wall_fused = time.time() - t0
    print(f"fused[seed={args.seed}]: it={fsol.iterations} "
          f"res={fsol.residual:.2e} [{wall_fused:.0f}s]", flush=True)

    kernel = make_bellman_kernel(prob, grid,
                                 jnp.asarray(controls, jnp.float32),
                                 chunk=32768)
    t0 = time.time()
    v = _repad(fsol.v, args.polish_rmax)
    state = None
    cyc_hist = []
    for cyc in range(args.cycles):
        psol = tt_polish(prob, grid, controls, v, rmax=args.polish_rmax,
                         schedule=((args.cycle_steps, args.polish_rmax),),
                         check_every=4, kernel=kernel, state=state,
                         key=jax.random.key(1000 * args.seed + cyc))
        v, state = psol.v, psol.state
        v, cinfo = coarse_correct(prob, grid, controls, v, kernel=kernel,
                                  rmax_corr=32, verbose=True)
        cyc_hist.append({"cycle": cyc,
                         "coarse_accepted": cinfo.accepted,
                         "bres": cinfo.bres_after})
    wall_polish = time.time() - t0
    # gated slow-mode corrections (VERDICT r4 next #2: measured
    # accept/reject around EVERY correction stage)
    probe = make_greedy_probe(prob, grid, controls, n_rollouts=24,
                              n_steps=250, dt=0.01)
    lc_hist, mc_hist = [], []

    def _lc(vt):
        out, h = level_correct(prob, grid, controls, vt, kernel=kernel)
        lc_hist.extend(h)
        return out

    def _mc(vt):
        out, h = mode_correct(prob, grid, controls, vt, kernel=kernel)
        mc_hist.extend(h)
        return out

    v, g_lc = gated_apply(prob, grid, controls, v, _lc, name="level",
                          kernel=kernel, probe_fn=probe, verbose=True)
    v, g_mc = gated_apply(prob, grid, controls, v, _mc, name="modes",
                          kernel=kernel, probe_fn=probe, verbose=True)

    # two-level TT+patch cycles (r4 machinery, KEPT in r5: the composite-
    # kernel polish refreshes the TT at the patch ring, which is what the
    # deployment controller's terminal values live on — the r5a run that
    # dropped this stage passed the value bar but FAILED deployment at
    # +9.3%, experiments/northstar_r5_seed0.log first attempt)
    from c3sc_tpu.solvers.local_patch import two_level_solve

    t0 = time.time()
    tl = two_level_solve(prob, grid, controls, v, rmax=args.polish_rmax,
                         cycles=2, cycle_schedule=((args.cycle_steps,
                                                    args.polish_rmax),),
                         margin=args.margin)
    v, patch = tl.v, tl.patch
    wall_tl = time.time() - t0
    print(f"cycles [{wall_polish:.0f}s] + two-level [{wall_tl:.0f}s]",
          flush=True)
    from c3sc_tpu.ops.tt import tt_save

    tt_save(v, os.path.join(ART, f"northstar_seed{args.seed}_v.npz"))
    np.savez(os.path.join(ART, f"northstar_seed{args.seed}_patch.npz"),
             v=np.asarray(patch.v), lo=patch.lo, hi=patch.hi)

    vfn_tt = lambda p: tt_lerp_eval(v, grid, p)
    vfn_prod = make_patched_value_fn(grid, vfn_tt, patch)
    vfn_dense = lambda p: multilinear_interp(grid, v_dense, p)

    # deployed composite on the full node set
    mesh_x = jnp.asarray(np.stack([m.ravel() for m in grid.meshgrid()], -1),
                         jnp.float32)
    v_comp = np.asarray(
        jax.jit(vfn_prod)(mesh_x)).reshape(grid.shape)
    par_fused = parity(np.asarray(tt_full(fsol.v)))
    par_polish = parity(np.asarray(tt_full(v)))
    par_prod = parity(v_comp)
    print(f"value parity interior q95: fused "
          f"{par_fused['interior']['q95']:.3%} -> polish "
          f"{par_polish['interior']['q95']:.3%} -> deployed "
          f"{par_prod['interior']['q95']:.3%}", flush=True)

    # --- closed loop under identical noise (chunked rollouts) ---
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
            cs.append(np.asarray(tr.cost))
            al.append(np.asarray(tr.alive[-1]))
        return (float(np.concatenate(cs).mean()),
                float(np.concatenate(al).mean()))

    tlqr = None
    if args.terminal_radius > 0:
        from c3sc_tpu.sim.terminal import make_terminal_lqr

        tlqr = make_terminal_lqr(prob, dt=0.01, radius=args.terminal_radius)

    def eval_mpc(vfn):
        cs, al = [], []
        for i in range(B // CH):
            tr = receding_horizon_rollout(
                prob, grid, vfn, x0[i*CH:(i+1)*CH], jax.random.key(1000 + i),
                dt=0.01, n_steps=args.steps, horizon=args.horizon,
                replan_every=4, opt_iters=8, controls=controls,
                terminal_lqr=tlqr)
            cs.append(np.asarray(tr.cost))
            al.append(np.asarray(tr.alive[-1]))
        return (float(np.concatenate(cs).mean()),
                float(np.concatenate(al).mean()))

    c_o, surv_o = eval_greedy(vfn_dense)
    c_p, surv_p = eval_greedy(vfn_prod)
    cost_rel = abs(c_p - c_o) / max(abs(c_o), 1e-9)
    print(f"greedy closed loop: prod={c_p:.4f} dense={c_o:.4f} "
          f"rel={cost_rel:.2%}; survival prod={surv_p:.2%} "
          f"dense={surv_o:.2%}", flush=True)

    mpc_row = None
    if not args.skip_mpc:
        cm_o, _ = eval_mpc(vfn_dense)
        cm_p, sm_p = eval_mpc(vfn_prod)
        mpc_row = {
            "mean_cost": cm_p, "oracle_mean_cost": cm_o, "survival": sm_p,
            "signed_rel": (cm_p - cm_o) / max(abs(cm_o), 1e-9),
            "controller": ("dual-mode: receding-horizon iLQR + terminal "
                           "basin LQR (sim/terminal.py), identical for "
                           "production and oracle fields under CRN"
                           if tlqr is not None else
                           "receding-horizon iLQR (pure MPC)"),
            "terminal_lqr": ({"radius": args.terminal_radius}
                             if tlqr is not None else None),
            "note": ("one-sided deployment check: production must not be "
                     "WORSE than the oracle-value controller by more than "
                     "tol; negative signed_rel = production realizes LOWER "
                     "cost (the continuous-dynamics iLQR planner beats the "
                     "coarse-grid discrete-optimal policy)"),
            "pass_one_sided": bool((cm_p - cm_o) / max(abs(cm_o), 1e-9)
                                   <= 0.03 and sm_p >= 0.9),
        }
        print(f"mpc closed loop: prod={cm_p:.4f} dense={cm_o:.4f} "
              f"signed_rel={mpc_row['signed_rel']:+.2%}", flush=True)

    # --- matched-state control agreement + Q-gap under the ORACLE Q ---
    pol_prod = make_implicit_policy(prob, grid, vfn_prod, controls)
    pol_dense = make_implicit_policy(prob, grid, vfn_dense, controls)
    tr_o = rollout(prob, grid, pol_dense, x0[:CH], jax.random.key(1000),
                   dt=0.01, n_steps=args.steps)
    xs = np.asarray(tr_o.xs[:-1]).reshape(-1, 6)
    alive_m = np.asarray(tr_o.alive[:-1]).reshape(-1)
    xs = jnp.asarray(xs[alive_m][:4096], jnp.float32)
    u_p = np.asarray(pol_prod(xs))
    u_o = np.asarray(pol_dense(xs))
    agree = float((np.abs(u_p - u_o) < 1e-6).all(axis=-1).mean())
    urange = float(prob.uub[0] - prob.ulb[0])
    u_dev = float(np.abs(u_p - u_o).mean() / urange)
    s_dev = float(np.abs((u_p.sum(-1)) - (u_o.sum(-1))).mean() / (2 * urange))
    m_dev = float(np.abs((u_p[:, 0] - u_p[:, 1])
                         - (u_o[:, 0] - u_o[:, 1])).mean() / (2 * urange))
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

    tol_cost, tol_surv, tol_q95 = 0.03, 0.90, 0.05
    greedy_pass = bool(cost_rel <= tol_cost and surv_p >= tol_surv)
    dep_pass = (None if mpc_row is None else mpc_row["pass_one_sided"])
    result = {
        "metric": "quadcopter_6d_vs_dense_oracle",
        "oracle": {
            "kind": "dense_vi (full-grid modified PI, no TT anywhere)",
            "nodes": int(np.prod(grid.shape)),
            "residual_tol": args.dense_tol,
            "wall_s": round(dense_wall, 1),
            "mean_cost": c_o, "survival": surv_o,
        },
        "config": {
            "grid": list(grid.shape), "seed": args.seed, "rmax": args.rmax,
            "polish_rmax": args.polish_rmax,
            "cycles": args.cycles, "cycle_steps": args.cycle_steps,
            "patch_margin": args.margin,
            "controls": len(controls), "rollouts": args.rollouts,
            "rollout_steps": args.steps, "mpc_horizon": args.horizon,
            "backend": jax.default_backend(),
            "recipe": ("fused cross-VI -> [two-site polish smoothing + "
                       "global coarse-grid correction] cycles -> GATED "
                       "level/mode corrections -> local dense completion "
                       "(round-5 two-grid campaign)"),
        },
        "production": {
            "mean_cost": c_p, "survival": surv_p,
            "fused_iterations": fsol.iterations,
            "cycles": cyc_hist,
            "level_correction": {"accepted": g_lc.accepted,
                                 "history": lc_hist},
            "mode_correction": {"accepted": g_mc.accepted,
                                "history": mc_hist},
            "tt_ranks": [int(r) for r in np.asarray(v.ranks)],
            "patch_nodes": int(np.prod(patch.subgrid.shape)),
            "wall_s": {"fused": round(wall_fused, 1),
                       "cycles": round(wall_polish, 1),
                       "patch": round(wall_tl, 1)},
        },
        "value_parity_rel_to_range": {
            "fused": par_fused, "polished_tt": par_polish,
            "deployed_composite": par_prod,
            "note": ("interior excludes absorbing-face nodes (v pinned to "
                     "exit cost; C0 jump a lerp-basis TT smooths over 1 "
                     "cell); the PASS criterion applies to the deployed "
                     "composite — the field a user queries"),
        },
        "cost_rel_deviation": cost_rel,
        "greedy_pass_two_sided": greedy_pass,
        "deployment_mpc": mpc_row,
        "control_agreement": {
            "candidate_exact": agree,
            "mean_u_deviation_of_range": u_dev,
            "thrust_sum_deviation_of_range": s_dev,
            "differential_deviation_of_range": m_dev,
            "q_gap_at_disagreements_rel_to_span": {
                "q50": qg_q50, "q95": qg_q95, "frac_below_0.5%": qg_small},
        },
        "tolerance": {"cost_rel": tol_cost, "survival_min": tol_surv,
                      "value_q95_max": tol_q95,
                      "cost_criterion": ("deployment controller (iLQR "
                                         "receding-horizon MPC), one-sided"
                                         " — see module docstring + "
                                         "docs/DESIGN.md round-4 campaign "
                                         "for the measured rationale; "
                                         "greedy two-sided reported as "
                                         "greedy_pass_two_sided")},
        "pass": bool(surv_p >= tol_surv and surv_o >= tol_surv
                     and par_prod["interior"]["q95"] <= tol_q95
                     and (dep_pass if dep_pass is not None
                          else greedy_pass)),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, f"NORTHSTAR_seed{args.seed}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    # NORTHSTAR.json is written by experiments/northstar_aggregate.py as
    # the WORST CASE over the seed artifacts (VERDICT r4 next #1)


if __name__ == "__main__":
    main()
