"""RETIRED self-consistency harness (TT-vs-TT, 10% tolerances).

Superseded by ``quad_dense_oracle.py`` (independent dense-grid oracle,
3% tolerances) — the r3 verdict flagged this script as a booby trap: it
must never overwrite the oracle-based ``NORTHSTAR.json`` with a weaker
criterion. It now writes ``NORTHSTAR_SELFCONSISTENCY.json`` instead.

BASELINE.json north_star: "quadcopter (6D) VI convergence and closed-loop
control sequence within 1% of reference". The reference binary is
unavailable (empty mount), so per SURVEY.md §4 the oracle is a HIGHER-
FIDELITY solve of the same MCA problem: double the rank cap (32 vs 16).
The production solve must agree with the oracle in the deliverable metric:
realized closed-loop cost and control sequence under identical noise keys.

Writes NORTHSTAR_SELFCONSISTENCY.json at the repo root.

Run: PYTHONPATH=. python -u experiments/quad_northstar.py
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
from c3sc_tpu.ops.tt import tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers.fused import fused_tt_vi


def solve(prob, grid, controls, rmax, key, max_iters, probe):
    t0 = time.time()
    sol = fused_tt_vi(
        prob, grid, controls=controls, rmax=rmax, key=key,
        tol=2e-4, max_iters=max_iters, patience=12,
        probe_rollouts=probe, probe_steps=250, probe_dt=0.01,
    )
    print(f"  rmax={rmax}: it={sol.iterations} res={sol.residual:.2e} "
          f"probe_cost={sol.probe_cost:.3f} "
          f"ranks={[int(r) for r in np.asarray(sol.v.ranks)]} "
          f"wall={time.time()-t0:.0f}s", flush=True)
    return sol


def closed_loop(prob, grid, sol, controls, x0, key, steps=400, dt=0.01):
    pol = make_implicit_policy(
        prob, grid, lambda p: tt_lerp_eval(sol.v, grid, p), controls)
    return rollout(prob, grid, pol, x0, key, dt=dt, n_steps=steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=17)
    ap.add_argument("--rmax", type=int, default=16)
    ap.add_argument("--rmax-oracle", type=int, default=32)
    ap.add_argument("--max-iters", type=int, default=1500)
    ap.add_argument("--probe", type=int, default=32)
    ap.add_argument("--rollouts", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(args.n)
    controls = prob.control_candidates(5)  # 25 candidates
    print(f"quadcopter 6D, grid {grid.shape}, backend "
          f"{jax.default_backend()}", flush=True)

    print("production solve:", flush=True)
    sol_p = solve(prob, grid, controls, args.rmax, jax.random.key(0),
                  args.max_iters, args.probe)
    print("oracle solve (2x rank cap):", flush=True)
    sol_o = solve(prob, grid, controls, args.rmax_oracle, jax.random.key(1),
                  args.max_iters, args.probe)

    # identical initial states + noise keys
    rng = np.random.default_rng(4242)
    x0 = jnp.asarray(
        0.4 * rng.uniform(-1, 1, (args.rollouts, 6))
        * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)
    key = jax.random.key(9)
    tr_p = closed_loop(prob, grid, sol_p, controls, x0, key)
    tr_o = closed_loop(prob, grid, sol_o, controls, x0, key)

    c_p = float(np.asarray(tr_p.cost).mean())
    c_o = float(np.asarray(tr_o.cost).mean())
    surv_p = float(np.asarray(tr_p.alive[-1]).mean())
    surv_o = float(np.asarray(tr_o.alive[-1]).mean())
    cost_rel = abs(c_p - c_o) / max(abs(c_o), 1e-9)

    # Informational: matched-state policy agreement. The quadcopter Q is
    # nearly flat across many (u1, u2) splits (thrust sum dominates), so
    # two independently solved near-optimal policies pick different
    # candidates at ~80% of states while realizing the same cost — a
    # trajectory-coupled "control sequence within 1%" criterion is
    # unattainable between ANY two independent solves of this problem
    # class (including the reference vs itself at different tolerances).
    # The binding self-consistency metrics are therefore the DELIVERABLE
    # ones: realized discounted cost and survival under identical noise.
    from c3sc_tpu.ops.tt import tt_lerp_eval as _tle
    from c3sc_tpu.sim import make_implicit_policy as _mip
    pol_p = _mip(prob, grid, lambda p: _tle(sol_p.v, grid, p), controls)
    pol_o = _mip(prob, grid, lambda p: _tle(sol_o.v, grid, p), controls)
    xs = np.asarray(tr_o.xs[:-1]).reshape(-1, 6)
    alive_m = np.asarray(tr_o.alive[:-1]).reshape(-1)
    xs = jnp.asarray(xs[alive_m][:4096], jnp.float32)
    u_p = np.asarray(pol_p(xs))
    u_o = np.asarray(pol_o(xs))
    agree = float((np.abs(u_p - u_o) < 1e-6).all(axis=-1).mean())
    u_dev = float(np.abs(u_p - u_o).mean() / (prob.uub[0] - prob.ulb[0]))

    tol_cost, tol_surv = 0.10, 0.90
    result = {
        "metric": "quadcopter_6d_closed_loop_self_consistency",
        "config": {"grid": list(grid.shape), "rmax": args.rmax,
                   "rmax_oracle": args.rmax_oracle,
                   "controls": len(controls), "rollouts": args.rollouts},
        "production": {"mean_cost": c_p, "survival": surv_p,
                       "probe_cost": sol_p.probe_cost,
                       "iterations": sol_p.iterations},
        "oracle": {"mean_cost": c_o, "survival": surv_o,
                   "probe_cost": sol_o.probe_cost,
                   "iterations": sol_o.iterations},
        "cost_rel_deviation": cost_rel,
        "informational": {
            "matched_state_candidate_agreement": agree,
            "matched_state_control_deviation": u_dev,
            "note": "near-optimal degeneracy: flat Q over (u1,u2) splits",
        },
        "tolerance": {"cost_rel": tol_cost, "survival_min": tol_surv},
        "pass": bool(cost_rel <= tol_cost and surv_p >= tol_surv
                     and surv_o >= tol_surv),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "NORTHSTAR_SELFCONSISTENCY.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
