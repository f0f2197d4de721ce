"""Does receding-horizon shooting MPC absorb terminal-value error?

The round-4 frontier measurement showed closed-loop GREEDY cost deviation
is a lottery in the value error (SVD-optimal rank-81 at 11^6: q95 0.117%
yet 25% cost deviation). This experiment measures, under CRN on the 9^6
quadcopter: cost(MPC with truncated/production value) vs cost(MPC with
dense oracle value), across value-error levels, vs their greedy rows.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/mpc_parity.py
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
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_from_dense, tt_full, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=9)
    ap.add_argument("--rollouts", type=int, default=256)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--horizon", type=int, default=128)
    ap.add_argument("--replan-every", type=int, default=4)
    ap.add_argument("--opt-iters", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--ranks", type=int, nargs="*", default=[24, 48])
    args = ap.parse_args()

    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(args.n)
    controls = prob.control_candidates(5)
    with np.load(os.path.join(HERE, "artifacts",
                              f"quad_dense_v{args.n}.npz")) as z:
        v_dense = jnp.asarray(z["v"])
    rng = np.random.default_rng(args.seed)
    x0 = jnp.asarray(
        0.4 * rng.uniform(-1, 1, (args.rollouts, 6))
        * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)
    key = jax.random.key(args.seed + 5)
    print(f"grid {grid.shape} backend {jax.default_backend()} "
          f"H={args.horizon} replan={args.replan_every} "
          f"iters={args.opt_iters}", flush=True)

    vfns = {"dense": lambda p: multilinear_interp(grid, v_dense, p)}
    for r in args.ranks:
        tt = tt_from_dense(v_dense, rmax=r, tol=0.0)
        vfns[f"svd{r}"] = lambda p, tt=tt: tt_lerp_eval(tt, grid, p)

    rows = {}
    for name, vfn in vfns.items():
        t0 = time.time()
        pol = make_implicit_policy(prob, grid, vfn, controls)
        tr_g = rollout(prob, grid, pol, x0, key, dt=0.01,
                       n_steps=args.steps)
        cg = float(np.asarray(tr_g.cost).mean())
        t1 = time.time()
        tr_m = receding_horizon_rollout(
            prob, grid, vfn, x0, key, dt=0.01, n_steps=args.steps,
            horizon=args.horizon, replan_every=args.replan_every,
            opt_iters=args.opt_iters, lr=args.lr, u_init="greedy",
            controls=controls)
        cm = float(np.asarray(tr_m.cost).mean())
        sm = float(np.asarray(tr_m.alive[-1]).mean())
        rows[name] = {"greedy_cost": cg, "mpc_cost": cm, "mpc_surv": sm}
        print(f"{name}: greedy={cg:.4f} [{t1-t0:.0f}s]  "
              f"mpc={cm:.4f} surv={sm:.2%} [{time.time()-t1:.0f}s]",
              flush=True)

    c0g, c0m = rows["dense"]["greedy_cost"], rows["dense"]["mpc_cost"]
    for name, r in rows.items():
        r["greedy_rel"] = abs(r["greedy_cost"] - c0g) / c0g
        r["mpc_rel"] = abs(r["mpc_cost"] - c0m) / c0m
        print(f"{name}: greedy_rel={r['greedy_rel']:.2%} "
              f"mpc_rel={r['mpc_rel']:.2%}", flush=True)

    out = os.path.join(HERE, "artifacts", f"mpc_parity_n{args.n}.json")
    with open(out, "w") as f:
        json.dump({"config": vars(args), "rows": rows}, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
