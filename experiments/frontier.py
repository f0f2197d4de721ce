"""The q95 -> closed-loop-cost frontier, 9^6 vs 11^6 (r3 judge item 7).

For each grid: TT-SVD truncate the cached dense oracle solution at a ladder
of ranks, then measure (a) interior value error quantiles and (b) the
closed-loop cost deviation of the truncated-value greedy policy vs the
dense-value greedy policy under common random numbers. Multiple eval seeds
at selected ranks quantify the cost-estimator noise (the r3 frontier's
rank-48 5.18% vs rank-64 0.32% jump motivated this check).

Decides whether the 6D north star needs rank~64 solver accuracy or whether
finer/better node placement softens the hypersensitivity (VERDICT r3
Missing #5, Next #7).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/frontier.py --n 11
"""

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from c3sc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.models.base import Boundary
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_from_dense, tt_full, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout

HERE = os.path.dirname(os.path.abspath(__file__))


def eval_cost(prob, grid, vfn, controls, n_roll, steps, seed):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(
        0.4 * rng.uniform(-1, 1, (n_roll, 6))
        * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)
    key = jax.random.key(seed + 5)
    pol = make_implicit_policy(prob, grid, vfn, controls)
    tr = rollout(prob, grid, pol, x0, key, dt=0.01, n_steps=steps)
    return (float(np.asarray(tr.cost).mean()),
            float(np.asarray(tr.alive[-1]).mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=11)
    ap.add_argument("--ranks", type=int, nargs="*",
                    default=[16, 24, 32, 48, 64, 81, 100])
    ap.add_argument("--rollouts", type=int, default=256)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--seeds", type=int, nargs="*", default=[4242])
    ap.add_argument("--noise-ranks", type=int, nargs="*", default=[48, 64],
                    help="ranks measured at every seed (others: first seed)")
    args = ap.parse_args()

    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(args.n)
    controls = prob.control_candidates(5)
    cache = os.path.join(HERE, "artifacts", f"quad_dense_v{args.n}.npz")
    with np.load(cache) as z:
        v_dense = jnp.asarray(z["v"])
    print(f"grid {grid.shape}, dense cache {cache}, backend "
          f"{jax.default_backend()}", flush=True)

    vrange = float(np.asarray(v_dense).max() - np.asarray(v_dense).min())
    sl = tuple(slice(1, -1) if b == Boundary.ABSORB else slice(None)
               for b in prob.boundary)
    vfn_dense = lambda p: multilinear_interp(grid, v_dense, p)

    rows = []
    # oracle self-costs per seed (CRN partner for each truncation row)
    oracle = {}
    for seed in args.seeds:
        c, s = eval_cost(prob, grid, vfn_dense, controls, args.rollouts,
                         args.steps, seed)
        oracle[seed] = c
        print(f"dense policy: seed={seed} cost={c:.4f} surv={s:.2%}",
              flush=True)

    for rank in args.ranks:
        tt = tt_from_dense(v_dense, rmax=max(rank, 2), tol=0.0)
        err = np.abs(np.asarray(tt_full(tt)) - np.asarray(v_dense))[sl]
        q95 = float(np.quantile(err, 0.95)) / vrange
        vfn = lambda p, tt=tt: tt_lerp_eval(tt, grid, p)
        seeds = args.seeds if rank in args.noise_ranks else args.seeds[:1]
        for seed in seeds:
            c, s = eval_cost(prob, grid, vfn, controls, args.rollouts,
                             args.steps, seed)
            rel = abs(c - oracle[seed]) / abs(oracle[seed])
            rows.append({"grid_n": args.n, "rank": rank, "q95": q95,
                         "seed": seed, "cost": c, "survival": s,
                         "cost_rel": rel})
            print(f"rank {rank}: q95={q95:.3%} seed={seed} cost={c:.4f} "
                  f"rel={rel:.2%} surv={s:.2%}", flush=True)

    out = os.path.join(HERE, "artifacts", f"frontier_n{args.n}.json")
    with open(out, "w") as f:
        json.dump({"oracle_cost": oracle, "rollouts": args.rollouts,
                   "steps": args.steps, "rows": rows}, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
