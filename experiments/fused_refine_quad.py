"""VERDICT r4 next #7: continuous-control refinement INSIDE the fused sweep,
measured on the quadcopter at fixed candidate count.

The machinery exists (fused.py `_eval_fibers` refine_steps -> batched PGD
of the continuous Bellman RHS seeded from the candidate argmin — the
reference's per-node ``c3opt_minimize`` BFGS inner solve, SURVEY §3.1
HOTTEST loop); this experiment produces the MEASURED comparison the
verdict asked for: refine_steps 0 vs 2 at 25 candidates on the 9^6 quad,
scored against the cached dense oracle (value q95, CRN greedy cost,
candidate-agreement movement).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/fused_refine_quad.py
"""

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
from c3sc_tpu.solvers.fused import fused_tt_vi

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


def main(n=9, rmax=16, max_iters=900):
    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(n)
    controls = prob.control_candidates(5)          # 25 candidates, fixed
    with np.load(os.path.join(ART, f"quad_dense_v{n}.npz")) as z:
        vd = np.asarray(z["v"], np.float64)
    vrange = vd.max() - vd.min()
    sl = tuple(slice(1, -1) if b == Boundary.ABSORB else slice(None)
               for b in prob.boundary)
    vfn_dense = lambda p: multilinear_interp(grid, jnp.asarray(vd, jnp.float32), p)

    rng = np.random.default_rng(4242)
    x0 = jnp.asarray(
        0.4 * rng.uniform(-1, 1, (64, 6))
        * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)

    def greedy_cost(vfn):
        pol = make_implicit_policy(prob, grid, vfn, controls)
        tr = rollout(prob, grid, pol, x0, jax.random.key(1000), dt=0.01,
                     n_steps=400)
        return float(np.asarray(tr.cost).mean()), pol

    c_d, pol_d = greedy_cost(vfn_dense)
    rows = {}
    for rs in (0, 2):
        t0 = time.time()
        sol = fused_tt_vi(prob, grid, controls=controls, rmax=rmax,
                          key=jax.random.key(0), tol=2e-4,
                          max_iters=max_iters, patience=25,
                          probe_rollouts=32, probe_steps=500,
                          refine_steps=rs)
        wall = time.time() - t0
        rel = np.abs(np.asarray(tt_full(sol.v), np.float64) - vd) / vrange
        c_p, pol_p = greedy_cost(lambda p: tt_lerp_eval(sol.v, grid, p))
        xs = jnp.asarray(rng.uniform(-0.5, 0.5, (4096, 6))
                         * np.asarray([2, 2, 1, 3, 3, 4]), jnp.float32)
        agree = float((np.abs(np.asarray(pol_p(xs)) - np.asarray(pol_d(xs)))
                       < 1e-6).all(axis=-1).mean())
        rows[f"refine{rs}"] = {
            "q95_interior": float(np.quantile(rel[sl], 0.95)),
            "greedy_cost": c_p,
            "greedy_cost_rel_vs_oracle": abs(c_p - c_d) / abs(c_d),
            "candidate_agreement_vs_oracle": agree,
            "iterations": sol.iterations, "wall_s": round(wall, 1),
        }
        print(rs, json.dumps(rows[f"refine{rs}"]), flush=True)
    out = {"oracle_greedy_cost": c_d, **rows}
    with open(os.path.join(ART, "fused_refine_quad.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
