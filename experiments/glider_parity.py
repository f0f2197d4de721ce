"""Experiment: 4D glider dense-oracle vs fused-TT parity (VERDICT r1 next #1).

Stands up a coarse dense oracle for the perching glider (~20k nodes) and
measures (a) node-wise value error of the fused TT solve and (b) closed-loop
control-sequence deviation under identical noise keys. Used to size the
committed pytest (tests/test_glider_parity.py) and the NORTHSTAR artifact.

Run: python experiments/glider_parity.py [--n 15 11 11 11] [--rmax 20]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from c3sc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_glider_problem
from c3sc_tpu.ops.interp import multilinear_interp
from c3sc_tpu.ops.tt import tt_gather_eval, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs=4, default=[15, 11, 11, 11])
    ap.add_argument("--rmax", type=int, default=20)
    ap.add_argument("--nc", type=int, default=9)
    ap.add_argument("--tol", type=float, default=2e-4)
    ap.add_argument("--max-iters", type=int, default=4000)
    ap.add_argument("--patience", type=int, default=40)
    ap.add_argument("--eps-rank", type=float, default=1e-5)
    ap.add_argument("--probe", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    prob = make_glider_problem()
    grid = prob.default_grid(tuple(args.n))
    controls = prob.control_candidates(args.nc)
    print(f"grid {grid.shape} = {np.prod(grid.shape)} nodes, "
          f"{len(controls)} candidates, backend {jax.default_backend()}")

    t0 = time.time()
    dense = dense_vi(prob, grid, controls=controls, tol=1e-5,
                     max_outer=2000, chunk=100)
    t_dense = time.time() - t0
    print(f"dense: res={dense.residual:.2e} sweeps={dense.sweeps} "
          f"wall={t_dense:.1f}s")

    t0 = time.time()
    sol = fused_tt_vi(prob, grid, controls=controls, rmax=args.rmax,
                      key=jax.random.key(0), tol=args.tol,
                      max_iters=args.max_iters, eps_rank=args.eps_rank,
                      patience=args.patience, probe_rollouts=args.probe)
    t_tt = time.time() - t0
    print(f"fused: res={sol.residual:.2e} it={sol.iterations} "
          f"ranks={[int(r) for r in np.asarray(sol.v.ranks)]} wall={t_tt:.1f}s")

    # node-wise value parity
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in grid.shape],
                               indexing="ij"), -1).reshape(-1, 4)
    v_tt = np.asarray(tt_gather_eval(sol.v, jnp.asarray(idx, jnp.int32)))
    v_d = np.asarray(dense.v).ravel()
    scale = np.abs(v_d).max()
    err = np.abs(v_tt - v_d) / scale
    print(f"value err: sup={err.max():.4f} q95={np.quantile(err, 0.95):.4f} "
          f"mean={err.mean():.4f}")

    # closed-loop control-sequence parity, identical noise
    pol_d = make_implicit_policy(
        prob, grid, lambda p: multilinear_interp(grid, dense.v, p), controls)
    pol_t = make_implicit_policy(
        prob, grid, lambda p: tt_lerp_eval(sol.v, grid, p), controls)
    B, T = 32, 300
    rng = np.random.default_rng(5)
    # launch box: left side of the domain, gliding toward the perch
    x0 = np.stack([
        rng.uniform(-3.2, -2.0, B), rng.uniform(-0.5, 0.5, B),
        rng.uniform(2.0, 5.0, B), rng.uniform(-0.5, 0.3, B)], -1)
    x0 = jnp.asarray(x0, jnp.float32)
    key = jax.random.key(7)
    tr_d = rollout(prob, grid, pol_d, x0, key, dt=0.01, n_steps=T)
    tr_t = rollout(prob, grid, pol_t, x0, key, dt=0.01, n_steps=T)
    u_d, u_t = np.asarray(tr_d.us), np.asarray(tr_t.us)
    alive = np.asarray(tr_d.alive[:-1])[..., None] * np.asarray(tr_t.alive[:-1])[..., None]
    u_range = prob.uub[0] - prob.ulb[0]
    dev = (np.abs(u_t - u_d) * alive).sum() / max(alive.sum(), 1) / u_range
    c_d, c_t = np.asarray(tr_d.cost).mean(), np.asarray(tr_t.cost).mean()
    print(f"control dev (alive-masked mean/range) = {dev:.4f}")
    print(f"cost dense={c_d:.4f} tt={c_t:.4f} rel={(c_t-c_d)/abs(c_d):.4f}")
    print(json.dumps(dict(
        sup=float(err.max()), q95=float(np.quantile(err, 0.95)),
        dev=float(dev), cost_rel=float((c_t - c_d) / abs(c_d)),
        t_dense=t_dense, t_tt=t_tt)))


if __name__ == "__main__":
    main()
