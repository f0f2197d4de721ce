"""Round-5 rehearsal: 6D quadcopter, new two-grid pipeline vs dense oracle.

Pipeline under test:  fused cross-VI -> cycles of
    [global coarse-grid correction  +  smoother (pi_als | polish)]
-> level/mode correct (gated) -> optional local patch.

Measures node-value q95 (full + interior) against the cached dense oracle
per stage, and walls per stage. The round-4 committed floor to beat:
polished q95 interior 6.4-6.5%, polish wall 521 s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/rehearse6d_r5.py
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
from c3sc_tpu.ops.tt import tt_full
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.pials import pi_als
from c3sc_tpu.solvers.polish import level_correct, mode_correct, tt_polish
from c3sc_tpu.solvers.twogrid import coarse_correct

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=9)
    ap.add_argument("--rmax", type=int, default=16)
    ap.add_argument("--rmax-polish", type=int, default=64)
    ap.add_argument("--cycles", type=int, default=4)
    ap.add_argument("--smoother", type=str, default="pials",
                    choices=["pials", "polish", "none"])
    ap.add_argument("--pials-outers", type=int, default=2)
    ap.add_argument("--pials-lam", type=float, default=3e-2)
    ap.add_argument("--pials-oversample", type=float, default=3.0)
    ap.add_argument("--pials-cap", type=int, default=48)
    ap.add_argument("--polish-steps", type=int, default=8)
    ap.add_argument("--max-iters", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
    grid = prob.default_grid(args.n)
    controls = prob.control_candidates(5)
    print(f"quadcopter 6D {grid.shape}, backend {jax.default_backend()}",
          flush=True)

    cache = os.path.join(ART, f"quad_dense_v{args.n}.npz")
    with np.load(cache) as z:
        vd = np.asarray(z["v"], np.float64)
    vrange = vd.max() - vd.min()
    sl = tuple(slice(1, -1) if b == Boundary.ABSORB else slice(None)
               for b in prob.boundary)

    def parity(v_tt):
        rel = np.abs(np.asarray(tt_full(v_tt), np.float64) - vd) / vrange
        return (float(np.quantile(rel, 0.95)),
                float(np.quantile(rel[sl], 0.95)),
                float(rel[sl].max()))

    t0 = time.time()
    fsol = fused_tt_vi(
        prob, grid, controls=controls, rmax=args.rmax,
        key=jax.random.key(args.seed), tol=2e-4, max_iters=args.max_iters,
        patience=25, probe_rollouts=32, probe_steps=500, probe_dt=0.01)
    wall_f = time.time() - t0
    q = parity(fsol.v)
    print(f"fused: it={fsol.iterations} q95={q[0]:.4f}/{q[1]:.4f} "
          f"[{wall_f:.0f}s]", flush=True)

    from c3sc_tpu.ops.tt import _repad
    from c3sc_tpu.solvers.ttvi import make_bellman_kernel

    kernel = make_bellman_kernel(prob, grid,
                                 jnp.asarray(controls, jnp.float32),
                                 chunk=32768)
    v = _repad(fsol.v, args.rmax_polish)
    walls = {"fused": wall_f}
    state = None
    for cyc in range(args.cycles):
        t0 = time.time()
        if args.smoother == "pials":
            v = pi_als(prob, grid, controls, v, rmax=args.rmax_polish,
                       schedule=((args.pials_outers, args.pials_cap),),
                       oversample=args.pials_oversample,
                       lam_rel=args.pials_lam, sweeps=1, verbose=True,
                       kernel=kernel).v
        elif args.smoother == "polish":
            psol = tt_polish(prob, grid, controls, v, rmax=args.rmax_polish,
                             schedule=((args.polish_steps,
                                        args.rmax_polish),),
                             check_every=4, kernel=kernel, state=state)
            v, state = psol.v, psol.state
        ts = time.time() - t0
        q = parity(v)
        print(f"cycle {cyc} smooth [{ts:.0f}s]: q95={q[0]:.4f}/{q[1]:.4f}",
              flush=True)
        t0 = time.time()
        v, info = coarse_correct(prob, grid, controls, v, verbose=True,
                                 rmax_corr=32, kernel=kernel)
        tc = time.time() - t0
        q = parity(v)
        print(f"cycle {cyc} coarse [{tc:.0f}s]: q95={q[0]:.4f}/{q[1]:.4f} "
              f"accepted={info.accepted}", flush=True)
        walls[f"cycle{cyc}"] = {"coarse": round(tc, 1),
                                "smooth": round(ts, 1)}

    t0 = time.time()
    v, lc = level_correct(prob, grid, controls, v, kernel=kernel)
    v, mc = mode_correct(prob, grid, controls, v, kernel=kernel)
    q = parity(v)
    print(f"level+mode [{time.time()-t0:.0f}s]: q95={q[0]:.4f}/{q[1]:.4f}",
          flush=True)
    out = {"config": vars(args), "walls": walls,
           "q95_full": q[0], "q95_interior": q[1], "max_interior": q[2]}
    with open(os.path.join(ART, f"rehearse6d_r5_{args.smoother}.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
