"""Polish fit-floor config sweep at 6D (round 4): which knobs cut the
per-fit floor (bres ~4.5e-3 at cap 64, q95 ~7.5%)?"""
import sys, time
import numpy as np
import jax
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.models.base import Boundary
from c3sc_tpu.ops.tt import tt_full
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.polish import tt_polish

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
z = np.load("experiments/artifacts/quad_dense_v9.npz")
vd = np.asarray(z["v"]); vr = vd.max()-vd.min()
sl = tuple(slice(1,-1) if b==Boundary.ABSORB else slice(None) for b in prob.boundary)
fsol = fused_tt_vi(prob, grid, controls=controls, rmax=16, key=jax.random.key(0),
                   tol=2e-4, max_iters=1000, patience=25)
print(f"base res={fsol.residual:.2e}", flush=True)
variants = [
    ("os1.0", dict(oversample=1.0, eps_rank=1e-5, rmax=128, schedule=((4,24),(4,40),(17,64)))),
    ("os0.5+eps3e-6", dict(oversample=0.5, eps_rank=3e-6, rmax=128, schedule=((4,24),(4,40),(17,64)))),
    ("sweeps2", dict(oversample=0.0, eps_rank=1e-5, rmax=64, schedule=((4,24),(4,40),(17,64,2)))),
    ("os1.0+sweeps2", dict(oversample=1.0, eps_rank=1e-5, rmax=128, schedule=((4,24),(4,40),(17,64,2)))),
]
for name, kw in variants:
    t0=time.time()
    rmax = kw.pop("rmax")
    psol = tt_polish(prob, grid, controls, fsol.v, rmax=rmax, check_every=2, **kw)
    q95 = np.quantile(np.abs(np.asarray(tt_full(psol.v))-vd)[sl],0.95)/vr
    bres = [r["bres"] for r in psol.history if "bres" in r]
    print(f"{name}: q95={q95:.3%} bres_tail={np.median(bres[-4:]):.3e} "
          f"ranks={psol.history[-1]['ranks']} [{time.time()-t0:.0f}s]", flush=True)
