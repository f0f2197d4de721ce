"""Does the boundary-layer coarse correction fix the ring + greedy gap?"""
import time
import jax
import jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops.tt import tt_load, tt_full, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers.twogrid import coarse_correct, coarse_grid
from c3sc_tpu.solvers.local_patch import (make_patched_value_fn,
                                          solve_local_patch)
from c3sc_tpu.ops.interp import multilinear_interp

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
vd = np.load('experiments/artifacts/quad_dense_v9.npz')['v'].astype(np.float64)
vrange = vd.max() - vd.min()
v = tt_load('experiments/artifacts/northstar_seed0_v.npz')
gc, _ = coarse_grid(grid, boundary_layer=True)
print("bl coarse grid:", gc.shape, "uniform:", gc.uniform)

idxg = np.indices(vd.shape)
dist = np.minimum.reduce([np.minimum(idxg[k], 8 - idxg[k]) for k in (0, 1)])

def report(v, tag):
    vf = np.asarray(tt_full(v), np.float64)
    err = (vf - vd) / vrange
    ring = err[dist == 1]
    inner = err[tuple(slice(1, -1) for _ in range(6))]
    print(f"[{tag}] interior q95={np.quantile(np.abs(inner),.95):.4f} "
          f"ring q50={np.quantile(np.abs(ring),.5):.4f} "
          f"ring signed={ring.mean():+.4f}", flush=True)

report(v, "before")
for it in range(3):
    t0 = time.time()
    v, info = coarse_correct(prob, grid, controls, v, verbose=True,
                             rmax_corr=48)
    print(f"  coarse {it}: {time.time()-t0:.0f}s", flush=True)
    report(v, f"after coarse {it}")

# greedy CRN probe (same x0/key family as the artifact's first chunk)
rng = np.random.default_rng(4242)
x0 = jnp.asarray(0.4 * rng.uniform(-1, 1, (64, 6))
                 * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)
patch = solve_local_patch(prob, grid, lambda p: tt_lerp_eval(v, grid, p),
                          controls, margin=1, tol=1e-5)
vfn = make_patched_value_fn(grid, lambda p: tt_lerp_eval(v, grid, p), patch)
vfn_d = lambda p: multilinear_interp(grid, jnp.asarray(vd, jnp.float32), p)
for tag, f in [("prod", vfn), ("dense", vfn_d)]:
    pol = make_implicit_policy(prob, grid, f, controls)
    tr = rollout(prob, grid, pol, x0, jax.random.key(1000), dt=0.01,
                 n_steps=400)
    print(f"greedy[{tag}]: cost={float(np.asarray(tr.cost).mean()):.4f} "
          f"surv={float(np.asarray(tr.alive[-1]).mean()):.2%}", flush=True)
