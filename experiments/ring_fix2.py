"""Ring-slab mode correction on the saved seed-0 TT: ring + greedy effect."""
import jax
import jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops.tt import tt_load, tt_full, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers.polish import mode_correct
from c3sc_tpu.solvers.local_patch import (make_patched_value_fn,
                                          solve_local_patch)
from c3sc_tpu.ops.interp import multilinear_interp

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
vd = np.load('experiments/artifacts/quad_dense_v9.npz')['v'].astype(np.float64)
vrange = vd.max() - vd.min()
v = tt_load('experiments/artifacts/northstar_seed0_v.npz')

idxg = np.indices(vd.shape)
dist_abs = np.minimum.reduce([np.minimum(idxg[k], 8 - idxg[k]) for k in (0, 1)])
dist_all = np.minimum.reduce([np.minimum(idxg[k], 8 - idxg[k]) for k in range(6)])

def report(v, tag):
    vf = np.asarray(tt_full(v), np.float64)
    err = (vf - vd) / vrange
    inner = err[tuple(slice(1, -1) for _ in range(6))]
    r_abs = err[dist_abs == 1]; r_all = err[dist_all == 1]
    print(f"[{tag}] interior q95={np.quantile(np.abs(inner),.95):.4f} "
          f"ringABS q50={np.quantile(np.abs(r_abs),.5):.4f} "
          f"signed={r_abs.mean():+.4f} | ringALL q50="
          f"{np.quantile(np.abs(r_all),.5):.4f} signed={r_all.mean():+.4f}",
          flush=True)

report(v, "before")
v, hist = mode_correct(prob, grid, controls, v, iters=3, ring_modes=True,
                       verbose=True)
report(v, "after ring-modes")

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
