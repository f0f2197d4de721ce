"""Parking diagnosis: patch-vs-dense in the basin; trajectory endpoints."""
import jax
import jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops.tt import tt_load, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.solvers.local_patch import (make_patched_value_fn,
                                          solve_local_patch)
from c3sc_tpu.ops.interp import multilinear_interp

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
vd = np.load('experiments/artifacts/quad_dense_v9.npz')['v'].astype(np.float64)
vrange = vd.max() - vd.min()
v = tt_load('experiments/artifacts/northstar_seed0_v.npz')

patch = solve_local_patch(prob, grid, lambda p: tt_lerp_eval(v, grid, p),
                          controls, margin=1, tol=1e-6, max_sweeps=4000)
pv = np.asarray(patch.v, np.float64)               # [7]*6
vd_sub = vd[tuple(slice(1, 8) for _ in range(6))]
rel = np.abs(pv - vd_sub) / vrange
print(f"patch-vs-dense on sub-box: q50={np.quantile(rel,.5):.5f} "
      f"q95={np.quantile(rel,.95):.5f} max={rel.max():.5f}")
c3 = tuple(slice(2, 5) for _ in range(6))          # central 3^6 of sub-box
print(f"  central 3^6: q95={np.quantile(rel[c3],.95):.5f} "
      f"signed={np.mean((pv-vd_sub)[c3]/vrange):+.5f}")

vfn = make_patched_value_fn(grid, lambda p: tt_lerp_eval(v, grid, p), patch)
vfn_d = lambda p: multilinear_interp(grid, jnp.asarray(vd, jnp.float32), p)
rng = np.random.default_rng(4242)
x0 = jnp.asarray(0.4 * rng.uniform(-1, 1, (64, 6))
                 * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)
scale = np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0])
for tag, f in [("prod", vfn), ("dense", vfn_d)]:
    pol = make_implicit_policy(prob, grid, f, controls)
    tr = rollout(prob, grid, pol, x0, jax.random.key(1000), dt=0.01,
                 n_steps=400)
    xs = np.asarray(tr.xs)        # [T+1, B, 6]
    tail = xs[300:]               # parked phase
    print(f"[{tag}] cost={float(np.asarray(tr.cost).mean()):.4f} "
          f"tail |x|/scale per dim: "
          f"{np.round(np.abs(tail/scale).mean(axis=(0,1)), 4)}", flush=True)
    # stage cost at the tail
    g = (2.0*(tail[...,0]**2+tail[...,1]**2) + 1.0*tail[...,2]**2
         + 0.2*(tail[...,3]**2+tail[...,4]**2) + 0.1*tail[...,5]**2)
    print(f"   tail mean state-cost: {g.mean():.4f}", flush=True)
