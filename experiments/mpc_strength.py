"""Does a stronger deployment planner shrink the field-dependence gap?"""
import jax
import jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops.tt import tt_load, tt_lerp_eval
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.solvers.local_patch import (make_patched_value_fn,
                                          solve_local_patch)
from c3sc_tpu.ops.interp import multilinear_interp

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
vd = np.load('experiments/artifacts/quad_dense_v9.npz')['v'].astype(np.float64)
v = tt_load('experiments/artifacts/northstar_seed0_v.npz')
patch = solve_local_patch(prob, grid, lambda p: tt_lerp_eval(v, grid, p),
                          controls, margin=1, tol=1e-6, max_sweeps=4000)
vfn_p = make_patched_value_fn(grid, lambda p: tt_lerp_eval(v, grid, p), patch)
vfn_d = lambda p: multilinear_interp(grid, jnp.asarray(vd, jnp.float32), p)

rng = np.random.default_rng(4242)
x0 = jnp.asarray(0.4 * rng.uniform(-1, 1, (64, 6))
                 * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)
for hor, oi in [(128, 24), (192, 24), (192, 48)]:
    row = {}
    for tag, f in [("prod", vfn_p), ("dense", vfn_d)]:
        tr = receding_horizon_rollout(prob, grid, f, x0, jax.random.key(1000),
                                      dt=0.01, n_steps=400, horizon=hor,
                                      replan_every=4, opt_iters=oi,
                                      controls=controls)
        row[tag] = float(np.asarray(tr.cost).mean())
    rel = (row["prod"] - row["dense"]) / row["dense"]
    print(f"H={hor} iters={oi}: prod={row['prod']:.4f} "
          f"dense={row['dense']:.4f} signed_rel={rel:+.2%}", flush=True)
