"""Does a Polyak-averaged polish tail (r4-style smoothing) fix deployment?"""
import jax
import jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops.tt import tt_load, tt_lerp_eval, tt_full
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.solvers.polish import tt_polish, level_correct
from c3sc_tpu.solvers.local_patch import (make_patched_value_fn,
                                          solve_local_patch)
from c3sc_tpu.ops.interp import multilinear_interp

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
vd = np.load('experiments/artifacts/quad_dense_v9.npz')['v'].astype(np.float64)
vrange = vd.max() - vd.min()
v = tt_load('experiments/artifacts/northstar_seed0_v.npz')

psol = tt_polish(prob, grid, controls, v, rmax=64,
                 schedule=((40, 64),), check_every=4,
                 average_tail=32, reroll_every=10)
v2, _ = level_correct(prob, grid, controls, psol.v)
rel = np.abs(np.asarray(tt_full(v2), np.float64) - vd) / vrange
inner = rel[tuple(slice(1, -1) for _ in range(6))]
print(f"after smooth tail: interior q95={np.quantile(inner, .95):.4f}",
      flush=True)

rng = np.random.default_rng(4242)
x0 = jnp.asarray(0.4 * rng.uniform(-1, 1, (64, 6))
                 * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)
patch = solve_local_patch(prob, grid, lambda p: tt_lerp_eval(v2, grid, p),
                          controls, margin=1, tol=1e-6, max_sweeps=4000)
vfn_p = make_patched_value_fn(grid, lambda p: tt_lerp_eval(v2, grid, p),
                              patch)
vfn_d = lambda p: multilinear_interp(grid, jnp.asarray(vd, jnp.float32), p)
for tag, f in [("prod", vfn_p), ("dense", vfn_d)]:
    pol = make_implicit_policy(prob, grid, f, controls)
    tr = rollout(prob, grid, pol, x0, jax.random.key(1000), dt=0.01,
                 n_steps=400)
    trm = receding_horizon_rollout(prob, grid, f, x0, jax.random.key(1000),
                                   dt=0.01, n_steps=400, horizon=128,
                                   replan_every=4, opt_iters=8,
                                   controls=controls)
    print(f"[{tag}] greedy={float(np.asarray(tr.cost).mean()):.4f} "
          f"mpc={float(np.asarray(trm.cost).mean()):.4f}", flush=True)
