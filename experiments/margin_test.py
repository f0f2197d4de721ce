"""Patch margin 1 vs 2 (and ring-corrected TT): greedy + MPC outcome."""
import jax
import jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.ops.tt import tt_load, tt_lerp_eval
from c3sc_tpu.sim import make_implicit_policy, rollout
from c3sc_tpu.sim.mpc_shoot import receding_horizon_rollout
from c3sc_tpu.solvers.local_patch import (make_patched_value_fn,
                                          solve_local_patch)
from c3sc_tpu.solvers.polish import mode_correct
from c3sc_tpu.ops.interp import multilinear_interp

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
vd = np.load('experiments/artifacts/quad_dense_v9.npz')['v'].astype(np.float64)
v = tt_load('experiments/artifacts/northstar_seed0_v.npz')
v_ring, _ = mode_correct(prob, grid, controls, v, iters=3, ring_modes=True)

rng = np.random.default_rng(4242)
x0 = jnp.asarray(0.4 * rng.uniform(-1, 1, (64, 6))
                 * np.asarray([2.0, 2.0, 1.0, 3.0, 3.0, 4.0]), jnp.float32)
vfn_d = lambda p: multilinear_interp(grid, jnp.asarray(vd, jnp.float32), p)

def evals(tag, vfn):
    pol = make_implicit_policy(prob, grid, vfn, controls)
    tr = rollout(prob, grid, pol, x0, jax.random.key(1000), dt=0.01,
                 n_steps=400)
    g = float(np.asarray(tr.cost).mean())
    trm = receding_horizon_rollout(prob, grid, vfn, x0, jax.random.key(1000),
                                   dt=0.01, n_steps=400, horizon=128,
                                   replan_every=4, opt_iters=8,
                                   controls=controls)
    m = float(np.asarray(trm.cost).mean())
    print(f"[{tag}] greedy={g:.4f} mpc={m:.4f}", flush=True)
    return g, m

evals("dense", vfn_d)
for name, vv in [("seed0", v), ("seed0+ring", v_ring)]:
    for margin in (1, 2):
        patch = solve_local_patch(prob, grid,
                                  lambda p: tt_lerp_eval(vv, grid, p),
                                  controls, margin=margin, tol=1e-6,
                                  max_sweeps=4000)
        vfn = make_patched_value_fn(grid,
                                    lambda p: tt_lerp_eval(vv, grid, p),
                                    patch)
        evals(f"{name} m{margin}", vfn)
