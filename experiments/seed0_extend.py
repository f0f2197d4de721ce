"""Extend seed-0's cycle ladder: 4 more [polish + coarse] cycles."""
import time
import jax
import jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np

from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.models.base import Boundary
from c3sc_tpu.ops.tt import tt_load, tt_save, tt_full, tt_lerp_eval
from c3sc_tpu.solvers.polish import tt_polish
from c3sc_tpu.solvers.twogrid import coarse_correct
from c3sc_tpu.solvers.local_patch import two_level_solve
from c3sc_tpu.solvers.ttvi import make_bellman_kernel

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
vd = np.load('experiments/artifacts/quad_dense_v9.npz')['v'].astype(np.float64)
vrange = vd.max() - vd.min()
sl = tuple(slice(1, -1) if b == Boundary.ABSORB else slice(None)
           for b in prob.boundary)
def q95(v):
    rel = np.abs(np.asarray(tt_full(v), np.float64) - vd) / vrange
    return float(np.quantile(rel[sl], 0.95))

v = tt_load('experiments/artifacts/northstar_seed0_v.npz')
print(f"seed0 start q95={q95(v):.4f}", flush=True)
kernel = make_bellman_kernel(prob, grid, jnp.asarray(controls, jnp.float32),
                             chunk=32768)
state = None
t0 = time.time()
for cyc in range(4):
    ps = tt_polish(prob, grid, controls, v, rmax=64,
                   schedule=((10, 64),), check_every=4, kernel=kernel,
                   state=state, key=jax.random.key(7000 + cyc))
    v, state = ps.v, ps.state
    v, info = coarse_correct(prob, grid, controls, v, kernel=kernel,
                             rmax_corr=32, verbose=True)
    print(f"cycle {cyc}: q95={q95(v):.4f} [{time.time()-t0:.0f}s]",
          flush=True)
tl = two_level_solve(prob, grid, controls, v, rmax=64, cycles=1,
                     cycle_schedule=((10, 64),), margin=1)
v = tl.v
print(f"after two-level: q95={q95(v):.4f}", flush=True)
tt_save(v, 'experiments/artifacts/northstar_seed0_v.npz')
print("saved", flush=True)
