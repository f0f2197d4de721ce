"""Solve the 11^6 quadcopter dense oracle and cache it (judge r3 item 7)."""
import time, os, sys
import numpy as np
import jax, jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.solvers.dense import dense_vi

n = int(sys.argv[1]) if len(sys.argv) > 1 else 11
prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(n)
controls = prob.control_candidates(5)
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts", f"quad_dense_v{n}.npz")
print(f"grid {grid.shape} ({np.prod(grid.shape):,} nodes) backend {jax.default_backend()}", flush=True)
t0 = time.time()
sol = dense_vi(prob, grid, controls=controls, tol=1e-5, max_outer=3000, chunk=25, eval_sweeps=10, verbose=True)
wall = time.time() - t0
np.savez_compressed(cache, v=np.asarray(sol.v), residual=sol.residual, sweeps=sol.sweeps, wall_s=wall)
print(f"done residual={sol.residual:.2e} sweeps={sol.sweeps} wall={wall:.0f}s -> {cache}", flush=True)
