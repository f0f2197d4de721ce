"""Two-grid correction on the pendulum: does it crush the smooth floor?"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import tt_full
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.polish import tt_polish
from c3sc_tpu.solvers.twogrid import coarse_correct, coarse_grid

prob = make_pendulum_problem()
grid = prob.default_grid(31)
controls = prob.control_candidates(9)
dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
vd = np.asarray(dsol.v)
vrange = vd.max() - vd.min()
def q95(v):
    return np.quantile(np.abs(np.asarray(tt_full(v)) - vd), 0.95) / vrange

gc, fi = coarse_grid(grid)
print(f"fine {grid.shape} -> coarse {gc.shape} (periodic {grid.periodic})")

fsol = fused_tt_vi(prob, grid, controls=controls, rmax=12,
                   key=jax.random.key(1), tol=2e-4, max_iters=600,
                   patience=50)
v = fsol.v
print(f"fused base q95={q95(v):.4f}")
for cyc in range(4):
    v, info = coarse_correct(prob, grid, controls, v, verbose=True)
    print(f"  cycle {cyc} after coarse: q95={q95(v):.5f}")
    psol = tt_polish(prob, grid, controls, v, rmax=24,
                     schedule=((6, 20),), chunk=8192, check_every=3)
    v = psol.v
    print(f"  cycle {cyc} after polish: q95={q95(v):.5f}")
