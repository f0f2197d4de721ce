"""Pipeline variants: smoother choice x two-grid correction (pendulum)."""
import time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import tt_full
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.pials import pi_als
from c3sc_tpu.solvers.polish import tt_polish
from c3sc_tpu.solvers.twogrid import coarse_correct

prob = make_pendulum_problem()
grid = prob.default_grid(31)
controls = prob.control_candidates(9)
dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
vd = np.asarray(dsol.v)
vrange = vd.max() - vd.min()
def q95(v):
    return np.quantile(np.abs(np.asarray(tt_full(v)) - vd), 0.95) / vrange

fsol = fused_tt_vi(prob, grid, controls=controls, rmax=12,
                   key=jax.random.key(1), tol=2e-4, max_iters=600,
                   patience=50)
print(f"fused base q95={q95(fsol.v):.4f}")

t0 = time.time()
v = fsol.v
for cyc in range(3):
    v, info = coarse_correct(prob, grid, controls, v)
    res = pi_als(prob, grid, controls, v, rmax=24,
                 schedule=((3, 20),), oversample=4.0, chunk=8192,
                 lam_rel=3e-2, sweeps=2)
    v = res.v
    print(f"  [pials-smoother] cycle {cyc}: q95={q95(v):.5f} "
          f"({time.time()-t0:.0f}s)")

t0 = time.time()
v = fsol.v
for cyc in range(3):
    v, info = coarse_correct(prob, grid, controls, v)
    psol = tt_polish(prob, grid, controls, v, rmax=24,
                     schedule=((6, 20),), chunk=8192, check_every=3)
    v = psol.v
    print(f"  [polish-smoother] cycle {cyc}: q95={q95(v):.5f} "
          f"({time.time()-t0:.0f}s)")
