"""Realistic base: fused rank-12 pendulum -> pi_als vs polish."""
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

prob = make_pendulum_problem()
grid = prob.default_grid(31)
controls = prob.control_candidates(9)
dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
vd = np.asarray(dsol.v)
vrange = vd.max() - vd.min()
fsol = fused_tt_vi(prob, grid, controls=controls, rmax=12,
                   key=jax.random.key(1), tol=2e-4, max_iters=600,
                   patience=50)
def q95(v):
    return np.quantile(np.abs(np.asarray(tt_full(v)) - vd), 0.95) / vrange
print(f"fused rank-12 base q95={q95(fsol.v):.4f}")

t0 = time.time()
res = pi_als(prob, grid, controls, fsol.v, rmax=24,
             schedule=((2, 12), (6, 20)), oversample=4.0,
             chunk=8192, lam_rel=3e-2, sweeps=2, verbose=False)
b = [f"{r['bres']:.2e}" for r in res.history]
print(f"pi_als: q95={q95(res.v):.5f} best={res.best_outer} "
      f"wall={time.time()-t0:.0f}s bres={b}")

t0 = time.time()
psol = tt_polish(prob, grid, controls, fsol.v, rmax=20,
                 schedule=((8, 12), (24, 20)), chunk=8192, check_every=4)
print(f"polish: q95={q95(psol.v):.5f} wall={time.time()-t0:.0f}s")
