"""More sweeps per outer + stronger inflation from the starved base."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import tt_full
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.pials import pi_als

prob = make_pendulum_problem()
grid = prob.default_grid(31)
controls = prob.control_candidates(9)
dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
vd = np.asarray(dsol.v)
vrange = vd.max() - vd.min()
fsol = fused_tt_vi(prob, grid, controls=controls, rmax=6,
                   key=jax.random.key(1), tol=2e-4, max_iters=400,
                   patience=50)
q0 = np.quantile(np.abs(np.asarray(tt_full(fsol.v)) - vd), 0.95) / vrange
print(f"fused base q95={q0:.4f}")
for sweeps, lam in [(3, 3e-2), (3, 1e-2), (5, 3e-3)]:
    res = pi_als(prob, grid, controls, fsol.v, rmax=24,
                 schedule=((3, 10), (8, 20)), oversample=4.0,
                 chunk=8192, lam_rel=lam, sweeps=sweeps, verbose=False)
    q1 = np.quantile(np.abs(np.asarray(tt_full(res.v)) - vd), 0.95) / vrange
    b = [f"{r['bres']:.2e}" for r in res.history]
    print(f"sweeps={sweeps} lam={lam:.0e}: q95={q1:.5f} "
          f"best={res.best_outer} bres={b}")
