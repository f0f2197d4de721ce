"""Debug pi_als on the pendulum: start near-exact, watch per-outer drift."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import _repad, tt_from_dense, tt_full
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers.pials import pi_als

prob = make_pendulum_problem()
grid = prob.default_grid(31)
controls = prob.control_candidates(9)
dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
vd = np.asarray(dsol.v)
vrange = vd.max() - vd.min()

v0 = _repad(tt_from_dense(jnp.asarray(vd), rmax=20, tol=1e-6), 24)
q0 = np.quantile(np.abs(np.asarray(tt_full(v0)) - vd), 0.95) / vrange
print(f"start q95={q0:.5f} ranks={np.asarray(v0.ranks)}")

res = pi_als(prob, grid, controls, v0, rmax=24,
             schedule=((4, 20),), oversample=4.0, chunk=8192, verbose=True)
q1 = np.quantile(np.abs(np.asarray(tt_full(res.v)) - vd), 0.95) / vrange
print(f"end q95={q1:.5f} best_outer={res.best_outer}")
for r in res.history:
    print(r)
