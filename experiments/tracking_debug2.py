import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from c3sc_tpu.models import make_lq_family
from c3sc_tpu.sim.tracking import make_tracking_solver, tracking_mpc_run

family = make_lq_family(sigma=0.3, beta=0.5, q=2.0, r=0.1)
prob0 = family(np.zeros(2))
grid = prob0.default_grid(21)
controls = prob0.control_candidates(13)
solver = make_tracking_solver(family, grid, controls, rmax=8,
                              solver_kwargs={"sample_size": 128})
thetas = np.array([[0.0, 0.0], [1.0, 0.0]])
x0 = jnp.zeros((32, 2), jnp.float32)
kw = dict(dt=0.01, steps_per_segment=400, replan_iters=300,
          first_solve_iters=500)
for stale in [False, True]:
    run = tracking_mpc_run(solver, family, thetas, x0, jax.random.key(7),
                           stale=stale, **kw)
    xs = run.xs
    print(f"stale={stale}: cost={run.cost.mean():.4f} "
          f"x@500={xs[500,:,0].mean():+.3f} x@800={xs[800,:,0].mean():+.3f}")
