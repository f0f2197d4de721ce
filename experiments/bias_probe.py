"""Is the polish steady-state error a systematic (slow-mode) bias, and does
pointwise defect correction remove it? (round 4, post-northstar probe)"""
import time
import numpy as np
import jax, jax.numpy as jnp
from c3sc_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from c3sc_tpu.models import make_quadcopter_problem
from c3sc_tpu.models.base import Boundary
from c3sc_tpu.ops import mca
from c3sc_tpu.ops.tt import tt_full
from c3sc_tpu.solvers.fused import fused_tt_vi
from c3sc_tpu.solvers.polish import tt_polish
from c3sc_tpu.solvers.ttvi import make_bellman_kernel

prob = make_quadcopter_problem(sigma_v=0.15, sigma_om=0.15)
grid = prob.default_grid(9)
controls = prob.control_candidates(5)
z = np.load("experiments/artifacts/quad_dense_v9.npz")
vd = np.asarray(z["v"]); vr = vd.max()-vd.min()
sl = tuple(slice(1,-1) if b==Boundary.ABSORB else slice(None) for b in prob.boundary)
fsol = fused_tt_vi(prob, grid, controls=controls, rmax=16, key=jax.random.key(0),
                   tol=2e-4, max_iters=1000, patience=25)
psol = tt_polish(prob, grid, controls, fsol.v, rmax=64,
                 schedule=((6,24),(8,40),(40,64)), check_every=4,
                 average_tail=36, reroll_every=12)
vt = np.asarray(tt_full(psol.v))
e = (vt - vd)[sl]
print(f"signed interior err (of range): mean={e.mean()/vr:+.3%} q50={np.quantile(e,0.5)/vr:+.3%} "
      f"q05={np.quantile(e,0.05)/vr:+.3%} q95={np.quantile(e,0.95)/vr:+.3%} |q95|={np.quantile(np.abs(e),0.95)/vr:.3%}", flush=True)
# pointwise sampled defect d = T(v) - v on interior nodes + mean discount
kernel = make_bellman_kernel(prob, grid, jnp.asarray(controls, jnp.float32), chunk=32768)
rng = np.random.default_rng(11)
idx = jnp.asarray(np.stack([rng.integers(1, n-1, 8192) for n in grid.shape], -1), jnp.int32)
from c3sc_tpu.ops.tt import tt_gather_eval
tv = np.asarray(kernel(psol.v, idx))
v = np.asarray(jax.jit(lambda t: tt_gather_eval(t, idx))(psol.v))
d = tv - v
x = np.asarray(grid.index_to_state(idx))
pp, pm, dt = mca.transition_all_controls(prob, grid, jnp.asarray(x, jnp.float32), jnp.asarray(controls, jnp.float32))
gbar = float(np.mean(np.exp(-prob.beta * np.asarray(dt))))
c = -np.mean(d) / (1.0 - gbar)
print(f"defect: mean={np.mean(d):+.4f} sup={np.abs(d).max():.4f} gbar={gbar:.5f} -> const corr {c:+.4f} ({c/vr:+.3%} of range)", flush=True)
e2 = e + c
print(f"after const defect-corr: q50={np.quantile(np.abs(e2),0.5)/vr:.3%} |q95|={np.quantile(np.abs(e2),0.95)/vr:.3%}", flush=True)

# --- level correction test ---
from c3sc_tpu.solvers.polish import level_correct
v2, hist = level_correct(prob, grid, controls, psol.v, kernel=kernel, verbose=True)
vt2 = np.asarray(tt_full(v2))
e3 = (vt2 - vd)[sl]
print(f"after level_correct: mean={e3.mean()/vr:+.3%} q50={np.quantile(e3,0.5)/vr:+.3%} "
      f"|q95|={np.quantile(np.abs(e3),0.95)/vr:.3%}", flush=True)
