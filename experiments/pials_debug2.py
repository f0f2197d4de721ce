"""Isolate the ALS-LS assembly: does G x = b match the explicit rows?"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import _repad, tt_from_dense, tt_full, tt_gather_eval
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers import pials

prob = make_pendulum_problem()
grid = prob.default_grid(31)
controls = prob.control_candidates(9)
dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
vd = np.asarray(dsol.v)

v0 = _repad(tt_from_dense(jnp.asarray(vd), rmax=20, tol=1e-6), 24)
uc = jnp.asarray(controls, jnp.float32)
rng = np.random.default_rng(5)
S = 2480
idx = jnp.asarray(np.stack([rng.integers(0, n, S) for n in grid.shape], -1),
                  jnp.int32)
pts, w, rhs = pials.frozen_policy_rows(prob, grid, uc, v0, idx)
d = grid.ndim

blocks = pials.tt_to_blocks(v0)
k = 0
blocks = pials._orthogonalize(blocks, k)
bd = [jnp.asarray(b, jnp.float32) for b in blocks]

# explicit row residual with current blocks (defect of v0 under frozen pol)
v_re = pials.blocks_to_tt(blocks, 24)
v_pts = tt_gather_eval(v_re, pts.reshape(-1, d)).reshape(pts.shape[:2])
res_rows = np.asarray(jnp.sum(w * v_pts, axis=1) - rhs)
print(f"row residual of v0: rms={np.sqrt((res_rows**2).mean()):.2e} "
      f"max={np.abs(res_rows).max():.2e}")

T = pts.shape[1]
pts_flat = pts.reshape(-1, d)
Lf, Rf = pials._frames(bd, pts_flat, k)
r1, r2 = blocks[k].shape[0], blocks[k].shape[2]
n_k = grid.shape[k]
Lf = Lf.reshape(S, T, r1); Rf = Rf.reshape(S, T, r2)
isl = pts[:, :, k]

# check frames reproduce v at pts: v(pt) = L @ C[:, i, :] @ R
C = jnp.asarray(blocks[k], jnp.float32)
v_fr = jnp.einsum("sta,anb,stb->stn", Lf, C, Rf)
v_fr = jnp.take_along_axis(v_fr, isl[:, :, None], axis=2)[:, :, 0]
dfr = np.abs(np.asarray(v_fr) - np.asarray(v_pts))
print(f"frame-eval vs gather-eval: max diff={dfr.max():.2e}")

G, b = pials._normal_eq_chunk(Lf, Rf, isl, w, rhs, n_k)
x0 = jnp.asarray(blocks[k].transpose(1, 0, 2).reshape(-1), jnp.float32)
r_ne = np.asarray(b - G @ x0)
print(f"normal-eq residual at x0: rms={np.sqrt((r_ne**2).mean()):.2e} "
      f"max={np.abs(r_ne).max():.2e}, |b|~{np.abs(np.asarray(b)).max():.2e}")

# solve and measure explicit row residual of the solution
P = n_k * r1 * r2
lam = 3e-7 * (jnp.trace(G) / P)
Gr = G + lam * jnp.eye(P, dtype=jnp.float32)
cho = jax.scipy.linalg.cho_factor(Gr)
x = x0
for _ in range(3):
    x = x + jax.scipy.linalg.cho_solve(cho, b - Gr @ x)
blocks[k] = np.asarray(x, np.float64).reshape(n_k, r1, r2).transpose(1, 0, 2)
v_new = pials.blocks_to_tt(blocks, 24)
v_pts2 = tt_gather_eval(v_new, pts.reshape(-1, d)).reshape(pts.shape[:2])
res2 = np.asarray(jnp.sum(w * v_pts2, axis=1) - rhs)
print(f"row residual after solve: rms={np.sqrt((res2**2).mean()):.2e} "
      f"max={np.abs(res2).max():.2e}")
q95 = np.quantile(np.abs(np.asarray(tt_full(v_new)) - vd), 0.95) / (vd.max() - vd.min())
print(f"q95 after one core solve: {q95:.5f}")
