"""f64 LS with proximal regularization toward warm start, lambda scan."""
import itertools
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.models import make_pendulum_problem
from c3sc_tpu.ops.tt import _repad, tt_from_dense, tt_full, tt_gather_eval
from c3sc_tpu.solvers.dense import dense_vi
from c3sc_tpu.solvers import pials
from c3sc_tpu.solvers.ttvi import make_bellman_kernel

prob = make_pendulum_problem()
grid = prob.default_grid(31)
controls = prob.control_candidates(9)
dsol = dense_vi(prob, grid, controls=controls, tol=1e-6, max_outer=4000)
vd = np.asarray(dsol.v)
vrange = vd.max() - vd.min()
v0 = _repad(tt_from_dense(jnp.asarray(vd), rmax=20, tol=1e-6), 24)
uc = jnp.asarray(controls, jnp.float32)
kernel = make_bellman_kernel(prob, grid, uc, chunk=8192)
rng = np.random.default_rng(5)
check_idx = jnp.asarray(
    np.stack([rng.integers(0, n, 4096) for n in grid.shape], -1), jnp.int32)
def bres(v):
    tv = np.asarray(kernel(v, check_idx))
    vv = np.asarray(tt_gather_eval(v, check_idx))
    return np.abs(tv - vv).max()
print(f"v0 bres={bres(v0):.4f}")
S = 2480
idx_np = np.stack([rng.integers(0, n, S) for n in grid.shape], -1)
idx = jnp.asarray(idx_np, jnp.int32)
pts, w, rhs = pials.frozen_policy_rows(prob, grid, uc, v0, idx)
d = grid.ndim

def build_rows(blocks, k):
    bd = [jnp.asarray(b, jnp.float32) for b in blocks]
    pts_flat = pts.reshape(-1, d)
    Lf, Rf = pials._frames(bd, pts_flat, k)
    r1, r2 = blocks[k].shape[0], blocks[k].shape[2]
    n_k = grid.shape[k]
    T = pts.shape[1]
    Lf = np.asarray(Lf, np.float64).reshape(S, T, r1)
    Rf = np.asarray(Rf, np.float64).reshape(S, T, r2)
    isl = np.asarray(pts[:, :, k])
    wn = np.asarray(w, np.float64)
    P = n_k * r1 * r2
    Mrows = np.zeros((S, n_k, r1, r2))
    for tt_ in range(T):
        np.add.at(Mrows, (np.arange(S), isl[:, tt_]),
                  wn[:, tt_, None, None] * np.einsum(
                      "sa,sb->sab", Lf[:, tt_], Rf[:, tt_]))
    return Mrows.reshape(S, P), n_k, r1, r2

sv_printed = False
for lam in [1e-8, 1e-6, 1e-4, 1e-2, 1e-1]:
    blocks = pials.tt_to_blocks(v0)
    for k in [0, 1]:
        blocks = pials._orthogonalize(blocks, k)
        Mrows, n_k, r1, r2 = build_rows(blocks, k)
        r64 = np.asarray(rhs, np.float64)
        P = Mrows.shape[1]
        if not sv_printed:
            sv = np.linalg.svd(Mrows, compute_uv=False)
            print(f"core {k}: sv[0]={sv[0]:.2e} sv[-1]={sv[-1]:.2e} "
                  f"frac sv<1e-3*max: {(sv < 1e-3*sv[0]).mean():.2%}")
        x0 = blocks[k].transpose(1, 0, 2).reshape(P)
        G = Mrows.T @ Mrows
        lam_abs = lam * np.trace(G) / P
        x = np.linalg.solve(G + lam_abs * np.eye(P),
                            Mrows.T @ r64 + lam_abs * x0)
        blocks[k] = x.reshape(n_k, r1, r2).transpose(1, 0, 2)
    sv_printed = True
    v_new = pials.blocks_to_tt(blocks, 24)
    q95 = np.quantile(np.abs(np.asarray(tt_full(v_new)) - vd), 0.95) / vrange
    print(f"lam={lam:.0e}: bres={bres(v_new):.4f} q95={q95:.5f}")
