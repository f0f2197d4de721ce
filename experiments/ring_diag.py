"""Where does the seed-0 TT error live? Slabs by distance to boundary."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from c3sc_tpu.ops.tt import tt_load, tt_full

vd = np.load('/root/repo/experiments/artifacts/quad_dense_v9.npz')['v'].astype(np.float64)
v = np.asarray(tt_full(tt_load('/root/repo/experiments/artifacts/northstar_seed0_v.npz')), np.float64)
vrange = vd.max() - vd.min()
err = (v - vd) / vrange
n = 9
idx = np.indices(vd.shape)
# absorb dims are 0,1 (x,z); distance to absorbing boundary
dist_abs = np.minimum.reduce([np.minimum(idx[k], n-1-idx[k]) for k in (0,1)])
dist_all = np.minimum.reduce([np.minimum(idx[k], n-1-idx[k]) for k in range(6)])
for name, dist in [("absorb-dims", dist_abs), ("all-dims", dist_all)]:
    print(f"--- distance to boundary ({name}) ---")
    for dd in range(5):
        m = dist == dd
        e = err[m]
        print(f" dist={dd}: n={m.sum():7d} q50={np.quantile(np.abs(e),.5):.4f} "
              f"q95={np.quantile(np.abs(e),.95):.4f} mean_signed={e.mean():+.4f}")
# basin region: central 3^6 box
sl = tuple(slice(3,6) for _ in range(6))
e = err[sl]
print(f"central 3^6: q50={np.quantile(np.abs(e),.5):.4f} q95={np.quantile(np.abs(e),.95):.4f} mean={e.mean():+.4f}")
# gradient tilt at center along each dim
c = tuple([4]*6)
for k in range(6):
    up = list(c); dn = list(c); up[k]+=1; dn[k]-=1
    ge = (err[tuple(up)] - err[tuple(dn)])/2
    print(f" dim {k}: d(err)/dnode at center = {ge:+.5f}")
