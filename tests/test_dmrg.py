"""Two-site DMRG cross approximation (C3 dmrg*.c parity — SURVEY.md §2)."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.ops.tt import tt_gather_eval
from c3sc_tpu.solvers.dmrg import dmrg_cross


def _rank2_tensor(shape):
    """f(i) = Π sin(xₖ) + Π cos(xₖ): exact TT rank 2."""
    grids = [np.linspace(0, 1, n) for n in shape]

    def f(idx):
        xs = jnp.stack([jnp.asarray(grids[k])[idx[:, k]]
                        for k in range(len(shape))], axis=-1)
        return jnp.prod(jnp.sin(xs), -1) + jnp.prod(jnp.cos(xs), -1)

    return f


def test_dmrg_recovers_rank2_exactly():
    shape = (11, 9, 13, 8)
    f = _rank2_tensor(shape)
    res = dmrg_cross(f, shape, rmax=6, key=jax.random.key(0), max_sweeps=4)
    rng = np.random.default_rng(7)
    idx = jnp.asarray(np.stack([rng.integers(0, n, 500) for n in shape], -1),
                      jnp.int32)
    got = tt_gather_eval(res.tt, idx)
    want = f(idx)
    err = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert err < 1e-4, f"relative error {err}"
    # two-site SVD should reveal the true rank (2), not inflate to rmax
    active = np.asarray(res.tt.ranks)
    assert active.max() <= 3


def test_dmrg_adapts_rank_up():
    # rank-4 separable mixture
    shape = (12, 12, 12)
    grids = [np.linspace(-1, 1, n) for n in shape]

    def f(idx):
        xs = jnp.stack([jnp.asarray(grids[k])[idx[:, k]] for k in range(3)], -1)
        out = 0.0
        for a in (0.5, 1.0, 1.5, 2.0):
            out = out + jnp.prod(jnp.exp(-a * xs**2), -1)
        return out

    res = dmrg_cross(f, shape, rmax=8, key=jax.random.key(1), max_sweeps=5,
                     r0=2)
    rng = np.random.default_rng(3)
    idx = jnp.asarray(np.stack([rng.integers(0, n, 400) for n in shape], -1),
                      jnp.int32)
    err = float(jnp.max(jnp.abs(tt_gather_eval(res.tt, idx) - f(idx))))
    assert err < 5e-4
    assert int(np.asarray(res.tt.ranks).max()) >= 3  # grew beyond r0
