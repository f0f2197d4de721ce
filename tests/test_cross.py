"""TT-cross tests on known low-rank black boxes (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.ops import tt as ttm
from c3sc_tpu.ops.cross import init_cross_state, tt_cross

SHAPE = (17, 13, 15)
GRIDS = [np.linspace(-1, 1, n).astype(np.float32) for n in SHAPE]


def f_rank2(idx):
    """f = x + y*z — TT-rank 2."""
    x = jnp.asarray(GRIDS[0])[idx[:, 0]]
    y = jnp.asarray(GRIDS[1])[idx[:, 1]]
    z = jnp.asarray(GRIDS[2])[idx[:, 2]]
    return x + y * z


def f_gauss(idx):
    x = jnp.asarray(GRIDS[0])[idx[:, 0]]
    y = jnp.asarray(GRIDS[1])[idx[:, 1]]
    z = jnp.asarray(GRIDS[2])[idx[:, 2]]
    return jnp.exp(-(x**2 + 2 * y**2 + 0.5 * z**2 + 0.3 * x * y))


def dense_of(f):
    idx = np.stack(
        np.meshgrid(*[np.arange(n) for n in SHAPE], indexing="ij"), -1
    ).reshape(-1, 3)
    return np.asarray(f(jnp.asarray(idx))).reshape(SHAPE)


def test_cross_exact_rank2():
    res = tt_cross(f_rank2, SHAPE, rmax=8, key=jax.random.key(0), tol=1e-5)
    approx = np.asarray(ttm.tt_full(res.tt))
    truth = dense_of(f_rank2)
    err = np.abs(approx - truth).max() / np.abs(truth).max()
    assert err < 1e-4, f"cross err {err:.2e}"
    assert res.converged
    # must touch far fewer points than the full grid would take in many sweeps
    assert res.n_evals < 20 * np.prod(SHAPE)


def test_cross_smooth_gaussian():
    res = tt_cross(f_gauss, SHAPE, rmax=12, key=jax.random.key(1), tol=1e-4)
    approx = np.asarray(ttm.tt_full(res.tt))
    truth = dense_of(f_gauss)
    err = np.abs(approx - truth).max() / np.abs(truth).max()
    assert err < 1e-3, f"cross err {err:.2e}"


def test_cross_warm_start_fewer_sweeps():
    res1 = tt_cross(f_gauss, SHAPE, rmax=12, key=jax.random.key(2), tol=1e-4)
    # warm start from converged state: should converge in <= the cold sweeps
    res2 = tt_cross(
        f_gauss, SHAPE, rmax=12, key=jax.random.key(3), tol=1e-4, state=res1.state
    )
    assert res2.converged
    assert res2.sweeps <= res1.sweeps
    approx = np.asarray(ttm.tt_full(res2.tt))
    truth = dense_of(f_gauss)
    assert np.abs(approx - truth).max() / np.abs(truth).max() < 1e-3


def test_cross_interpolation_property():
    """The cross TT must reproduce f exactly at its own pivot fibers."""
    res = tt_cross(f_gauss, SHAPE, rmax=12, key=jax.random.key(4), tol=1e-4)
    # check on random nodes: surrogate close pointwise
    rng = np.random.default_rng(0)
    idx = np.stack([rng.integers(0, n, 64) for n in SHAPE], -1)
    vals = np.asarray(ttm.tt_gather_eval(res.tt, jnp.asarray(idx, jnp.int32)))
    truth = np.asarray(f_gauss(jnp.asarray(idx)))
    np.testing.assert_allclose(vals, truth, rtol=5e-3, atol=5e-4)
