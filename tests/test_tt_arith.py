"""TT multiply + integrate (function_train_mult / _integrate parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.ops import tt as ttm


def test_tt_mult_matches_dense():
    a = ttm.tt_random(jax.random.key(0), (6, 5, 7), (1, 2, 3, 1), rmax=12)
    b = ttm.tt_random(jax.random.key(1), (6, 5, 7), (1, 3, 2, 1), rmax=12)
    prod = ttm.tt_mult(a, b)
    dense = np.asarray(ttm.tt_full(a)) * np.asarray(ttm.tt_full(b))
    np.testing.assert_allclose(
        np.asarray(ttm.tt_full(prod)), dense, rtol=1e-4, atol=1e-5
    )
    # ranks multiplied (2*3=6, 3*2=6)
    assert int(prod.ranks[1]) == 6 and int(prod.ranks[2]) == 6
    # rounding recompresses without changing values
    rounded = ttm.tt_round(prod, 1e-5)
    np.testing.assert_allclose(
        np.asarray(ttm.tt_full(rounded)), dense, rtol=1e-3, atol=1e-4
    )


def test_tt_integrate_polynomial():
    # f(x,y) = x^2 * y on [0,1]^2: integral = 1/3 * 1/2 = 1/6
    n = 101
    grid = Grid.create((0.0, 0.0), (1.0, 1.0), (n, n), (False, False))
    x = jnp.asarray(grid.nodes(0), jnp.float32)
    y = jnp.asarray(grid.nodes(1), jnp.float32)
    tt = ttm.tt_rank1([x**2, y], rmax=4)
    val = float(ttm.tt_integrate(tt, grid))
    assert abs(val - 1.0 / 6.0) < 1e-3


def test_tt_integrate_periodic_uniform_weights():
    # integral of sin^2 over [0, 2pi) = pi (rank-1 in 1 dim x const)
    n = 64
    grid = Grid.create((0.0, 0.0), (2 * np.pi, 1.0), (n, 8), (True, False))
    th = jnp.asarray(grid.nodes(0), jnp.float32)
    tt = ttm.tt_rank1([jnp.sin(th) ** 2, jnp.ones(8)], rmax=4)
    val = float(ttm.tt_integrate(tt, grid))
    assert abs(val - np.pi) < 1e-2
