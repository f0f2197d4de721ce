"""TT core unit tests: eval vs dense, arithmetic, rounding, padding
invariant, serialization (SURVEY.md §4: FT round/cross on known low-rank
functions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.grids import Grid
from c3sc_tpu.ops import tt as ttm

R = 12
SHAPE = (7, 9, 8)


@pytest.fixture
def rand_tt():
    return ttm.tt_random(jax.random.key(0), SHAPE, (1, 3, 4, 1), R)


def test_full_vs_gather_eval(rand_tt):
    dense = np.asarray(ttm.tt_full(rand_tt))
    assert dense.shape == SHAPE
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in SHAPE], indexing="ij"), -1).reshape(-1, 3)
    vals = np.asarray(ttm.tt_gather_eval(rand_tt, jnp.asarray(idx)))
    np.testing.assert_allclose(vals, dense.ravel(), rtol=1e-5, atol=1e-6)


def test_from_dense_roundtrip():
    rng = np.random.default_rng(3)
    # rank-2 tensor
    a = np.einsum("i,j,k->ijk", rng.normal(size=7), rng.normal(size=9), rng.normal(size=8))
    a += np.einsum("i,j,k->ijk", rng.normal(size=7), rng.normal(size=9), rng.normal(size=8))
    tt = ttm.tt_from_dense(jnp.asarray(a, jnp.float32), rmax=R)
    np.testing.assert_allclose(np.asarray(ttm.tt_full(tt)), a, rtol=1e-4, atol=1e-4)
    assert int(tt.ranks[1]) <= 2 and int(tt.ranks[2]) <= 2


def test_add_scale_dot_norm(rand_tt):
    b = ttm.tt_random(jax.random.key(1), SHAPE, (1, 2, 2, 1), R)
    s = ttm.tt_add(rand_tt, ttm.tt_scale(b, -2.0))
    dense = np.asarray(ttm.tt_full(rand_tt)) - 2.0 * np.asarray(ttm.tt_full(b))
    np.testing.assert_allclose(np.asarray(ttm.tt_full(s)), dense, rtol=1e-4, atol=1e-5)
    # dot/norm
    dot = float(ttm.tt_dot(rand_tt, b))
    np.testing.assert_allclose(
        dot, np.sum(np.asarray(ttm.tt_full(rand_tt)) * np.asarray(ttm.tt_full(b))),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(ttm.tt_norm(s)), np.linalg.norm(dense), rtol=1e-4
    )


def test_round_compresses_inflated_rank(rand_tt):
    # a + a has doubled representation ranks but same true ranks
    s = ttm.tt_add(rand_tt, rand_tt)
    assert int(s.ranks[1]) == 6  # doubled representation rank
    rounded = ttm.tt_round(s, tol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ttm.tt_full(rounded)),
        2 * np.asarray(ttm.tt_full(rand_tt)),
        rtol=1e-3, atol=1e-4,
    )
    assert int(rounded.ranks[1]) <= int(rand_tt.ranks[1])
    assert int(rounded.ranks[2]) <= int(rand_tt.ranks[2])
    # padding invariant: entries outside active blocks are zero
    for k in range(3):
        c = np.asarray(rounded.cores[k])
        rl, rr = int(rounded.ranks[k]), int(rounded.ranks[k + 1])
        assert np.allclose(c[rl:], 0) and np.allclose(c[:, :, rr:], 0)


def test_round_is_jittable(rand_tt):
    f = jax.jit(lambda t: ttm.tt_round(t, tol=1e-5))
    out = f(ttm.tt_add(rand_tt, rand_tt))
    np.testing.assert_allclose(
        np.asarray(ttm.tt_full(out)), 2 * np.asarray(ttm.tt_full(rand_tt)),
        rtol=1e-3, atol=1e-4,
    )


def test_lerp_eval_matches_interp():
    grid = Grid.create((-1.0, -1.0), (1.0, 1.0), (16, 16), (False, False))
    # f(x, y) = x*y exactly rank-1, bilinear -> lerp eval must be exact
    fx = jnp.asarray(grid.nodes(0), jnp.float32)
    fy = jnp.asarray(grid.nodes(1), jnp.float32)
    tt = ttm.tt_rank1([fx, fy], rmax=4)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, size=(32, 2)), jnp.float32)
    vals = ttm.tt_lerp_eval(tt, grid, x)
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(x[:, 0] * x[:, 1]), rtol=1e-4, atol=1e-5
    )


def test_save_load(tmp_path, rand_tt):
    p = str(tmp_path / "tt.npz")
    ttm.tt_save(rand_tt, p)
    back = ttm.tt_load(p)
    np.testing.assert_allclose(
        np.asarray(ttm.tt_full(back)), np.asarray(ttm.tt_full(rand_tt))
    )


def test_constant_tt():
    tt = ttm.tt_constant(SHAPE, 3.5, rmax=4)
    np.testing.assert_allclose(np.asarray(ttm.tt_full(tt)), 3.5, rtol=1e-6)
