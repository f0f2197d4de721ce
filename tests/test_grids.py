import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid


def make_grid():
    return Grid.create(
        lb=(-np.pi, -2.0), ub=(np.pi, 2.0), shape=(8, 5), periodic=(True, False)
    )


def test_spacing_and_nodes():
    g = make_grid()
    h = g.h
    assert np.isclose(h[0], 2 * np.pi / 8)   # periodic: span/n
    assert np.isclose(h[1], 4.0 / 4)         # bounded: span/(n-1)
    n0 = g.nodes(0)
    assert len(n0) == 8 and np.isclose(n0[0], -np.pi)
    assert n0[-1] < np.pi  # periodic grid excludes ub
    n1 = g.nodes(1)
    assert np.isclose(n1[0], -2.0) and np.isclose(n1[-1], 2.0)


def test_index_state_roundtrip():
    g = make_grid()
    idx = jnp.array([[0, 0], [3, 2], [7, 4]], jnp.int32)
    x = g.index_to_state(idx)
    np.testing.assert_allclose(np.asarray(x[0]), [-np.pi, -2.0], atol=1e-6)
    cell, w = g.state_to_cell(x)
    # on-node states: cell == idx (or idx-1 with w==1 at bounded top edge)
    recon = g.index_to_state(cell) + w * jnp.asarray(g.h)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=1e-5)


def test_neighbor_index_periodic_wraps_and_bounded_clamps():
    g = make_grid()
    idx = jnp.array([[7, 4]], jnp.int32)
    up0 = g.neighbor_index(idx, 0, +1)
    assert int(up0[0, 0]) == 0  # wraps
    up1 = g.neighbor_index(idx, 1, +1)
    assert int(up1[0, 1]) == 4  # clamps
    dn1 = g.neighbor_index(jnp.array([[0, 0]], jnp.int32), 1, -1)
    assert int(dn1[0, 1]) == 0


def test_wrap_state():
    g = make_grid()
    x = jnp.array([np.pi + 0.1, 1.0])
    w = g.wrap_state(x)
    assert np.isclose(float(w[0]), -np.pi + 0.1, atol=1e-6)
    assert np.isclose(float(w[1]), 1.0)
