"""Polynomial-core function train (ops/ft.py): the C3 FT-with-poly-cores
equivalent, connected to the value path (VERDICT r1 next #10)."""

import jax
import jax.numpy as jnp
import numpy as np

from c3sc_tpu.grids import Grid
from c3sc_tpu.ops.cross import tt_cross
from c3sc_tpu.ops.ft import ft_eval, ft_from_tt, ft_grad_eval, ft_integrate
from c3sc_tpu.ops.tt import tt_gather_eval, tt_lerp_eval


def _smooth_tt(grid):
    """Rank-2 smooth function: sin(x) sin(y) + 0.3 x^2 y^2 on the grid."""

    def f(idx):
        x = grid.index_to_state(idx)
        return (jnp.sin(x[:, 0]) * jnp.sin(x[:, 1])
                + 0.3 * x[:, 0] ** 2 * x[:, 1] ** 2)

    return tt_cross(f, grid.shape, rmax=8, key=jax.random.key(0),
                    tol=1e-9, max_sweeps=8).tt


def _grid():
    return Grid.create(lb=(-2.0, -1.5), ub=(2.0, 1.5), shape=(17, 15))


def test_ft_interpolates_tt_at_nodes():
    grid = _grid()
    v = _smooth_tt(grid)
    ft = ft_from_tt(v, grid)
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in grid.shape],
                               indexing="ij"), -1).reshape(-1, 2)
    pts = grid.index_to_state(jnp.asarray(idx, jnp.int32))
    v_tt = np.asarray(tt_gather_eval(v, jnp.asarray(idx, jnp.int32)))
    v_ft = np.asarray(ft_eval(ft, pts))
    np.testing.assert_allclose(v_ft, v_tt, rtol=0, atol=5e-4)


def test_ft_beats_lerp_off_grid():
    """Smooth target: the degree-(n-1) FT interpolant must beat multilinear
    lerp between nodes — the reason C3 carries poly cores at all."""
    grid = _grid()
    v = _smooth_tt(grid)
    ft = ft_from_tt(v, grid)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(np.stack([
        rng.uniform(-1.9, 1.9, 512), rng.uniform(-1.4, 1.4, 512)], -1),
        jnp.float32)
    truth = (np.sin(np.asarray(pts[:, 0])) * np.sin(np.asarray(pts[:, 1]))
             + 0.3 * np.asarray(pts[:, 0]) ** 2 * np.asarray(pts[:, 1]) ** 2)
    err_ft = np.abs(np.asarray(ft_eval(ft, pts)) - truth).max()
    err_lerp = np.abs(np.asarray(tt_lerp_eval(v, grid, pts)) - truth).max()
    assert err_ft < 0.3 * err_lerp, (err_ft, err_lerp)
    assert err_ft < 5e-3


def test_ft_integrate_exact():
    grid = _grid()
    v = _smooth_tt(grid)
    ft = ft_from_tt(v, grid)
    # analytic: int sin over symmetric domain = 0 for the rank-1 sin term;
    # int 0.3 x^2 y^2 = 0.3 * (2*2^3/3) * (2*1.5^3/3)
    exact = 0.3 * (2 * 2.0 ** 3 / 3) * (2 * 1.5 ** 3 / 3)
    got = float(ft_integrate(ft))
    assert abs(got - exact) / exact < 2e-3, (got, exact)


def test_ft_grad_smooth():
    grid = _grid()
    v = _smooth_tt(grid)
    ft = ft_from_tt(v, grid)
    pts = jnp.asarray([[0.37, 0.21], [-1.1, 0.8]], jnp.float32)
    g = np.asarray(ft_grad_eval(ft, pts))
    x, y = np.asarray(pts[:, 0]), np.asarray(pts[:, 1])
    gx = np.cos(x) * np.sin(y) + 0.6 * x * y ** 2
    gy = np.sin(x) * np.cos(y) + 0.6 * x ** 2 * y
    np.testing.assert_allclose(g, np.stack([gx, gy], -1), atol=2e-2)


def test_ft_save_load_roundtrip(tmp_path):
    """PolyFT serialization (``function_train_save`` for poly cores —
    SURVEY.md §2.2/§5; r2 verdict next #7): evaluation after a disk
    roundtrip is bit-identical."""
    from c3sc_tpu.ops.ft import ft_load, ft_save

    grid = _grid()
    ft = ft_from_tt(_smooth_tt(grid), grid)
    path = str(tmp_path / "value_ft")
    ft_save(path, ft)
    ft2 = ft_load(path)
    assert ft2.lb == ft.lb and ft2.ub == ft.ub and ft2.periodic == ft.periodic
    rng = np.random.default_rng(1)
    pts = jnp.asarray(np.stack([
        rng.uniform(-2, 2, 128), rng.uniform(-1.5, 1.5, 128)], -1),
        jnp.float32)
    np.testing.assert_array_equal(np.asarray(ft_eval(ft, pts)),
                                  np.asarray(ft_eval(ft2, pts)))
    # wrong-kind file raises a clear error, not a KeyError
    np.savez(str(tmp_path / "not_ft.npz"), meta=np.frombuffer(
        b'{"kind": "other"}', dtype=np.uint8))
    try:
        ft_load(str(tmp_path / "not_ft.npz"))
        assert False, "expected ValueError"
    except ValueError:
        pass
