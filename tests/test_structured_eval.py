"""Structured fiber-neighbor evaluation vs independent TT gathers (the
valuef_eval_fiber_ind_nn parity check, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.grids import Grid
from c3sc_tpu.ops.tt import tt_gather_eval, tt_random
from c3sc_tpu.solvers.fused import _shift_coord, make_structured_fiber_eval

R = 6
SHAPE = (8, 7, 9, 6)


@pytest.mark.parametrize("k", [0, 1, 2, 3])
@pytest.mark.parametrize("periodic", [False, True])
def test_structured_matches_gather(k, periodic):
    d = len(SHAPE)
    grid = Grid.create(
        lb=(-1.0,) * d, ub=(1.0,) * d, shape=SHAPE, periodic=(periodic,) * d
    )
    tt = tt_random(jax.random.key(0), SHAPE, (1, 4, 5, 4, 1), R)
    rng = np.random.default_rng(k)
    left = jnp.asarray(
        np.stack([rng.integers(0, SHAPE[j], R) for j in range(d)], -1), jnp.int32
    )
    right = jnp.asarray(
        np.stack([rng.integers(0, SHAPE[j], R) for j in range(d)], -1), jnp.int32
    )
    fn = make_structured_fiber_eval(grid, k, R)
    vp, vm, v0 = fn(tt.cores, left, right)  # [d, R, n, R] x2, [R, n, R]

    # reference: independent gather evals at shifted indices
    n = SHAPE[k]
    dimcol = jnp.arange(d)
    A = jnp.broadcast_to(left[:, None, None, :], (R, n, R, d))
    B = jnp.broadcast_to(right[None, None, :, :], (R, n, R, d))
    I = jnp.broadcast_to(jnp.arange(n)[None, :, None, None], (R, n, R, d))
    idx = jnp.where(dimcol < k, A, jnp.where(dimcol == k, I, B)).astype(jnp.int32)
    flat = idx.reshape(-1, d)
    # center values (the base-mode w-fit path)
    ref0 = np.asarray(tt_gather_eval(tt, flat)).reshape(R, n, R)
    np.testing.assert_allclose(np.asarray(v0), ref0, rtol=2e-4, atol=2e-5,
                               err_msg=f"center values core {k}")
    for m in range(d):
        for sign, v_struct in ((1, vp), (-1, vm)):
            nb = flat.at[:, m].set(_shift_coord(flat[:, m], m, sign, grid))
            ref = np.asarray(tt_gather_eval(tt, nb)).reshape(R, n, R)
            got = np.asarray(v_struct[m])
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                       err_msg=f"dim {m} sign {sign} core {k}")
