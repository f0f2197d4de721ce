"""Native library tests: maxvol quality + binary TT serialization roundtrip.

If native/libc3sc_native.so is missing these exercise the numpy fallbacks;
when built (make -C native) they exercise the C++ paths.
"""

import jax
import numpy as np

from c3sc_tpu import native
from c3sc_tpu.ops import tt as ttm


def test_maxvol_selects_well_conditioned_rows():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((200, 8))
    rows = native.maxvol(A)
    assert rows.shape == (8,)
    assert len(set(rows.tolist())) == 8  # distinct
    B = A @ np.linalg.inv(A[rows])
    assert np.abs(B).max() <= 1.2  # maxvol property (within tol)


def test_maxvol_native_matches_quality_of_fallback():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((100, 6))
    rows_n = native.maxvol(A)
    vol_n = abs(np.linalg.det(A[rows_n]))
    rows_f = native._maxvol_numpy(np.asarray(A, np.float64), 0.05, 100)
    vol_f = abs(np.linalg.det(A[rows_f]))
    # both should find near-maximal volume; neither degenerate
    assert vol_n > 0.2 * vol_f


def test_binary_tt_roundtrip(tmp_path):
    tt = ttm.tt_random(jax.random.key(0), (7, 9, 8), (1, 3, 4, 1), rmax=12)
    active = native.tt_to_active(tt)
    p = str(tmp_path / "vf.c3tt")
    native.tt_save_binary(p, active)
    back = native.tt_load_binary(p)
    assert len(back) == 3
    for a, b in zip(active, back):
        np.testing.assert_allclose(np.asarray(a, np.float32), b, rtol=1e-6)
    # repack and compare evaluations
    tt2 = native.tt_from_active(back, rmax=12)
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in (7, 9, 8)], indexing="ij"), -1).reshape(-1, 3)
    import jax.numpy as jnp

    v1 = np.asarray(ttm.tt_gather_eval(tt, jnp.asarray(idx, jnp.int32)))
    v2 = np.asarray(ttm.tt_gather_eval(tt2, jnp.asarray(idx, jnp.int32)))
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-6)


def test_binary_smaller_than_padded(tmp_path):
    tt = ttm.tt_random(jax.random.key(1), (31, 31, 31), (1, 4, 4, 1), rmax=32)
    p1 = str(tmp_path / "a.c3tt")
    native.tt_save_binary(p1, native.tt_to_active(tt))
    p2 = str(tmp_path / "a.npz")
    ttm.tt_save(tt, p2)
    import os

    assert os.path.getsize(p1) < os.path.getsize(p2) / 10
