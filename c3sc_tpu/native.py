"""ctypes bindings for the native host-runtime library (native/).

Native components (see ``native/c3sc_native.cpp``): greedy maxvol pivot
selection (C3 ``qmarray_maxvol1d`` parity) and the compact binary TT
serializer (``function_train_save`` / ``valuef_save`` parity — active rank
blocks only). Falls back to pure-numpy implementations when the shared
library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "native", "libc3sc_native.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.c3sc_maxvol.restype = ctypes.c_int
    lib.c3sc_maxvol.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_double, ctypes.c_int,
    ]
    lib.c3sc_tt_save.restype = ctypes.c_int
    lib.c3sc_tt_load_header.restype = ctypes.c_int
    lib.c3sc_tt_load_cores.restype = ctypes.c_int
    _LIB = lib
    return lib


def have_native() -> bool:
    return _load() is not None


# ------------------------------------------------------------------- maxvol


def maxvol(A: np.ndarray, tol: float = 0.05, max_iters: int = 100) -> np.ndarray:
    """Rows (len r) of A [m, r] maximizing submatrix volume.

    Native greedy maxvol when available; numpy LU+swap fallback otherwise.
    """
    A = np.ascontiguousarray(A, np.float64)
    m, r = A.shape
    lib = _load()
    rows = np.zeros(r, np.int64)
    if lib is not None:
        ret = lib.c3sc_maxvol(
            A.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            m, r, rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            tol, max_iters,
        )
        if ret >= 0:
            return rows
    return _maxvol_numpy(A, tol, max_iters)


def _maxvol_numpy(A, tol, max_iters):
    import scipy.linalg

    m, r = A.shape
    _, _, _ = scipy.linalg.lu(A)  # warm scipy import path
    piv = scipy.linalg.lu_factor(A)[1]
    order = np.arange(m)
    for i, p in enumerate(piv[:r]):
        order[i], order[p] = order[p], order[i]
    rows = order[:r].copy()
    for _ in range(max_iters):
        B = A @ np.linalg.inv(A[rows])
        i, j = np.unravel_index(np.argmax(np.abs(B)), B.shape)
        if abs(B[i, j]) <= 1.0 + tol:
            break
        rows[j] = i
    return rows


# ------------------------------------------------------------ serialization


def tt_save_binary(path: str, cores_active: list[np.ndarray]) -> None:
    """Save active-block cores [(r_k, n_k, r_{k+1})] to the C3TT format."""
    lib = _load()
    d = len(cores_active)
    ranks = np.asarray(
        [1] + [c.shape[2] for c in cores_active], np.int64
    )
    ranks[0] = cores_active[0].shape[0]
    n = np.asarray([c.shape[1] for c in cores_active], np.int64)
    cores32 = [np.ascontiguousarray(c, np.float32) for c in cores_active]
    if lib is not None:
        arr_t = ctypes.POINTER(ctypes.c_float) * d
        ptrs = arr_t(*[c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for c in cores32])
        ret = lib.c3sc_tt_save(
            path.encode(), d,
            ranks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), ptrs,
        )
        if ret == 0:
            return
    # numpy fallback: same layout via np.savez is NOT binary-compatible;
    # emulate the exact format
    with open(path, "wb") as f:
        f.write(b"C3TT")
        f.write(np.asarray([1, 0], np.uint32).tobytes())
        f.write(np.asarray([d], np.int64).tobytes())
        f.write(ranks.tobytes())
        f.write(n.tobytes())
        for c in cores32:
            f.write(c.tobytes())


def tt_load_binary(path: str) -> list[np.ndarray]:
    """Load active-block cores from the C3TT format."""
    with open(path, "rb") as f:
        magic = f.read(4)
        assert magic == b"C3TT", f"bad magic {magic!r}"
        _version, dtype_code = np.frombuffer(f.read(8), np.uint32)
        assert dtype_code == 0
        d = int(np.frombuffer(f.read(8), np.int64)[0])
        ranks = np.frombuffer(f.read(8 * (d + 1)), np.int64)
        n = np.frombuffer(f.read(8 * d), np.int64)
        cores = []
        for k in range(d):
            sz = int(ranks[k] * n[k] * ranks[k + 1])
            c = np.frombuffer(f.read(4 * sz), np.float32)
            cores.append(c.reshape(ranks[k], n[k], ranks[k + 1]).copy())
    return cores


def tt_to_active(tt) -> list[np.ndarray]:
    """Extract active blocks from a padded TT."""
    ranks = np.asarray(tt.ranks)
    return [
        np.asarray(c)[: ranks[k], :, : ranks[k + 1]]
        for k, c in enumerate(tt.cores)
    ]


def tt_from_active(cores_active: list[np.ndarray], rmax: int):
    """Pack active blocks into a padded TT."""
    import jax.numpy as jnp

    from c3sc_tpu.ops.tt import TT

    d = len(cores_active)
    ranks = [1] + [c.shape[2] for c in cores_active]
    cores = []
    for k, c in enumerate(cores_active):
        buf = np.zeros((rmax, c.shape[1], rmax), c.dtype)
        buf[: c.shape[0], :, : c.shape[2]] = c
        cores.append(jnp.asarray(buf))
    return TT(tuple(cores), jnp.asarray(ranks, jnp.int32))
