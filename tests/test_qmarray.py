"""Quasimatrix algebra (C3 qmarray.c parity — SURVEY.md §2.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.ops.qmarray import (
    QmArray, mass_matrix, qm_eval, qm_from_callbacks, qm_inner, qm_lu,
    qm_maxvol1d, qm_qr,
)

NODES = jnp.linspace(-1.0, 1.0, 101)


def _example(r=2, c=3):
    fs = [
        [lambda x: jnp.ones_like(x), lambda x: x, lambda x: x**2],
        [lambda x: jnp.sin(3 * x), lambda x: jnp.cos(x), lambda x: x**3],
    ]
    return qm_from_callbacks(fs[:r], NODES)


def test_mass_matrix_exact_linear_integral():
    M = mass_matrix(NODES)
    ones = jnp.ones(len(NODES))
    x = NODES
    # ∫ 1·1 = 2, ∫ x·x = 2/3 over [-1,1]
    assert float(ones @ M @ ones) == pytest.approx(2.0, rel=1e-6)
    assert float(x @ M @ x) == pytest.approx(2.0 / 3.0, rel=1e-4)


def test_qm_eval():
    A = _example()
    E = qm_eval(A, jnp.asarray(0.5))
    np.testing.assert_allclose(
        np.asarray(E),
        [[1.0, 0.5, 0.25], [np.sin(1.5), np.cos(0.5), 0.125]],
        atol=1e-3)


def test_qm_qr_orthonormal_and_reconstructs():
    A = _example()
    Q, R = qm_qr(A)
    G = qm_inner(Q, Q)
    np.testing.assert_allclose(np.asarray(G), np.eye(3), atol=1e-4)
    # A = Q R (function values agree)
    recon = jnp.einsum("imk,kj->imj", Q.vals, R)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(A.vals), atol=1e-4)
    # R upper triangular
    assert abs(float(R[1, 0])) < 1e-6 and abs(float(R[2, 0])) < 1e-6


def test_qm_lu_reconstructs_with_unit_pivots():
    A = _example()
    L, U, piv = qm_lu(A)
    recon = jnp.einsum("imk,kj->imj", L.vals, U)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(A.vals), atol=1e-5)
    for j, (pi, pt) in enumerate(piv):
        assert float(L.vals[pi, pt, j]) == pytest.approx(1.0, abs=1e-6)
        for k in range(j):
            assert float(L.vals[piv[j][0], piv[j][1], k]) == pytest.approx(
                float(L.vals[pi, pt, k]))


def test_qm_maxvol1d_interpolation_identity():
    A = _example()
    piv, E, interp = qm_maxvol1d(A)
    assert len(piv) == 3
    # CUR identity: interp evaluated at pivot p is the unit vector e_p
    for p, (pi, pt) in enumerate(piv):
        row = np.asarray(interp.vals[pi, pt, :])
        want = np.zeros(3)
        want[p] = 1.0
        np.testing.assert_allclose(row, want, atol=1e-5)
    # pivot evaluation matrix should be well-conditioned (maxvol goal)
    assert np.linalg.cond(np.asarray(E)) < 50.0
