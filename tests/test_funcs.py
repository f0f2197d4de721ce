"""Univariate function classes + quadrature (C3 lib_funcs / lib_quadrature
parity — SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3sc_tpu.ops import quadrature as quad
from c3sc_tpu.ops.funcs import (
    GenericFunction, constelm_eval, constelm_integrate, gf_eval, gf_integrate,
    gf_load, gf_save, kernel_eval, kernel_fit, kernel_integrate, linelm_deriv,
    linelm_eval, linelm_fit, linelm_inner, linelm_integrate, poly_deriv,
    poly_eval, poly_fit, poly_inner, poly_integrate, pwpoly_deriv,
    pwpoly_eval, pwpoly_fit, pwpoly_integrate,
)


# --------------------------------------------------------------- quadrature

def test_gauss_legendre_polynomial_exactness():
    x, w = quad.gauss_legendre(5, 0.0, 2.0)   # exact to degree 9
    for p in range(10):
        assert np.sum(w * x**p) == pytest.approx(2.0 ** (p + 1) / (p + 1), rel=1e-10)


def test_gauss_hermite_prob_moments():
    x, w = quad.gauss_hermite_prob(8)
    assert np.sum(w) == pytest.approx(1.0)
    assert np.sum(w * x**2) == pytest.approx(1.0)   # Var(Z)
    assert np.sum(w * x**4) == pytest.approx(3.0)   # E[Z^4]


def test_clenshaw_curtis_smooth():
    x, w = quad.clenshaw_curtis(33, 0.0, np.pi)
    assert np.sum(w * np.sin(x)) == pytest.approx(2.0, abs=1e-10)


def test_trapezoid_matches_numpy():
    nodes = np.array([0.0, 0.3, 1.0, 2.5])
    vals = nodes**2
    _, w = quad.trapezoid(nodes)
    assert np.sum(w * vals) == pytest.approx(np.trapezoid(vals, nodes))


# -------------------------------------------------------------------- polys

def test_poly_fit_eval_accuracy():
    f = lambda x: jnp.sin(2 * x) + 0.3 * x**2
    p = poly_fit(f, n=16, a=-1.5, b=2.0)
    xs = jnp.linspace(-1.5, 2.0, 101)
    np.testing.assert_allclose(poly_eval(p, xs), jax.vmap(f)(xs), atol=2e-5)


def test_poly_integrate_and_inner():
    p = poly_fit(lambda x: x**2, n=6, a=0.0, b=2.0)
    assert float(poly_integrate(p)) == pytest.approx(8.0 / 3.0, rel=1e-5)
    q = poly_fit(lambda x: x, n=6, a=0.0, b=2.0)
    # ∫0^2 x^3 dx = 4
    assert float(poly_inner(p, q)) == pytest.approx(4.0, rel=1e-4)


def test_poly_deriv():
    p = poly_fit(lambda x: jnp.sin(x), n=20, a=-2.0, b=2.0)
    dp = poly_deriv(p)
    xs = jnp.linspace(-1.9, 1.9, 41)
    np.testing.assert_allclose(poly_eval(dp, xs), jnp.cos(xs), atol=1e-4)


# ------------------------------------------------------------------- linelm

def test_linelm_eval_integrate_inner_deriv():
    nodes = jnp.linspace(0.0, 1.0, 51)
    a = linelm_fit(lambda x: 2 * x, nodes)
    b = linelm_fit(lambda x: 3 * x, nodes)
    assert float(linelm_eval(a, jnp.asarray(0.25))) == pytest.approx(0.5)
    assert float(linelm_integrate(a)) == pytest.approx(1.0)
    # exact for piecewise linear: ∫ 6x² = 2
    assert float(linelm_inner(a, b)) == pytest.approx(2.0, rel=1e-6)
    ce = linelm_deriv(a)
    np.testing.assert_allclose(np.asarray(ce.vals), 2.0, atol=1e-5)
    assert float(constelm_integrate(ce)) == pytest.approx(2.0, rel=1e-5)
    assert float(constelm_eval(ce, jnp.asarray(0.7))) == pytest.approx(2.0, abs=1e-5)


# ------------------------------------------------------------------- pwpoly

def test_pwpoly_fit_eval_integrate_deriv():
    edges = np.linspace(-1.0, 1.0, 9)
    pw = pwpoly_fit(lambda x: jnp.exp(x), edges, order=3)
    xs = jnp.linspace(-0.99, 0.99, 53)
    np.testing.assert_allclose(pwpoly_eval(pw, xs), jnp.exp(xs), rtol=1e-4)
    assert float(pwpoly_integrate(pw)) == pytest.approx(np.e - 1 / np.e, rel=1e-4)
    dpw = pwpoly_deriv(pw)
    np.testing.assert_allclose(pwpoly_eval(dpw, xs), jnp.exp(xs), rtol=2e-3)


# ------------------------------------------------------------------- kernel

def test_kernel_fit_eval_integrate():
    centers = jnp.linspace(-2.0, 2.0, 25)
    ke = kernel_fit(lambda x: jnp.cos(x), centers, width=0.4)
    xs = jnp.linspace(-1.8, 1.8, 37)
    np.testing.assert_allclose(kernel_eval(ke, xs), jnp.cos(xs), atol=1e-3)
    assert float(kernel_integrate(ke, -1.5, 1.5)) == pytest.approx(
        2 * np.sin(1.5), abs=5e-3)


# ------------------------------------------------------------------ generic

def test_generic_dispatch_and_roundtrip(tmp_path):
    p = poly_fit(lambda x: x**3, n=8, a=-1.0, b=1.0)
    g = GenericFunction("poly", p)
    assert float(gf_eval(g, jnp.asarray(0.5))) == pytest.approx(0.125, abs=1e-5)
    assert float(gf_integrate(g)) == pytest.approx(0.0, abs=1e-5)
    path = str(tmp_path / "gf.npz")
    gf_save(path, g)
    g2 = gf_load(path)
    assert g2.kind == "poly"
    xs = jnp.linspace(-1, 1, 11)
    np.testing.assert_allclose(gf_eval(g2, xs), gf_eval(g, xs), atol=1e-6)


def test_generic_kernel_roundtrip(tmp_path):
    ke = kernel_fit(lambda x: jnp.sin(x), jnp.linspace(-1, 1, 9), width=0.5)
    g = GenericFunction("kernel", ke)
    path = str(tmp_path / "ke.npz")
    gf_save(path, g)
    g2 = gf_load(path)
    assert float(g2.obj.width) == pytest.approx(0.5)
    xs = jnp.linspace(-1, 1, 11)
    np.testing.assert_allclose(gf_eval(g2, xs), gf_eval(g, xs), atol=1e-6)
