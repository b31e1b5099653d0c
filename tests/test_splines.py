"""Spline kernels vs scipy BPoly oracles.

Mirrors the reference's oracle strategy (library/test/test_spline.py:16-90).
"""

import numpy as np
import pytest
from scipy.interpolate import BPoly

from tpl_tpu.ops import PolyCubic, PolyQuintic, PolySeptic, PolyQuartic


RNG = np.random.default_rng(5454754987)


def _rand_interval():
    x0, x1 = sorted(RNG.uniform(-100, 100, 2))
    if x1 - x0 < 1e-3:
        x1 = x0 + 1.0
    return x0, x1


@pytest.mark.parametrize("trial", range(5))
def test_cubic(trial):
    x0, x1 = _rand_interval()
    s0, s1, v0, v1 = RNG.uniform(-100, 100, 4)
    gt = BPoly.from_derivatives([x0, x1], [[s0, v0], [s1, v1]])
    p = PolyCubic(x0, s0, v0, x1, s1, v1)
    xs = np.linspace(x0, x1, 100)
    np.testing.assert_allclose(p.f(xs), gt(xs), rtol=1e-9, atol=1e-7)
    np.testing.assert_allclose(p.df(xs), gt.derivative()(xs), rtol=1e-9, atol=1e-7)
    np.testing.assert_allclose(p.ddf(xs), gt.derivative(2)(xs), rtol=1e-8, atol=1e-6)
    np.testing.assert_allclose(p.dddf(xs), gt.derivative(3)(xs), rtol=1e-8, atol=1e-6)


@pytest.mark.parametrize("trial", range(5))
def test_quintic(trial):
    x0, x1 = _rand_interval()
    s0, s1, v0, v1, a0, a1 = RNG.uniform(-100, 100, 6)
    gt = BPoly.from_derivatives([x0, x1], [[s0, v0, a0], [s1, v1, a1]])
    p = PolyQuintic(x0, s0, v0, a0, x1, s1, v1, a1)
    xs = np.linspace(x0, x1, 100)
    np.testing.assert_allclose(p.f(xs), gt(xs), rtol=1e-8, atol=1e-6)
    np.testing.assert_allclose(p.df(xs), gt.derivative()(xs), rtol=1e-8, atol=1e-6)
    np.testing.assert_allclose(p.ddf(xs), gt.derivative(2)(xs), rtol=1e-7, atol=1e-5)
    np.testing.assert_allclose(p.dddf(xs), gt.derivative(3)(xs), rtol=1e-7, atol=1e-4)


@pytest.mark.parametrize("trial", range(5))
def test_septic(trial):
    x0, x1 = _rand_interval()
    vals = RNG.uniform(-100, 100, 8)
    s0, s1, v0, v1, a0, a1, j0, j1 = vals
    gt = BPoly.from_derivatives([x0, x1], [[s0, v0, a0, j0], [s1, v1, a1, j1]])
    p = PolySeptic(x0, s0, v0, a0, j0, x1, s1, v1, a1, j1)
    xs = np.linspace(x0, x1, 100)
    np.testing.assert_allclose(p.f(xs), gt(xs), rtol=1e-7, atol=1e-5)
    np.testing.assert_allclose(p.df(xs), gt.derivative()(xs), rtol=1e-7, atol=1e-4)
    np.testing.assert_allclose(p.ddf(xs), gt.derivative(2)(xs), rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(p.dddf(xs), gt.derivative(3)(xs), rtol=1e-6, atol=1e-2)


def test_quartic_boundary_conditions():
    ts, ss, vs, as_ = 1.0, 5.0, 3.0, -0.5
    te, ve, ae = 4.0, 8.0, 0.25
    p = PolyQuartic(ts, ss, vs, as_, te, ve, ae)
    assert np.isclose(p.f(ts), ss)
    assert np.isclose(p.df(ts), vs)
    assert np.isclose(p.ddf(ts), as_)
    assert np.isclose(p.df(te), ve)
    assert np.isclose(p.ddf(te), ae)


def test_batched_coefficients():
    # batched construction must match per-instance construction
    x0 = np.zeros(4)
    x1 = np.full(4, 2.0)
    y0 = np.array([0.0, 1.0, -1.0, 3.0])
    y1 = np.array([1.0, 0.0, 2.0, -2.0])
    v0 = np.array([0.5, -0.5, 0.0, 1.0])
    v1 = np.array([0.0, 0.0, 1.0, -1.0])
    batch = PolyCubic(x0, y0, v0, x1, y1, v1)
    for i in range(4):
        single = PolyCubic(x0[i], y0[i], v0[i], x1[i], y1[i], v1[i])
        xs = np.linspace(0.0, 2.0, 7)
        np.testing.assert_allclose(
            np.array([batch.f(x)[i] for x in xs]),
            single.f(xs), rtol=1e-12)


def test_integrals():
    p = PolyCubic(0.0, 1.0, 0.5, 2.0, 3.0, -0.5)
    xs = np.linspace(0.0, 2.0, 50)
    # numeric integral oracle
    from scipy.integrate import cumulative_trapezoid
    fine = np.linspace(0.0, 2.0, 20001)
    i1_num = cumulative_trapezoid(p.f(fine), fine, initial=0.0) + 7.0
    i1 = p.i1(xs, 7.0)
    np.testing.assert_allclose(i1, np.interp(xs, fine, i1_num), atol=1e-5)
