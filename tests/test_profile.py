"""rampify_profile / velocity helpers property tests."""

import numpy as np

from tpl_tpu.ops import (
    rampify_profile, curv_to_vel_profile, zero_after_first_zero,
    add_vel_constraint,
)


def test_rampify_respects_limit():
    lim_v = np.full(100, 10.0)
    lim_v[50:60] = 2.0
    prof = rampify_profile(8.0, 0.0, lim_v, -2.5, 2.5, -1.5, 1.5, 1.0, 0.5)
    assert np.all(prof[:, 0] <= lim_v + 1e-9)
    assert np.all(prof[:, 0] >= 1.0 - 1e-9)


def test_rampify_decelerates_before_slow_zone():
    lim_v = np.full(200, 15.0)
    lim_v[100:] = 1.0
    prof = rampify_profile(15.0, 0.0, lim_v, -2.5, 2.5, -1.5, 1.5, 1.0, 0.5)
    # must already be slowing well before the zone
    assert prof[90, 0] < 14.0
    assert prof[100, 0] <= 1.0 + 1e-9
    # spatial deceleration bounded: dv/ds * v = a >= a_min
    # (tolerance accounts for the discretized backward recursion evaluating
    #  the bound at the previous step's velocity)
    v = prof[:, 0]
    a_spatial = np.diff(v) / 0.5 * v[:-1]
    assert np.min(a_spatial) >= -2.5 * 1.3


def test_rampify_accel_limited():
    lim_v = np.full(100, 20.0)
    prof = rampify_profile(1.0, 0.0, lim_v, -2.5, 2.5, -1.5, 1.5, 1.0, 0.5)
    v = prof[:, 0]
    a_spatial = np.diff(v) / 0.5 * v[:-1]
    assert np.max(a_spatial) <= 2.5 + 0.1
    assert v[0] == 1.0
    assert v[-1] > 10.0


def test_curv_to_vel_profile():
    k = np.array([0.0, 0.1, 0.5])
    lim = np.array([20.0, 20.0, 20.0])
    out = curv_to_vel_profile(k, lim, 2.5)
    assert out[0] == 20.0
    assert np.isclose(out[1], np.sqrt(2.5 / 0.1))
    assert np.isclose(out[2], np.sqrt(2.5 / 0.5))


def test_zero_after_first_zero():
    v = np.array([1.0, 1.0, 0.0, 1.0, 1.0])
    np.testing.assert_array_equal(zero_after_first_zero(v),
                                  [1.0, 1.0, 0.0, 0.0, 0.0])


def test_add_vel_constraint():
    lim = np.full(20, 10.0)
    add_vel_constraint(lim, 5, 2.0, length=3)
    np.testing.assert_array_equal(lim[5:8], 2.0)
    assert lim[4] == 10.0 and lim[8] == 10.0
    # clipped at boundaries
    lim2 = np.full(5, 10.0)
    add_vel_constraint(lim2, -10, 1.0, length=3)
    add_vel_constraint(lim2, 10, 1.0, length=3)
    assert np.all(lim2 == 10.0) or np.all(lim2 >= 1.0)
