"""Poly-sampling device kernel vs the vectorized-numpy oracle.

The jitted kernel (poly_kernel.py) must reproduce the host evaluation
(_eval_candidates) bit-closely: same winning candidate, same trajectory,
same collision penalties. (reference behavior target:
library/src/poly_sampling.cpp:37-258)
"""

import numpy as np
import pytest

from tpl_tpu.planning.poly_sampling import poly_sampling_planner as psp
from tpl_tpu.planning.poly_sampling import poly_kernel


def _scene(obstacles=True):
    N = 200
    path = np.zeros((N, 6))
    path[:, 0] = np.arange(N) * 0.5
    path[:, 3] = path[:, 0]
    path[:, 5] = 10.0
    start = dict(d=0.5, d_d=0.1, d_dd=0.0, s=0.0, s_d=8.0, s_dd=0.0)
    obs = []
    if obstacles:
        obs = [
            dict(hull=np.array([[30., -1.], [34., -1.], [34., 1.],
                                [30., 1.]])),
            dict(hull=np.array([[18., 1.5], [21., 1.5], [21., 3.5],
                                [18., 3.5], [19.5, 4.0]])),
        ]
    pp = psp.PolySamplingParams()
    pp.lane_width = 3.0
    pp.v_samples = 2
    pp.rear_axis_to_rear = 1.0
    pp.rear_axis_to_front = 4.0
    pp.width_ego = 2.5
    return start, path, obs, pp


@pytest.mark.parametrize("with_obs", [False, True])
def test_device_kernel_matches_oracle(with_obs):
    start, path, obs, pp = _scene(with_obs)
    ref = psp._eval_candidates(start, path, obs, pp)
    dev = psp._eval_candidates_device(start, path, obs, pp)
    assert ref["cost"] == pytest.approx(dev["cost"], rel=1e-4)
    for k in ("x", "y", "yaw", "s", "s_d", "s_dd", "d", "d_d", "c"):
        np.testing.assert_allclose(dev[k], ref[k], rtol=1e-4, atol=1e-4,
                                   err_msg=k)


def test_collision_penalty_forces_evasion():
    """With the direct lane blocked, the winner must carry no collision
    penalty and swing laterally around the obstacle."""
    start, path, obs, pp = _scene(True)
    dev = psp._eval_candidates_device(start, path, obs, pp)
    assert dev["cost"] < poly_kernel.PENALTY
    # obstacle spans y in [-1, 1] around x ~ 30-34: the plan must be
    # clear of it where it passes
    near = (dev["x"] > 28.0) & (dev["x"] < 36.0)
    if np.any(near):
        assert np.all(np.abs(dev["y"][near]) > 1.0)


def test_pack_obstacles_padding_is_sat_safe():
    hulls, valid = poly_kernel.pack_obstacles([
        dict(hull=np.array([[0., 0.], [1., 0.], [1., 1.]])),
        dict(hull=np.array([[5., 5.], [7., 5.], [7., 7.], [5., 7.],
                            [4.5, 6.0]])),
        dict(hull=np.array([[9., 9.], [9.1, 9.]])),   # degenerate: dropped
    ])
    assert hulls.shape[0] == 4 and valid.sum() == 2
    # vertex padding repeats the last vertex
    assert np.all(hulls[0, 3:] == hulls[0, 2])
