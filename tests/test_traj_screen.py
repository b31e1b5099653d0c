"""Host-side trajectory-vs-prediction collision screen tests."""

import numpy as np

from tpl_tpu.environment.detections import DynamicObject, Prediction
from tpl_tpu.planning.utils import traj_collision_imminent


def _ego_traj(t0=100.0, v=10.0, n=100, dt=0.1):
    traj = np.zeros((n, 8))
    traj[:, 0] = t0 + np.arange(n) * dt
    traj[:, 2] = np.arange(n) * dt * v        # x
    traj[:, 3] = 0.0                          # y
    traj[:, 6] = 0.0                          # heading
    return traj


def _obj(x, y, yaw=0.0, v=0.0, heading=0.0, length=4.0, width=2.0):
    o = DynamicObject()
    o.pos = np.array([x, y], dtype=float)
    o.yaw = yaw
    box = np.array([[-length / 2, -width / 2], [length / 2, -width / 2],
                    [length / 2, width / 2], [-length / 2, width / 2]])
    c, s = np.cos(yaw), np.sin(yaw)
    o.hull = o.pos + box @ np.array([[c, s], [-s, c]])
    o.hull_radius = float(np.hypot(length, width) / 2)
    p = Prediction()
    ts = np.arange(11.0)
    p.states = np.column_stack([
        ts,
        x + v * np.cos(heading) * ts,
        y + v * np.sin(heading) * ts,
        np.full(11, yaw),
        np.full(11, v)])
    o.predictions = [p]
    return o


def test_crossing_object_detected():
    traj = _ego_traj()
    # object crosses ego's x=50 point (reached at t_rel 5.0) at that time
    obj = _obj(50.0, -25.0, yaw=np.pi / 2, v=5.0, heading=np.pi / 2)
    assert traj_collision_imminent(traj, [obj], 1.9, 5.0, t_now=100.0)


def test_parallel_lane_not_flagged():
    traj = _ego_traj()
    # same direction, one lane over (3.5 m): never a hit
    obj = _obj(20.0, 3.5, yaw=0.0, v=10.0, heading=0.0)
    assert not traj_collision_imminent(traj, [obj], 1.9, 5.0, t_now=100.0)


def test_lead_vehicle_ahead_not_flagged():
    traj = _ego_traj()
    # leader starts 30 m ahead at the same speed: gap never closes
    obj = _obj(30.0, 0.0, yaw=0.0, v=10.0, heading=0.0)
    assert not traj_collision_imminent(traj, [obj], 1.9, 5.0, t_now=100.0)


def test_stopped_object_on_path_detected():
    traj = _ego_traj()
    obj = _obj(40.0, 0.0, yaw=0.0, v=0.0)
    assert traj_collision_imminent(traj, [obj], 1.9, 5.0, t_now=100.0)


def test_prediction_window_respected():
    traj = _ego_traj(n=20)  # plan covers rel t in [0, 2)
    # object only becomes dangerous at rel t=5, plan ends before
    obj = _obj(200.0, 0.0, yaw=np.pi, v=0.0)
    assert not traj_collision_imminent(traj, [obj], 1.9, 5.0, t_now=100.0)


def test_empty_inputs():
    assert not traj_collision_imminent(None, [], 1.9, 5.0, t_now=0.0)
    traj = _ego_traj()
    assert not traj_collision_imminent(traj, [], 1.9, 5.0, t_now=100.0)
    o = DynamicObject()
    o.predictions = []
    assert not traj_collision_imminent(traj, [o], 1.9, 5.0, t_now=100.0)


def test_aligned_leader_passthrough_not_flagged():
    # the s-domain velocity plan legitimately catches up to (and in open
    # loop passes through) a slower same-heading leader's predicted
    # position; with ignore_leading_aligned the latch must not fire
    traj = _ego_traj(v=10.0)
    obj = _obj(20.0, 0.0, yaw=0.0, v=5.0, heading=0.0)
    assert traj_collision_imminent(traj, [obj], 1.9, 5.0, t_now=100.0)
    assert not traj_collision_imminent(
        traj, [obj], 1.9, 5.0, t_now=100.0,
        min_closing_speed=1.0, ignore_leading_aligned=True)


def test_oncoming_flagged_despite_leading_filter():
    traj = _ego_traj(v=10.0)
    obj = _obj(80.0, 0.0, yaw=np.pi, v=8.0, heading=np.pi)
    assert traj_collision_imminent(
        traj, [obj], 1.9, 5.0, t_now=100.0,
        min_closing_speed=1.0, ignore_leading_aligned=True)


def test_stationary_on_path_flagged_despite_leading_filter():
    traj = _ego_traj(v=10.0)
    obj = _obj(40.0, 0.0, yaw=0.0, v=0.0)
    assert traj_collision_imminent(
        traj, [obj], 1.9, 5.0, t_now=100.0,
        min_closing_speed=1.0, ignore_leading_aligned=True)


def test_matched_speed_tail_bunching_not_flagged():
    # plan tail ends 2.5 m behind a matched-speed leader: marginal chain
    # overlap with ~zero closing speed must not latch
    traj = _ego_traj(v=10.0, n=50)
    obj = _obj(traj[-1, 2] - 100.0 + 2.5 + 10.0 * 4.9, 0.0,
               yaw=0.0, v=10.0, heading=0.0)
    assert not traj_collision_imminent(
        traj, [obj], 1.9, 5.0, t_now=100.0,
        min_closing_speed=1.0, ignore_leading_aligned=True)
