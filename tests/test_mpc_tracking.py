"""MPC tracking precision at UTM-magnitude coordinates.

Regression test: the tracking MPC solves on device in float32, where the
ulp at UTM magnitude (~5e6 m) is 0.5 m.  The controllers must center
coordinates around the reference start before solving, otherwise lateral
dynamics quantize to half-meter steps and tracking errors of meters
appear (observed closed-loop on acc_2024/rb_3o).
"""

import contextlib

import numpy as np

from tpl_tpu.util import Bundle
from tpl_tpu.environment.vehicle_state import VehicleState
from tpl_tpu.planning.trajectory import Trajectory


UTM_X = 571172.0
UTM_Y = 5364663.0


def _make_straight_traj(heading=0.3, v=10.0, n=200, step=0.5):
    traj = Trajectory()
    s = np.arange(n) * step
    traj.x = UTM_X + np.cos(heading) * s
    traj.y = UTM_Y + np.sin(heading) * s
    traj.orientation = np.full(n, heading)
    traj.s = s
    traj.curvature = np.zeros(n)
    traj.velocity = np.full(n, v)
    traj.time = s / v
    traj.acceleration = np.zeros(n)
    return traj


def _run_controller(ctrl_cls, traj, veh, steps=5, dt=0.01):
    shared = Bundle()

    @contextlib.contextmanager
    def lock_shared():
        yield

    ctrl = ctrl_cls(shared, lock_shared)

    con_input = Bundle()
    con_input.vehicle = veh
    con_input.trajectory = traj

    controls = (0.0, 0.0)
    for i in range(steps):
        con_input.t = i * dt
        controls, con_traj = ctrl.update(con_input)
    return ctrl, controls, con_traj


def test_spatial_mpc_no_utm_quantization():
    from tpl_tpu.control.model_predictive_controller import (
        ModelPredictiveController)

    heading, v = 0.3, 10.0
    traj = _make_straight_traj(heading, v)

    veh = VehicleState()
    veh.x, veh.y = UTM_X, UTM_Y
    veh.phi = heading
    veh.v = v

    ctrl, (acc, steer), con_traj = _run_controller(
        ModelPredictiveController, traj, veh)

    # on-reference start: commanded steering must be ~0 and the predicted
    # rollout must stay within centimeters of the straight reference line
    assert abs(steer) < 0.01
    n = np.array([-np.sin(heading), np.cos(heading)])
    lat = (np.asarray(con_traj.x) - UTM_X) * n[0] \
        + (np.asarray(con_traj.y) - UTM_Y) * n[1]
    assert np.max(np.abs(lat)) < 0.05, np.max(np.abs(lat))

    # the predicted xy must advance smoothly, not in float32 ulp jumps
    dy = np.abs(np.diff(np.asarray(con_traj.y)))
    assert np.all(dy < 0.35), dy.max()
    assert np.count_nonzero(dy) > len(dy) * 0.9


def test_time_mpc_no_utm_quantization():
    from tpl_tpu.control.model_predictive_controller_time import (
        ModelPredictiveControllerTime)

    heading, v = 0.3, 10.0
    traj = _make_straight_traj(heading, v)
    # time-indexed reference
    traj.time = np.arange(len(traj.x)) * 0.1
    traj.x = UTM_X + np.cos(heading) * v * traj.time
    traj.y = UTM_Y + np.sin(heading) * v * traj.time
    traj.s = v * traj.time

    veh = VehicleState()
    veh.x, veh.y = UTM_X, UTM_Y
    veh.phi = heading
    veh.v = v

    ctrl, (acc, steer), con_traj = _run_controller(
        ModelPredictiveControllerTime, traj, veh)

    assert abs(steer) < 0.02
    n = np.array([-np.sin(heading), np.cos(heading)])
    lat = (np.asarray(con_traj.x) - UTM_X) * n[0] \
        + (np.asarray(con_traj.y) - UTM_Y) * n[1]
    assert np.max(np.abs(lat)) < 0.1, np.max(np.abs(lat))


def test_dead_time_compensation_runs_and_predicts_forward():
    """Regression: the dead-time loop mutates Solver.dynamics results in
    place (mpc:172-177) — they must be writable — and the compensated
    state must advance along the reference by roughly v * dead_time."""
    from tpl_tpu.control.model_predictive_controller import (
        ModelPredictiveController)

    heading, v = 0.3, 10.0
    traj = _make_straight_traj(heading, v)

    veh = VehicleState()
    veh.x, veh.y = UTM_X, UTM_Y
    veh.phi = heading
    veh.v = v
    veh.dead_time_steer = 0.05
    veh.dead_time_acc = 0.05

    ctrl, (acc, steer), con_traj = _run_controller(
        ModelPredictiveController, traj, veh, steps=10)

    assert abs(steer) < 0.02
    dtt = ctrl.dead_time_trajectory
    assert len(dtt) >= 2
    # forward-integrated dead-time trajectory advances ~v * dead_time
    adv = np.hypot(dtt[-1, 1] - dtt[0, 1], dtt[-1, 2] - dtt[0, 2])
    assert 0.2 < adv < 1.5, adv
