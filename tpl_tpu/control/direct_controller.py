"""Trajectory passthrough controller: interpolates acceleration and
curvature-derived steering directly from the planned trajectory.
(reference: library/tpl/control/direct_controller.py)"""

import copy

import numpy as np
from scipy.interpolate import interp1d

from tpl_tpu.control.base_controller import BaseController
from tpl_tpu.planning.trajectory import Trajectory
from tpl_tpu.util import snapshot


class Params:

    def __init__(self):
        self.a_max = 3.0
        self.a_min = -3.0
        self.steer_rate_max_abs = 1.0


class DirectController(BaseController):

    def __init__(self, shared, lock_shared):
        self.shared = shared
        self.lock_shared = lock_shared

        with self.lock_shared():
            self.shared.params = Params()

        self.con_traj = Trajectory()
        self.last_update_time = 0.0
        self.acc = 0.0
        self.steering_angle = 0.0

    def update(self, con_input):
        t = con_input.t
        veh = con_input.vehicle
        traj = con_input.trajectory

        self.con_traj = Trajectory()
        self.con_traj.x = np.array([veh.x])
        self.con_traj.y = np.array([veh.y])

        dt = t - self.last_update_time
        self.last_update_time = t
        if dt == 0 or len(traj.time) < 2:
            return (self.acc, self.steering_angle), self.con_traj

        with self.lock_shared():
            params = snapshot(self.shared.params)

        t_clip = min(traj.time[-1],
                     max(traj.time[0], t + veh.dead_time_steer))

        acc = float(interp1d(traj.time, traj.acceleration,
                             fill_value="extrapolate")(t_clip))
        steering_angle = float(np.arctan(
            interp1d(traj.time, traj.curvature,
                     fill_value="extrapolate")(t_clip) * veh.wheel_base))

        self.acc = min(params.a_max, max(params.a_min, acc))
        self.steering_angle = min(veh.delta_max,
                                  max(-veh.delta_max, steering_angle))

        return (self.acc, self.steering_angle), self.con_traj
