"""
Control application: controller registry, emergency routing to the
constant-deceleration fallback, per-tick control statistics.
(reference: library/tpl/application/control_app.py)
"""

import time
import copy
import os.path as osp

import numpy as np
from scipy.interpolate import interp1d

from tpl_tpu import util
from tpl_tpu.control import BaseController
from tpl_tpu.planning import Trajectory
from tpl_tpu.environment import VehicleState
from tpl_tpu.util import (
    get_subclasses_recursive, to_snake_case, StoreRegistry, Bundle,
    project, short_angle_dist, snapshot,
)


class ControlInput:

    def __init__(self):
        self.t = 0.0
        self.vehicle = VehicleState()
        self.trajectory = Trajectory()


class ControlStats:

    def __init__(self):
        self.runtime = 0.0
        self.err_d_lat = 0.0
        self.err_vel = 0.0
        self.err_heading = 0.0


class ControlApp:

    def __init__(self, app_id="", control_params_path=None):
        self.app_id = app_id

        self.sh_input = StoreRegistry.get(f"/{self.app_id}tpl_control_input")
        with self.sh_input.lock():
            ci = ControlInput()
            self.sh_input.t = ci.t
            self.sh_input.vehicle = ci.vehicle
            self.sh_input.trajectory = ci.trajectory

        self.controllers = {}
        controller_classes = [BaseController] + [
            cls for cls in get_subclasses_recursive(BaseController)
            if not cls.__dict__.get("ABSTRACT", False)]
        controller_names = [to_snake_case(cls.__name__)
                            for cls in controller_classes]

        self.sh_controllers = StoreRegistry.get(f"/{self.app_id}tpl_control")

        with self.sh_controllers.lock():
            self.sh_controllers.storage = "default"
            self.sh_controllers.runtime = 0.0
            self.sh_controllers.stats = ControlStats()
            self.sh_controllers.controls = (0.0, 0.0)
            self.sh_controllers.active_controller = controller_names[0]
            self.sh_controllers.active_controller_state = Bundle()
            self.sh_controllers.controller_names = controller_names
            for cls in controller_classes:
                name = to_snake_case(cls.__name__)
                setattr(self.sh_controllers, name, Bundle())
                state = getattr(self.sh_controllers, name)
                self.controllers[name] = cls(state, self.sh_controllers.lock)
            load_control_params(self.sh_controllers, control_params_path)

    def calc_stats(self, con_input, runtime):
        """lat/heading/velocity error via projection.
        (control_app.py:92-110)"""
        veh = con_input.vehicle
        traj = con_input.trajectory

        stats = ControlStats()
        stats.runtime = runtime
        if len(traj.time) < 2:
            return stats

        traj_path = np.vstack([traj.x, traj.y]).T
        ivel = interp1d(traj.s, traj.velocity, fill_value="extrapolate")
        proj = project(traj_path, np.array([veh.x, veh.y]))

        stats.err_d_lat = proj.distance
        stats.err_heading = short_angle_dist(proj.angle, veh.phi)
        stats.err_vel = float(ivel(proj.arc_len)) - veh.v
        return stats

    def update(self):
        runtime_start = time.perf_counter()

        with self.sh_input.lock():
            con_input = ControlInput()
            con_input.t = self.sh_input.t
            con_input.vehicle = snapshot(self.sh_input.vehicle)
            con_input.trajectory = snapshot(self.sh_input.trajectory)

        if con_input.trajectory.emergency:
            controller = self.controllers["const_acc_controller"]
        else:
            with self.sh_controllers.lock():
                active_controller = self.sh_controllers.active_controller
            controller = self.controllers.get(
                active_controller, self.controllers["base_controller"])

        controls, control_traj = controller.update(con_input)
        runtime = time.perf_counter() - runtime_start
        stats = self.calc_stats(con_input, runtime)

        with self.sh_controllers.lock():
            self.sh_controllers.runtime = runtime
            self.sh_controllers.stats = stats
            self.sh_controllers.controls = controls
            self.sh_controllers.control_trajectory = control_traj


def load_control_params(sh_controllers, path=None):
    if path is None:
        path = getattr(sh_controllers, "storage", "default")
    if not path:
        return
    abs_path = util.resolve_data("params", osp.join("control", path))
    data = util.load_state_dict(abs_path)
    if data is None:
        return
    if "active_controller" in data:
        sh_controllers.active_controller = data["active_controller"]
    for name, sub in data.items():
        if not isinstance(sub, dict) or "params" not in sub:
            continue
        state = getattr(sh_controllers, name, None)
        if state is not None and hasattr(state, "params"):
            util.merge_into(state.params, sub["params"])
    sh_controllers.storage = path


def save_control_params(sh_controllers):
    params = Bundle()
    params.active_controller = sh_controllers.active_controller
    for cn in sh_controllers.controller_names:
        state = getattr(sh_controllers, cn, None)
        if state is not None and hasattr(state, "params"):
            params[cn] = Bundle(params=snapshot(state.params))
    abs_path = osp.join(util.PATH_PARAMS, "control", sh_controllers.storage)
    util.save_state_dict(params, abs_path)
