"""
Simulation state containers and scenario persistence.
(reference: library/tpl/simulation/state.py)
"""

import os
import sys
import uuid
import types
import importlib.util

import numpy as np

from tpl_tpu import util


class SimIdmParams:

    def __init__(self):
        self.time_headway = 1.5
        self.gap_min = 2.0
        self.a = 1.5
        self.b = 3.0
        self.delta = 4.0


class SimCar:

    def __init__(self):
        self.uuid = uuid.uuid4().hex
        self.map_uuid = ""

        self.x = 0.0
        self.y = 0.0
        self.yaw = 0.0
        self.width = 2.0
        self.length = 4.0

        self.proj = None
        self.reverse = False

        self.v = 10.0
        self.target_v = 10.0
        self.target_change_dt = -1.0
        self.target_last_change_t = 0.0
        self.target_v_low = 5.0
        self.target_v_high = 20.0

        self.use_route_velocity = False
        self.react_to_curvature = False
        self.max_lat_acc = 2.0

        self.use_idm = False
        self.params_idm = SimIdmParams()

        self.noise_x = 0.0
        self.noise_y = 0.0
        self.noise_yaw = 0.0
        self.noise_v = 0.0
        self.noise_hull = 0.0

        self.evade = ""

    @staticmethod
    def get_convex_hull(self):
        l = self.length
        w = self.width
        pts = np.array([[l / 2, w / 2], [l / 2, -w / 2],
                        [-l / 2, -w / 2], [-l / 2, w / 2]])
        c, s = np.cos(self.yaw), np.sin(self.yaw)
        rot = np.array([[c, -s], [s, c]])
        return pts @ rot.T + np.array([self.x, self.y])


class SimEgo:

    def __init__(self):
        self.x = 0.0
        self.y = 0.0
        self.yaw = 0.0

        self.v = 0.0
        self.a = 0.0
        self.min_v = 0.0
        self.max_v = 100.0

        self.steer_angle = 0.0
        self.max_steer_angle = np.radians(40.96)

        self.acc_dead_time = 0.0
        self.steer_dead_time = 0.0

        self.control_acc = 0.0
        self.control_steer = 0.0

        self.width = 1.89
        self.length = 5.1

        self.wheel_base = 3.165
        self.cog_axes_ratio = 0.5

        self.rear_to_rear_axis = 2.665 - (self.wheel_base
                                          * self.cog_axes_ratio)
        self.front_to_front_axis = 2.23 - (self.wheel_base
                                           * (1.0 - self.cog_axes_ratio))

        self.track_width = 1.6
        self.v_ch = 32.0

    @staticmethod
    def get_convex_hull(self):
        pts = np.array([
            (-self.rear_to_rear_axis, -self.width / 2),
            (self.wheel_base + self.front_to_front_axis, -self.width / 2),
            (self.wheel_base + self.front_to_front_axis, self.width / 2),
            (-self.rear_to_rear_axis, self.width / 2),
            (-self.rear_to_rear_axis, -self.width / 2)])
        c, s = np.cos(self.yaw), np.sin(self.yaw)
        rot = np.array([[c, -s], [s, c]])
        return pts @ rot.T + np.array([self.x, self.y])


class SimTrafficLight:

    UNKNOWN = -1
    RED = 0
    YELLOW = 1
    GREEN = 2

    def __init__(self):
        self.uuid = uuid.uuid4().hex
        self.x = 0.0
        self.y = 0.0
        self.state = SimTrafficLight.UNKNOWN


class SimTimeConstraint:

    def __init__(self):
        self.uuid = uuid.uuid4().hex
        self.x = 0.0
        self.y = 0.0
        self.t_min = 0.0
        self.t_max = 10.0 ** 10


class SimSettings:

    def __init__(self):
        self.running = False
        self.reload_requested = True
        self.single_step_requested = False
        self.reload_if_finished = False

        self.use_real_time = True
        self.fixed_time_step = 0.01
        self.int_step = 0.005

        self.update_logic = True
        self.update_vehicle_state = True
        self.update_dynamic_objects = True

        self.set_env_time = True
        self.set_env_vehicle_state = True
        self.set_env_dynamic_objects = True
        self.set_env_dynamic_objects_dt = 0.01
        self.set_env_traffic_lights = True
        self.set_env_time_constraints = True


class SimRuleViolation:

    COLLISION = 0
    OFF_ROAD = 1
    WRONG_WAY = 2
    SPEED_LIMIT = 3

    def __init__(self, t, kind, msg=""):
        self.t = t
        self.kind = kind
        self.msg = msg

    def __repr__(self):
        names = {0: "COLLISION", 1: "OFF_ROAD", 2: "WRONG_WAY",
                 3: "SPEED_LIMIT"}
        return f"SimRuleViolation(t={self.t:.2f}, {names[self.kind]}, {self.msg})"


class SimRuleChecker:

    def __init__(self):
        self.enable = False
        self.off_road_dist_limit = 1.0
        self.v_max_tol = 1.0
        self.violations = []


class SimState:

    def __init__(self):
        self.t = 0.0
        self.finished = False

        self.map_store_path = ""
        self.selected_map = ""
        self.available_maps = []

        self.init_env_params = ""
        self.init_planning_params = ""
        self.init_control_params = ""

        self.ego = SimEgo()
        self.cars = []
        self.traffic_lights = []
        self.time_constraints = []

        self.rule_checker = SimRuleChecker()
        self.settings = SimSettings()

        self.manager = None


def _install_manager_shims():
    """Let scenario manager.py files importing the reference's module names
    resolve against this framework."""
    import tpl_tpu.simulation.state as state_mod

    if "tpl" in sys.modules and getattr(
            sys.modules["tpl"], "__tpl_tpu_shim__", False) is False:
        return

    tpl = types.ModuleType("tpl")
    tpl.__tpl_tpu_shim__ = True
    sim_pkg = types.ModuleType("tpl.simulation")
    sim_state = types.ModuleType("tpl.simulation.state")
    for name in ("SimCar", "SimEgo", "SimTrafficLight", "SimTimeConstraint",
                 "SimState", "SimSettings", "SimIdmParams"):
        setattr(sim_state, name, getattr(state_mod, name))
    sim_pkg.state = sim_state
    tpl.simulation = sim_pkg
    sys.modules.setdefault("tpl", tpl)
    sys.modules["tpl.simulation"] = sim_pkg
    sys.modules["tpl.simulation.state"] = sim_state


def _merge_sim(sim, data):
    """Merge a decoded scenario dict into a SimState, rebuilding typed
    lists (cars/traffic lights/time constraints)."""
    plain = {k: v for k, v in data.items()
             if k not in ("ego", "cars", "traffic_lights",
                          "time_constraints", "rule_checker", "settings")}
    util.merge_into(sim, plain)
    util.merge_into(sim.ego, data.get("ego"))
    util.merge_into(sim.rule_checker, data.get("rule_checker"))
    util.merge_into(sim.settings, data.get("settings"))

    sim.cars = []
    for c in data.get("cars", []) or []:
        car = SimCar()
        util.merge_into(car, {k: v for k, v in c.items()
                              if k != "params_idm"})
        util.merge_into(car.params_idm, c.get("params_idm"))
        car.proj = None
        sim.cars.append(car)

    sim.traffic_lights = []
    for tl in data.get("traffic_lights", []) or []:
        stl = SimTrafficLight()
        util.merge_into(stl, tl)
        sim.traffic_lights.append(stl)

    sim.time_constraints = []
    for tc in data.get("time_constraints", []) or []:
        stc = SimTimeConstraint()
        util.merge_into(stc, tc)
        sim.time_constraints.append(stc)

    return sim


def save_sim_state(sim, path):
    """Freeze a SimState as a scenario directory (state.json).

    The reference's scenarios are literally frozen SimStates that resume
    mid-scene (reference: state.py:316-337, e.g.
    data/scenarios/default/state.json) — saving a running sim yields a
    scenario that restarts exactly there.  ``path`` is resolved relative
    to the primary scenarios root unless absolute.  Runtime-only fields
    (manager, car projections, available_maps) are stripped.
    """
    d = dict(sim.__dict__)
    d.pop("manager", None)
    d.pop("available_maps", None)
    cars = []
    for c in d.get("cars", []):
        cd = dict(c.__dict__)
        cd.pop("proj", None)
        cars.append(cd)
    d["cars"] = cars
    # a frozen mid-run state must not immediately terminate or reload
    d["finished"] = False
    if not os.path.isabs(path):
        path = os.path.join(util.PATH_SCENARIOS, path)
    util.save_state_dict(d, path)
    return path


def load_sim_state(path):
    """Load a scenario directory (state.json + optional manager.py).
    (reference: state.py:329-348)"""
    full = util.resolve_data("scenarios", path)
    data = util.load_state_dict(full)
    if data is None:
        return None

    sim = SimState()
    _merge_sim(sim, data)

    manager_path = os.path.join(full, "manager.py")
    if os.path.exists(manager_path):
        _install_manager_shims()
        module_name = "tpl_tpu_scenario_" + path.replace("/", "_").replace(
            "-", "_")
        spec = importlib.util.spec_from_file_location(
            module_name, manager_path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[module_name] = module
        spec.loader.exec_module(module)
        sim.manager = module.SimulationManager(sim)

    return sim
