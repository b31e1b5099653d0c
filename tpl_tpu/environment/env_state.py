"""Environment state container.
(reference: library/tpl/environment/env_state.py)"""

import copy

import numpy as np

from tpl_tpu import util
from tpl_tpu.ops import project, short_angle_dist
from tpl_tpu.environment.vehicle_state import VehicleState
from tpl_tpu.util import snapshot


class EnvironmentState:

    def __init__(self):
        self.full_reset()

    def reset(self):
        self.reset_counter += 1
        self.local_map = None

    def full_reset(self):
        self.t = 0.0

        self.reset_counter = 1
        """Incremented when something fundamental changed; planners use it
        to invalidate warm starts."""

        self.vehicle_state = VehicleState()

        self.map_store_path = ""
        self.maps = util.Bundle()
        self.selected_map = ""
        self.local_map = None
        self.local_map_behind = None

        self.tl_dets = util.Bundle()
        self.ir_pc_dets = []
        self.tracks = util.Bundle()
        self.predicted = []
        self.cpms = []
        self.overtake_obj = []
        self.man_cam_ids = []

        self.man_time_cons = []
        """maneuver time constraints: list of (pos, t_min, t_max)"""

        self.man_vel_cons = []
        """maneuver velocity constraints: list of (pos0, pos1, v_max)"""

    def set_selected_map(self, name_or_uuid):
        for k, v in util.get_obj_dict(self.maps).items():
            if k == name_or_uuid or v.name == name_or_uuid:
                self.selected_map = k
                self.reset()
                return True
        return False

    def auto_select_map(self):
        min_map = None
        min_proj = None
        for k, v in util.get_obj_dict(self.maps).items():
            proj = project(v.path[:, :2],
                           (self.vehicle_state.x, self.vehicle_state.y))
            if not proj.in_bounds:
                continue
            if np.degrees(abs(short_angle_dist(
                    proj.angle, self.vehicle_state.phi))) > 30.0:
                continue
            if min_proj is None or abs(proj.distance) < abs(min_proj.distance):
                min_map = v
                min_proj = proj
        if min_map is not None:
            self.selected_map = min_map.uuid

    def get_current_map(self):
        return util.get_obj_dict(self.maps).get(self.selected_map)

    def get_relevant_maps(self):
        """local_map_behind + in-bounds intersection path segments."""
        if self.local_map is None:
            return []
        maps = [self.local_map_behind]
        for ip in self.local_map.intersection_paths:
            p = project(self.local_map.path[:, :2], ip.stop_pos)
            if p.in_bounds and ip.map_segment is not None:
                maps.append(ip.map_segment)
        return maps

    def get_all_tracks(self):
        dyn_objs = []
        for v in util.get_obj_dict(self.tracks).values():
            dyn_objs += snapshot(v)
        dyn_objs += snapshot(self.cpms)
        return dyn_objs


def SharedEnvironmentState():
    """Lock-wrapped EnvironmentState (make_class_shared analog)."""
    return util.SharedObject(EnvironmentState())
