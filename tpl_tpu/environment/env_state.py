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
        match = next((k for k, v in util.get_obj_dict(self.maps).items()
                      if name_or_uuid in (k, v.name)), None)
        if match is None:
            return False
        self.selected_map = match
        self.reset()
        return True

    def auto_select_map(self):
        """Select the map the vehicle is on: in its corridor, roughly
        aligned with its heading (<= 30 deg), closest laterally."""
        veh = self.vehicle_state
        candidates = []
        for k, v in util.get_obj_dict(self.maps).items():
            proj = project(v.path[:, :2], (veh.x, veh.y))
            off = abs(short_angle_dist(proj.angle, veh.phi))
            if proj.in_bounds and np.degrees(off) <= 30.0:
                candidates.append((abs(proj.distance), v.uuid))
        if candidates:
            self.selected_map = min(candidates)[1]

    def get_current_map(self):
        return util.get_obj_dict(self.maps).get(self.selected_map)

    def get_relevant_maps(self):
        """local_map_behind + in-bounds intersection path segments."""
        if self.local_map is None:
            return []
        path = self.local_map.path[:, :2]
        segs = [ip.map_segment
                for ip in self.local_map.intersection_paths
                if ip.map_segment is not None
                and project(path, ip.stop_pos).in_bounds]
        return [self.local_map_behind, *segs]

    def get_all_tracks(self):
        banks = list(util.get_obj_dict(self.tracks).values()) + [self.cpms]
        return [obj for bank in banks for obj in snapshot(bank)]


def SharedEnvironmentState():
    """Lock-wrapped EnvironmentState (make_class_shared analog)."""
    return util.SharedObject(EnvironmentState())
