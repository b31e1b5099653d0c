"""
Map data model: global maps with boundaries and items, the sliding-window
local map, map-store loading, and per-tick map item logic.

(reference: library/tpl/environment/map_module.py — Map/LocalMap:161-240,
copy_map_segment:243-280, reinit_map:283-421, update_local_map:462-530,
velocity logic:533-629, update_map_items:632-811, load_map_store:822-851)
"""

import os
import uuid
import traceback

import numpy as np

from tpl_tpu import util
from tpl_tpu.ops import (
    project, resample, interp_resampled_path, smooth_path_positions,
    curv_to_vel_profile, zero_after_first_zero, add_vel_constraint,
    intersect_polygons, short_angle_dist,
)


class VelocityLimit:

    def __init__(self):
        self.__tag__ = "velocity_limit"
        self.uuid = uuid.uuid4().hex
        self.pos = np.array([0.0, 0.0])
        self.limit = 0.0
        self.length = 20.0
        self.min_distance = 1.0
        self.proj = util.Projection()
        self.active = True

    def __savestate__(self):
        s = self.__dict__.copy()
        s.pop("proj", None)
        s.pop("active", None)
        return s


class TrafficLight(VelocityLimit):

    RED = 0
    YELLOW = 1
    GREEN = 2
    NONE = 3

    def __init__(self):
        super().__init__()
        self.__tag__ = "traffic_light"
        self.uuid = uuid.uuid4().hex
        self.light_pos = np.array([0.0, 0.0])
        self.detection_radius = 1.0
        self.t = 0.0
        self.state = TrafficLight.NONE
        self.can_stop = False


class CrossWalk(VelocityLimit):

    def __init__(self):
        super().__init__()
        self.__tag__ = "cross_walk"
        self.uuid = uuid.uuid4().hex
        self.corners = np.zeros((0,))
        self.free_limit = 10.0


class TurnIndPoint:

    OFF = 0
    RIGHT = -1
    LEFT = 1
    HAZARD = 2

    def __init__(self):
        self.__tag__ = "turn_ind_point"
        self.uuid = uuid.uuid4().hex
        self.pos = np.array([0.0, 0.0])
        self.dir = TurnIndPoint.OFF
        self.activation_radius = 2.0


class MapSwitchPoint:

    def __init__(self):
        self.__tag__ = "map_switch_point"
        self.uuid = uuid.uuid4().hex
        self.pos = np.array([0.0, 0.0])
        self.trigger_divisor = 1
        self.triggers = 0
        self.activation_radius = 5.0
        self.in_radius = False
        self.target_uuid = ""


class IntersectionPath:

    def __init__(self, pos=None):
        self.__tag__ = "intersection_path"
        self.uuid = uuid.uuid4().hex
        pos = np.zeros(2) if pos is None else pos
        self.pos = pos
        self.stop_pos = pos + np.array([2.0, 2.0])
        self.stop_proj = util.Projection()
        self.intersection_map_uuid = ""
        self.map_segment = None
        self.map_segment_step_size = 2.0
        self.offset_path_begin = -20
        self.offset_path_end = 20
        self.stop = True
        self.d_decision = 30.0
        self.gap_acceptance = 5.0
        self.gap_rejection = 3.0

    def __savestate__(self):
        s = self.__dict__.copy()
        s.pop("stop_proj", None)
        s.pop("map_segment", None)
        return s


_ITEM_CLASSES = {
    "velocity_limit": VelocityLimit,
    "traffic_light": TrafficLight,
    "cross_walk": CrossWalk,
    "turn_ind_point": TurnIndPoint,
    "map_switch_point": MapSwitchPoint,
    "intersection_path": IntersectionPath,
}


class Map:

    def __init__(self, name="unnamed_map"):
        self.__tag__ = "map"
        self.name = name
        self.uuid = uuid.uuid4().hex

        self.velocity_limits = []
        self.turn_ind_points = []
        self.map_switch_points = []
        self.intersection_paths = []

        # dims: x, y, d_left, d_right, speed_limit, altitude
        self.control_points = np.zeros((0, 6))
        self.smoothing = 0.0
        self.step_size_discr = 0.5
        self.closed_path = False

        # computed by reinit_map
        # discretized path, dims: x, y, orientation, s, curvature, speed_limit
        self.path = None
        self.boundary_left = None
        self.boundary_right = None
        self.d_left = None
        self.d_right = None
        self.altitude = None
        self.route = None   # deprecated input format

    def __str__(self):
        return self.name

    def __savestate__(self):
        """Persist only source fields; path/boundaries are recomputed by
        reinit_map on load."""
        keep = ("__tag__", "name", "uuid", "velocity_limits",
                "turn_ind_points", "map_switch_points",
                "intersection_paths", "control_points", "smoothing",
                "step_size_discr", "closed_path")
        return {k: self.__dict__[k] for k in keep if k in self.__dict__}


class LocalMap(Map):

    def __init__(self):
        super().__init__("local_map")
        # sliding window configuration (map_module.py:218-240)
        self.steps_ref = 400
        self.step_size_ref = 0.5
        self.idx_start_ref = 0
        self.shift_idx_start_ref = 0
        self.shift_vel_lim = 0
        self.update_inters_paths = False
        self.step_shift_idx = 2
        self.position_vehicle = 0.0


def copy_map_segment(dst_map, src_map, step_size, steps, start_idx):
    """Resample a window of src_map into dst_map. (map_module.py:243-280)"""
    try:
        rsi = resample(src_map.path[:, :2], step_size, steps, start_idx,
                       closed=src_map.closed_path)
    except RuntimeError:
        return False

    dst_map.path = interp_resampled_path(
        src_map.path, rsi, step_size, steps,
        zero_vel_at_end=not src_map.closed_path,
        closed=src_map.closed_path)

    alpha = rsi[:, 2]
    alpha_inv = 1.0 - alpha
    idx_prev = rsi[:, 3].astype(int)
    idx_next = rsi[:, 4].astype(int)

    d_left = np.asarray(src_map.d_left).reshape(-1)
    d_right = np.asarray(src_map.d_right).reshape(-1)
    dst_map.d_left = d_left[idx_prev] * alpha_inv + d_left[idx_next] * alpha
    dst_map.d_right = d_right[idx_prev] * alpha_inv + d_right[idx_next] * alpha

    cos_orth = np.cos(dst_map.path[:, 2] + np.pi / 2)
    sin_orth = np.sin(dst_map.path[:, 2] + np.pi / 2)

    dst_map.boundary_left = dst_map.path[:, :2].copy()
    dst_map.boundary_right = dst_map.path[:, :2].copy()
    dst_map.boundary_left[:, 0] += dst_map.d_left * cos_orth
    dst_map.boundary_left[:, 1] += dst_map.d_left * sin_orth
    dst_map.boundary_right[:, 0] -= dst_map.d_right * cos_orth
    dst_map.boundary_right[:, 1] -= dst_map.d_right * sin_orth
    return True


def reinit_map(cmap):
    """Discretize control points into path/boundaries. (map_module.py:283-421)"""
    cps_in = np.asarray(cmap.control_points, dtype=np.float64)

    if len(cps_in) == 0:
        cmap.path = np.zeros((0, 6))
        cmap.boundary_left = np.zeros((0, 2))
        cmap.boundary_right = np.zeros((0, 2))
        cmap.d_left = np.zeros(0)
        cmap.d_right = np.zeros(0)
        return

    if len(cps_in) == 1:
        cmap.path = np.array([[cps_in[0, 0], cps_in[0, 1], 0.0, 0.0, 0.0,
                               cps_in[0, 4]]])
        cmap.boundary_left = cps_in[:, :2] + np.array([[0.0, cps_in[0, 2]]])
        cmap.boundary_right = cps_in[:, :2] - np.array([[0.0, cps_in[0, 3]]])
        cmap.d_left = np.array([cps_in[0, 2]])
        cmap.d_right = np.array([cps_in[0, 3]])
        return

    if cmap.closed_path:
        cps = np.vstack([cps_in, cps_in[0]])
    else:
        cps = cps_in

    step_size = max(0.1, min(5.0, cmap.step_size_discr))
    len_path = np.sum(np.linalg.norm(np.diff(cps[:, :2], axis=0), axis=1))
    steps = int(len_path / step_size)

    try:
        rsi = resample(cps[:, :2], step_size, steps, closed=cmap.closed_path)
    except RuntimeError:
        return

    alpha = rsi[:, 2]
    alpha_inv = 1.0 - alpha
    idx_prev = rsi[:, 3].astype(int)
    idx_next = rsi[:, 4].astype(int)

    cmap.d_left = cps[idx_prev, 2] * alpha_inv + cps[idx_next, 2] * alpha
    cmap.d_right = cps[idx_prev, 3] * alpha_inv + cps[idx_next, 3] * alpha
    cmap.altitude = cps[idx_prev, 5] * alpha_inv + cps[idx_next, 5] * alpha

    diffs = np.diff(cps[:, :2], axis=0)
    angles = np.zeros(cps.shape[0])
    angles[:-1] = np.arctan2(diffs[:, 1], diffs[:, 0])
    angles[-1] = angles[0] if cmap.closed_path else angles[-2]

    path = np.zeros((cps.shape[0], 6))
    path[:, :2] = cps[:, :2]
    path[:, 2] = angles
    path[:, 5] = cps[:, 4]

    path = interp_resampled_path(path, rsi, step_size, steps, False,
                                 cmap.closed_path)

    if cmap.smoothing > 1e-5:
        xys = smooth_path_positions(
            rsi[:, :2], step_size, 0.0, 10.0 * cmap.smoothing,
            1000.0 * cmap.smoothing, cmap.closed_path)

        len_path = np.sum(np.linalg.norm(np.diff(xys, axis=0), axis=1))
        steps = int(len_path / step_size)
        try:
            rsi = resample(xys, step_size, steps, closed=cmap.closed_path)
        except RuntimeError:
            return

        alpha = rsi[:, 2]
        alpha_inv = 1.0 - alpha
        idx_prev = rsi[:, 3].astype(int)
        idx_next = rsi[:, 4].astype(int)

        cmap.d_left = (cmap.d_left[idx_prev] * alpha_inv
                       + cmap.d_left[idx_next] * alpha)
        cmap.d_right = (cmap.d_right[idx_prev] * alpha_inv
                        + cmap.d_right[idx_next] * alpha)
        cmap.altitude = (cmap.altitude[idx_prev] * alpha_inv
                         + cmap.altitude[idx_next] * alpha)

        diffs = np.diff(xys[:, :2], axis=0)
        angles = np.zeros(xys.shape[0])
        angles[:-1] = np.arctan2(diffs[:, 1], diffs[:, 0])
        angles[-1] = angles[0] if cmap.closed_path else angles[-2]

        prev_path = path
        path = np.zeros((xys.shape[0], 6))
        path[:, :2] = xys
        path[:, 2] = angles
        path[:, 5] = prev_path[:len(xys), 5] if len(prev_path) >= len(xys) \
            else np.r_[prev_path[:, 5],
                       np.full(len(xys) - len(prev_path), prev_path[-1, 5])]

        path = interp_resampled_path(path, rsi, step_size, steps, False,
                                     cmap.closed_path)

    cmap.path = path

    cos_orth = np.cos(cmap.path[:, 2] + np.pi / 2)
    sin_orth = np.sin(cmap.path[:, 2] + np.pi / 2)

    cmap.boundary_left = cmap.path[:, :2].copy()
    cmap.boundary_right = cmap.path[:, :2].copy()
    cmap.boundary_left[:, 0] += cmap.d_left * cos_orth
    cmap.boundary_left[:, 1] += cmap.d_left * sin_orth
    cmap.boundary_right[:, 0] -= cmap.d_right * cos_orth
    cmap.boundary_right[:, 1] -= cmap.d_right * sin_orth


def reinit_map_items(cmap, map_store):
    maps = util.get_obj_dict(map_store)
    for ip in cmap.intersection_paths:
        if ip.intersection_map_uuid in maps:
            reinit_intersection_path(ip, cmap, maps)


def reinit_intersection_path(ip, cmap, maps):
    """(map_module.py:435-459)"""
    ip.map_segment_step_size = max(0.1, ip.map_segment_step_size)
    src_map = maps[ip.intersection_map_uuid]
    proj = project(src_map.path[:, :2], ip.pos)

    if src_map.closed_path:
        steps = (ip.offset_path_end - ip.offset_path_begin) % len(src_map.path)
    else:
        ip.offset_path_end = max(ip.offset_path_begin + 1, ip.offset_path_end)
        steps = ip.offset_path_end - ip.offset_path_begin

    f = src_map.step_size_discr / ip.map_segment_step_size
    steps = max(1, int(abs(steps) * f))
    start_idx = proj.index + ip.offset_path_begin

    ip.map_segment = Map()
    ip.map_segment.name = src_map.name
    copy_map_segment(ip.map_segment, src_map, ip.map_segment_step_size,
                     steps, start_idx)


def update_local_map(env):
    """Sliding-window local map update. (map_module.py:462-530)"""
    cmap = env.get_current_map()
    if cmap is None:
        env.local_map = None
        return

    veh = env.vehicle_state

    if env.local_map is None:
        proj_path_ref = None
        env.local_map = LocalMap()
        env.local_map_behind = Map()
        env.local_map_behind.name = "local_map_behind"
        on_map = False
    else:
        proj_path_ref = project(env.local_map.path[:, :2], (veh.x, veh.y))
        d_r = -env.local_map.d_right[proj_path_ref.index]
        d_l = env.local_map.d_left[proj_path_ref.index]
        on_map = ((d_r <= proj_path_ref.distance <= d_l)
                  and proj_path_ref.in_bounds)

    local_map = env.local_map
    local_map.velocity_limits = cmap.velocity_limits
    local_map.turn_ind_points = cmap.turn_ind_points
    local_map.map_switch_points = cmap.map_switch_points
    local_map.intersection_paths = cmap.intersection_paths

    local_map.shift_idx_start_ref = 0
    veh_pos_steps = int(local_map.position_vehicle // local_map.step_size_ref)

    if not on_map:
        proj_route = project(cmap.path[:, :2], (veh.x, veh.y))
        local_map.idx_start_ref = proj_route.start
        env.reset_counter += 1
    elif abs(proj_path_ref.start - veh_pos_steps) > local_map.step_shift_idx:
        shift = ((proj_path_ref.start - veh_pos_steps)
                 // local_map.step_shift_idx)
        local_map.shift_idx_start_ref = shift * local_map.step_shift_idx
        local_map.idx_start_ref += shift * local_map.step_shift_idx
        if cmap.closed_path:
            local_map.idx_start_ref %= len(cmap.path)
        else:
            local_map.idx_start_ref = max(
                0, min(len(cmap.path), local_map.idx_start_ref))

    if not copy_map_segment(local_map, cmap, local_map.step_size_ref,
                            local_map.steps_ref, local_map.idx_start_ref):
        return

    idx_behind = local_map.idx_start_ref - local_map.steps_ref
    if cmap.closed_path:
        idx_behind %= len(cmap.path)
    else:
        idx_behind = max(0, min(len(cmap.path), idx_behind))

    if not copy_map_segment(env.local_map_behind, cmap,
                            local_map.step_size_ref,
                            local_map.steps_ref * 2, idx_behind):
        return

    local_map.steps_ref = len(local_map.path)


def update_local_map_velocity(env):
    """(map_module.py:573-599)"""
    cmap = env.local_map
    if cmap is None:
        return

    v_lim = curv_to_vel_profile(cmap.path[:, 4], cmap.path[:, 5],
                                env.vehicle_state.a_lat_max)

    for vl in cmap.velocity_limits:
        if not vl.active:
            continue
        if not vl.proj.in_bounds:
            continue
        if abs(vl.proj.distance) > vl.min_distance:
            continue
        add_vel_constraint(v_lim, vl.proj.start, vl.limit, vl.length,
                           cmap.shift_vel_lim)

    cmap.path[:, 5] = v_lim


def update_local_map_inters_paths(env):
    """(map_module.py:602-629)"""
    cmap = env.local_map
    if cmap is None or not cmap.update_inters_paths:
        return

    v_lim = cmap.path[:, 5]
    for ip in cmap.intersection_paths:
        if not ip.stop_proj.in_bounds:
            continue
        if abs(ip.stop_proj.distance) > 1.0:
            continue
        if not ip.stop:
            continue
        add_vel_constraint(v_lim, ip.stop_proj.start, max_vel=0.0,
                           length=10, shift=cmap.shift_vel_lim)
    cmap.path[:, 5] = v_lim


def update_map_items(env):
    """Map switch points, turn indicators, velocity limits, traffic lights,
    crosswalks, intersection gap acceptance. (map_module.py:632-811)"""
    cmap = env.local_map
    if cmap is None:
        return

    veh = env.vehicle_state
    veh_pos = np.array([veh.x, veh.y])
    proj_veh = project(env.local_map.path[:, :2], veh_pos)

    for msp in cmap.map_switch_points:
        if np.linalg.norm(msp.pos - veh_pos) < msp.activation_radius:
            if not msp.in_radius:
                msp.triggers += 1
                if msp.triggers % msp.trigger_divisor == 0:
                    env.selected_map = msp.target_uuid
                    env.reset_counter += 1
            msp.in_radius = True
        else:
            msp.in_radius = False

    veh.turn_indicator = 0
    for tip in cmap.turn_ind_points:
        if np.linalg.norm(tip.pos - veh_pos) < tip.activation_radius:
            veh.turn_indicator = tip.dir

    velocity_limits_path_ref = []

    for vl in cmap.velocity_limits:
        vl.proj = project(env.local_map.path[:, :2], vl.pos)
        on_ref_path = vl.proj.in_bounds and abs(vl.proj.distance) <= \
            vl.min_distance
        if on_ref_path:
            velocity_limits_path_ref.append(vl)

        if vl.__tag__ == "velocity_limit":
            if not on_ref_path:
                vl.active = True

        elif vl.__tag__ == "cross_walk":
            if not on_ref_path:
                continue
            stop = False
            only_stationary = True
            for tr in list(env.get_all_tracks()):
                if tr.object_class != "pedestrian":
                    continue
                if intersect_polygons(tr.hull, vl.corners):
                    stop = True
                only_stationary &= tr.stationary
            if stop:
                vl.limit = 3.0 if only_stationary else 0.0
            else:
                vl.limit = vl.free_limit

        elif vl.__tag__ == "traffic_light":
            if abs(env.t - vl.t) > 3.0:
                vl.state = TrafficLight.RED
                vl.can_stop = True
            if not on_ref_path:
                continue

            all_tds = []
            for src in util.get_obj_dict(env.tl_dets).values():
                all_tds += src

            assoc_dets = []
            for det in all_tds:
                if det.confidence < 0.25:
                    continue
                a = np.array([det.near_point, det.far_point])
                ray = a[1] - a[0]
                angle = np.arctan2(ray[1], ray[0])
                angle_dist = abs(np.degrees(
                    short_angle_dist(vl.proj.angle, angle)))
                if angle_dist > 35.0:
                    continue
                p = project(a, vl.light_pos)
                if abs(p.distance) <= vl.detection_radius:
                    assoc_dets.append((det, p))

            if len(assoc_dets) > 0:
                vote = np.zeros(4)
                for det, p in assoc_dets:
                    w = ((vl.detection_radius - abs(p.distance))
                         / vl.detection_radius)
                    if det.state == TrafficLight.NONE:
                        w *= 0.1
                    vote[det.state] += w
                det_state = int(np.argmax(vote))

                if (vl.state in (TrafficLight.GREEN, TrafficLight.NONE)
                        and det_state not in (TrafficLight.GREEN,
                                              TrafficLight.NONE)):
                    d_to_tl = vl.proj.arc_len - proj_veh.arc_len
                    d_stop = veh.v ** 2 / (2 * 2.75)
                    vl.can_stop = d_to_tl >= d_stop

                vl.t = env.t
                vl.state = det_state

            vl.active = vl.state in (TrafficLight.RED, TrafficLight.YELLOW)
            vl.active &= vl.can_stop

    if veh.steering_wheel_button and len(velocity_limits_path_ref) > 0:
        vl_next = min(velocity_limits_path_ref, key=lambda v: v.proj.arc_len)
        vl_next.active = False

    # intersection gap acceptance
    for ip in cmap.intersection_paths:
        ip.stop_proj = project(env.local_map.path[:, :2], ip.stop_pos)
        if not ip.stop_proj.in_bounds:
            ip.stop = True
            continue

        dist_to_stop = (np.linalg.norm(ip.stop_pos - veh_pos)
                        - veh.rear_axis_to_front)
        time_to_stop = max(0.0, dist_to_stop / max(2.0, veh.v))
        if dist_to_stop > ip.d_decision:
            continue
        if ip.map_segment is None or ip.map_segment.path is None:
            continue

        pos_critical = (ip.map_segment.path[-1, 3]
                        * abs(ip.offset_path_begin)
                        / (ip.offset_path_end - ip.offset_path_begin))

        t_min = float("inf")
        for tr in env.predicted:
            if tr.stationary:
                continue
            for pred in tr.predictions:
                if ip.map_segment.uuid != pred.uuid_assoc_map:
                    continue
                if pred.cos_angle_dist < 0.0:
                    continue
                t_inters = ((5.0 + pos_critical
                             - pred.proj_assoc_map.arc_len)
                            / max(5.0, tr.v * pred.cos_angle_dist))
                if t_inters < 0.0:
                    continue
                t_min = min(t_min, t_inters)

        if t_min - time_to_stop > ip.gap_acceptance:
            ip.stop = False
        elif not ip.stop:
            if t_min < ip.gap_rejection:
                stop_acc = 6.0
                dist_break = veh.v ** 2 / (2 * stop_acc)
                if dist_to_stop > dist_break:
                    ip.stop = True

    mmap = env.get_current_map()
    mmap.velocity_limits = cmap.velocity_limits
    mmap.turn_ind_points = cmap.turn_ind_points
    mmap.map_switch_points = cmap.map_switch_points
    mmap.intersection_paths = cmap.intersection_paths


def get_map_boundary_polygon(cmap):
    return np.vstack([cmap.boundary_right, cmap.boundary_left[::-1],
                      cmap.boundary_right[np.newaxis, 0]])


def _build_map_items(kind, entries):
    cls = _ITEM_CLASSES[kind]
    items = []
    for e in entries or []:
        item = cls()
        util.merge_into(item, e)
        items.append(item)
    return items


def load_map_store(file_path, data_path=None):
    """Load a map store directory (state.json + extern npy) into Maps.

    (reference: map_module.py:822-851; format-compatible with the
    reference's objtoolbox map stores)
    """
    if not file_path:
        return util.Bundle()
    if data_path:
        full = os.path.join(data_path, file_path)
    else:
        full = util.resolve_data("maps", file_path)
    if not os.path.isdir(full):
        return util.Bundle()

    try:
        raw = util.load_state_dict(full)
        if raw is None:
            return util.Bundle()

        store = {}
        for key, m in raw.items():
            if not isinstance(m, dict):
                continue
            cmap = Map()
            for attr in ("name", "uuid", "smoothing", "step_size_discr"):
                if attr in m:
                    setattr(cmap, attr, m[attr])
            cmap.closed_path = bool(m.get("closed_path", 0))
            cps = np.asarray(m.get("control_points", np.zeros((0, 6))),
                             dtype=np.float64)
            route = m.get("route")
            if len(cps) == 0 and route is not None and len(route) > 0:
                route = np.asarray(route, dtype=np.float64)
                cps = np.zeros((len(route), 6))
                cps[:, 0] = route[:, 0]
                cps[:, 1] = route[:, 1]
                cps[:, 2] = 2.0
                cps[:, 3] = 2.0
                cps[:, 4] = route[:, 5]
            if cps.shape[1] < 6:
                full_cps = np.zeros((len(cps), 6))
                full_cps[:, :cps.shape[1]] = cps
                cps = full_cps
            cmap.control_points = cps
            cmap.velocity_limits = _build_map_items(
                "velocity_limit", m.get("velocity_limits"))
            # typed items carry a __tag__ in their dicts
            typed = []
            for e in m.get("velocity_limits") or []:
                tag = e.get("__tag__", "velocity_limit")
                item = _ITEM_CLASSES.get(tag, VelocityLimit)()
                util.merge_into(item, e)
                typed.append(item)
            cmap.velocity_limits = typed
            cmap.turn_ind_points = _build_map_items(
                "turn_ind_point", m.get("turn_ind_points"))
            cmap.map_switch_points = _build_map_items(
                "map_switch_point", m.get("map_switch_points"))
            cmap.intersection_paths = _build_map_items(
                "intersection_path", m.get("intersection_paths"))
            reinit_map(cmap)
            store[key] = cmap

        bundle = util.Bundle(**store)
        for cmap in store.values():
            reinit_map_items(cmap, bundle)
        return bundle
    except Exception:
        traceback.print_exc()
        return util.Bundle()
