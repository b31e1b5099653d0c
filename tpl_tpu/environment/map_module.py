"""
Map data model: global maps with boundaries and items, the sliding-window
local map, map-store loading, and per-tick map item logic.

Structure: one channel-lerp helper (`lerp_resampled`) and one
discretization pass (`discretize_pass`) express every resampling in the
module; the per-tick item logic is split per item type and vectorized
where there is anything to vectorize (traffic-light vote).

Behavior-parity target: library/tpl/environment/map_module.py
(Map/LocalMap:161-240, copy_map_segment:243-280, reinit_map:283-421,
update_local_map:462-530, velocity logic:533-629, items:632-811,
load_map_store:822-851).
"""

import os
import uuid
import traceback
from dataclasses import dataclass, field

import numpy as np

from tpl_tpu import util
from tpl_tpu.ops import (
    project, resample, interp_resampled_path, smooth_path_positions,
    curv_to_vel_profile, add_vel_constraint,
    intersect_polygons, short_angle_dist,
)

# columns of a discretized path: x, y, orientation, arc length s,
# curvature, speed limit
PATH_X, PATH_Y, PATH_PHI, PATH_S, PATH_K, PATH_V = range(6)


# ---------------------------------------------------------------------------
# map items (field sets fixed by the objtoolbox store format; containers
# follow this framework's dataclass idiom, like environment/detections.py)

def _uuid():
    return uuid.uuid4().hex


def _vec2():
    return np.zeros(2)


@dataclass
class VelocityLimit:
    __tag__: str = "velocity_limit"
    uuid: str = field(default_factory=_uuid)
    pos: np.ndarray = field(default_factory=_vec2)
    limit: float = 0.0
    length: float = 20.0
    min_distance: float = 1.0
    proj: util.Projection = field(default_factory=util.Projection)
    active: bool = True

    def __savestate__(self):
        s = self.__dict__.copy()
        s.pop("proj", None)
        s.pop("active", None)
        return s


@dataclass
class TrafficLight(VelocityLimit):
    RED = 0
    YELLOW = 1
    GREEN = 2
    NONE = 3

    __tag__: str = "traffic_light"
    light_pos: np.ndarray = field(default_factory=_vec2)
    detection_radius: float = 1.0
    t: float = 0.0
    state: int = NONE
    can_stop: bool = False


@dataclass
class CrossWalk(VelocityLimit):
    __tag__: str = "cross_walk"
    corners: np.ndarray = field(default_factory=lambda: np.zeros((0,)))
    free_limit: float = 10.0


@dataclass
class TurnIndPoint:
    OFF = 0
    RIGHT = -1
    LEFT = 1
    HAZARD = 2

    __tag__: str = "turn_ind_point"
    uuid: str = field(default_factory=_uuid)
    pos: np.ndarray = field(default_factory=_vec2)
    dir: int = OFF
    activation_radius: float = 2.0


@dataclass
class MapSwitchPoint:
    __tag__: str = "map_switch_point"
    uuid: str = field(default_factory=_uuid)
    pos: np.ndarray = field(default_factory=_vec2)
    trigger_divisor: int = 1
    triggers: int = 0
    activation_radius: float = 5.0
    in_radius: bool = False
    target_uuid: str = ""


@dataclass
class IntersectionPath:
    __tag__: str = "intersection_path"
    uuid: str = field(default_factory=_uuid)
    pos: np.ndarray = None
    stop_pos: np.ndarray = None
    stop_proj: util.Projection = field(default_factory=util.Projection)
    intersection_map_uuid: str = ""
    map_segment: object = None
    map_segment_step_size: float = 2.0
    offset_path_begin: int = -20
    offset_path_end: int = 20
    stop: bool = True
    d_decision: float = 30.0
    gap_acceptance: float = 5.0
    gap_rejection: float = 3.0

    def __post_init__(self):
        if self.pos is None:
            self.pos = np.zeros(2)
        if self.stop_pos is None:
            self.stop_pos = self.pos + np.array([2.0, 2.0])

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

_ITEM_LISTS = ("velocity_limits", "turn_ind_points", "map_switch_points",
               "intersection_paths")


@dataclass
class Map:
    name: str = "unnamed_map"
    __tag__: str = "map"
    uuid: str = field(default_factory=_uuid)

    velocity_limits: list = field(default_factory=list)
    turn_ind_points: list = field(default_factory=list)
    map_switch_points: list = field(default_factory=list)
    intersection_paths: list = field(default_factory=list)

    # dims: x, y, d_left, d_right, speed_limit, altitude
    control_points: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 6)))
    smoothing: float = 0.0
    step_size_discr: float = 0.5
    closed_path: bool = False

    # computed by reinit_map
    path: np.ndarray = None       # discretized, PATH_* columns
    boundary_left: np.ndarray = None
    boundary_right: np.ndarray = None
    d_left: np.ndarray = None
    d_right: np.ndarray = None
    altitude: np.ndarray = None
    route: object = None          # deprecated input format

    def __str__(self):
        return self.name

    def __savestate__(self):
        """Persist only source fields; path/boundaries are recomputed by
        reinit_map on load."""
        keep = ("__tag__", "name", "uuid", "smoothing", "step_size_discr",
                "closed_path", "control_points") + _ITEM_LISTS
        return {k: self.__dict__[k] for k in keep if k in self.__dict__}


@dataclass
class LocalMap(Map):
    name: str = "local_map"
    # sliding window configuration (reference map_module.py:218-240)
    steps_ref: int = 400
    step_size_ref: float = 0.5
    idx_start_ref: int = 0
    shift_idx_start_ref: int = 0
    shift_vel_lim: int = 0
    update_inters_paths: bool = False
    step_shift_idx: int = 2
    position_vehicle: float = 0.0


def adopt_items_from(dst_map, src_map):
    """Share (not copy) src_map's item lists — items carry live state
    (projections, light states) that both views must observe."""
    for attr in _ITEM_LISTS:
        setattr(dst_map, attr, getattr(src_map, attr))


# ---------------------------------------------------------------------------
# resampling helpers

def lerp_resampled(rsi, channel):
    """Interpolate a per-vertex channel at resampled stations.

    ``rsi`` rows are (x, y, alpha, idx_prev, idx_next) as produced by
    :func:`tpl_tpu.ops.resample`.
    """
    c = np.asarray(channel).reshape(-1)
    a = rsi[:, 2]
    return c[rsi[:, 3].astype(int)] * (1.0 - a) + c[rsi[:, 4].astype(int)] * a


def side_boundaries(path, d_left, d_right):
    """Offset the centerline by the corridor half-widths along the
    left-hand path normal; returns (boundary_left, boundary_right)."""
    normal = np.stack([np.cos(path[:, PATH_PHI] + np.pi / 2),
                       np.sin(path[:, PATH_PHI] + np.pi / 2)], axis=1)
    center = path[:, :2]
    return (center + d_left[:, None] * normal,
            center - d_right[:, None] * normal)


def polyline_headings(xy, closed):
    """Per-vertex tangent angles; the last vertex wraps (closed) or
    repeats (open)."""
    d = np.diff(xy[:, :2], axis=0)
    phi = np.empty(len(xy))
    phi[:-1] = np.arctan2(d[:, 1], d[:, 0])
    phi[-1] = phi[0] if closed else phi[-2]
    return phi


def discretize_pass(xy, v, channels, step_size, closed):
    """One uniform-arc-length discretization pass.

    Returns ``(path, interpolated_channels)`` where ``path`` carries the
    PATH_* columns (curvature/arc length filled by the resampled-path
    interpolator) and each entry of ``channels`` is lerped onto the new
    stations.  Raises RuntimeError when the polyline cannot be resampled.
    """
    length = np.sum(np.linalg.norm(np.diff(xy[:, :2], axis=0), axis=1))
    steps = int(length / step_size)
    rsi = resample(xy[:, :2], step_size, steps, closed=closed)

    src = np.zeros((len(xy), 6))
    src[:, :2] = xy[:, :2]
    src[:, PATH_PHI] = polyline_headings(xy, closed)
    src[:, PATH_V] = v
    path = interp_resampled_path(src, rsi, step_size, steps, False, closed)
    return rsi, path, [lerp_resampled(rsi, c) for c in channels]


def copy_map_segment(dst_map, src_map, step_size, steps, start_idx):
    """Resample a window of src_map into dst_map.
    (reference: map_module.py:243-280)"""
    try:
        rsi = resample(src_map.path[:, :2], step_size, steps, start_idx,
                       closed=src_map.closed_path)
    except RuntimeError:
        return False

    dst_map.path = interp_resampled_path(
        src_map.path, rsi, step_size, steps,
        zero_vel_at_end=not src_map.closed_path,
        closed=src_map.closed_path)
    dst_map.d_left = lerp_resampled(rsi, src_map.d_left)
    dst_map.d_right = lerp_resampled(rsi, src_map.d_right)
    dst_map.boundary_left, dst_map.boundary_right = side_boundaries(
        dst_map.path, dst_map.d_left, dst_map.d_right)
    return True


def reinit_map(cmap):
    """Discretize control points into path/boundaries.
    (reference: map_module.py:283-421)"""
    cps = np.asarray(cmap.control_points, dtype=np.float64)

    if len(cps) == 0:
        cmap.path = np.zeros((0, 6))
        cmap.boundary_left = np.zeros((0, 2))
        cmap.boundary_right = np.zeros((0, 2))
        cmap.d_left = np.zeros(0)
        cmap.d_right = np.zeros(0)
        return

    if len(cps) == 1:
        x, y, dl, dr, v = cps[0, :5]
        cmap.path = np.array([[x, y, 0.0, 0.0, 0.0, v]])
        cmap.boundary_left = np.array([[x, y + dl]])
        cmap.boundary_right = np.array([[x, y - dr]])
        cmap.d_left = np.array([dl])
        cmap.d_right = np.array([dr])
        return

    if cmap.closed_path:
        cps = np.vstack([cps, cps[0]])

    step_size = float(np.clip(cmap.step_size_discr, 0.1, 5.0))

    # pass 1: control polygon -> uniform stations
    try:
        rsi, path, (d_left, d_right, altitude) = discretize_pass(
            cps[:, :2], cps[:, 4], (cps[:, 2], cps[:, 3], cps[:, 5]),
            step_size, cmap.closed_path)
    except RuntimeError:
        return

    # pass 2 (optional): smooth the station positions, re-discretize
    if cmap.smoothing > 1e-5:
        xys = smooth_path_positions(
            rsi[:, :2], step_size, 0.0, 10.0 * cmap.smoothing,
            1000.0 * cmap.smoothing, cmap.closed_path)
        # carry pass-1 velocity onto the smoothed vertices (pad with the
        # last value if smoothing changed the vertex count)
        v = path[:, PATH_V]
        if len(v) < len(xys):
            v = np.r_[v, np.full(len(xys) - len(v), v[-1])]
        try:
            rsi, path, (d_left, d_right, altitude) = discretize_pass(
                xys, v[:len(xys)], (d_left, d_right, altitude),
                step_size, cmap.closed_path)
        except RuntimeError:
            return

    cmap.path = path
    cmap.d_left = d_left
    cmap.d_right = d_right
    cmap.altitude = altitude
    cmap.boundary_left, cmap.boundary_right = side_boundaries(
        path, d_left, d_right)


def reinit_map_items(cmap, map_store):
    maps = util.get_obj_dict(map_store)
    for ip in cmap.intersection_paths:
        if ip.intersection_map_uuid in maps:
            reinit_intersection_path(ip, cmap, maps)


def reinit_intersection_path(ip, cmap, maps):
    """Extract the crossing-road segment around the conflict point.
    (reference: map_module.py:435-459)"""
    ip.map_segment_step_size = max(0.1, ip.map_segment_step_size)
    src_map = maps[ip.intersection_map_uuid]
    anchor = project(src_map.path[:, :2], ip.pos)

    if src_map.closed_path:
        steps = (ip.offset_path_end - ip.offset_path_begin) % len(src_map.path)
    else:
        ip.offset_path_end = max(ip.offset_path_begin + 1, ip.offset_path_end)
        steps = ip.offset_path_end - ip.offset_path_begin

    refine = src_map.step_size_discr / ip.map_segment_step_size
    ip.map_segment = Map(src_map.name)
    copy_map_segment(ip.map_segment, src_map, ip.map_segment_step_size,
                     max(1, int(abs(steps) * refine)),
                     anchor.index + ip.offset_path_begin)


# ---------------------------------------------------------------------------
# sliding window

def _window_start(local_map, cmap, veh, proj_ref):
    """New window anchor index + quantized shift for this tick.

    Returns (idx_start, shift_steps, reset).  When the vehicle is still
    inside the corridor, the window slides in multiples of
    ``step_shift_idx`` so warm starts stay index-aligned; when it left
    the corridor the window snaps to the route projection and the world
    is declared reset.
    """
    if proj_ref is not None:
        inside = (-local_map.d_right[proj_ref.index]
                  <= proj_ref.distance
                  <= local_map.d_left[proj_ref.index])
        if inside and proj_ref.in_bounds:
            anchor = int(local_map.position_vehicle
                         // local_map.step_size_ref)
            lag = proj_ref.start - anchor
            if abs(lag) <= local_map.step_shift_idx:
                return local_map.idx_start_ref, 0, False
            shift = ((lag // local_map.step_shift_idx)
                     * local_map.step_shift_idx)
            idx = local_map.idx_start_ref + shift
            if cmap.closed_path:
                idx %= len(cmap.path)
            else:
                idx = max(0, min(len(cmap.path), idx))
            return idx, shift, False

    # off the corridor: re-anchor on the global route
    return project(cmap.path[:, :2], (veh.x, veh.y)).start, 0, True


def update_local_map(env):
    """Sliding-window local map update. (reference: map_module.py:462-530)"""
    cmap = env.get_current_map()
    if cmap is None:
        env.local_map = None
        return

    veh = env.vehicle_state

    proj_ref = None
    if env.local_map is None:
        env.local_map = LocalMap()
        env.local_map_behind = Map("local_map_behind")
    else:
        proj_ref = project(env.local_map.path[:, :2], (veh.x, veh.y))

    local_map = env.local_map
    adopt_items_from(local_map, cmap)

    idx, shift, reset = _window_start(local_map, cmap, veh, proj_ref)
    local_map.idx_start_ref = idx
    local_map.shift_idx_start_ref = shift
    if reset:
        env.reset_counter += 1

    if not copy_map_segment(local_map, cmap, local_map.step_size_ref,
                            local_map.steps_ref, local_map.idx_start_ref):
        return

    # trailing window: same length again, ending where the front starts
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


# ---------------------------------------------------------------------------
# velocity profile shaping

def update_local_map_velocity(env):
    """Curvature-limited speed profile + active point limits.
    (reference: map_module.py:573-599)"""
    cmap = env.local_map
    if cmap is None:
        return

    v_lim = curv_to_vel_profile(cmap.path[:, PATH_K], cmap.path[:, PATH_V],
                                env.vehicle_state.a_lat_max)
    for vl in cmap.velocity_limits:
        if (vl.active and vl.proj.in_bounds
                and abs(vl.proj.distance) <= vl.min_distance):
            add_vel_constraint(v_lim, vl.proj.start, vl.limit, vl.length,
                               cmap.shift_vel_lim)
    cmap.path[:, PATH_V] = v_lim


def update_local_map_inters_paths(env):
    """Zero the profile at stop lines of intersections we must yield at.
    (reference: map_module.py:602-629)"""
    cmap = env.local_map
    if cmap is None or not cmap.update_inters_paths:
        return

    v_lim = cmap.path[:, PATH_V]
    for ip in cmap.intersection_paths:
        if (ip.stop and ip.stop_proj.in_bounds
                and abs(ip.stop_proj.distance) <= 1.0):
            add_vel_constraint(v_lim, ip.stop_proj.start, max_vel=0.0,
                               length=10, shift=cmap.shift_vel_lim)
    cmap.path[:, PATH_V] = v_lim


# ---------------------------------------------------------------------------
# per-tick item logic

def _update_switch_points(env, cmap, veh_pos):
    """Rising-edge triggered map switching."""
    for msp in cmap.map_switch_points:
        entered = (np.linalg.norm(msp.pos - veh_pos)
                   < msp.activation_radius)
        if entered and not msp.in_radius:
            msp.triggers += 1
            if msp.triggers % msp.trigger_divisor == 0:
                env.selected_map = msp.target_uuid
                env.reset_counter += 1
        msp.in_radius = entered


def _update_turn_indicators(veh, cmap, veh_pos):
    veh.turn_indicator = 0
    for tip in cmap.turn_ind_points:
        if np.linalg.norm(tip.pos - veh_pos) < tip.activation_radius:
            veh.turn_indicator = tip.dir


def _update_crosswalk(env, vl):
    """Pedestrians on the crossing force a stop; if every one of them
    stands still, creep at 3 m/s instead of a hard stop."""
    blocked = False
    only_stationary = True
    for tr in list(env.get_all_tracks()):
        if tr.object_class != "pedestrian":
            continue
        if intersect_polygons(tr.hull, vl.corners):
            blocked = True
        only_stationary &= tr.stationary
    if blocked:
        vl.limit = 3.0 if only_stationary else 0.0
    else:
        vl.limit = vl.free_limit


def _vote_traffic_light(env, vl):
    """Distance-weighted vote over associated detections; returns the
    winning state or None without evidence."""
    dets = [d for src in util.get_obj_dict(env.tl_dets).values()
            for d in src if d.confidence >= 0.25]
    if not dets:
        return None

    rays = np.array([[d.near_point, d.far_point] for d in dets])
    dirs = rays[:, 1] - rays[:, 0]
    ray_angles = np.arctan2(dirs[:, 1], dirs[:, 0])
    misalign = np.abs(np.degrees(
        [short_angle_dist(vl.proj.angle, a) for a in ray_angles]))

    vote = np.zeros(4)
    for det, ray, off in zip(dets, rays, misalign):
        if off > 35.0:
            continue
        p = project(ray, vl.light_pos)
        if abs(p.distance) > vl.detection_radius:
            continue
        w = (vl.detection_radius - abs(p.distance)) / vl.detection_radius
        if det.state == TrafficLight.NONE:
            w *= 0.1
        vote[det.state] += w
    if not np.any(vote > 0.0):
        return None
    return int(np.argmax(vote))


def _update_traffic_light(env, vl, veh, proj_veh):
    # stale detections decay to "assume red, we can still stop"
    if abs(env.t - vl.t) > 3.0:
        vl.state = TrafficLight.RED
        vl.can_stop = True

    det_state = _vote_traffic_light(env, vl)
    if det_state is not None:
        going = (TrafficLight.GREEN, TrafficLight.NONE)
        if vl.state in going and det_state not in going:
            # light just turned: stop only if physically able (2.75 m/s^2)
            d_to_tl = vl.proj.arc_len - proj_veh.arc_len
            vl.can_stop = d_to_tl >= veh.v ** 2 / (2 * 2.75)
        vl.t = env.t
        vl.state = det_state

    vl.active = (vl.state in (TrafficLight.RED, TrafficLight.YELLOW)
                 and vl.can_stop)


def _update_point_limits(env, cmap, veh, proj_veh):
    """Project every velocity-limit item onto the corridor and run its
    type-specific logic; returns the items lying on the reference path."""
    on_path = []
    for vl in cmap.velocity_limits:
        vl.proj = project(cmap.path[:, :2], vl.pos)
        on_ref_path = (vl.proj.in_bounds
                       and abs(vl.proj.distance) <= vl.min_distance)
        if on_ref_path:
            on_path.append(vl)

        if vl.__tag__ == "velocity_limit":
            if not on_ref_path:
                vl.active = True
        elif vl.__tag__ == "cross_walk":
            if on_ref_path:
                _update_crosswalk(env, vl)
        elif vl.__tag__ == "traffic_light":
            if abs(env.t - vl.t) > 3.0:
                vl.state = TrafficLight.RED
                vl.can_stop = True
            if on_ref_path:
                _update_traffic_light(env, vl, veh, proj_veh)
    return on_path


def _time_to_conflict(ip, env, pos_critical):
    """Earliest predicted arrival of crossing traffic at the conflict
    point (inf if nothing is coming)."""
    t_min = float("inf")
    for tr in env.predicted:
        if tr.stationary:
            continue
        for pred in tr.predictions:
            if (ip.map_segment.uuid != pred.uuid_assoc_map
                    or pred.cos_angle_dist < 0.0):
                continue
            t = ((5.0 + pos_critical - pred.proj_assoc_map.arc_len)
                 / max(5.0, tr.v * pred.cos_angle_dist))
            if t >= 0.0:
                t_min = min(t_min, t)
    return t_min


def _update_intersection_gaps(env, cmap, veh, veh_pos):
    """Gap acceptance at crossings: commit to go when the predicted gap
    exceeds gap_acceptance; abort (re-stop) only while a comfortable
    6 m/s^2 stop is still possible."""
    for ip in cmap.intersection_paths:
        ip.stop_proj = project(cmap.path[:, :2], ip.stop_pos)
        if not ip.stop_proj.in_bounds:
            ip.stop = True
            continue

        dist_to_stop = (np.linalg.norm(ip.stop_pos - veh_pos)
                        - veh.rear_axis_to_front)
        if dist_to_stop > ip.d_decision:
            continue
        if ip.map_segment is None or ip.map_segment.path is None:
            continue

        seg_len = ip.map_segment.path[-1, PATH_S]
        pos_critical = (seg_len * abs(ip.offset_path_begin)
                        / (ip.offset_path_end - ip.offset_path_begin))
        t_min = _time_to_conflict(ip, env, pos_critical)
        time_to_stop = max(0.0, dist_to_stop / max(2.0, veh.v))

        if t_min - time_to_stop > ip.gap_acceptance:
            ip.stop = False
        elif not ip.stop and t_min < ip.gap_rejection:
            dist_brake = veh.v ** 2 / (2 * 6.0)
            if dist_to_stop > dist_brake:
                ip.stop = True


def update_map_items(env):
    """Per-tick logic of all map items.
    (reference: map_module.py:632-811)"""
    cmap = env.local_map
    if cmap is None:
        return

    veh = env.vehicle_state
    veh_pos = np.array([veh.x, veh.y])
    proj_veh = project(cmap.path[:, :2], veh_pos)

    _update_switch_points(env, cmap, veh_pos)
    _update_turn_indicators(veh, cmap, veh_pos)
    on_path = _update_point_limits(env, cmap, veh, proj_veh)

    # driver override: the steering-wheel button releases the next limit
    if veh.steering_wheel_button and on_path:
        min(on_path, key=lambda v: v.proj.arc_len).active = False

    _update_intersection_gaps(env, cmap, veh, veh_pos)

    # the live item state must survive the next window rebuild
    adopt_items_from(env.get_current_map(), cmap)


def get_map_boundary_polygon(cmap):
    return np.vstack([cmap.boundary_right, cmap.boundary_left[::-1],
                      cmap.boundary_right[np.newaxis, 0]])


# ---------------------------------------------------------------------------
# map store loading

def _build_items(entries, default_tag):
    """Instantiate typed map items from decoded dicts, dispatching on
    the stored __tag__ (velocity-limit lists mix plain limits, traffic
    lights and crosswalks)."""
    items = []
    for e in entries or []:
        tag = e.get("__tag__", default_tag) if isinstance(e, dict) \
            else default_tag
        item = _ITEM_CLASSES.get(tag, _ITEM_CLASSES[default_tag])()
        util.merge_into(item, e)
        items.append(item)
    return items


def _control_points_of(m):
    """Control points from the store entry, falling back to the
    deprecated route format (x, y @ cols 0-1, v @ col 5, 2 m corridor)."""
    cps = np.asarray(m.get("control_points", np.zeros((0, 6))),
                     dtype=np.float64)
    route = m.get("route")
    if len(cps) == 0 and route is not None and len(route) > 0:
        route = np.asarray(route, dtype=np.float64)
        cps = np.zeros((len(route), 6))
        cps[:, :2] = route[:, :2]
        cps[:, 2:4] = 2.0
        cps[:, 4] = route[:, 5]
    if cps.shape[1] < 6:
        cps = np.pad(cps, ((0, 0), (0, 6 - cps.shape[1])))
    return cps


def _map_from_store(m):
    cmap = Map()
    for attr in ("name", "uuid", "smoothing", "step_size_discr"):
        if attr in m:
            setattr(cmap, attr, m[attr])
    cmap.closed_path = bool(m.get("closed_path", 0))
    cmap.control_points = _control_points_of(m)
    cmap.velocity_limits = _build_items(
        m.get("velocity_limits"), "velocity_limit")
    cmap.turn_ind_points = _build_items(
        m.get("turn_ind_points"), "turn_ind_point")
    cmap.map_switch_points = _build_items(
        m.get("map_switch_points"), "map_switch_point")
    cmap.intersection_paths = _build_items(
        m.get("intersection_paths"), "intersection_path")
    reinit_map(cmap)
    return cmap


def load_map_store(file_path, data_path=None):
    """Load a map store directory (state.json + extern npy) into Maps.

    (reference: map_module.py:822-851; format-compatible with the
    reference's objtoolbox map stores)
    """
    if not file_path:
        return util.Bundle()
    full = (os.path.join(data_path, file_path) if data_path
            else util.resolve_data("maps", file_path))
    if not os.path.isdir(full):
        return util.Bundle()

    try:
        raw = util.load_state_dict(full)
        if raw is None:
            return util.Bundle()
        store = {key: _map_from_store(m) for key, m in raw.items()
                 if isinstance(m, dict)}
        bundle = util.Bundle(**store)
        for cmap in store.values():
            reinit_map_items(cmap, bundle)
        return bundle
    except Exception:
        traceback.print_exc()
        return util.Bundle()
