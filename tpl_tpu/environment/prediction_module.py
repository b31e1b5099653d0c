"""
Constant-velocity prediction over map corridors.

Both predictors are closed-form array programs: the along-path variant
exploits that CV speed is constant over the horizon, so all arc-length
stations are known upfront and every channel (position, heading) is one
batched equally-spaced lerp — no per-step loop.

Behavioral parity target:
library/tpl/environment/prediction_module.py:41-234.
"""

import numpy as np

from tpl_tpu.ops import project, project_many
from tpl_tpu.ops.interp import lerp_xs
from tpl_tpu.environment.detections import Prediction

# state row layout shared by both predictors
T, X, Y, YAW, V = range(5)


def calc_pred_cv(x0, dt, horizon):
    """In-place constant-velocity prediction (straight-line ballistic).
    Returns (L, 5) rows [t, x, y, yaw, v]."""
    ts = dt * np.arange(int(horizon / dt) + 1)
    out = np.empty((len(ts), 5))
    out[:, T] = x0[T] + ts
    out[:, X] = x0[X] + ts * x0[V] * np.cos(x0[YAW])
    out[:, Y] = x0[Y] + ts * x0[V] * np.sin(x0[YAW])
    out[:, YAW] = x0[YAW]
    out[:, V] = x0[V]
    return out


def calc_pred_cv_path(x0, d0, s0, path, dt, horizon, clip_pos_alpha=False):
    """Constant-velocity prediction riding a map path at lateral offset
    ``d0``. Fully vectorized: the projected speed is constant, so the
    visited stations are ``s0 + v·dt·i`` and all lookups batch."""
    steps = int(horizon / dt) + 1
    ts = dt * np.arange(steps)

    yaw0 = lerp_xs(s0, path[:, 3], path[:, 2], angle=True, clip_alpha=True)
    cos_angle_dist = np.cos(x0[YAW] - yaw0)
    v_path = x0[V] * cos_angle_dist

    stations = s0 + v_path * ts
    headings = lerp_xs(stations, path[:, 3], path[:, 2],
                       angle=True, clip_alpha=True)
    anchors = np.asarray(lerp_xs(stations, path[:, 3], path[:, :2],
                                 clip_alpha=clip_pos_alpha), dtype=float)
    normals = np.stack([-np.sin(headings), np.cos(headings)], axis=1)

    out = np.empty((steps, 5))
    out[:, T] = x0[T] + ts
    out[:, X:Y + 1] = anchors + d0 * normals
    out[:, YAW] = headings
    out[:, V] = v_path
    # row 0 keeps the measured position, only heading/speed are projected
    out[0, X], out[0, Y] = x0[X], x0[Y]
    return out


class PredictionModule:

    def __init__(self):
        self.limit_assoc_vel = 1.0
        self.limit_assoc_angle = 0.9
        self.pedestrian_assoc_tol = 5.0
        self.dt_pred = 1.0
        self.horizon_pred = 10.0
        self.pred_margin_acc = 0.2

    # ------------------------------------------------------------------

    def _corridor_test(self, m, track):
        """Does the track's hull reach into map ``m``'s corridor?
        Returns the center projection when it does, else None."""
        center = project(m.path[:, :2], np.mean(track.hull, axis=0))
        if not center.in_bounds:
            return None
        tol = track.hull_radius
        if track.object_class == "pedestrian":
            tol += self.pedestrian_assoc_tol
        lo = -m.d_right[center.index] - tol
        hi = m.d_left[center.index] + tol
        if not lo < center.distance < hi:
            return None

        hull = project_many(m.path[:, :2], track.hull)
        d = hull["distance"][hull["in_bounds"]]
        if len(d) == 0:
            return None
        # the hull itself (without tolerance) must overlap the road
        if d.max() < -m.d_right[center.index] \
                or d.min() > m.d_left[center.index]:
            return None
        return center

    def associate(self, maps, tracks):
        for track in tracks:
            for m in maps.values():
                center = self._corridor_test(m, track)
                if center is None:
                    continue
                pred = Prediction()
                pred.proj_assoc_map = center
                pred.uuid_assoc_map = m.uuid
                pred.cos_angle_dist = np.cos(track.yaw - center.angle)
                track.predictions.append(pred)

    # ------------------------------------------------------------------

    def drop_irrelevant(self, env, maps, tracks):
        """Keep associated tracks that are not hopelessly behind the ego:
        a track behind on a shared corridor is dropped when it occupies
        the ego's lane or cannot catch up within ~5 s."""
        veh = env.vehicle_state
        ego_proj = {uuid: project(m.path[:, :2], [veh.x, veh.y])
                    for uuid, m in maps.items()}

        def behind_and_hopeless(p, track_v):
            m = maps[p.uuid_assoc_map]
            ep = ego_proj[p.uuid_assoc_map]
            if not -m.d_right[ep.index] <= ep.distance \
                    <= m.d_left[ep.index]:
                return False
            lag = p.proj_assoc_map.arc_len - ep.arc_len
            if lag >= -3.0:
                return False
            same_lane = abs(ep.distance - p.proj_assoc_map.distance) \
                < veh.width + 0.25
            return same_lane or abs(lag) / max(
                0.001, abs(veh.v - track_v)) > 5.0

        return [track for track in tracks
                if track.predictions
                and not any(behind_and_hopeless(p, track.v)
                            for p in track.predictions)]

    # ------------------------------------------------------------------

    def predict(self, maps, tracks):
        for track in tracks:
            anchor = np.mean(track.hull, axis=0)
            if track.object_class == "pedestrian":
                x0 = np.array([0.0, anchor[0], anchor[1], 0.0, 0.0])
            else:
                v = 0.0 if track.v < 0.5 else track.v
                x0 = np.array([0.0, anchor[0], anchor[1], track.yaw, v])

            for pred in track.predictions:
                rides_path = (track.object_class != "pedestrian"
                              and track.v > self.limit_assoc_vel
                              and abs(pred.cos_angle_dist)
                              > self.limit_assoc_angle)
                if rides_path:
                    m = maps[pred.uuid_assoc_map]
                    c = pred.proj_assoc_map
                    pred.states = calc_pred_cv_path(
                        x0.copy(), c.distance, c.arc_len, m.path,
                        self.dt_pred, self.horizon_pred,
                        clip_pos_alpha=m.name == "local_map_behind")
                else:
                    stationary = x0.copy()
                    stationary[V] = 0.0
                    pred.states = calc_pred_cv(
                        stationary, self.dt_pred, self.horizon_pred)

            # prefer along-path predictions, then forward-driving ones
            moving = [p for p in track.predictions if p.states[0, V] != 0.0]
            if moving:
                track.predictions = moving
            forward = [p for p in track.predictions
                       if p.cos_angle_dist > 0.0]
            if forward:
                track.predictions = forward

    # ------------------------------------------------------------------

    def update(self, env):
        if env.get_current_map() is None or env.local_map is None:
            return
        maps = {m.uuid: m for m in env.get_relevant_maps()}
        tracks = env.get_all_tracks()
        self.associate(maps, tracks)
        tracks = self.drop_irrelevant(env, maps, tracks)
        self.predict(maps, tracks)
        env.predicted = tracks
