"""
Constant-velocity prediction: associates tracks to maps via a corridor
test, drops tracks behind the ego, and predicts either along the map path
or in place. (reference: library/tpl/environment/prediction_module.py)
"""

import numpy as np

from tpl_tpu import util
from tpl_tpu.ops import project
from tpl_tpu.ops.interp import lerp_xs, short_angle_dist
from tpl_tpu.environment.detections import Prediction


def _lerp(x, xs, ys, angle=False, clip_alpha=False):
    """Equally-spaced interp over arbitrary channel arrays
    (prediction_module.py:10-38)."""
    return lerp_xs(x, xs, ys, angle=angle, clip_alpha=clip_alpha)


def calc_pred_cv(x0, dt, horizon):
    """Constant-velocity prediction in place. (prediction_module.py:41-55)"""
    l = int(horizon / dt) + 1
    x = np.zeros((l, x0.shape[0]))
    x[0] = x0
    ts = np.arange(l) * dt
    x[:, 0] = x0[0] + ts
    x[:, 1] = x0[1] + ts * x0[4] * np.cos(x0[3])
    x[:, 2] = x0[2] + ts * x0[4] * np.sin(x0[3])
    x[:, 3] = x0[3]
    x[:, 4] = x0[4]
    return x


def calc_pred_cv_path(x0, d0, s0, path, dt, horizon, clip_pos_alpha=False):
    """Constant-velocity prediction along a map path, keeping the lateral
    offset d0. (prediction_module.py:58-84)"""
    s = s0
    d = d0

    heading = _lerp(s, path[:, 3], path[:, 2], angle=True, clip_alpha=True)
    cos_angle_dist = np.cos(x0[3] - heading)

    l = int(horizon / dt) + 1
    x = np.zeros((l, x0.shape[0]))
    x[0] = x0
    x[0, 3] = heading
    x[0, 4] = x0[4] * cos_angle_dist

    for i in range(l - 1):
        s += dt * x[i, 4]
        pos = np.array(_lerp(s, path[:, 3], path[:, :2],
                             clip_alpha=clip_pos_alpha), dtype=np.float64)
        heading = _lerp(s, path[:, 3], path[:, 2], angle=True,
                        clip_alpha=True)
        pos[0] += -np.sin(heading) * d
        pos[1] += np.cos(heading) * d
        x[i + 1, 0] = x[i, 0] + dt
        x[i + 1, 1:3] = pos
        x[i + 1, 3] = heading
        x[i + 1, 4] = x[i, 4]
    return x


class PredictionModule:

    def __init__(self):
        self.limit_assoc_vel = 1.0
        self.limit_assoc_angle = 0.9
        self.pedestrian_assoc_tol = 5.0
        self.dt_pred = 1.0
        self.horizon_pred = 10.0
        self.pred_margin_acc = 0.2

    def associate_maps_and_tracks(self, maps, tracks):
        """(prediction_module.py:101-135)"""
        for tr in tracks:
            pos_mean = np.mean(tr.hull, axis=0)
            for m in maps.values():
                proj = project(m.path[:, :2], pos_mean)
                if not proj.in_bounds:
                    continue
                assoc_tol = tr.hull_radius
                if tr.object_class == "pedestrian":
                    assoc_tol += self.pedestrian_assoc_tol
                left_bound = m.d_left[proj.index] + assoc_tol
                right_bound = -m.d_right[proj.index] - assoc_tol
                if not right_bound < proj.distance < left_bound:
                    continue

                projs_hull = project(m.path[:, :2], tr.hull)
                projs_hull = [p for p in projs_hull if p.in_bounds]
                if len(projs_hull) == 0:
                    continue
                dists = np.array([p.distance for p in projs_hull])
                if (np.max(dists) < -m.d_right[proj.index]
                        or np.min(dists) > m.d_left[proj.index]):
                    continue

                pred = Prediction()
                pred.proj_assoc_map = proj
                pred.uuid_assoc_map = m.uuid
                pred.cos_angle_dist = np.cos(tr.yaw - proj.angle)
                tr.predictions.append(pred)

    def clean_tracks(self, env, maps, tracks):
        """Drop unassociated tracks and tracks behind the ego.
        (prediction_module.py:137-169)"""
        veh = env.vehicle_state
        keep = []
        for tr in tracks:
            if len(tr.predictions) == 0:
                continue
            reject = False
            for p in tr.predictions:
                m = maps[p.uuid_assoc_map]
                veh_proj = project(m.path[:, :2], [veh.x, veh.y])
                if (veh_proj.distance > m.d_left[veh_proj.index]
                        or veh_proj.distance < -m.d_right[veh_proj.index]):
                    continue
                dist = p.proj_assoc_map.arc_len - veh_proj.arc_len
                if dist < -3.0:
                    if abs(veh_proj.distance - p.proj_assoc_map.distance) < \
                            (veh.width + 0.25):
                        reject = True
                        break
                    temporal_dist = abs(dist) / max(0.001, abs(veh.v - tr.v))
                    if temporal_dist > 5.0:
                        reject = True
                        break
            if not reject:
                keep.append(tr)
        return keep

    def apply_predictions(self, maps, tracks):
        """(prediction_module.py:171-219)"""
        for tr in tracks:
            pos_mean = np.mean(tr.hull, axis=0)
            if tr.object_class == "pedestrian":
                x0 = np.array([0.0, pos_mean[0], pos_mean[1], 0.0, 0.0])
            else:
                v_pred = 0.0 if tr.v < 0.5 else tr.v
                x0 = np.array([0.0, pos_mean[0], pos_mean[1], tr.yaw,
                               v_pred])

            for pred in tr.predictions:
                pred_along_map = (
                    tr.object_class != "pedestrian"
                    and tr.v > self.limit_assoc_vel
                    and abs(pred.cos_angle_dist) > self.limit_assoc_angle)
                x0_p = x0.copy()
                if pred_along_map:
                    proj = pred.proj_assoc_map
                    m = maps[pred.uuid_assoc_map]
                    on_local_map = m.name == "local_map_behind"
                    pred.states = calc_pred_cv_path(
                        x0_p, proj.distance, proj.arc_len, m.path,
                        self.dt_pred, self.horizon_pred,
                        clip_pos_alpha=on_local_map)
                else:
                    x0_p[4] = 0.0
                    pred.states = calc_pred_cv(x0_p, self.dt_pred,
                                               self.horizon_pred)

            path_preds = [p for p in tr.predictions if p.states[0, 4] != 0.0]
            if len(path_preds) > 0:
                tr.predictions = path_preds
            non_reverse = [p for p in tr.predictions
                           if p.cos_angle_dist > 0.0]
            if len(non_reverse) > 0:
                tr.predictions = non_reverse

    def update(self, env):
        cmap = env.get_current_map()
        if cmap is None or env.local_map is None:
            return
        maps = {m.uuid: m for m in env.get_relevant_maps()}
        tracks = env.get_all_tracks()
        self.associate_maps_and_tracks(maps, tracks)
        tracks = self.clean_tracks(env, maps, tracks)
        self.apply_predictions(maps, tracks)
        env.predicted = tracks
