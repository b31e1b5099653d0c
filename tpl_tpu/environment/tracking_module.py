"""
Lightweight multi-object tracker: map-gated detection filtering with
hull-merge fusion, Hungarian association, constant-velocity Kalman filter
with existence and stationary scores.

(reference: library/tpl/environment/tracking_module.py)
"""

import copy
import itertools

import numpy as np
from scipy.optimize import linear_sum_assignment

from tpl_tpu import util
from tpl_tpu.ops import project, intersect_polygons, convex_hull
from tpl_tpu.environment.detections import DynamicObject
from tpl_tpu.util import snapshot


class Track:

    ID_COUNTER = 10000

    def __init__(self):
        Track.ID_COUNTER += 1
        self.id = Track.ID_COUNTER
        self.t = 0.0
        # x, y, v_x, v_y
        self.state = np.zeros(4)
        self.covar = np.diag([0.1, 0.1, 0.1, 0.1])
        self.hull = np.zeros((0, 2))
        self.hull_radius = 0.0
        self.pos_prev = np.zeros(2)
        self.hull_prev = np.zeros((0, 2))
        self.v_abs = 0.0
        self.a_abs = 0.0
        self.heading = None
        self.object_class = ""
        self.existence = 0.15
        self.stationary = 0.0


class TrackingModule:

    def __init__(self):
        self.d_gating = 5.0
        self.d_gating_birth = 5.0
        self.maps = []
        self.tracks = []
        self.tracks_new = []
        self.v_min = 0.5
        self.covar_meas = np.diag([0.01, 0.1])
        self.covar_proc = np.diag([0.01, 0.01, 0.02, 0.02])
        self.last_update_time = -1.0
        self.newest_det_time = 0.0

    def filter_detections(self, env):
        """Drop stale/off-map detections, fuse overlapping hulls.
        (tracking_module.py:65-126)"""
        all_dets = env.ir_pc_dets.copy()
        all_dets = [d for d in all_dets if d.t > self.newest_det_time]
        if len(all_dets) > 0:
            self.newest_det_time = max(d.t for d in all_dets)
        if len(all_dets) == 0:
            return []

        on_path_dets = []
        for d in all_dets:
            on_any_map = False
            d.on_local_map = False
            for m in self.maps:
                proj = project(m.path[:, :2], d.pos)
                assoc_tol = d.hull_radius
                if d.object_class == "pedestrian":
                    assoc_tol += 2.0
                left_bound = m.d_left[proj.index] + assoc_tol
                right_bound = -m.d_right[proj.index] - assoc_tol
                if not right_bound < proj.distance < left_bound:
                    continue
                on_any_map = True
                if m.name == "local_map_behind":
                    d.on_local_map = True
            if on_any_map:
                on_path_dets.append(d)

        while True:
            did_merge = False
            for d, o in itertools.combinations(list(on_path_dets), 2):
                if d.object_class != o.object_class:
                    continue
                if o not in on_path_dets:
                    continue
                if intersect_polygons(d.hull, o.hull):
                    d.hull = convex_hull(np.vstack((d.hull, o.hull)))
                    d.pos = np.mean(d.hull, axis=0)
                    d.hull_radius = np.max(np.linalg.norm(
                        d.hull - d.pos[None, :], axis=1))
                    try:
                        on_path_dets.remove(o)
                    except ValueError:
                        pass
                    did_merge = True
            if not did_merge:
                break
        return on_path_dets

    def association(self, detections):
        """Nearest-neighbor assignment with per-detection fallback columns.
        (tracking_module.py:128-167)"""
        assocs = {}
        unused_dets = []
        all_tracks = self.tracks + self.tracks_new
        count_tracks = len(all_tracks)
        count_dets = len(detections)
        if count_tracks == 0:
            return assocs, detections

        mat_costs = np.full((count_dets, count_tracks + count_dets), 1e4)
        for i, det in enumerate(detections):
            for j, tr in enumerate(all_tracks):
                if tr.t >= det.t or tr.object_class != det.object_class:
                    mat_costs[i, j] = 1e10
                    continue
                d = np.linalg.norm(det.pos - tr.state[:2])
                mat_costs[i, j] = d if d <= self.d_gating else 1e10

        _, assignment = linear_sum_assignment(mat_costs)
        for i, track_idx in enumerate(assignment):
            if track_idx < count_tracks:
                assocs[all_tracks[track_idx].id] = detections[i]
            else:
                unused_dets.append(detections[i])
        return assocs, unused_dets

    def predict_tracks(self, dt):
        F = np.eye(4)
        F[0, 2] = dt
        F[1, 3] = dt
        for tr in self.tracks:
            tr.state[:2] += dt * tr.state[2:]
            tr.hull = tr.hull + dt * tr.state[None, 2:]
            tr.covar = F @ tr.covar @ F.T + self.covar_proc

    def update_tracks(self, t, dt, veh, assocs):
        """KF measurement update with hull-extremes velocity recovery.
        (tracking_module.py:180-240)"""
        for tr in self.tracks:
            o = assocs.get(tr.id)
            if o is None:
                tr.existence = max(0.0, tr.existence - dt)
                continue
            dt_meas = o.t - tr.t
            tr.existence = min(1.0, tr.existence + dt_meas)
            tr.t = o.t

            # velocity from the hull extreme that moved least: robust to
            # partially visible hulls
            hull_min_v = (np.min(o.hull, axis=0)
                          - np.min(tr.hull_prev, axis=0)) / dt_meas
            hull_max_v = (np.max(o.hull, axis=0)
                          - np.max(tr.hull_prev, axis=0)) / dt_meas
            v_box_x = hull_min_v[0] if abs(hull_min_v[0]) < abs(
                hull_max_v[0]) else hull_max_v[0]
            v_box_y = hull_min_v[1] if abs(hull_min_v[1]) < abs(
                hull_max_v[1]) else hull_max_v[1]

            tr.state[:2] = np.mean(o.hull, axis=0)
            tr.state[2] = tr.state[2] * 0.9 + v_box_x * 0.1
            tr.state[3] = tr.state[3] * 0.9 + v_box_y * 0.1

            H = np.eye(4)[:2, :]
            S = H @ tr.covar @ H.T + self.covar_meas
            K = tr.covar @ H.T @ np.linalg.inv(S)
            Z = np.eye(4) - K @ H
            tr.covar = Z @ tr.covar

            v_abs = np.linalg.norm(tr.state[2:])
            a_abs = tr.a_abs * 0.9 + (v_abs - tr.v_abs) / dt_meas * 0.1
            tr.v_abs = v_abs
            tr.a_abs = a_abs

            tr.hull_prev = snapshot(o.hull)
            tr.hull = snapshot(o.hull)
            tr.hull_radius = o.hull_radius
            tr.pos_prev = tr.state[:2].copy()

            if tr.v_abs > self.v_min:
                tr.heading = np.arctan2(tr.state[3], tr.state[2])
            if tr.v_abs < self.v_min:
                tr.stationary = min(1.0, tr.stationary + dt_meas)
            else:
                tr.stationary = max(0.0, tr.stationary - dt_meas)

    def init_tracks(self, dt, assocs):
        confirmed = []
        for tr in self.tracks_new:
            o = assocs.get(tr.id)
            if o is None:
                tr.existence = max(0.0, tr.existence - dt)
                continue
            dt_meas = o.t - tr.t
            tr.existence = min(1.0, tr.existence + dt_meas)
            if tr.object_class == "pedestrian":
                tr.state[2:] = 0.0
            else:
                tr.state[2:] = (o.pos - tr.state[:2]) / (o.t - tr.t)
            tr.t = o.t
            tr.state[:2] = o.pos
            tr.pos_prev = o.pos.copy()
            tr.hull_prev = snapshot(o.hull)
            tr.hull = snapshot(o.hull)
            tr.hull_radius = o.hull_radius
            confirmed.append(tr)
        self.tracks += confirmed
        self.tracks_new = [t for t in self.tracks_new if t not in confirmed]

    def create_tracks(self, dets):
        for o in dets:
            tr = Track()
            tr.t = o.t
            tr.state[:2] = o.pos
            tr.pos_prev = o.pos.copy()
            tr.hull_prev = snapshot(o.hull)
            tr.hull = snapshot(o.hull)
            tr.hull_radius = o.hull_radius
            tr.object_class = o.object_class
            # conservative existence for objects on intersecting maps
            tr.existence = 0.15 if o.on_local_map else 1.0
            self.tracks_new.append(tr)

    def update(self, env):
        t = env.t
        cmap = env.get_current_map()
        if cmap is None or env.local_map is None:
            return

        dt = 0.0 if self.last_update_time < 0 else t - self.last_update_time
        self.last_update_time = t

        self.maps = env.get_relevant_maps()
        self.predict_tracks(dt)

        dets = self.filter_detections(env)
        assocs, dets = self.association(dets)

        self.update_tracks(env.t, dt, env.vehicle_state, assocs)
        self.init_tracks(dt, assocs)
        self.create_tracks(dets)

        self.tracks_new = [tr for tr in self.tracks_new if tr.existence > 0]
        self.tracks = [tr for tr in self.tracks if tr.existence > 0]

        existing = {tr.id: tr for tr in getattr(env.tracks, "internal", [])}
        updated = []
        for tr in self.tracks:
            do = existing.get(tr.id, None) or DynamicObject()
            do.id = tr.id
            do.t = tr.t
            do.object_class = tr.object_class
            do.pos = tr.state[:2]
            do.v = tr.v_abs
            do.a = tr.a_abs
            if tr.heading is None:
                do.yaw = np.arctan2(tr.state[3], tr.state[2])
            else:
                do.yaw = tr.heading
            do.covar = tr.covar
            do.hull = tr.hull
            do.hull_radius = tr.hull_radius
            do.stationary = tr.stationary == 1.0
            updated.append(snapshot(do))

        env.tracks.internal = updated
