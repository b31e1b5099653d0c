"""
Multi-object tracker built around a fixed-layout struct-of-arrays track
bank: constant-velocity Kalman filtering, map-corridor detection gating,
and hull fusion all run as single vectorized programs over the whole
bank instead of per-track Python loops.

Behavioral parity target: the reference's per-object tracker
(library/tpl/environment/tracking_module.py) — same gating radii,
existence/stationary score dynamics, hull-extreme velocity recovery,
and Hungarian association with per-detection fallback columns.
"""

import numpy as np
from scipy.optimize import linear_sum_assignment

from tpl_tpu.ops import project_many, intersect_polygons, convex_hull
from tpl_tpu.environment.detections import DynamicObject
from tpl_tpu.util import snapshot

GATE_COST_INF = 1e10
BIRTH_COST = 1e4
VEL_BLEND = 0.9          # old-velocity weight in the box-velocity blend
ACC_BLEND = 0.9          # old-acceleration weight


class TrackBank:
    """Struct-of-arrays storage for all live tracks (confirmed + tentative).

    Numeric per-track fields live in packed numpy arrays so predict /
    correct / scoring run as one vectorized expression over the bank.
    Variable-length hulls stay in Python lists indexed by slot.
    """

    _next_id = 10001

    def __init__(self):
        self.n = 0
        self.ids = np.zeros(0, dtype=np.int64)
        self.t = np.zeros(0)
        self.kf_x = np.zeros((0, 4))       # [x, y, vx, vy]
        self.kf_p = np.zeros((0, 4, 4))
        self.v_abs = np.zeros(0)
        self.a_abs = np.zeros(0)
        self.heading = np.zeros(0)         # nan until first reliable value
        self.existence = np.zeros(0)
        self.stationary = np.zeros(0)
        self.confirmed = np.zeros(0, dtype=bool)
        self.hull_radius = np.zeros(0)
        self.classes = []
        self.hulls = []
        self.hulls_prev = []

    def spawn(self, det, existence):
        """Append one tentative slot seeded from a detection."""
        tid = TrackBank._next_id
        TrackBank._next_id += 1
        self.ids = np.append(self.ids, tid)
        self.t = np.append(self.t, det.t)
        x0 = np.array([det.pos[0], det.pos[1], 0.0, 0.0])
        self.kf_x = np.concatenate([self.kf_x, x0[None]], axis=0)
        p0 = np.diag([0.1, 0.1, 0.1, 0.1])
        self.kf_p = np.concatenate([self.kf_p, p0[None]], axis=0)
        self.v_abs = np.append(self.v_abs, 0.0)
        self.a_abs = np.append(self.a_abs, 0.0)
        self.heading = np.append(self.heading, np.nan)
        self.existence = np.append(self.existence, existence)
        self.stationary = np.append(self.stationary, 0.0)
        self.confirmed = np.append(self.confirmed, False)
        self.hull_radius = np.append(self.hull_radius, det.hull_radius)
        self.classes.append(det.object_class)
        self.hulls.append(snapshot(det.hull))
        self.hulls_prev.append(snapshot(det.hull))
        self.n += 1

    def compact(self, keep):
        """Drop every slot where ``keep`` is False."""
        keep = np.asarray(keep, dtype=bool)
        if keep.all():
            return
        idx = np.flatnonzero(keep)
        for name in ("ids", "t", "kf_x", "kf_p", "v_abs", "a_abs",
                     "heading", "existence", "stationary", "confirmed",
                     "hull_radius"):
            setattr(self, name, getattr(self, name)[idx])
        self.classes = [self.classes[i] for i in idx]
        self.hulls = [self.hulls[i] for i in idx]
        self.hulls_prev = [self.hulls_prev[i] for i in idx]
        self.n = len(idx)


def _fuse_overlapping(dets):
    """Merge same-class detections whose hulls intersect.

    Connected components under the "same class AND hulls intersect"
    relation are merged via convex hull of the union; iterated to a
    fixpoint because merged hulls can create new overlaps.
    """
    while True:
        m = len(dets)
        if m < 2:
            return dets
        parent = list(range(m))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        any_edge = False
        for i in range(m):
            for j in range(i + 1, m):
                if dets[i].object_class != dets[j].object_class:
                    continue
                if find(i) == find(j):
                    continue
                if intersect_polygons(dets[i].hull, dets[j].hull):
                    parent[find(j)] = find(i)
                    any_edge = True
        if not any_edge:
            return dets

        groups = {}
        for i in range(m):
            groups.setdefault(find(i), []).append(i)
        fused = []
        for members in groups.values():
            d = dets[members[0]]
            if len(members) > 1:
                d.hull = convex_hull(
                    np.vstack([dets[i].hull for i in members]))
                d.pos = np.mean(d.hull, axis=0)
                d.hull_radius = np.max(
                    np.linalg.norm(d.hull - d.pos[None, :], axis=1))
                d.on_local_map = any(dets[i].on_local_map for i in members)
            fused.append(d)
        dets = fused


class TrackingModule:

    def __init__(self):
        self.d_gating = 5.0
        self.d_gating_birth = 5.0
        self.v_min = 0.5
        self.covar_meas = np.diag([0.01, 0.1])
        self.covar_proc = np.diag([0.01, 0.01, 0.02, 0.02])
        self.bank = TrackBank()
        self.last_update_time = -1.0
        self.newest_det_time = 0.0
        self.maps = []

    # ------------------------------------------------------------------
    # detection preprocessing

    def gate_detections(self, env):
        """Keep fresh detections inside any relevant map corridor.

        One batched projection per map covers all detections at once
        (the reference projects one detection at a time,
        tracking_module.py:65-126).
        """
        dets = [d for d in env.ir_pc_dets if d.t > self.newest_det_time]
        if not dets:
            return []
        self.newest_det_time = max(d.t for d in dets)

        pos = np.array([d.pos for d in dets])           # (M, 2)
        tol = np.array([d.hull_radius for d in dets])
        tol = tol + np.array(
            [2.0 if d.object_class == "pedestrian" else 0.0 for d in dets])

        on_any = np.zeros(len(dets), dtype=bool)
        for d in dets:
            d.on_local_map = False
        for m in self.maps:
            pr = project_many(m.path[:, :2], pos)
            lo = -m.d_right[pr["index"]] - tol
            hi = m.d_left[pr["index"]] + tol
            inside = (pr["distance"] > lo) & (pr["distance"] < hi)
            on_any |= inside
            if m.name == "local_map_behind":
                for i in np.flatnonzero(inside):
                    dets[i].on_local_map = True

        return _fuse_overlapping(
            [d for i, d in enumerate(dets) if on_any[i]])

    # ------------------------------------------------------------------
    # association

    def associate(self, dets):
        """Hungarian assignment of detections to bank slots.

        Cost matrix built in one broadcast: gated euclidean distance,
        with class/time mismatches forced out and one fallback birth
        column per detection. Returns (slot_idx per det, -1 = birth).
        """
        bank = self.bank
        m = len(dets)
        if m == 0 or bank.n == 0:
            return np.full(m, -1, dtype=np.int64)

        det_pos = np.array([d.pos for d in dets])               # (M, 2)
        det_t = np.array([d.t for d in dets])
        dist = np.linalg.norm(
            det_pos[:, None, :] - bank.kf_x[None, :, :2], axis=2)
        same_class = np.array(
            [[bank.classes[j] == d.object_class for j in range(bank.n)]
             for d in dets])
        fresh = det_t[:, None] > bank.t[None, :]
        gated = same_class & fresh & (dist <= self.d_gating)
        cost = np.where(gated, dist, GATE_COST_INF)

        full = np.concatenate(
            [cost, np.full((m, m), BIRTH_COST)], axis=1)
        _, cols = linear_sum_assignment(full)
        return np.where(cols < bank.n, cols, -1)

    # ------------------------------------------------------------------
    # filtering

    def predict(self, dt):
        """CV prediction over the confirmed slice of the bank, one shot."""
        bank = self.bank
        c = bank.confirmed
        if not c.any():
            return
        bank.kf_x[c, :2] += dt * bank.kf_x[c, 2:]
        f = np.eye(4)
        f[0, 2] = f[1, 3] = dt
        bank.kf_p[c] = np.einsum(
            "ab,nbc,dc->nad", f, bank.kf_p[c], f) + self.covar_proc
        for i in np.flatnonzero(c):
            bank.hulls[i] = bank.hulls[i] + dt * bank.kf_x[i, None, 2:]

    def correct(self, dets, det_slot, dt):
        """Measurement update across the whole bank.

        Associated confirmed slots get the KF position update with
        hull-extreme velocity recovery; associated tentative slots get
        confirmed with a finite-difference velocity seed; missed slots
        decay their existence. All score updates are single masked
        array expressions.
        """
        bank = self.bank
        hit = np.zeros(bank.n, dtype=bool)
        det_of = np.full(bank.n, -1, dtype=np.int64)
        for di, si in enumerate(det_slot):
            if si >= 0:
                hit[si] = True
                det_of[si] = di

        # -- existence scores
        miss = ~hit
        bank.existence[miss] = np.maximum(0.0, bank.existence[miss] - dt)
        if not hit.any():
            return

        slots = np.flatnonzero(hit)
        meas_t = np.array([dets[det_of[s]].t for s in slots])
        dt_meas = meas_t - bank.t[slots]
        bank.existence[slots] = np.minimum(
            1.0, bank.existence[slots] + dt_meas)

        was_confirmed = bank.confirmed[slots]

        # -- confirmed slots: KF correct
        for k, s in enumerate(slots):
            d = dets[det_of[s]]
            if not was_confirmed[k]:
                continue
            self._kf_correct(s, d, dt_meas[k])
        # -- tentative slots: promote with finite-difference velocity
        for k, s in enumerate(slots):
            d = dets[det_of[s]]
            if was_confirmed[k]:
                continue
            if bank.classes[s] == "pedestrian":
                vel = np.zeros(2)
            else:
                vel = (d.pos - bank.kf_x[s, :2]) / dt_meas[k]
            bank.kf_x[s] = np.array([d.pos[0], d.pos[1], vel[0], vel[1]])
            bank.hulls_prev[s] = snapshot(d.hull)
            bank.hulls[s] = snapshot(d.hull)
            bank.hull_radius[s] = d.hull_radius
            bank.confirmed[s] = True

        bank.t[slots] = meas_t

        # -- stationary / heading scores for confirmed hits, vectorized
        conf_slots = slots[was_confirmed]
        conf_dtm = dt_meas[was_confirmed]
        if len(conf_slots):
            v = bank.v_abs[conf_slots]
            moving = v > self.v_min
            bank.heading[conf_slots[moving]] = np.arctan2(
                bank.kf_x[conf_slots[moving], 3],
                bank.kf_x[conf_slots[moving], 2])
            st = bank.stationary[conf_slots]
            bank.stationary[conf_slots] = np.where(
                v < self.v_min,
                np.minimum(1.0, st + conf_dtm),
                np.maximum(0.0, st - conf_dtm))

    def _kf_correct(self, s, det, dt_meas):
        """Position update + hull-extreme velocity blend for one slot."""
        bank = self.bank
        # the hull corner that moved least gives the most robust velocity
        # estimate under partial occlusion (reference :180-240)
        lo_v = (det.hull.min(axis=0)
                - bank.hulls_prev[s].min(axis=0)) / dt_meas
        hi_v = (det.hull.max(axis=0)
                - bank.hulls_prev[s].max(axis=0)) / dt_meas
        v_box = np.where(np.abs(lo_v) < np.abs(hi_v), lo_v, hi_v)

        bank.kf_x[s, :2] = det.hull.mean(axis=0)
        bank.kf_x[s, 2:] = (VEL_BLEND * bank.kf_x[s, 2:]
                            + (1.0 - VEL_BLEND) * v_box)

        p = bank.kf_p[s]
        s_inn = p[:2, :2] + self.covar_meas
        gain = p[:, :2] @ np.linalg.inv(s_inn)
        bank.kf_p[s] = p - gain @ p[:2, :]

        v_abs = np.linalg.norm(bank.kf_x[s, 2:])
        bank.a_abs[s] = (ACC_BLEND * bank.a_abs[s]
                         + (1.0 - ACC_BLEND)
                         * (v_abs - bank.v_abs[s]) / dt_meas)
        bank.v_abs[s] = v_abs

        bank.hulls_prev[s] = snapshot(det.hull)
        bank.hulls[s] = snapshot(det.hull)
        bank.hull_radius[s] = det.hull_radius

    # ------------------------------------------------------------------

    def update(self, env):
        if env.get_current_map() is None or env.local_map is None:
            return

        t = env.t
        dt = 0.0 if self.last_update_time < 0 else t - self.last_update_time
        self.last_update_time = t

        self.maps = env.get_relevant_maps()
        self.predict(dt)

        dets = self.gate_detections(env)
        det_slot = self.associate(dets)
        self.correct(dets, det_slot, dt)

        # births: unassociated detections open tentative slots; objects
        # already on the ego corridor start near-dead so a second hit is
        # required, anything merging in from another map is trusted at once
        for di, si in enumerate(det_slot):
            if si < 0:
                d = dets[di]
                self.bank.spawn(d, 0.15 if d.on_local_map else 1.0)

        self.bank.compact(self.bank.existence > 0)
        self.publish(env)

    def publish(self, env):
        """Write confirmed tracks into env.tracks.internal as
        DynamicObjects, reusing prior objects where ids persist."""
        bank = self.bank
        prior = {o.id: o for o in getattr(env.tracks, "internal", [])}
        out = []
        for s in np.flatnonzero(bank.confirmed):
            obj = prior.get(bank.ids[s]) or DynamicObject()
            obj.id = int(bank.ids[s])
            obj.t = bank.t[s]
            obj.object_class = bank.classes[s]
            obj.pos = bank.kf_x[s, :2]
            obj.v = bank.v_abs[s]
            obj.a = bank.a_abs[s]
            if np.isnan(bank.heading[s]):
                obj.yaw = np.arctan2(bank.kf_x[s, 3], bank.kf_x[s, 2])
            else:
                obj.yaw = bank.heading[s]
            obj.covar = bank.kf_p[s]
            obj.hull = bank.hulls[s]
            obj.hull_radius = bank.hull_radius[s]
            obj.stationary = bank.stationary[s] == 1.0
            out.append(snapshot(obj))
        env.tracks.internal = out
