"""Planning helpers (rampify_profile re-export + host-side trajectory
collision screen).
(reference: library/tpl/planning/utils.py)"""

import numpy as np

from tpl_tpu.ops.profile import rampify_profile  # noqa: F401


def _object_chain(obj):
    """Disc-chain approximation of an object footprint in its body frame.

    Returns (offsets (K,), radius): disc centers along the body x-axis and
    the per-disc radius, derived from the detection hull. Falls back to a
    single disc of hull_radius when no usable hull/yaw is available.
    """
    hull = np.asarray(obj.hull, dtype=np.float64)
    if len(hull) < 3 or obj.yaw is None:
        return np.zeros(1), max(float(obj.hull_radius), 0.5)
    c, s = np.cos(-obj.yaw), np.sin(-obj.yaw)
    rel = hull - np.asarray(obj.pos, dtype=np.float64)[None, :]
    xb = rel[:, 0] * c - rel[:, 1] * s
    yb = rel[:, 0] * s + rel[:, 1] * c
    half_len = max(float(np.max(np.abs(xb))), 0.5)
    radius = max(float(np.max(np.abs(yb))), 0.5)
    n = max(1, int(np.ceil(half_len / radius)))
    offsets = np.linspace(-half_len + radius, half_len - radius, n) \
        if n > 1 else np.zeros(1)
    return offsets, radius


def traj_collision_imminent(traj_np, objects, width_veh, length_veh,
                            t_now, margin=0.1, horizon=None,
                            min_closing_speed=0.0,
                            ignore_leading_aligned=False):
    """Conservative host-only screen of a planned trajectory against the
    latest predictions.

    This restores the reference's per-pass reaction to newly appearing
    threats (reevalTraj, lat_lon_planner.cu:358 / lon_planner.cu:227)
    without a device round trip: both footprints are approximated by disc
    chains and the predicted object motion is interpolated onto the plan's
    time grid. A hit only forces an early replan (the DP solve then judges
    validity exactly), so false positives cost one extra replan, never a
    wrong trajectory.

    traj_np: (N, >=7) with columns 0=t (absolute), 2=x, 3=y, 6=heading.
    objects: env.predicted (DynamicObject list with .predictions holding
        states (M, 5) = [t_rel, x, y, yaw, v]).
    horizon: only screen plan points within this many seconds of t_now
        (None = whole plan).
    min_closing_speed: when > 0, a marginal chain overlap only counts if
        the ego plan and the object are actually closing on each other at
        that sample faster than this (m/s); deep penetrations (anchor
        distance under half the combined radius) count regardless.
    ignore_leading_aligned: skip overlaps against MOVING objects that are
        heading-aligned with the ego plan at the overlap sample.  This is
        the discriminator an emergency latch needs: the RSTP velocity
        solver plans in the arc-length domain, so its receding-horizon
        leader handling is safe even though the open-loop plan
        legitimately catches up to — and passes through — the leader's
        predicted position within the horizon (reference
        velocity_optim.py:106-139 has the same open-loop property).
        Oncoming, crossing and stationary threats — the cases the
        s-domain solver does NOT govern — are always screened.
    Returns True if any object's predicted chain overlaps the ego chain.
    """
    if traj_np is None or len(traj_np) == 0 or not objects:
        return False

    rel_t = traj_np[:, 0] - t_now
    sel = rel_t >= -1e-6
    if horizon is not None:
        sel &= rel_t <= horizon
    if not np.any(sel):
        return False
    pts = traj_np[sel]
    rel_t = rel_t[sel]

    r_ego = width_veh * 0.5 + margin
    n_ego = max(1, int(np.ceil(0.5 * length_veh / r_ego)))
    ego_offs = np.linspace(-0.5 * length_veh + r_ego,
                           0.5 * length_veh - r_ego, n_ego) \
        if n_ego > 1 else np.zeros(1)
    ego_dir = np.stack([np.cos(pts[:, 6]), np.sin(pts[:, 6])], axis=-1)
    # (N, n_ego, 2)
    ego_cs = pts[:, None, 2:4] + ego_offs[None, :, None] * ego_dir[:, None]

    ego_vel = None
    if min_closing_speed > 0.0 and len(pts) > 1:
        # ego plan velocity vectors by finite differences over plan time
        dts = np.gradient(rel_t)
        dts = np.where(np.abs(dts) < 1e-3, 1e-3, dts)
        ego_vel = np.stack([np.gradient(pts[:, 2]) / dts,
                            np.gradient(pts[:, 3]) / dts], axis=-1)

    for obj in objects:
        offs, r_obj = _object_chain(obj)
        reach = r_ego + r_obj + abs(offs).max() if len(offs) else r_ego + r_obj
        for pred in obj.predictions:
            st = np.asarray(pred.states, dtype=np.float64)
            if len(st) == 0:
                continue
            if rel_t[-1] < st[0, 0] or rel_t[0] > st[-1, 0]:
                continue
            ox = np.interp(rel_t, st[:, 0], st[:, 1])
            oy = np.interp(rel_t, st[:, 0], st[:, 2])
            # coarse screen on the chain anchor point
            d2 = (pts[:, 2] - ox) ** 2 + (pts[:, 3] - oy) ** 2
            cand = d2 < (reach + 0.5) ** 2
            if not np.any(cand):
                continue
            yaw = np.interp(rel_t[cand],
                            st[:, 0], np.unwrap(st[:, 3]))
            od = np.stack([np.cos(yaw), np.sin(yaw)], axis=-1)
            # (Nc, n_obj, 2)
            ocs = np.stack([ox[cand], oy[cand]], axis=-1)[:, None, :] \
                + offs[None, :, None] * od[:, None]
            diff = ego_cs[cand][:, :, None, :] - ocs[:, None, :, :]
            d2s = np.min(np.sum(diff * diff, axis=-1), axis=(1, 2))
            hit = d2s < (r_ego + r_obj) ** 2
            if not np.any(hit):
                continue
            if not ignore_leading_aligned and min_closing_speed <= 0.0:
                return True
            idxs = np.flatnonzero(cand)[hit]
            dx = ox[idxs] - pts[idxs, 2]
            dy = oy[idxs] - pts[idxs, 3]
            dist = np.maximum(np.hypot(dx, dy), 1e-6)
            oyaw = np.interp(rel_t[idxs], st[:, 0], np.unwrap(st[:, 3]))
            ov = np.interp(rel_t[idxs], st[:, 0], st[:, 4])
            if ignore_leading_aligned:
                # NO ahead/behind test: the s-domain plan legitimately
                # passes through a slower leader's predicted position in
                # open loop (the leader maps to a static arc position),
                # leaving overlap samples on both sides of the object
                ego_h = pts[idxs, 6]
                aligned = np.cos(oyaw - ego_h) > 0.7
                keep = ~(aligned & (ov > 1.0))
                if not np.any(keep):
                    continue
                idxs = idxs[keep]
                dx, dy, dist = dx[keep], dy[keep], dist[keep]
                oyaw, ov = oyaw[keep], ov[keep]
            # deep penetration is a hit no matter the relative motion
            if np.any(dist < 0.5 * (r_ego + r_obj)):
                return True
            if min_closing_speed <= 0.0 or ego_vel is None:
                return True
            rel_v = ego_vel[idxs] - np.stack(
                [ov * np.cos(oyaw), ov * np.sin(oyaw)], axis=-1)
            closing = (rel_v[:, 0] * dx + rel_v[:, 1] * dy) / dist
            if np.any(closing >= min_closing_speed):
                return True
    return False
