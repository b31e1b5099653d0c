"""
RSTP stage 1: corridor-constrained lateral profile optimization.

Builds the lateral corridor from the local map and predicted objects
(including the evade-side decision), smooths evasion ramps, and solves the
corridor-constrained lateral profile with the iLQR core.
(reference: library/tpl/planning/path_vel_decomp/path_optim.py)
"""

import numpy as np

from tpl_tpu import util
from tpl_tpu.util import runtime
from tpl_tpu.optim import problems
from tpl_tpu.optim.solver import Solver


def rampify_corridor(step, horizon, evasion_sharpness, proj_distance, path,
                     gap, lower, upper):
    """Smooth evasive lower-bound profile via two slope-limited passes.

    (reference: path_optim.py:11-55; forward pass then backward pass, slope
    limited by the opposite corridor bound minus the lateral gap)
    """
    from tpl_tpu import native
    res = native.rampify_corridor(step, horizon, evasion_sharpness,
                                  proj_distance, path, gap, lower, upper)
    if res is not None:
        return res
    n = len(path)
    d_offset_fwd = np.zeros(n) - 10
    d_offset_bwd = np.zeros(n) - 10

    for pass_nr in range(2):
        if pass_nr == 0:
            pd = d_offset_fwd
            d = lower[0]
            i_range = range(0, horizon)
        else:
            pd = d_offset_bwd
            d = lower[horizon - 1]
            i_range = range(horizon - 1, -1, -1)

        for i in i_range:
            if pass_nr == 0:
                slope_lim_range = range(i, horizon)
            else:
                slope_lim_range = range(i, -1, -1)

            d = max(lower[i], d)
            pd[i] = d

            slope = -(evasion_sharpness / max(path[i, 5], 1e-8) ** 2)
            ks = np.fromiter(slope_lim_range, dtype=np.int64)
            if len(ks):
                cand = (upper[ks] - gap - d) / (np.maximum(
                    1, np.abs(ks - i)) * step)
                slope = min(slope, float(np.min(cand)))

            if pass_nr == 1:
                slope = min(slope, (proj_distance - d) / max(1, (i * step)))

            d += step * slope

    return np.maximum(d_offset_fwd, d_offset_bwd)


class CostFunctionParams:

    def __init__(self):
        self.w_d = 0.5
        self.w_v_d = 0.5
        self.w_a_d = 0.5
        self.w_k = 0.5


class Params:

    def __init__(self):
        self.horizon = 250
        self.step = 0.5
        self.ref_step = 0.5

        self.min_d_dd = -2.5
        self.max_d_dd = 2.5
        self.max_lat_acc = 2.5

        self.lateral_min_gap = 2.0
        self.offset_center_line = 0.0

        # keep already-traversed path fixed for this many seconds
        self.fix_seconds = 3.0

        self.evasion_lon_d_safe = 4
        self.evasion_lat_d_safe = 2.0
        self.evasion_lat_d_comf = 2.0
        self.evasion_sharpness = 20.0

        # Oncoming-traffic handling beyond the reference (which collides
        # in its own overtake-against-oncoming stress scenarios, see
        # PARITY.md): a larger lateral margin against oncoming hulls, and
        # a meeting-point estimate from the ego's MEASURED speed instead
        # of the map speed profile (path_optim.py:193-196 uses
        # path[0, 5]; when the ego drives slower than the map profile —
        # exactly what happens while yielding — that misplaces the carve
        # window beyond the true meeting zone and uncovers the near
        # field, letting the path nose into the oncoming corridor).
        self.evasion_lat_d_safe_oncoming = 2.5
        self.oncoming_v_scale_ego = True

        self.cost_func = CostFunctionParams()


class PathOptim:

    def __init__(self, horizon_max=250):
        prob, spec = problems.lateral_profile(ref_capacity=512)
        self.opt = Solver(prob, spec, horizon_max=horizon_max, device="cpu")
        self.opt.lg_mult_limit = 0.0
        self.opt.barrier_weight[:] = 1000.0

        self.opt_path = np.zeros((1, 6))
        self.d_lower_constr = np.zeros((0, 1))
        self.d_upper_constr = np.zeros((0, 1))

        self.reset_counter = 0
        self.reset_required = False
        self.prev_time = -10000.0

    def prepare(self, env, params):
        """Corridor construction shared by the host and fused pipelines.

        Computes everything up to (but excluding) the solver-state
        mutations: window, corridor bounds, evade decisions, rampified
        reference profiles and warm-start intents.  Writes the final
        reference arrays into ``opt.params`` (the next tick's fix-region
        copy reads them back) and returns the solve inputs.
        (reference: path_optim.py:119-299)
        """
        local_map = env.local_map
        path_len = min(params.horizon, local_map.steps_ref)
        path = local_map.path[:path_len].copy()
        veh = env.vehicle_state
        proj_veh = util.project(path[:, :2], np.array([veh.x, veh.y]))
        l_veh = veh.rear_axis_to_front + veh.rear_axis_to_rear

        opt = self.opt
        opt.horizon = path_len
        opt.step = params.step
        opt.params.ref_step = local_map.step_size_ref

        opt.params.merge(vars(params.cost_func))

        d_lower_constr = -local_map.d_right[:path_len] + veh.width / 2.0
        d_upper_constr = -local_map.d_left[:path_len] + veh.width / 2.0

        # (re-)initialization via warm starting (path_optim.py:140-170)

        si = local_map.shift_idx_start_ref

        self.reset_required |= self.reset_counter != env.reset_counter
        self.reset_required |= self.prev_time > env.t
        self.reset_counter = env.reset_counter
        self.prev_time = env.t

        length_veh = (veh.rear_axis_to_rear + veh.rear_axis_to_front
                      + veh.v * params.fix_seconds)
        fix = int(np.ceil(length_veh / local_map.step_size_ref))

        reset = bool(self.reset_required or not 0 <= si < path_len)
        if not reset:
            # keep values fixed which the vehicle already traversed
            d_upper_constr[:fix] = -opt.params.d_upper_constr[si:si + fix]
            d_lower_constr[:fix] = opt.params.d_lower_constr[si:si + fix]

        self.reset_required = False

        w_path = (-d_upper_constr - d_lower_constr)
        d_mid = d_lower_constr + w_path / 2.0

        # incorporate dynamic objects (path_optim.py:177-252)

        evade_these = []
        for obj in env.predicted:
            local_map_preds = [
                p for p in obj.predictions
                if p.uuid_assoc_map == env.local_map_behind.uuid]
            if len(local_map_preds) == 0:
                continue
            evade_these.append((obj, local_map_preds[0]))

        # discard objects after the first stop point
        first_stop = int(np.argmax(path[:, 5] < 0.1))
        if first_stop == 0 and path[0, 5] > 0.1:
            first_stop = 1000

        for obj, pred in evade_these:
            pps = util.project(path[:, :2], obj.hull)

            p_min = min(pps, key=lambda p: p.arc_len)
            p_max = max(pps, key=lambda p: p.arc_len)

            if p_min.index > first_stop:
                continue

            oncoming = pred.cos_angle_dist < 0.0

            v_ego = path[0, 5]
            if oncoming and params.oncoming_v_scale_ego:
                # yielding ego drives below the map profile; the meeting
                # point must follow the measured speed or the carve lands
                # beyond the true conflict zone
                v_ego = min(v_ego, max(veh.v, 0.5))
            v_diff = v_ego - obj.v * pred.cos_angle_dist
            v_scale = v_ego / max(0.001, abs(v_diff))
            if v_diff < 0.0:
                v_scale *= -1.0

            arc_min = (p_min.arc_len - params.evasion_lon_d_safe
                       - l_veh / 2) * v_scale
            arc_max = (p_max.arc_len + params.evasion_lon_d_safe
                       + l_veh / 2) * v_scale

            idx_min = max(0, min(path.shape[0], int(arc_min / opt.step)))
            idx_max = max(0, min(path.shape[0], int(arc_max / opt.step)))

            pps_in = [p for p in pps if p.in_bounds
                      and -local_map.d_right[p.index] <= p.distance
                      <= local_map.d_left[p.index]]
            if len(pps_in) == 0:
                continue

            evade_side = obj.evade
            if evade_side not in ("right", "left"):
                # decide whether to evade anyway (slow or oncoming objects)
                if obj.v < path[0, 5] * 0.75 or pred.cos_angle_dist < 0.0:
                    only_left = True
                    only_right = True
                    for p in pps_in:
                        only_left &= p.distance < d_mid[p.start]
                        only_right &= p.distance > d_mid[p.start]
                    if only_left:
                        evade_side = "left"
                    if only_right:
                        evade_side = "right"

            if evade_side == "right":
                d_mult = -1.0
                side = d_upper_constr
                other_side = d_lower_constr
            elif evade_side == "left":
                d_mult = 1.0
                side = d_lower_constr
                other_side = d_upper_constr
            else:
                continue

            lat_d_safe = params.evasion_lat_d_safe
            if oncoming:
                lat_d_safe = max(lat_d_safe,
                                 params.evasion_lat_d_safe_oncoming)

            d_max = max(pps_in, key=lambda p: d_mult * p.distance).distance
            d_max += d_mult * (lat_d_safe + veh.width / 2.0)
            evade_dist = d_mult * d_max

            for i in range(idx_min, idx_max):
                side[i] = np.minimum(-other_side[i],
                                     np.maximum(side[i], evade_dist))

        self.d_lower_constr = d_lower_constr
        self.d_upper_constr = d_upper_constr

        # smoothed evasive reference profiles (path_optim.py:259-288)

        d_lower_ref = rampify_corridor(
            opt.step, opt.horizon, params.evasion_sharpness,
            proj_veh.distance, path, params.lateral_min_gap,
            d_lower_constr, -d_upper_constr)

        d_upper_ref = rampify_corridor(
            opt.step, opt.horizon, params.evasion_sharpness,
            -proj_veh.distance, path, params.lateral_min_gap,
            d_upper_constr, -d_lower_constr)
        d_upper_ref = -d_upper_ref

        w_corridor = d_upper_ref - d_lower_ref
        d_trg = d_lower_ref + np.minimum(w_corridor / 2,
                                         params.evasion_lat_d_comf)

        center_free = ((d_lower_ref < params.offset_center_line)
                       & (d_upper_ref > params.offset_center_line))
        d_trg[center_free] = params.offset_center_line

        # final reference arrays; the next tick's fix-region copy reads
        # these back from opt.params
        opt.params.k_ref = path[:, 4]
        opt.params.d_lower_constr = d_lower_ref
        opt.params.d_upper_constr = d_upper_ref
        opt.params.d_offset = d_trg

        return dict(
            path=path, path_len=path_len, proj_veh=proj_veh,
            d_lower_ref=d_lower_ref, d_upper_ref=d_upper_ref, d_trg=d_trg,
            si=si, fix=fix, reset=reset,
            x0=np.array([proj_veh.distance, 0.0]))

    @runtime
    def update(self, env, params):
        prep = self.prepare(env, params)

        opt = self.opt
        opt.u_min[:] = -params.max_d_dd
        opt.u_max[:] = params.max_d_dd

        if prep["reset"]:
            opt.x[0, :] = prep["x0"]
            opt.u[:] = 0.0
        else:
            opt.shift(prep["si"])
            opt.u_max[:prep["fix"]] = 0.0
            opt.u_min[:prep["fix"]] = 0.0

        opt.integrator_type = opt.EULER
        opt.update()

        # transform to cartesian and resample (path_optim.py:301-307)

        path = prep["path"]
        path[:, 0] += -np.sin(path[:, 2]) * opt.x[:-1, 0]
        path[:, 1] += np.cos(path[:, 2]) * opt.x[:-1, 0]
        path[:, 2] += np.arctan(opt.x[:-1, 1])

        self.opt_path = util.resample_path(path, opt.step, opt.horizon)
