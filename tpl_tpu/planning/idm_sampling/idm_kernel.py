"""
IDM sampling rollout planner kernel: closed-loop forward simulation of
lateral-offset candidates with Stanley lateral control and IDM longitudinal
control, evaluated for collisions, interactions and comfort.

TPU-native re-design of the reference's C++/OpenMP planner (reference:
library/src/idm_sampling.cpp): all candidates roll out in one
vmap-over-candidates lax.scan; the per-step leader lookups, stop-point
scans, reference-line projections and the SAT collision checks are
vectorized over the padded object set. The same kernel batches over
thousands of scenario rollouts per chip (vmap over a scenario axis).

Object tensors are padded to (O, P, K) with validity masks; the host-side
preprocessing (hull merge, prediction projections) lives in the planner
driver.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tpl_tpu.ops.jgeometry import project_polyline, polygons_intersect


class IdmSamplingParams:
    """(reference: idm_sampling.hpp:4-55)"""

    def __init__(self):
        self.steps_t = 100
        self.dt = 0.1

        self.dead_time = 0.0

        self.lat_steps = 2
        self.d_safe_lat = 0.25
        self.d_safe_lat_path = 0.5
        self.d_comf_lat = 1.0

        self.k_stanley = 1.0
        self.v_offset_stanley = 1.0

        self.steer_angle_max = 0.7
        self.steer_rate_max = 0.6

        self.t_vel_lookahead = 2.0
        self.d_safe_min = 1.0
        self.t_headway_desired = 1.0
        self.a_break_comf = 1.5

        self.idm_exp_dcc = 4.0
        self.idm_exp_acc = 4.0

        self.k_p_s = 1.0
        self.k_p_v = 1.0

        self.a_max = 2.0
        self.a_min = -3.0
        self.j_max = 1.5
        self.j_min = -1.5

        self.d_next_inters_point = 1.0e6

        self.width_veh = 0.0
        self.length_veh = 0.0
        self.radius_veh = 0.0
        self.dist_front_veh = 0.0
        self.dist_back_veh = 0.0
        self.wheel_base = 4.0

        self.l_trg = 0.0
        self.w_l = 1.0
        self.w_a = 1.0
        self.w_lat_dist = 1.0

        self.dt_decision = 0.2

        self.enable_reverse = False

    def dynamic_dict(self):
        keys = ("dt", "dead_time", "d_safe_lat", "d_safe_lat_path",
                "d_comf_lat", "k_stanley", "v_offset_stanley",
                "steer_angle_max", "steer_rate_max", "t_vel_lookahead",
                "d_safe_min", "t_headway_desired", "a_break_comf",
                "idm_exp_dcc", "idm_exp_acc", "k_p_s", "k_p_v", "a_max",
                "a_min", "j_max", "j_min", "width_veh", "length_veh",
                "radius_veh", "dist_front_veh", "dist_back_veh",
                "wheel_base", "l_trg", "w_l", "w_a", "w_lat_dist")
        return {k: jnp.float32(getattr(self, k)) for k in keys}


# ref state fields: t, x, y, heading, v, a, s, l, d_right, d_left
R_T, R_X, R_Y, R_H, R_V, R_A, R_S, R_L, R_DR, R_DL = range(10)
# vehicle state fields: t, x, y, heading, steer, v, a, s, l
V_T, V_X, V_Y, V_H, V_ST, V_V, V_A, V_S, V_L = range(9)


def _interp_by_t(ts, values, t):
    """Linear interp of (P, ...) values by times ts (P,)."""
    i = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1,
                 0, ts.shape[0] - 2)
    a = jnp.clip((t - ts[i]) / jnp.maximum(ts[i + 1] - ts[i], 1e-9),
                 0.0, 1.0)
    va = values[i]
    vb = values[i + 1]
    if values.ndim > 1:
        a = a.reshape((1,) * (values.ndim - 1)).squeeze() if False else a
        for _ in range(values.ndim - 1):
            a = a[..., None]
    return va * (1.0 - a) + vb * a


def _interp_hulls_by_t(ts, hulls, t):
    """Linear interp of (P, K, 2) hull sweeps by times ts (P,).

    Same math as :func:`_interp_by_t`, but the time axis is contracted
    with a 2-hot weight vector so XLA lowers it as a small matmul.  The
    gather form materializes a (cand, T, O, P, K) fusion output under the
    candidate/time vmaps, which overflows HBM beyond ~1k candidates."""
    n = ts.shape[0]
    i = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, n - 2)
    a = jnp.clip((t - ts[i]) / jnp.maximum(ts[i + 1] - ts[i], 1e-9),
                 0.0, 1.0)
    w = jnp.zeros((n,), hulls.dtype).at[i].set(1.0 - a).at[i + 1].add(a)
    return jnp.einsum("p,pkc->kc", w, hulls)


def make_idm_kernel(spec):
    """spec: steps_t, n_ref (ref line points), n_obj, n_pred, n_hull
    (all static)."""
    T = spec["steps_t"]
    NR = spec["n_ref"]
    O = spec["n_obj"]
    P = spec["n_pred"]
    K = spec["n_hull"]
    f32 = jnp.float32

    def ref_lerp(ref_line, ref_step, s):
        n = NR
        q = s / ref_step
        i0 = jnp.clip(jnp.floor(q), 0, n - 1).astype(jnp.int32)
        i1 = jnp.clip(jnp.ceil(q), 0, n - 1).astype(jnp.int32)
        a = jnp.clip(q - i0, 0.0, 1.0)
        if hasattr(a, "ndim") and a.ndim > 0:
            a = a[..., None]
        return ref_line[i0] * (1.0 - a) + ref_line[i1] * a

    def obj_hull_at(objs, t):
        """Merged prediction hulls lerped at time t -> (O, K, 2)."""
        def one(ts, hulls):
            return _interp_hulls_by_t(ts, hulls, t)
        return jax.vmap(one)(objs["pred_t"], objs["hull_preds"])

    def obj_state_at(objs, t):
        def one(ts, xy, heading, v):
            return (_interp_by_t(ts, xy, t),
                    _interp_by_t(ts, heading, t),
                    _interp_by_t(ts, v, t))
        return jax.vmap(one)(objs["pred_t"], objs["pred_xy"],
                             objs["pred_heading"], objs["pred_v"])

    def get_leader(ref_state, l_trg, objs, pp):
        """(idm_sampling.cpp:266-352). Returns (d_lead, v_lead, d_right,
        d_left)."""
        x, y, h, t, s = (ref_state[R_X], ref_state[R_Y], ref_state[R_H],
                         ref_state[R_T], ref_state[R_S])
        dirv = jnp.stack([jnp.cos(h), jnp.sin(h)])
        p0 = jnp.stack([x, y]) - dirv * pp["dist_back_veh"]
        ray_len = 200.0 + pp["dist_back_veh"]

        hulls = obj_hull_at(objs, t)                          # (O, K, 2)
        pos_o, head_o, v_o = obj_state_at(objs, t)            # (O,2),(O,),(O,)

        rel = hulls - p0                                       # (O, K, 2)
        arc = jnp.einsum("okd,d->ok", rel, dirv)               # along ray
        lat = rel[..., 1] * dirv[0] - rel[..., 0] * dirv[1]
        # signed distance: positive left of ray = cross(dir, rel)
        lat = dirv[0] * rel[..., 1] - dirv[1] * rel[..., 0]
        in_bounds = (arc > 0.0) & (arc < ray_len)

        valid = objs["valid"][:, None] & objs["on_local_map"][:, None]

        on_left = jnp.any((lat > 0.0) & valid, axis=1)         # (O,)
        on_right = jnp.any((lat < 0.0) & valid, axis=1)
        spans = on_left & on_right

        close_lat = jnp.abs(lat) < pp["width_veh"] / 2.0 + pp["d_safe_lat"]
        lead_mask = in_bounds & valid & (spans[:, None] | close_lat)
        dists = jnp.where(lead_mask, arc - pp["dist_back_veh"], jnp.inf)

        v_cand = v_o * jnp.cos(head_o - h)                     # (O,)
        flat = dists.reshape(-1)
        idx = jnp.argmin(flat)
        d_lead = flat[idx]
        v_lead = jnp.where(jnp.isfinite(d_lead),
                           v_cand[idx // K], 0.0)

        # lateral clearances ahead of the front bumper
        front_mask = in_bounds & valid & (arc < pp["dist_front_veh"])
        d_right = jnp.min(jnp.where(
            front_mask & (lat < 0.0) & ~spans[:, None],
            jnp.abs(lat), 100.0))
        d_left = jnp.min(jnp.where(
            front_mask & (lat > 0.0) & ~spans[:, None],
            jnp.abs(lat), 100.0))
        any_span_front = jnp.any(front_mask & spans[:, None])
        d_right = jnp.where(any_span_front, 0.0, d_right)
        d_left = jnp.where(any_span_front, 0.0, d_left)

        # additional hull-projection check on the target lane
        hp = jax.vmap(lambda ts, hps: _interp_by_t(ts, hps, t))(
            objs["pred_t"], objs["hull_projs"])                # (O, 4)
        on_lane = ((l_trg > hp[:, 2] - pp["width_veh"] / 2.0
                    - pp["d_safe_lat"])
                   & (l_trg < hp[:, 3] + pp["width_veh"] / 2.0
                      + pp["d_safe_lat"])
                   & (s < hp[:, 1]) & objs["valid"])
        lane_d = jnp.where(on_lane, hp[:, 0] - s, jnp.inf)
        li = jnp.argmin(lane_d)
        better = lane_d[li] < d_lead
        v_lead = jnp.where(better, v_o[li], v_lead)
        d_lead = jnp.where(better, lane_d[li], d_lead)

        d_lead = jnp.where(jnp.isfinite(d_lead), d_lead, 1e6)

        # stronger reaction to oncoming traffic
        d_lead = jnp.where(v_lead < 0.0, d_lead - 10.0, d_lead)
        v_lead = jnp.where(v_lead < 0.0, v_lead * 2.0, v_lead)
        return d_lead, v_lead, d_right, d_left

    def next_stop_point(ref_state, ref_line, ref_step, pp):
        """(idm_sampling.cpp:238-263)"""
        s = ref_state[R_S]
        l = ref_state[R_L]
        ss = jnp.arange(NR, dtype=f32) * ref_step
        ahead = ss >= s
        d = ss - s
        zero_v = ref_line[:, 4] == 0.0
        off_road = (l < -ref_line[:, 6]) | (l > ref_line[:, 5])
        d_min = jnp.min(jnp.where(ahead & zero_v, d, jnp.inf))
        d_min = jnp.minimum(d_min, jnp.min(jnp.where(
            ahead & off_road, d - pp["d_safe_min"], jnp.inf)))
        return d_min

    def rollout(init_ref, init_con, l_trg, d_stop0, dt_replan, ref_line,
                ref_step, linestrip, objs, pp):
        """One candidate closed-loop rollout (idm_sampling.cpp:354-530).
        Returns ref_states (T, 10), states (T, 9)."""

        def step(carry, idx_t):
            ref, con = carry

            # --- reference update ---
            v_trg_dist = ref[R_V] * pp["t_vel_lookahead"]
            steps = 25
            offs = jnp.arange(steps, dtype=f32) * (v_trg_dist / steps)
            v_trg = jnp.min(ref_lerp(ref_line, ref_step,
                                     ref[R_S] + offs)[:, 4])
            v_trg = jnp.maximum(0.001, v_trg)

            d_lead, v_lead, d_right, d_left = get_leader(ref, l_trg, objs,
                                                         pp)
            d_stop = next_stop_point(ref, ref_line, ref_step, pp)
            d_stop = jnp.minimum(d_stop0 - ref[R_S], d_stop)

            t_headway = pp["t_headway_desired"] * (
                1.0 - jnp.tanh((ref[R_L] - l_trg) * 0.5) ** 2)
            t_headway = jnp.maximum(t_headway, 0.5)

            s_net_stop = d_stop - pp["dist_front_veh"] + 1.0
            s_star_stop = (1.0 + ref[R_V] * t_headway
                           + ref[R_V] ** 2
                           / (2 * jnp.sqrt(pp["a_max"]
                                           * pp["a_break_comf"])))
            inter_term = s_star_stop / s_net_stop

            s_net = d_lead - pp["dist_front_veh"]
            s_star = (pp["d_safe_min"] + ref[R_V] * t_headway
                      + ref[R_V] * (ref[R_V] - v_lead)
                      / (2 * jnp.sqrt(pp["a_max"] * pp["a_break_comf"])))
            inter_term = jnp.where(d_lead < d_stop,
                                   jnp.maximum(s_star / s_net, inter_term),
                                   inter_term)

            v_rel = ref[R_V] / v_trg
            exp = jnp.where(v_rel < 1.0, pp["idm_exp_acc"],
                            pp["idm_exp_dcc"])
            a_idm = pp["a_max"] * (1.0 - v_rel ** exp - inter_term ** 2)

            rp = ref_lerp(ref_line, ref_step, ref[R_S])
            # ref_line channels: x, y, heading, k, v_max, d_left, d_right
            l_change = jnp.clip(l_trg - ref[R_L], -1.5, 1.5)
            nl = ref[R_L] + l_change * pp["dt"]
            s_rate = (ref[R_V] * jnp.cos(ref[R_H] - rp[2])
                      / (1.0 - ref[R_L] * rp[3]))
            ns = ref[R_S] + s_rate * pp["dt"]
            nrp = ref_lerp(ref_line, ref_step, ns)

            heading_rel = _short_angle(ref[R_H], rp[2])
            heading_rel = heading_rel + s_rate * rp[3] * pp["dt"]
            nh = nrp[2] + heading_rel

            dt_control = jnp.where(idx_t == 0, dt_replan, pp["dt"])

            lane_changing = (jnp.abs(ref[R_L] - l_trg) > 0.5) \
                & (ref[R_V] > 1.0) & (ref[R_V] < 5.0)
            a_idm = jnp.where(lane_changing, jnp.minimum(0.0, a_idm),
                              a_idm)

            j = (a_idm - ref[R_A]) / jnp.maximum(dt_control, 1e-6)
            j_standstill = jnp.clip(j, pp["j_min"],
                                    -ref[R_A] / jnp.maximum(dt_control,
                                                            1e-6))
            j = jnp.where((ref[R_V] == 0.0) & (ref[R_A] < 0.0),
                          j_standstill,
                          jnp.clip(j, pp["j_min"], pp["j_max"]))

            a_new = jnp.clip(ref[R_A] + j * dt_control,
                             pp["a_min"], pp["a_max"])

            ref_out = ref.at[R_A].set(a_new)
            ref_out = ref_out.at[R_DR].set(d_right)
            ref_out = ref_out.at[R_DL].set(d_left)

            nref = jnp.zeros_like(ref)
            nref = nref.at[R_T].set(ref[R_T] + pp["dt"])
            nref = nref.at[R_L].set(nl)
            nref = nref.at[R_S].set(ns)
            nref = nref.at[R_H].set(nh)
            nref = nref.at[R_X].set(nrp[0] - nl * jnp.sin(nrp[2]))
            nref = nref.at[R_Y].set(nrp[1] + nl * jnp.cos(nrp[2]))
            nref = nref.at[R_V].set(jnp.maximum(
                0.0, ref[R_V] + a_new * pp["dt"]))
            nref = nref.at[R_A].set(a_new)

            # --- following controller (Stanley + PD) ---
            rs = ref_out
            rp_con = ref_lerp(ref_line, ref_step, con[V_S])
            k_adj = jnp.where(jnp.abs(rp_con[3]) > 1e-4,
                              1.0 / (1.0 / rp_con[3] + con[V_L]),
                              rp_con[3])
            steer_ref = jnp.arctan(k_adj * pp["wheel_base"])
            angle_diff = _short_angle(con[V_H], rs[R_H])
            lat_diff = rs[R_L] - con[V_L]
            steer_angle = steer_ref + angle_diff + jnp.arctan(
                pp["k_stanley"] * lat_diff
                / (pp["v_offset_stanley"] + con[V_V]))
            steer_angle = jnp.clip(steer_angle, -pp["steer_angle_max"],
                                   pp["steer_angle_max"])
            steer_rate = jnp.clip(
                (steer_angle - con[V_ST]) / jnp.maximum(dt_control, 1e-6),
                -pp["steer_rate_max"], pp["steer_rate_max"])
            do_steer = (con[V_V] > 1.0) | (con[V_A] > 0.5) \
                | (jnp.abs(lat_diff) > 0.1)
            new_steer = jnp.where(do_steer,
                                  con[V_ST] + steer_rate * dt_control,
                                  con[V_ST])

            err_s = rs[R_S] - con[V_S]
            err_v = rs[R_V] - con[V_V]
            a_con = rs[R_A] + err_s * pp["k_p_s"] + err_v * pp["k_p_v"]

            con_out = con.at[V_ST].set(new_steer)
            con_out = con_out.at[V_A].set(a_con)

            ncon = jnp.zeros_like(con)
            nv = jnp.maximum(0.0, con[V_V] + pp["dt"] * a_con)
            nheading = con[V_H] + pp["dt"] * nv * jnp.tan(new_steer) \
                / pp["wheel_base"]
            nx = con[V_X] + pp["dt"] * nv * jnp.cos(nheading)
            ny = con[V_Y] + pp["dt"] * nv * jnp.sin(nheading)
            proj = project_polyline(linestrip, jnp.stack([nx, ny]))
            ncon = ncon.at[V_T].set(con[V_T] + pp["dt"])
            ncon = ncon.at[V_A].set(a_con)
            ncon = ncon.at[V_ST].set(new_steer)
            ncon = ncon.at[V_V].set(nv)
            ncon = ncon.at[V_H].set(nheading)
            ncon = ncon.at[V_X].set(nx)
            ncon = ncon.at[V_Y].set(ny)
            ncon = ncon.at[V_S].set(proj["arc_len"])
            ncon = ncon.at[V_L].set(proj["distance"])

            return (nref, ncon), (ref_out, con_out)

        (last_ref, last_con), (refs, cons) = jax.lax.scan(
            step, (init_ref, init_con), jnp.arange(T - 1))
        ref_states = jnp.concatenate([refs, last_ref[None]], axis=0)
        states = jnp.concatenate([cons, last_con[None]], axis=0)
        return ref_states, states

    def _short_angle(a0, a1):
        m = 2 * jnp.pi
        da = jnp.mod(a1 - a0, m)
        return jnp.mod(2 * da, m) - da

    def vehicle_hull(state, pp):
        base = jnp.stack([
            jnp.stack([pp["dist_back_veh"], -pp["width_veh"] / 2]),
            jnp.stack([pp["dist_front_veh"], -pp["width_veh"] / 2]),
            jnp.stack([pp["dist_front_veh"], pp["width_veh"] / 2]),
            jnp.stack([pp["dist_back_veh"], pp["width_veh"] / 2])])
        c, s_ = jnp.cos(state[V_H]), jnp.sin(state[V_H])
        rot = jnp.stack([jnp.stack([c, -s_]), jnp.stack([s_, c])])
        return base @ rot.T + jnp.stack([state[V_X], state[V_Y]])

    def evaluate(ref_states, states, l_trg, objs, ref_line, ref_step, pp,
                 l_trg_global):
        """(idm_sampling.cpp:531-639). Returns cost tuple."""
        ts = states[:, V_T]

        hulls_v = jax.vmap(lambda s: vehicle_hull(s, pp))(states)  # (T,4,2)

        # collision with predicted hulls
        def coll_at(state, hull_v):
            t = state[V_T]
            hulls_o = obj_hull_at(objs, t)                   # (O, K, 2)
            pos_o, _, v_o = obj_state_at(objs, t)
            l_off = pp["length_veh"] / 2.0 - pp["dist_back_veh"]
            center = jnp.stack([
                state[V_X] + l_off * jnp.cos(state[V_H]),
                state[V_Y] + l_off * jnp.sin(state[V_H])])
            dist = jnp.linalg.norm(pos_o - center, axis=-1)
            near = (dist <= pp["radius_veh"] + objs["radius_hull"] + v_o) \
                & objs["valid"]
            hit = polygons_intersect(
                jnp.broadcast_to(hull_v, (O, 4, 2)), hulls_o) & near
            return jnp.any(hit)

        colls = jax.vmap(coll_at)(states, hulls_v)            # (T,)
        any_coll = jnp.any(colls)
        first_coll = jnp.argmax(colls)
        t_coll = ts[first_coll]

        invalid = any_coll & (t_coll < 3.0)
        cost_collision = jnp.where(any_coll, T * pp["dt"] - t_coll, 0.0)

        # interaction with oncoming objects (accumulated until collision)
        def inter_at(state):
            def per_obj(path, dists, ts_o, heads, hulls, radius, valid):
                proj = project_polyline(path,
                                        jnp.stack([state[V_X], state[V_Y]]))
                ok = proj["in_bounds"] & valid & (
                    jnp.abs(proj["distance"])
                    <= pp["radius_veh"] + radius)
                # prediction at the matched station
                i = jnp.clip(jnp.searchsorted(dists, proj["arc_len"],
                                              side="right") - 1, 0, P - 2)
                a = jnp.clip((proj["arc_len"] - dists[i])
                             / jnp.maximum(dists[i + 1] - dists[i], 1e-9),
                             0.0, 1.0)
                tt = ts_o[i] * (1 - a) + ts_o[i + 1] * a
                hull_p = _interp_hulls_by_t(ts_o, hulls, tt)
                hull_v = vehicle_hull(state, pp)
                hit = polygons_intersect(hull_v, hull_p)
                oncoming = jnp.cos(state[V_H] - proj["angle"]) < 0.0
                return jnp.where(ok & hit & oncoming,
                                 1.0 / (1.0 + jnp.abs(proj["distance"])),
                                 0.0)
            vals = jax.vmap(per_obj)(
                objs["pred_xy"], objs["pred_dists"], objs["pred_t"],
                objs["pred_heading"], objs["hull_preds"],
                objs["radius_hull"], objs["valid"])
            return jnp.sum(vals)

        inter = jax.vmap(inter_at)(states)
        before_coll = jnp.arange(T) < jnp.where(any_coll, first_coll, T)
        cost_interaction = jnp.sum(jnp.where(before_coll, inter, 0.0))

        # distance cost
        seg = jnp.linalg.norm(jnp.diff(states[:, [V_X, V_Y]], axis=0),
                              axis=-1)
        cost_distance = 1000.0 - jnp.sum(seg)

        # comfort costs
        cost = pp["w_l"] * (l_trg_global - l_trg) ** 2
        min_dl = jnp.min(ref_states[:-1, R_DL])
        min_dr = jnp.min(ref_states[:-1, R_DR])
        cost += jnp.where(min_dl < pp["d_comf_lat"],
                          pp["w_lat_dist"] * (pp["d_comf_lat"] - min_dl)
                          / pp["d_comf_lat"], 0.0)
        cost += jnp.where(min_dr < pp["d_comf_lat"],
                          pp["w_lat_dist"] * (pp["d_comf_lat"] - min_dr)
                          / pp["d_comf_lat"], 0.0)
        cost += jnp.sum(pp["w_a"] * jnp.minimum(0.0, states[:, V_A]) ** 2)

        # road-edge penalty
        rp = ref_lerp(ref_line, ref_step, states[:, V_S])
        margin = pp["width_veh"] / 2.0 * np.sqrt(2.0)
        edge = (jnp.sum(states[:, V_L] > rp[:, 5] - margin)
                + jnp.sum(states[:, V_L] < -rp[:, 6] + margin)).astype(f32)

        # on collision the reference skips distance/comfort and edge costs
        cost_collision = cost_collision + jnp.where(any_coll, 0.0, edge)
        cost = jnp.where(any_coll, 0.0, cost)
        cost_distance = jnp.where(any_coll, 0.0, cost_distance)
        cost_interaction = jnp.where(any_coll, cost_interaction,
                                     cost_interaction)

        return dict(cost=cost, cost_distance=cost_distance,
                    cost_interaction=cost_interaction,
                    cost_collision=cost_collision,
                    invalid=invalid)

    @jax.jit
    def run(init_ref, init_con, l_trgs, d_stops, dt_replan, ref_line,
            ref_step, objs, pp, l_trg_global):
        """Roll out + evaluate all candidates.

        l_trgs: (C,), d_stops: (C,). Returns (ref_states (C,T,10),
        states (C,T,9), costs dict of (C,) arrays).
        """
        # the kernel runs in f32; host arrays may arrive as f64 under x64
        def _f32(v):
            v = jnp.asarray(v)
            return v.astype(f32) if jnp.issubdtype(
                v.dtype, jnp.floating) else v
        (init_ref, init_con, l_trgs, d_stops, dt_replan, ref_line,
         ref_step, l_trg_global) = (
            _f32(init_ref), _f32(init_con), _f32(l_trgs), _f32(d_stops),
            _f32(dt_replan), _f32(ref_line), _f32(ref_step),
            _f32(l_trg_global))
        objs = jax.tree.map(_f32, objs)
        pp = {k: _f32(v) for k, v in pp.items()}
        linestrip = ref_line[:, :2]

        def one(args):
            l_trg, d_stop = args
            refs, cons = rollout(init_ref, init_con, l_trg, d_stop,
                                 dt_replan, ref_line, ref_step, linestrip,
                                 objs, pp)
            costs = evaluate(refs, cons, l_trg, objs, ref_line, ref_step,
                             pp, l_trg_global)
            return refs, cons, costs

        # chunked vmap: the evaluate stage's interaction term peaks at
        # ~5 MB of HBM per candidate (XLA materializes the hull-interp
        # broadcast before reducing), so an unchunked vmap OOMs beyond
        # ~1.5k candidates; 1024-candidate chunks keep full throughput
        if l_trgs.shape[0] <= 1024:
            return jax.vmap(lambda lt, ds: one((lt, ds)))(l_trgs, d_stops)
        return jax.lax.map(one, (l_trgs, d_stops), batch_size=1024)

    return run
