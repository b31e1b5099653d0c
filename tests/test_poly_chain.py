"""Fused poly_lat_dp_lon chain (poly_chain_kernel) vs the unfused host
oracle: the device-side selection scan, velocity-profile scans and the
full lateral stage must reproduce the host pipeline they replaced."""

import numpy as np
import jax.numpy as jnp

from tpl_tpu.ops import curv_to_vel_profile, rampify_profile
from tpl_tpu.planning.dyn_prog.dp_environment import (
    DpEnvironment, DpEnvParams,
)
from tpl_tpu.planning.dyn_prog import lon_kernel as lk
from tpl_tpu.planning.dyn_prog import poly_chain_kernel as pck
from tpl_tpu.planning.dyn_prog.poly_lat_kernel import (
    PolyLatPlannerJax, PolyLatParams, select_path, pack_env_pp,
    TC_X, TC_Y, TC_S, TC_L, TC_K, TC_V, TC_DIST,
)


def _straight_env(obstacle_s=None, half_width=6.0, obstacle_halfw=1.0):
    env = DpEnvironment()
    p = DpEnvParams()
    env.reinit_buffers(p)
    rl = np.zeros((401, 9))
    rl[:, 0] = np.arange(401) * 0.5
    rl[:, 3] = rl[:, 0]
    rl[:, 5] = 10.0
    rl[:, 6] = half_width
    rl[:, 7] = half_width
    env.set_ref_line(rl, 0.5)
    if obstacle_s is not None:
        w = obstacle_halfw
        quad = np.array([[obstacle_s - 2, -w], [obstacle_s + 2, -w],
                         [obstacle_s + 2, w], [obstacle_s - 2, w]])
        env.insert_geometry([(quad, t) for t in np.arange(10.0)],
                            stationary=True)
    env.update()
    return env


def test_select_path_device_matches_host():
    """The in-program selection fori_loop is an exact twin of the
    order-dependent host scan (reference: poly_lat_planner.cu:227-268)."""
    rng = np.random.default_rng(0)
    LD, SD = 21, 13
    for trial in range(20):
        cd = rng.uniform(0.0, 60.0, (LD, SD)).astype(np.float32)
        # sprinkle "no collision" sentinels and infeasible candidates
        cd[rng.random((LD, SD)) < 0.3] = 1000.0
        tc = rng.uniform(0.0, 100.0, (LD, SD)).astype(np.float32)
        tc[rng.random((LD, SD)) < 0.2] = 1e7
        il_h, isd_h = select_path(cd, tc, 2.0, LD, SD)
        il_d, isd_d, cost_d = pck.select_path_device(
            jnp.asarray(cd), jnp.asarray(tc), jnp.float32(2.0), LD, SD)
        assert (int(il_d), int(isd_d)) == (il_h, isd_h), f"trial {trial}"
        assert np.isclose(float(cost_d), tc[il_h, isd_h])


def test_rampify_device_matches_host():
    rng = np.random.default_rng(1)
    for trial in range(5):
        lim_v = rng.uniform(0.5, 15.0, 200)
        lim_v[rng.random(200) < 0.1] = 0.0   # stop cells
        host = rampify_profile(None, None, lim_v, -2.0, 2.0, -2.0, 2.0,
                               1.0, 1.0)[:, 0]
        dev = np.asarray(pck.rampify_device(
            jnp.asarray(lim_v, jnp.float32), -2.0, 2.0, -2.0, 2.0,
            1.0, 1.0))
        np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-4,
                                   err_msg=f"trial {trial}")


def _host_oracle_path(env, start, cpp_lat, cpp_lon):
    """The round-4 unfused host pipeline: PolyLatPlannerJax.update ->
    distance-keyed resampling -> curvature/jerk-limited velocity
    profile, in the env offset frame."""
    pl = PolyLatPlannerJax()
    pl.params = cpp_lat
    traj_lat = pl.update(start, env)
    dists = np.arange(cpp_lon.path_steps) * cpp_lon.path_step_size
    lat = traj_lat.lerp(dists)
    path = lat[:, [TC_X, TC_Y, TC_S, TC_L, TC_K, TC_V, TC_DIST]]
    path[:, lk.PC_VMAX] = curv_to_vel_profile(
        path[:, lk.PC_K], path[:, lk.PC_VMAX], cpp_lat.a_lat_abs_max)
    path[:, lk.PC_VMAX] = rampify_profile(
        None, None, path[:, lk.PC_VMAX], cpp_lon.a_min, cpp_lon.a_max,
        cpp_lon.j_min, cpp_lon.j_max, 1.0, 1.0)[:, 0]
    path[:, lk.PC_X] -= env.x_offset
    path[:, lk.PC_Y] -= env.y_offset
    return traj_lat, path


def _chain(env, cpp_lat, cpp_lon):
    return pck.make_poly_chain(dict(
        s_steps=cpp_lat.s_steps, l_dst_steps=cpp_lat.l_dst_steps,
        s_dst_steps=cpp_lat.s_dst_steps,
        t_steps_env=env.params.t_steps, s_steps_env=env.params.s_steps,
        l_steps_env=env.params.l_steps, t_steps=cpp_lon.t_steps,
        s_steps_lon=cpp_lon.s_steps, v_steps=cpp_lon.v_steps,
        a_steps=cpp_lon.a_steps, path_steps=cpp_lon.path_steps))


def _run_lat_stage(lat_stage, env, cpp_lat, cpp_lon, start,
                   old_pts=None, n_keep=0):
    if old_pts is None:
        old_pts = np.zeros((pck.KEEP_CAP, 12), np.float32)
    start_vec = jnp.asarray([start["l"], start["dl"], start["ddl"],
                             start["s"], start["v"]], jnp.float32)
    return lat_stage(env.grid.occ_map, env.grid.ref_line,
                     jnp.float32(env.ref_step), cpp_lat.packed(),
                     pack_env_pp(env.params), cpp_lon.packed(),
                     start_vec, jnp.asarray(old_pts), jnp.int32(n_keep))


def test_fused_lat_stage_matches_unfused_host_pipeline():
    env = _straight_env(obstacle_s=40.0)
    cpp_lat = PolyLatParams()
    cpp_lon = lk.LonParams()
    start = dict(l=0.4, dl=0.05, ddl=0.0, s=0.0, v=8.0)

    _traj_lat, path_h = _host_oracle_path(env, start, cpp_lat, cpp_lon)

    lat_stage, _ = _chain(env, cpp_lat, cpp_lon)
    _pts, _merged, path_d, il, isd, _cost = _run_lat_stage(
        lat_stage, env, cpp_lat, cpp_lon, start)
    path_d = np.asarray(path_d, np.float64)

    # the fused stage picked the same candidate as the host selection
    pl = PolyLatPlannerJax()
    pl.params = cpp_lat
    kernel = pl._get_kernel(env)
    cd, tc = kernel(env.grid.occ_map, env.grid.ref_line,
                    jnp.float32(env.ref_step), cpp_lat.packed(),
                    pack_env_pp(env.params),
                    jnp.asarray([0.4, 0.05, 0.0, 0.0, 8.0], jnp.float32))
    il_h, isd_h = select_path(cd, tc, cpp_lat.length_veh,
                              cpp_lat.l_dst_steps, cpp_lat.s_dst_steps)
    assert (int(il), int(isd)) == (il_h, isd_h)

    np.testing.assert_allclose(path_d[:, lk.PC_X], path_h[:, lk.PC_X],
                               atol=2e-2)
    np.testing.assert_allclose(path_d[:, lk.PC_Y], path_h[:, lk.PC_Y],
                               atol=2e-2)
    np.testing.assert_allclose(path_d[:, lk.PC_L], path_h[:, lk.PC_L],
                               atol=2e-2)
    np.testing.assert_allclose(path_d[:, lk.PC_VMAX],
                               path_h[:, lk.PC_VMAX], atol=5e-2)
    np.testing.assert_allclose(path_d[:, lk.PC_DIST],
                               path_h[:, lk.PC_DIST], atol=5e-2)


def test_fused_lat_stage_splices_previous_trajectory():
    """With a splice prefix, the merged buffer reproduces the host
    insert_after_station + update_time_dist_curv result."""
    env = _straight_env()
    cpp_lat = PolyLatParams()
    cpp_lon = lk.LonParams()
    s0 = 6.0
    start = dict(l=0.2, dl=0.0, ddl=0.0, s=s0, v=8.0)

    # fabricate a previous lateral trajectory along the road
    from tpl_tpu.planning.dyn_prog.poly_lat_kernel import PolyLatTraj
    prev = np.zeros((12, 12))
    prev[:, TC_S] = np.arange(12) * 1.0
    prev[:, TC_X] = env.x_offset + prev[:, TC_S]
    prev[:, TC_Y] = env.y_offset + 0.2
    prev[:, TC_L] = 0.2
    prev[:, TC_V] = 8.0
    traj_prev = PolyLatTraj(prev.copy())

    # host: expansion + splice
    pl = PolyLatPlannerJax()
    pl.params = cpp_lat
    new_host = pl.update(start, env)
    host_traj = PolyLatTraj(prev.copy())
    host_traj.insert_after_station(s0, new_host)

    # device: splice prefix uploaded, offset frame
    old_pts = np.zeros((pck.KEEP_CAP, 12), np.float32)
    keep = prev[prev[:, TC_S] < s0]
    kp = keep.astype(np.float32)
    kp[:, TC_X] -= env.x_offset
    kp[:, TC_Y] -= env.y_offset
    old_pts[:len(kp)] = kp
    lat_stage, _ = _chain(env, cpp_lat, cpp_lon)
    _pts, merged, _path, _il, _isd, _cost = _run_lat_stage(
        lat_stage, env, cpp_lat, cpp_lon, start, old_pts, len(kp))
    merged = np.asarray(merged, np.float64)
    n = len(host_traj.points)
    valid = merged[:n]
    np.testing.assert_allclose(valid[:, TC_X] + env.x_offset,
                               host_traj.points[:, TC_X], atol=2e-2)
    np.testing.assert_allclose(valid[:, TC_DIST],
                               host_traj.points[:, TC_DIST], atol=5e-2)
    np.testing.assert_allclose(valid[:, TC_K],
                               host_traj.points[:, TC_K], atol=1e-3)
    # invalid tail rows carry +inf DIST so resampling never selects them
    assert np.all(np.isinf(merged[n:, TC_DIST]))


def test_fused_lon_stage_stops_for_obstacle():
    """End-to-end fused chain on a fully blocked road (the obstacle
    spans the whole width, so no lateral evasion exists): the lon
    trajectory stops before the obstacle, matching the unfused
    behavioral result (test_lon_poly_planner.py)."""
    env = _straight_env(obstacle_s=60.0, half_width=4.0,
                        obstacle_halfw=6.0)
    cpp_lat = PolyLatParams()
    cpp_lon = lk.LonParams()
    start = dict(l=0.0, dl=0.0, ddl=0.0, s=0.0, v=8.0)
    lat_stage, lon_stage = _chain(env, cpp_lat, cpp_lon)
    _pts, _merged, path_d, _il, _isd, _cost = _run_lat_stage(
        lat_stage, env, cpp_lat, cpp_lon, start)
    pe = env.params
    env_scalars = jnp.asarray([pe.s_min, pe.s_step_size, pe.l_min,
                               pe.l_step_size], jnp.float32)
    x0 = np.zeros(7, np.float32)
    x0[lk.LC_V] = 8.0
    prev_pt = jnp.asarray(np.asarray(path_d)[0, :2])
    traj, arc = lon_stage(env.grid.occ_map, path_d, env_scalars,
                          cpp_lon.packed(), jnp.asarray(x0), prev_pt)
    traj = np.asarray(traj)
    assert float(arc) < 1.0                  # projected near path start
    assert np.all(traj[1:-1, lk.LC_CONSTR] < 0.1)
    assert traj[-1, lk.LC_S] < 58.0
    assert traj[-1, lk.LC_V] < 2.0
