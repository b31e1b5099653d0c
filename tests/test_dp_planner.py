"""DP environment + lat/lon value-iteration planner tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpl_tpu.planning.dyn_prog.dp_environment import (
    DpEnvironment, DpEnvParams,
)
from tpl_tpu.planning.dyn_prog import lat_lon_kernel as llk


def _straight_env(obstacle=True, v_max=10.0):
    env = DpEnvironment()
    p = DpEnvParams()
    env.reinit_buffers(p)
    n_ref = 401
    rl = np.zeros((n_ref, 9))
    rl[:, 0] = np.arange(n_ref) * 0.5
    rl[:, 3] = rl[:, 0]
    rl[:, 5] = v_max
    rl[:, 6] = 4.0
    rl[:, 7] = 4.0
    env.set_ref_line(rl, 0.5)
    if obstacle:
        quads = [(np.array([[48., -1.], [52., -1.], [52., 1.], [48., 1.]]),
                  t) for t in np.arange(10.0)]
        env.insert_geometry(quads, stationary=True)
    env.update()
    return env


def test_occupancy_semantics():
    env = _straight_env()
    occ = env.get_occ_map()
    assert occ.shape == (10, 201, 21)
    # stationary obstacle -> 3 in every slice around s=50 m (grid step is
    # 1 m, so idx 50), l=0 (idx 10)
    assert occ[0, 50, 10] == 3.0
    assert occ[9, 50, 10] == 3.0
    # off-road cells (l = +-5 and beyond road width 4) -> 2
    assert occ[0, 0, 0] == 2.0
    assert occ[0, 0, 20] == 2.0
    # free cell
    assert occ[0, 0, 10] == 0.0


def test_occupancy_moving_object_time_slices():
    env = DpEnvironment()
    p = DpEnvParams()
    env.reinit_buffers(p)
    rl = np.zeros((401, 9))
    rl[:, 0] = np.arange(401) * 0.5
    rl[:, 3] = rl[:, 0]
    rl[:, 5] = 10.0
    rl[:, 6] = 4.0
    rl[:, 7] = 4.0
    env.set_ref_line(rl, 0.5)
    # object moving: at t bin k it sits at s = 30 + 10k
    for k in range(5):
        s0 = 30.0 + 10.0 * k
        quad = np.array([[s0 - 2, -1.], [s0 + 2, -1.],
                         [s0 + 2, 1.], [s0 - 2, 1.]])
        env.insert_geometry([(quad, float(k) + 1.0)], stationary=False)
    env.update()
    occ = env.get_occ_map()
    # t_index(1.0) with dt_start=1: slice 1; at slice 1 the object is at
    # s=30 m (grid idx 30)
    i1 = env.t_index(1.0)
    assert occ[i1, 30, 10] == 1.0     # s=30 occupied at slice 1
    assert occ[i1, 60, 10] == 0.0     # s=60 free at slice 1


def test_dist_map_lon_oracle():
    env = _straight_env()
    occ = env.get_occ_map()
    dist = env.get_dist_map_lon()
    # brute-force oracle for channel 0 (distance ahead)
    t, l = 0, 10
    s_step = 1.0
    col = occ[t, :, l] > 0
    for s in [0, 50, 90, 200]:
        ahead = np.where(col[s:])[0]
        if len(ahead):
            expect = ahead[0] * s_step
        else:
            expect = 10000.0 + (201 - s) * s_step
        assert dist[t, s, l, 0] == pytest.approx(expect), (s, dist[t, s, l, 0])


def test_latlon_planner_brakes_for_blocked_road():
    env = _straight_env()
    cpp = llk.LatLonParams()
    solver, _ = llk.make_latlon_solver(dict(
        t_steps=10, s_steps=201, ds_steps=37, l_steps=21))
    x0 = np.zeros(12, np.float32)
    x0[llk.C_DS] = 8.0
    nodes, traj = solver(env.grid.dist_map_lon, env.grid.ref_line,
                         jnp.float32(0.5), cpp.dynamic_dict(),
                         jnp.asarray(x0))
    traj = np.asarray(traj)
    # no constraint violations and stops before the obstacle (s=50,
    # minus dilation and half vehicle length)
    assert np.all(traj[:, llk.C_CONSTR] == 0.0)
    assert traj[-1, llk.C_S] < 48.0
    assert traj[-1, llk.C_DS] < 2.0
    # monotone progress
    assert np.all(np.diff(traj[:, llk.C_S]) >= 0.0)


def test_latlon_planner_drives_free_road():
    env = _straight_env(obstacle=False)
    cpp = llk.LatLonParams()
    solver, _ = llk.make_latlon_solver(dict(
        t_steps=10, s_steps=201, ds_steps=37, l_steps=21))
    x0 = np.zeros(12, np.float32)
    x0[llk.C_DS] = 8.0
    _, traj = solver(env.grid.dist_map_lon, env.grid.ref_line,
                     jnp.float32(0.5), cpp.dynamic_dict(), jnp.asarray(x0))
    traj = np.asarray(traj)
    assert np.all(traj[:, llk.C_CONSTR] == 0.0)
    # reaches close to v_max and keeps going
    assert traj[-1, llk.C_DS] > 8.0
    assert traj[-1, llk.C_S] > 60.0
    # stays near the reference line
    assert np.all(np.abs(traj[:, llk.C_L]) < 1.0)


def test_host_reeval_matches_validity():
    env = _straight_env()
    cpp = llk.LatLonParams()
    solver, _ = llk.make_latlon_solver(dict(
        t_steps=10, s_steps=201, ds_steps=37, l_steps=21))
    x0 = np.zeros(12, np.float32)
    x0[llk.C_DS] = 8.0
    _, traj = solver(env.grid.dist_map_lon, env.grid.ref_line,
                     jnp.float32(0.5), cpp.dynamic_dict(), jnp.asarray(x0))
    traj = np.asarray(traj, dtype=np.float64)

    he = llk.HostEval(env.get_dist_map_lon(), env.ref_line, 0.5, cpp)
    re = he.reeval(traj)
    # the solver's feasible plan re-evaluates as feasible
    assert np.all(re[1:, llk.C_CONSTR] == 0.0)

    # a trajectory driving through the obstacle re-evaluates as infeasible
    bad = traj.copy()
    bad[:, llk.C_S] = np.linspace(40.0, 60.0, len(bad))
    bad[:, llk.C_DS] = 5.0
    bad[:, llk.C_L] = 0.0
    re_bad = he.reeval(bad)
    assert np.any(re_bad[:, llk.C_CONSTR] > 0.0)


def test_device_reeval_matches_host():
    """The on-device reeval (one dispatch, grid stays on device) must
    reproduce HostEval.reeval."""
    env = _straight_env()
    cpp = llk.LatLonParams()
    solver, reeval = llk.make_latlon_solver(dict(
        t_steps=10, s_steps=201, ds_steps=37, l_steps=21))
    x0 = np.zeros(12, np.float32)
    x0[llk.C_DS] = 8.0
    _, traj = solver(env.grid.dist_map_lon, env.grid.ref_line,
                     jnp.float32(0.5), cpp.dynamic_dict(), jnp.asarray(x0))
    traj = np.asarray(traj, dtype=np.float64)

    he = llk.HostEval(env.get_dist_map_lon(), env.ref_line, 0.5, cpp)

    for cand in (traj, _bad_traj(traj)):
        re_h = he.reeval(cand)
        re_d = np.asarray(reeval(env.grid.dist_map_lon, env.grid.ref_line,
                                 jnp.float32(0.5), cpp.dynamic_dict(),
                                 jnp.asarray(cand)))
        np.testing.assert_allclose(re_d[:, llk.C_COST],
                                   re_h[:, llk.C_COST], rtol=1e-4)
        np.testing.assert_allclose(re_d[:, llk.C_CONSTR],
                                   re_h[:, llk.C_CONSTR], rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_array_equal(re_d[:, llk.C_FLAGS],
                                      re_h[:, llk.C_FLAGS])


def _bad_traj(traj):
    bad = traj.copy()
    bad[:, llk.C_S] = np.linspace(40.0, 60.0, len(bad))
    bad[:, llk.C_DS] = 5.0
    bad[:, llk.C_L] = np.linspace(0.0, 2.0, len(bad))
    bad[:, llk.C_DL] = 0.4
    return bad
