"""Lon DP planner + polynomial lateral planner tests (synthetic scenes)."""

import numpy as np
import jax.numpy as jnp

from tpl_tpu.planning.dyn_prog.dp_environment import (
    DpEnvironment, DpEnvParams,
)
from tpl_tpu.planning.dyn_prog import lon_kernel as lk
from tpl_tpu.planning.dyn_prog.poly_lat_kernel import (
    PolyLatPlannerJax, TC_L, TC_S,
)


def _straight_env(obstacle_s=None, half_width=4.0):
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
        quad = np.array([[obstacle_s - 2, -1.], [obstacle_s + 2, -1.],
                         [obstacle_s + 2, 1.], [obstacle_s - 2, 1.]])
        env.insert_geometry([(quad, t) for t in np.arange(10.0)],
                            stationary=True)
    env.update()
    return env


def _straight_path(cpp):
    """Path along the ref line center (l = 0)."""
    P = cpp.path_steps
    path = np.zeros((P, 7))
    dists = np.arange(P) * cpp.path_step_size
    path[:, lk.PC_X] = dists - 100.0      # offset-centered frame
    path[:, lk.PC_S] = dists
    path[:, lk.PC_VMAX] = 10.0
    path[:, lk.PC_DIST] = dists
    return path


def _path_dist_sl(path, cpp):
    """Frenet (s, l) of the path sampled at each env grid s index."""
    S = cpp.s_steps
    dists = np.arange(S) * cpp.s_step
    a = dists / cpp.path_step_size
    i0 = np.clip(np.floor(a).astype(int), 0, len(path) - 1)
    i1 = np.clip(np.ceil(a).astype(int), 0, len(path) - 1)
    al = np.clip(a - i0, 0.0, 1.0)[:, None]
    interp = path[i0] * (1.0 - al) + path[i1] * al
    return interp[:, [lk.PC_S, lk.PC_L]]


def test_lon_planner_stops_for_obstacle():
    env = _straight_env(obstacle_s=60.0)
    cpp = lk.LonParams()
    solver, reeval = lk.make_lon_solver(dict(
        t_steps=cpp.t_steps, s_steps=cpp.s_steps, v_steps=cpp.v_steps,
        a_steps=cpp.a_steps, path_steps=cpp.path_steps))

    path = _straight_path(cpp)
    dist_path = env.update_dist_map_path(_path_dist_sl(path, cpp))

    x0 = np.zeros(7, np.float32)
    x0[lk.LC_V] = 8.0
    nodes, traj = solver(dist_path, jnp.asarray(path, jnp.float32),
                         cpp.dynamic_dict(), jnp.asarray(x0))
    traj = np.asarray(traj)
    assert np.all(traj[1:-1, lk.LC_CONSTR] < 0.1)
    # stops before the obstacle
    assert traj[-1, lk.LC_S] < 58.0
    assert traj[-1, lk.LC_V] < 2.0
    # reeval of the feasible plan stays feasible
    re = reeval(dist_path, jnp.asarray(path, jnp.float32),
                cpp.dynamic_dict(), jnp.asarray(traj, jnp.float32), nodes)
    re = np.asarray(re)
    assert np.all(re[1:-1, lk.LC_CONSTR] < 0.1)


def test_lon_planner_free_road_progresses():
    env = _straight_env()
    cpp = lk.LonParams()
    solver, _ = lk.make_lon_solver(dict(
        t_steps=cpp.t_steps, s_steps=cpp.s_steps, v_steps=cpp.v_steps,
        a_steps=cpp.a_steps, path_steps=cpp.path_steps))
    path = _straight_path(cpp)
    dist_path = env.update_dist_map_path(_path_dist_sl(path, cpp))
    x0 = np.zeros(7, np.float32)
    x0[lk.LC_V] = 5.0
    _, traj = solver(dist_path, jnp.asarray(path, jnp.float32),
                     cpp.dynamic_dict(), jnp.asarray(x0))
    traj = np.asarray(traj)
    assert traj[-1, lk.LC_S] > 50.0
    assert traj[-1, lk.LC_V] > 7.0
    # velocity limit respected (10 m/s + small tolerance)
    assert np.max(traj[:, lk.LC_V]) < 10.5


def test_poly_lat_evades_obstacle():
    # road wide enough that a feasible gap exists beyond the dilated
    # obstacle (blocked up to |l| ~ 3) and inside the corridor margin
    env = _straight_env(obstacle_s=40.0, half_width=6.0)
    pl = PolyLatPlannerJax()
    pl.params.l_trg = 0.0
    start = dict(l=0.0, dl=0.0, ddl=0.0, s=0.0, v=8.0)
    traj = pl.update(start, env)
    pts = traj.points
    # at the obstacle station the path moved laterally away from l=0
    at_obs = pts[np.abs(pts[:, TC_S] - 40.0) < 3.0]
    assert len(at_obs) > 0
    assert np.max(np.abs(at_obs[:, TC_L])) > 1.5
    # starts at the requested start state
    assert abs(pts[0, TC_L] - 0.0) < 1e-3


def test_poly_lat_straight_on_free_road():
    env = _straight_env()
    pl = PolyLatPlannerJax()
    start = dict(l=1.0, dl=0.0, ddl=0.0, s=0.0, v=8.0)
    traj = pl.update(start, env)
    pts = traj.points
    # converges toward l_trg = 0
    assert abs(pts[-1, TC_L]) < 0.3
