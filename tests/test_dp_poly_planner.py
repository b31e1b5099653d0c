"""Graph/polynomial DP planner kernel tests."""

import numpy as np

from tpl_tpu.planning.dyn_prog.dp_environment import (
    DpEnvironment, DpEnvParams,
)
from tpl_tpu.planning.dyn_prog.poly_planner_kernel import (
    DpPolyPlannerKernel, DpPolyParams,
    PP_T, PP_S, PP_DS, PP_L, PP_COST,
)


def _env(obstacle=True):
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
    if obstacle:
        quad = np.array([[58., -1.], [62., -1.], [62., 1.], [58., 1.]])
        env.insert_geometry([(quad, t) for t in np.arange(10.0)],
                            stationary=True)
    env.update()
    env.update_dir_dist_map()
    return env


def _kernel():
    kp = DpPolyParams()
    kp.ds_steps = 8
    kp.l_steps = 9
    k = DpPolyPlannerKernel()
    k.reinit_buffers(kp)
    return k


def test_dir_dist_map():
    env = _env()
    dd = np.asarray(env.grid.dir_dist_map)
    assert dd.shape == (10, 201, 21, 21)
    # grid-boundary cells collide immediately (env.cu:185-196 semantics)
    assert dd[0, 0, 10, 10] == 0.0
    # beyond ray range (ds_max = 36 m) -> 10000 (no collision found)
    assert dd[0, 10, 10, 10] == 10000.0
    # dir index 10 = straight ahead; from s=30, l=0 the ray hits the
    # dilated obstacle (blocked from ~s=56) -> distance ~26
    d0 = dd[0, 30, 10, 10]
    assert 20.0 < d0 < 32.0
    # a cell just before the obstacle sees a small distance
    assert dd[0, 50, 10, 10] < 10.0


def test_poly_planner_monotone_time_and_progress():
    env = _env()
    k = _kernel()
    init = np.zeros(8, np.float32)
    init[PP_DS] = 8.0
    traj = k.update(init, env)
    assert np.all(np.diff(traj[:, PP_T]) > 0)
    assert np.all(np.diff(traj[:, PP_S]) >= 0)
    # makes progress but does not drive through the obstacle lane
    at_obstacle = np.abs(traj[:, PP_S] - 60.0) < 6.0
    if np.any(at_obstacle):
        assert np.all(np.abs(traj[at_obstacle, PP_L]) > 2.5)


def test_poly_planner_free_road_faster():
    env_free = _env(obstacle=False)
    env_blocked = _env(obstacle=True)
    k = _kernel()
    init = np.zeros(8, np.float32)
    init[PP_DS] = 8.0
    traj_free = k.update(init, env_free)
    traj_blocked = k.update(init, env_blocked)
    assert traj_free[-1, PP_S] >= traj_blocked[-1, PP_S] - 1.0
    # free road: roughly keeps the lane
    assert abs(traj_free[-1, PP_L]) < 1.5
