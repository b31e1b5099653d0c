"""Multi-process deployment: planning app in a separate process served
an environment over shared memory."""

import os
import uuid
import multiprocessing as mp

import numpy as np


def _planner_proc(app_id):
    os.environ["TPL_TPU_SHM"] = "1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tpl_tpu.application.mains import planning_main
    planning_main(app_id=app_id, max_ticks=3)


def test_planning_app_in_subprocess():
    np.random.seed(0)
    app_id = "mp" + uuid.uuid4().hex[:6]

    from tpl_tpu.util.shm_store import ShmObject, ShmStore
    from tpl_tpu.environment import (
        EnvironmentState, map_module, load_map_store)

    # parent: publish a valid environment into shared memory
    env = ShmObject(EnvironmentState(), f"/{app_id}tpl_env", reinit=True)
    with env.lock():
        env.maps = load_map_store("acc_2024")
        env.selected_map = "lehr"
        env.map_store_path = "acc_2024"
        veh = env.vehicle_state
        veh.x = 571581.347301614
        veh.y = 5364792.691986253
        veh.phi = 0.2628900561473566
        veh.v = 10.0
        map_module.update_local_map(env.unwrap())
        map_module.update_local_map_velocity(env.unwrap())
        env.t = 0.1

    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_planner_proc, args=(app_id,))
    p.start()
    p.join(600)
    assert p.exitcode == 0

    planning = ShmStore(f"/{app_id}tpl_planning")
    assert planning.wait_for_attr("trajectory", timeout=5.0)
    with planning.lock():
        traj = planning.trajectory
        active = planning.active_planner
    # default planner is base_planner unless params select otherwise;
    # the store carries the full registry + published trajectory
    assert traj is not None
    assert "path_vel_decomp_planner" in planning.planner_names
