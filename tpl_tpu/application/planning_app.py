"""
Planning application: planner registry (subclass discovery + snake-case
naming), active planner dispatch, trajectory publication, param loading.
(reference: library/tpl/application/planning_app.py)
"""

import time
import copy
import traceback
import os.path as osp

import jax

from tpl_tpu import util
from tpl_tpu.planning import BasePlanner, Trajectory
from tpl_tpu.util import (
    get_subclasses_recursive, to_snake_case, StoreRegistry, Bundle,
    snapshot,
)


class PlanningApp:

    def __init__(self, app_id="", planning_params_path=None,
                 shared_env=None):
        self.app_id = app_id
        self.last_time = 0.0

        self.planners = {}
        planner_classes = [BasePlanner] + get_subclasses_recursive(
            BasePlanner)
        planner_names = [to_snake_case(cls.__name__)
                         for cls in planner_classes]

        if shared_env is None:
            raise ValueError(
                "PlanningApp requires shared_env (single-process build)")
        self.env = shared_env

        self.sh_planners = StoreRegistry.get(f"/{self.app_id}tpl_planning")

        with self.sh_planners.lock():
            self.sh_planners.storage = "default"
            self.sh_planners.runtime = 0.0
            self.sh_planners.trajectory = Trajectory()
            self.sh_planners.active_planner = planner_names[0]
            self.sh_planners.planner_names = planner_names
            for cls in planner_classes:
                name = to_snake_case(cls.__name__)
                setattr(self.sh_planners, name, Bundle())
                state = getattr(self.sh_planners, name)
                self.planners[name] = cls(state, self.sh_planners.lock)
            load_planning_params(self.sh_planners, planning_params_path)

        self.last_active_planner = ""

    def update(self):
        runtime_start = time.perf_counter()

        with self.env.lock():
            do_update = self.last_time != self.env.t
            self.last_time = self.env.t
        do_update = True

        with self.sh_planners.lock():
            active_planner = self.sh_planners.active_planner

        if self.last_active_planner != active_planner:
            with self.env.lock():
                self.env.reset()
        self.last_active_planner = active_planner

        planner = self.planners.get(active_planner)

        trajectory = None
        if planner is not None and do_update:
            try:
                trajectory = planner.update(self.env)
            except jax.errors.JaxRuntimeError:
                # Device/tunnel failure (worker crash, preemption, RPC
                # drop). The worker restart wipes all device state, so a
                # half-updated planner instance is unrecoverable in
                # place: publish an emergency trajectory (routed to
                # ConstAccController, control_app.py) and rebuild the
                # planner from scratch on the restarted device — the
                # reference's degrade-then-recover pattern
                # (dp_lat_lon_planner.py:170-176) extended to the
                # accelerator itself, which the reference never loses.
                traceback.print_exc()
                print(f"[planning] device failure in {active_planner}; "
                      "latching emergency and rebuilding the planner",
                      flush=True)
                trajectory = Trajectory()
                trajectory.emergency = True
                try:
                    self.planners[active_planner] = type(planner)(
                        planner.shared, planner.lock_shared)
                except Exception:
                    traceback.print_exc()

        if hasattr(planner, "runtime"):
            runtime = planner.runtime
        elif hasattr(planner, "update") and hasattr(planner.update,
                                                    "runtime"):
            runtime = planner.update.runtime
        else:
            runtime = time.perf_counter() - runtime_start

        with self.sh_planners.lock():
            self.sh_planners.runtime = runtime
            if trajectory is not None:
                self.sh_planners.trajectory = trajectory
                self.sh_planners.has_new_traj = True


def load_planning_params(sh_planners, path=None):
    if path is None:
        path = getattr(sh_planners, "storage", "default")
    if not path:
        return
    abs_path = util.resolve_data("params", osp.join("planning", path))
    data = util.load_state_dict(abs_path)
    if data is None:
        return
    if "active_planner" in data:
        sh_planners.active_planner = data["active_planner"]
    for name, sub in data.items():
        if not isinstance(sub, dict) or "params" not in sub:
            continue
        state = getattr(sh_planners, name, None)
        if state is None:
            continue
        if hasattr(state, "params"):
            util.merge_into(state.params, sub["params"])
    sh_planners.storage = path


def save_planning_params(sh_planners):
    params = Bundle()
    params.active_planner = sh_planners.active_planner
    for pn in sh_planners.planner_names:
        state = getattr(sh_planners, pn, None)
        if state is not None and hasattr(state, "params"):
            params[pn] = Bundle(params=snapshot(state.params))
    abs_path = osp.join(util.PATH_PARAMS, "planning", sh_planners.storage)
    util.save_state_dict(params, abs_path)
