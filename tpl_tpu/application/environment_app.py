"""
Environment application: local map windowing, tracking, prediction, and
map item updates each tick.
(reference: library/tpl/application/environment_app.py)
"""

import os.path as osp

from tpl_tpu import util
from tpl_tpu.environment import (
    SharedEnvironmentState,
    TrackingModule,
    PredictionModule,
    map_module,
)


class EnvironmentApp:

    def __init__(self, app_id="", env_params_path=None):
        self.app_id = app_id
        self.last_time = -1.0

        self.env = SharedEnvironmentState()
        with self.env.lock():
            self.env.storage = "default"
            load_env_params(self.env, env_params_path)

        self.tracking_module = TrackingModule()
        self.prediction_module = PredictionModule()

    def update(self, t):
        with self.env.lock():
            if t < self.last_time:
                # reinit if time jumps backwards
                self.tracking_module = TrackingModule()
                self.prediction_module = PredictionModule()
                self.last_time = 0.0

        with self.env.lock():
            self.env.t = t
            map_module.update_local_map(self.env)
            if self.last_time != t:
                self.tracking_module.update(self.env)
                self.prediction_module.update(self.env)
            map_module.update_map_items(self.env)
            map_module.update_local_map_velocity(self.env)
            map_module.update_local_map_inters_paths(self.env)

        self.last_time = t


def load_env_params(sh_env, path=None):
    if path is None:
        path = getattr(sh_env, "storage", "default")
    if not path:
        return False
    abs_path = util.resolve_data("params", osp.join("env", path))
    data = util.load_state_dict(abs_path)
    if data is None:
        return False

    sh_env.storage = path
    if "map_store_path" in data:
        sh_env.map_store_path = data["map_store_path"]
    if "selected_map" in data:
        sh_env.selected_map = data["selected_map"]

    map_store = map_module.load_map_store(sh_env.map_store_path)
    if not list(util.get_obj_dict(map_store)):
        sh_env.map_store_path = ""
        sh_env.maps = util.Bundle()
    else:
        sh_env.maps = map_store
    return True
