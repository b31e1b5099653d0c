"""
Bridges EnvironmentState -> DpEnvironment: reference line construction
(rampified velocity, intersection semantics, lateral range fit), fractional
dt_start bookkeeping so grid time slices stay aligned to wall time, and
per-prediction swept-geometry insertion with speed-dependent sweep length.
(reference: library/tpl/planning/dyn_prog/dp_env.py)
"""

import time
import copy

import numpy as np
import jax

from tpl_tpu import util
from tpl_tpu.util import Bundle
from tpl_tpu.ops import rampify_profile
from tpl_tpu.planning.dyn_prog.dp_environment import (
    DpEnvironment, DpEnvParams, gen_prediction_quads,
)
from tpl_tpu.util import snapshot


class Params:

    def __init__(self):
        self.write_debug_data = True
        # grid debug dumps are full device->host pulls; over a tunneled
        # TPU each costs ~RTT+transfer, so they refresh at their own rate
        # instead of every tick (the reference pulls every update, but its
        # GPU is local: dp_env.py:174-189)
        self.debug_grid_interval = 0.3
        self.dead_time = 0.0

        self.a_lat_max = 2.5

        self.a_max_v_ref = 3.0
        self.a_min_v_ref = -3.0
        self.j_max_v_ref = 1.5
        self.j_min_v_ref = -1.5

        self.t_dist_on_map = 0.5
        self.t_dist_crossing = 3.0

        self.cpp = DpEnvParams()


class DpEnv:

    def __init__(self, shared, lock_shared):
        self.shared = shared
        self.lock_shared = lock_shared

        self.ref_line = None
        self.ref_proj = None

        self.last_update_time = 0.0
        self.dt_start = None

        self.ref_line_shift = 0.0
        self.ref_line_step_size = 0.0

        self.cpp_env = DpEnvironment()
        self.runtime_environment = 0.0
        self._last_debug_grid_t = -np.inf

        with self.lock_shared():
            if not hasattr(self.shared, "params"):
                self.shared.params = Bundle()
            self.shared.params.env = Params()
            if not hasattr(self.shared, "debug"):
                self.shared.debug = Bundle()
            self.shared.debug.env = Bundle()

    def update_params(self, env):
        with self.lock_shared():
            params = self.shared.params.env

            params.cpp.dilation = np.sqrt(2.0) * env.vehicle_state.width * 0.5

            dt_update = env.t - self.last_update_time
            if self.dt_start is None:
                self.dt_start = params.cpp.dt
            else:
                self.dt_start = (self.dt_start - dt_update) % params.cpp.dt
            params.cpp.dt_start = self.dt_start

            sh_params = snapshot(params)
        return sh_params

    def update_reference_line(self, env, params):
        """(dp_env.py:79-122)"""
        if self.ref_line is not None:
            proj_prev = util.project(self.ref_line[:, :2],
                                     env.local_map.path[0, :2])
            self.ref_line_shift = round(
                proj_prev.arc_len / self.ref_line_step_size) \
                * self.ref_line_step_size

        self.ref_line = np.zeros((len(env.local_map.path), 9))
        self.ref_line[:, :6] = env.local_map.path
        self.ref_line[:, 6] = env.local_map.d_left
        self.ref_line[:, 7] = env.local_map.d_right
        self.ref_line_step_size = env.local_map.step_size_ref

        # rampified velocity profile (zero cells stay zero)
        idxs_zero = self.ref_line[:, 5] < 1.0
        self.ref_line[:, 5] = rampify_profile(
            None, None, self.ref_line[:, 5],
            params.a_min_v_ref, params.a_max_v_ref,
            params.j_min_v_ref, params.j_max_v_ref,
            1.0, env.local_map.step_size_ref)[:, 0]
        self.ref_line[idxs_zero, 5] = 0.0

        # semantic info: mark intersection conflict zones
        for ip in env.local_map.intersection_paths:
            if not ip.stop_proj.in_bounds:
                return
            i0 = ip.stop_proj.end
            self.ref_line[i0:i0 + 10, 8] = 1.0

        # fit lateral range to the road
        params.cpp.l_min = float(np.floor(np.min(-self.ref_line[:, 7])))
        params.cpp.l_max = float(np.ceil(np.max(self.ref_line[:, 6])))

    def update_environment(self, env, params, defer_device=False):
        """(dp_env.py:124-172). With defer_device the host-side prep
        (ref line upload packing, geometry insertion) runs but the device
        grid build is left to the caller (fused replan program)."""
        start = time.perf_counter()

        self.cpp_env.reinit_buffers(params.cpp)
        self.cpp_env.set_ref_line(self.ref_line, self.ref_line_step_size)

        maps = {m.uuid: m for m in env.get_relevant_maps()}

        for obj in env.predicted:
            for pred in obj.predictions:
                m = maps.get(pred.uuid_assoc_map)
                if m is None:
                    continue
                on_local_map = m.name == "local_map_behind"

                ts = np.array([0.0, *(params.cpp.dt_start
                                      + pred.states[:-1, 0])])
                ts += params.dead_time

                if on_local_map:
                    sweep_length = params.t_dist_on_map
                else:
                    sweep_length = params.t_dist_crossing
                    if env.vehicle_state.v > 20.0 or (
                            obj.a is not None and obj.a > 1.0):
                        sweep_length = 4.0
                    elif env.vehicle_state.v > 15.0:
                        sweep_length = 3.0
                    elif env.vehicle_state.v > 10.0:
                        sweep_length = 2.0

                quads = gen_prediction_quads(
                    pred.states, obj.hull, m.path[:, :2], ts,
                    station_step_size=5.0, expansion_rate=0.0,
                    sweep_length=sweep_length)

                quads = [(q, t - params.dead_time) for q, t in quads]
                self.cpp_env.insert_geometry(quads, obj.stationary)

        if not defer_device:
            self.cpp_env.update()
        self.runtime_environment = (time.perf_counter() - start) * 1000.0

    def write_debug_data(self, env, params):
        pull_grids = (env.t - self._last_debug_grid_t
                      >= params.debug_grid_interval
                      or env.t < self._last_debug_grid_t)
        grids = None
        if pull_grids:
            grid = self.cpp_env.grid
            # one batched pull for both maps (single round trip)
            grids = jax.device_get((grid.occ_map, grid.dist_map_lon))
            self._last_debug_grid_t = env.t
        with self.lock_shared():
            dbg = self.shared.debug.env
            dbg.runtime_environment = self.runtime_environment
            dbg.ref_line = self.ref_line
            if grids is not None:
                dbg.occ_map = np.asarray(grids[0])
                dbg.dist_map_lon = np.asarray(grids[1])

    def update(self, env, defer_device=False):
        params = self.update_params(env)
        self.update_reference_line(env, params)
        self.update_environment(env, params, defer_device=defer_device)
        if defer_device:
            # grids are not built yet; the caller adopts them and then
            # calls finish_deferred_update
            self._deferred = (env, params)
        else:
            if params.write_debug_data:
                self.write_debug_data(env, params)
            self.last_update_time = env.t

    def finish_deferred_update(self):
        """Debug write + bookkeeping after the caller adopted the fused
        program's grids."""
        env, params = self._deferred
        if params.write_debug_data:
            self.write_debug_data(env, params)
        self.last_update_time = env.t
