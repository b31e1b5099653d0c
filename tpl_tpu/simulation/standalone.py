"""
Single-process closed-loop composition: sim physics -> environment ->
planning -> control -> back into sim.
(reference: library/tpl/simulation/standalone.py)
"""

import copy

from tpl_tpu.application import EnvironmentApp, PlanningApp, ControlApp
from tpl_tpu.simulation.core import SimCore
from tpl_tpu.util import snapshot


class SimStandalone:

    def __init__(self, app_id="", scenario_path=None, env_params=None,
                 planning_params=None, control_params=None):
        self.core = SimCore(app_id, scenario_path)

        with self.core.sh_state.lock():
            scn_planning = self.core.sh_state.sim.init_planning_params
            scn_control = self.core.sh_state.sim.init_control_params

        if planning_params is None and scn_planning != "":
            planning_params = scn_planning
        if control_params is None and scn_control != "":
            control_params = scn_control

        self.env_app = EnvironmentApp(app_id, env_params)
        self.planning_app = PlanningApp(app_id, planning_params,
                                        shared_env=self.env_app.env)
        self.control_app = ControlApp(app_id, control_params)

        self.core.reload_scenario(
            scenario_path,
            self.env_app.env,
            self.planning_app.sh_planners,
            self.control_app.sh_controllers)

    def update(self, wall_time=None):
        sim = self.core.get_next_sim_state(
            self.env_app.env,
            self.planning_app.sh_planners,
            self.control_app.sh_controllers,
            wall_time=wall_time)
        self.core.write_sim_state(sim)

        with self.env_app.env.lock():
            self.env_app.update(sim.t)
            veh = snapshot(self.env_app.env.vehicle_state)

        self.planning_app.update()

        with self.planning_app.sh_planners.lock():
            traj = snapshot(self.planning_app.sh_planners.trajectory)

        with self.control_app.sh_input.lock():
            self.control_app.sh_input.t = sim.t
            self.control_app.sh_input.vehicle = veh
            self.control_app.sh_input.trajectory = traj

        self.control_app.update()

        with self.control_app.sh_controllers.lock():
            controls = snapshot(self.control_app.sh_controllers.controls)

        with self.core.sh_state.lock():
            sim = self.core.sh_state.sim
            sim.ego.control_acc = controls[0]
            sim.ego.control_steer = controls[1]
