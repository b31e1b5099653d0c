"""
Time-indexed MPC tracking controller with CoG slip-angle bicycle model and
dead-time compensation.
(reference: library/tpl/control/model_predictive_controller_time.py)
"""

import copy

import numpy as np
import jax.numpy as jnp

from tpl_tpu import util
from tpl_tpu.util import runtime
from tpl_tpu.optim import problems
from tpl_tpu.optim.solver import Solver
from tpl_tpu.control.base_controller import BaseController
from tpl_tpu.planning.trajectory import Trajectory
from tpl_tpu.util import snapshot


class IdleCompensationParams:

    def __init__(self):
        self.active = False
        self.min_acc = -2.0
        self.jerk = -1.0
        self.veh_thresh = 0.5
        self.traj_thresh = 0.1
        self.traj_look_ahead_steps = 5


class CostFunctionParams:

    def __init__(self):
        self.pd = 10.0
        self.pv = 5.0
        self.pdelta = 0.0
        self.min_pdelta_dot = 0.1
        self.pdelta_dot = 0.1
        self.min_p_phi_dot = 0.0
        self.p_phi_dot = 0.0
        self.p_phi = 0.0
        self.p_phi_ref_dot_diff = 0.0
        self.pa = 2.0
        self.pj = 0.5


class Params:

    def __init__(self):
        self.horizon = 40
        self.step = 0.05
        self.max_iterations = 20

        self.cycle_time = 0.01
        self.acc_min = -3.0
        self.acc_max = 3.0
        self.jerk_min = -3.0
        self.jerk_max = 1.5
        self.steer_rate_min = -1.0
        self.steer_rate_max = 1.0

        self.cog_pos = 0.5
        self.ref_dt = 0.1

        self.cost_function = CostFunctionParams()
        self.idle_comp = IdleCompensationParams()


class ModelPredictiveControllerTime(BaseController):

    def __init__(self, shared, lock_shared):
        self.shared = shared
        self.lock_shared = lock_shared

        prob, spec = problems.trajectory_tracking_mpc_time(ref_capacity=128)
        self.opt = Solver(prob, spec, horizon_max=60,
                  dtype=jnp.float64, device="cpu")
        self.opt.integrator_type = self.opt.HEUN
        self.opt.lg_mult_limit = 0.0
        self.opt.barrier_weight[:] = 10000.0

        self.opt.params.v_ch = 32.0
        self.opt.params.max_delta = 0.7

        self.lat_dist_to_traj = 0.0
        self.jerk = 0.0
        self.dead_time_trajectory = np.zeros((0, 5))
        self.controls = (0.0, 0.0)
        self.con_traj = Trajectory()
        self.last_update_time = 0.0
        self.ctrl_vars_history = []
        self.idle_comp_acc = 0.0
        self.idle_comp_steer = 0.0

        with self.lock_shared():
            self.shared.params = Params()

    @runtime
    def update(self, con_input):
        t = con_input.t
        veh = con_input.vehicle
        traj = con_input.trajectory

        opt = self.opt

        delta_time = t - self.last_update_time
        if delta_time < 0.0:
            self.ctrl_vars_history = []

        with self.lock_shared():
            params = snapshot(self.shared.params)

        if traj is None or len(traj.time) < 2:
            return self.controls, self.con_traj

        opt.u_min[:, 0] = params.jerk_min
        opt.u_max[:, 0] = params.jerk_max
        opt.u_min[:, 1] = params.steer_rate_min
        opt.u_max[:, 1] = params.steer_rate_max
        opt.params.min_acc = params.acc_min
        opt.params.max_acc = params.acc_max

        opt.params.merge(vars(params.cost_function))

        # center UTM coordinates around the reference start: the solver
        # traces in float32 on device, where the ulp at UTM magnitude
        # (~5e6) is 0.5 m.  Positions only enter through differences, so
        # a rigid translation is exact.
        x_off, y_off = float(traj.x[0]), float(traj.y[0])

        opt.horizon = params.horizon
        opt.step = params.step
        opt.max_iterations = params.max_iterations
        opt.params.l = veh.wheel_base
        opt.params.ref_x = np.asarray(traj.x) - x_off
        opt.params.ref_y = np.asarray(traj.y) - y_off
        opt.params.ref_phi = traj.orientation
        opt.params.ref_v = traj.velocity
        opt.params.ref_dt = params.ref_dt
        opt.params.ref_t_offset = veh.dead_time_steer
        opt.params.a_offset = 9.81 * np.sin(veh.pitch)
        opt.params.cog_pos = params.cog_pos

        self.lat_dist_to_traj = util.project(
            np.vstack((traj.x, traj.y)).T, (veh.x, veh.y)).distance

        # dead-time compensation through the issued-control history
        x0 = np.array([
            veh.x - x_off + np.cos(veh.phi) * params.cog_pos * veh.wheel_base,
            veh.y - y_off + np.sin(veh.phi) * params.cog_pos * veh.wheel_base,
            veh.phi,
            veh.delta,
            veh.v,
            veh.a])

        if veh.dead_time_steer > 0.0:
            x0s = []
            rt = t
            dead_time_index = int(veh.dead_time_steer / params.cycle_time
                                  + 1e-5)
            for acc, delta in self.ctrl_vars_history[-dead_time_index:]:
                x0s.append(np.array([rt, *x0]))
                x0[3] = delta
                x0[5] = acc
                x0 = opt.dynamics(x0, np.zeros(2), 0, params.cycle_time)
                rt += params.cycle_time
            x0s.append(np.array([rt, *x0]))
            self.dead_time_trajectory = np.array(x0s)

        opt.x[0] = x0
        opt.update()

        steering_angle = opt.x[1][3]
        steering_angle = min(veh.delta_max,
                             max(-veh.delta_max, steering_angle))
        acc = opt.x[1][5]
        acc = min(params.acc_max, max(params.acc_min, acc))

        if delta_time > 0.0:
            self.ctrl_vars_history.append((acc, steering_angle))
        if len(self.ctrl_vars_history) > 100:
            self.ctrl_vars_history.pop(0)

        self.last_update_time = t

        look = params.idle_comp.traj_look_ahead_steps
        if params.idle_comp.active and (
                veh.v < params.idle_comp.veh_thresh
                and look < len(traj.velocity)
                and traj.velocity[look] < params.idle_comp.traj_thresh):
            self.idle_comp_acc += params.idle_comp.jerk * delta_time
            steering_angle = self.idle_comp_steer
        else:
            self.idle_comp_steer = steering_angle
            self.idle_comp_acc = 0.0
        self.idle_comp_acc = min(0.0, max(params.idle_comp.min_acc,
                                          self.idle_comp_acc))
        acc += self.idle_comp_acc

        self.jerk = opt.u[0][0]
        self.controls = (acc, steering_angle)

        self.con_traj = Trajectory()
        self.con_traj.time = t + np.arange(0, opt.T * opt.dt, opt.dt)
        self.con_traj.x = opt.x[:-1, 0] + x_off
        self.con_traj.y = opt.x[:-1, 1] + y_off
        self.con_traj.orientation = opt.x[:-1, 2].copy()
        self.con_traj.velocity = opt.x[:-1, 4].copy()
        self.con_traj.curvature = np.tan(opt.x[:-1, 3]) / veh.wheel_base
        self.con_traj.acceleration = opt.x[:, 5].copy()

        return self.controls, self.con_traj
