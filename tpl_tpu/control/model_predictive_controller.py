"""
Spatial-progress MPC tracking controller with dead-time compensation.

Resamples the planned trajectory into equidistant reference arrays, forward
integrates the measured state through the history of issued controls to
compensate actuator dead time, projects onto the reference for the progress
state, and solves the tracking MPC with the iLQR core (HEUN integrator).
(reference: library/tpl/control/model_predictive_controller.py)
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
        self.pdelta_dot = 0.0
        self.min_p_phi_dot = 0.0
        self.p_phi_dot = 0.0
        self.p_phi = 0.01
        self.p_phi_ref_dot_diff = 0.01
        self.pa = 2.0
        self.pj = 0.5


class Params:

    def __init__(self):
        self.horizon = 60
        self.step = 0.05
        self.max_iterations = 20

        self.acc_min = -3.0
        self.acc_max = 3.0
        self.jerk_min = -3.0
        self.jerk_max = 1.5
        self.steer_rate_min = -1.0
        self.steer_rate_max = 1.0

        self.ref_step = 0.5

        self.cost_function = CostFunctionParams()
        self.idle_comp = IdleCompensationParams()


class ModelPredictiveController(BaseController):

    def __init__(self, shared, lock_shared):
        self.shared = shared
        self.lock_shared = lock_shared

        prob, spec = problems.trajectory_tracking_mpc(ref_capacity=128)
        self.opt = Solver(prob, spec, horizon_max=60,
                  dtype=jnp.float64, device="cpu")
        self.opt.integrator_type = self.opt.HEUN
        self.opt.lg_mult_limit = 0.0
        self.opt.barrier_weight[:] = 10000.0

        self.opt.params.v_ch = 32.0
        self.opt.params.max_delta = 0.7

        self.lat_dist_to_traj = 0.0
        self.jerk = 0.0
        self.dead_time_trajectory = np.zeros((0, 6))
        self.controls = (0.0, 0.0)
        self.con_traj = Trajectory()
        self.last_update_time = 0.0
        self.ctrl_vars_history = []
        self.idle_comp_acc = 0.0
        self.idle_comp_steer = 0.0
        self.cycle_time_estimate = 0.01

        with self.lock_shared():
            self.shared.params = Params()

    @runtime
    def update(self, con_input):
        t = con_input.t
        veh = con_input.vehicle
        traj = con_input.trajectory

        opt = self.opt

        delta_time = t - self.last_update_time
        if delta_time < 0.0 or delta_time > 1.0:
            self.ctrl_vars_history = []
        else:
            self.cycle_time_estimate = (self.cycle_time_estimate * 0.95
                                        + delta_time * 0.05)

        with self.lock_shared():
            params = snapshot(self.shared.params)

        if len(traj.time) < 2:
            return self.controls, self.con_traj

        traj_arr = np.vstack([traj.x, traj.y, traj.orientation, traj.s,
                              traj.curvature, traj.velocity]).T

        ref = util.resample_path(traj_arr, params.ref_step, 100,
                                 start_index=0, zero_vel_at_end=True)
        if ref is None:
            return self.controls, self.con_traj

        # constraints + cost params
        opt.u_min[:, 0] = params.jerk_min
        opt.u_max[:, 0] = params.jerk_max
        opt.u_min[:, 1] = params.steer_rate_min
        opt.u_max[:, 1] = params.steer_rate_max
        opt.params.min_acc = params.acc_min
        opt.params.max_acc = params.acc_max

        opt.params.merge(vars(params.cost_function))

        # center UTM coordinates around the reference start: the solver
        # traces in float32 on device, where the ulp at UTM magnitude
        # (~5e6) is 0.5 m — far too coarse for lateral dynamics.  The
        # tracking problem only uses positions through differences
        # (x - r_x, y - r_y), so a rigid translation is exact.
        x_off, y_off = float(ref[0, 0]), float(ref[0, 1])

        opt.horizon = params.horizon
        opt.step = params.step
        opt.max_iterations = params.max_iterations
        opt.params.l = veh.wheel_base
        opt.params.ref_x = ref[:, 0] - x_off
        opt.params.ref_y = ref[:, 1] - y_off
        opt.params.ref_phi = ref[:, 2]
        opt.params.ref_k = ref[:, 4]
        opt.params.ref_v = ref[:, 5]
        opt.params.ref_step = params.ref_step
        opt.params.a_offset = 9.81 * np.sin(veh.pitch)

        self.lat_dist_to_traj = util.project(
            ref[:, :2], (veh.x, veh.y)).distance

        # dead-time compensation: forward-integrate the measured state
        # through the issued-control history (mpc:161-185)

        x0 = np.array([veh.x - x_off, veh.y - y_off,
                       veh.phi, veh.delta, veh.v, 0.0, veh.a])

        if veh.dead_time_steer > 0.0:
            x0s = []
            rt = t
            dead_time_index = int(
                veh.dead_time_steer / self.cycle_time_estimate + 1e-5)
            for acc, delta in self.ctrl_vars_history[-dead_time_index:]:
                x0s.append(np.array([rt, *x0]))
                u = np.zeros(2)
                x0[3] = delta
                x0[6] = acc
                x0 = opt.dynamics(x0, u, 0, self.cycle_time_estimate)
                rt += self.cycle_time_estimate
            x0s.append(np.array([rt, *x0]))
            self.dead_time_trajectory = np.array(x0s)
            self.dead_time_trajectory[:, 1] += x_off
            self.dead_time_trajectory[:, 2] += y_off

        proj = util.project(ref[:, :2] - (x_off, y_off), x0[:2])
        x0[5] = proj.arc_len

        opt.x[0] = x0
        opt.update()

        # extract controls from the first prediction step (mpc:195-206)
        steering_angle = opt.x[1][3]
        steering_angle = min(veh.delta_max,
                             max(-veh.delta_max, steering_angle))
        acc = opt.x[1][6]
        acc = min(params.acc_max, max(params.acc_min, acc))

        if delta_time > 0.0:
            self.ctrl_vars_history.append((acc, steering_angle))
        if len(self.ctrl_vars_history) > 100:
            self.ctrl_vars_history.pop(0)

        self.last_update_time = t

        # idle compensation near standstill (mpc:211-221)
        vel_idx = 5
        if params.idle_comp.active and (
                veh.v < params.idle_comp.veh_thresh
                and ref[params.idle_comp.traj_look_ahead_steps, vel_idx]
                < params.idle_comp.traj_thresh):
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
        self.con_traj.s = opt.x[:-1, 5] - opt.x[0, 5]
        self.con_traj.acceleration = opt.u[:, 0].copy()

        return self.controls, self.con_traj
