"""
Shared replan-policy scaffolding for the receding-horizon planner drivers.

Every driver around a device planning kernel repeats the same life-cycle
machinery: snapshot the shared environment, gate the pass on fresh sim
time, decide whether to replan (environment reset, vehicle strayed off
the plan, replan cadence due, stored plan invalid, imminent collision),
latch an emergency trajectory for a number of cycles when plans stay
invalid, stitch the actuator dead-time window out of the previous plan,
and assemble the final :class:`Trajectory`.  The reference duplicates
this scaffolding per driver (reference:
library/tpl/planning/dyn_prog/dp_lat_lon_planner.py:150-290 and its
siblings); here it lives once and each driver composes the pieces its
decision table needs.
"""

import numpy as np

from tpl_tpu.util import snapshot
from tpl_tpu.planning.trajectory import Trajectory
from tpl_tpu.ops.interp import short_angle_dist


ENV_FIELDS = ("vehicle_state", "local_map", "local_map_behind",
              "selected_map", "tracks", "predicted", "man_time_cons")


def snapshot_env(sh_env, env, fields=ENV_FIELDS):
    """Copy the planner-relevant slice of the shared environment store
    into a private :class:`EnvironmentState` under one lock."""
    with sh_env.lock():
        env.t = sh_env.t
        env.reset_counter = sh_env.reset_counter
        for f in fields:
            setattr(env, f, snapshot(getattr(sh_env, f)))
    return env


def cog(veh):
    """Center-of-gravity position of the vehicle (the replan policies
    measure plan deviation at the CoG, not the rear axle)."""
    return (veh.x + np.cos(veh.phi) * veh.wheel_base * 0.5,
            veh.y + np.sin(veh.phi) * veh.wheel_base * 0.5)


class EmergencyLatch:
    """Constraint-violation -> emergency-trajectory latch.

    Two latch styles exist among the planners:

    - ``tolerance=0``: any invalid plan latches immediately for
      ``cycles`` passes; valid plans decay the latch by one.
    - ``tolerance=N``: plans may be invalid for up to N consecutive
      passes (the next replan usually repairs them) before latching;
      the latch decays every pass via :meth:`decay`.
    """

    def __init__(self, cycles=50, tolerance=0):
        self.cycles = cycles
        self.tolerance = tolerance
        self.counter = 0
        self.invalid_streak = 0

    @property
    def active(self):
        return self.counter > 0

    def note(self, valid):
        if self.tolerance == 0:
            if valid:
                self.decay()
            else:
                self.counter = self.cycles
        else:
            self.invalid_streak = 0 if valid else self.invalid_streak + 1
            if self.invalid_streak > self.tolerance:
                self.invalid_streak = 0
                self.counter = self.cycles
        return self.active

    def decay(self):
        self.counter = max(0, self.counter - 1)

    def clear(self):
        self.counter = 0
        self.invalid_streak = 0


class ReplanPolicy:
    """Bookkeeping shared by every driver's replan decision: environment
    reset tracking, replan cadence, off-plan deviation, and the reinit
    message surfaced to the debug store.

    Reinit messages are latched for :attr:`MSG_LATCH_PASSES` planner
    passes (drivers call :meth:`tick_msg` once per pass instead of
    clearing the field): the GUI event log polls the debug store at a
    few Hz while the planner loop runs much faster, so a message that
    lives for exactly one pass can fall between two polls."""

    MSG_LATCH_PASSES = 10

    def __init__(self):
        self.reset_counter = 0
        self.last_replan_time = -1.0
        self.last_imminent_time = -1.0
        self.reinit_msg = ""
        self._msg_passes = 0

    def set_msg(self, msg):
        self.reinit_msg = msg
        self._msg_passes = self.MSG_LATCH_PASSES

    def tick_msg(self):
        """Per-pass decay of the latched reinit message; a fresh
        :meth:`set_msg` re-arms the latch."""
        if self._msg_passes > 0:
            self._msg_passes -= 1
            if self._msg_passes == 0:
                self.reinit_msg = ""

    def reset_changed(self, env):
        """True when the environment's reset counter moved (world jump:
        all warm starts are stale)."""
        changed = self.reset_counter != env.reset_counter
        self.reset_counter = env.reset_counter
        return changed

    def due(self, t, period):
        return t - self.last_replan_time > period

    def mark(self, t):
        self.last_replan_time = t

    def imminent_due(self, t, interval):
        """Rate limit for the per-pass imminent-collision screen, on its
        OWN clock: gating the screen with :meth:`due` (shared
        ``last_replan_time``) either lets a persistent threat force a
        full solve every 10 ms pass (interval > replan period) or makes
        the screen unreachable because the regular cadence check already
        returned on the same condition (interval == replan period).  The
        dedicated timestamp keeps the screen live between replans while
        bounding it to one run per ``interval``.  Consumes the window on
        True: callers run the screen at most once per interval."""
        if t < self.last_imminent_time \
                or t - self.last_imminent_time > interval:
            self.last_imminent_time = t
            return True
        return False

    def off_plan_start(self, trajectory, veh, d_reinit):
        """Vehicle CoG strayed more than d_reinit from the stored plan's
        first point -> cold reinit."""
        if len(trajectory.x) == 0:
            return False
        x_cog, y_cog = cog(veh)
        d = np.hypot(trajectory.x[0] - x_cog, trajectory.y[0] - y_cog)
        if d > d_reinit:
            self.set_msg("Warning: Planner reinit, distance to "
                         "trajectory too high")
            return True
        return False

    def off_plan_lateral(self, project, points_xy, pos, d_reinit):
        """Reference position laterally off the stored plan polyline by
        more than d_reinit -> cold reinit (projection variant; callers
        pass the CoG or the rear axle, matching their decision table)."""
        if points_xy is None or len(points_xy) == 0:
            return False
        d = project(points_xy, pos).distance
        if abs(d) > d_reinit:
            self.set_msg("Warning: Planner reinit, distance to "
                         "trajectory too high")
            return True
        return False


def pass_gate(env, last_update_time, update_always=False):
    """Per-pass gating common to all drivers: skip without a local map
    or when sim time has not advanced; returns (run_pass, new_last_time)
    where new_last_time rewinds to 0 on a backwards time jump.

    The staleness check runs against the PRE-rewind clock: after a time
    jump backwards (scenario reload to t = 0) the pass must run once
    even when the new time equals the rewound clock."""
    run = env.local_map is not None and (
        env.t != last_update_time or update_always)
    if env.t < last_update_time:
        last_update_time = 0.0
    return run, last_update_time


def interp_plan(ts, plan, angle_col=None):
    """Row-wise linear interpolation of a time-indexed plan array
    (column 0 = time), robust to non-uniform and degenerate time grids
    (clamped at the ends; duplicate timestamps cannot divide by zero).
    ``angle_col`` marks a heading column to interpolate along the short
    angular path."""
    ts = np.asarray(ts, dtype=np.float64)
    xs = plan[:, 0]
    n = len(plan)
    if n == 1:
        out = np.repeat(plan, len(ts), axis=0)
        out[:, 0] = ts
        return out
    i = np.clip(np.searchsorted(xs, ts, side="right") - 1, 0, n - 2)
    j = i + 1
    a = np.clip((ts - xs[i]) / np.maximum(xs[j] - xs[i], 1e-9),
                0.0, 1.0)[:, None]
    out = plan[i] * (1.0 - a) + plan[j] * a
    out[:, 0] = ts
    if angle_col is not None:
        out[:, angle_col] = plan[i, angle_col] + short_angle_dist(
            plan[i, angle_col], plan[j, angle_col]) * a[:, 0]
    return out


def stitch_dead_time(traj_np, prev_np, t, dead_time, dt, angle_col=None):
    """Prepend the actuator dead-time window [t, t + dead_time) sampled
    from the PREVIOUS plan: controls issued now act after the dead time,
    so the head of the published trajectory must restate what the
    vehicle is already committed to."""
    if prev_np is None:
        # Cold start: no previous plan exists, but the published
        # trajectory must still cover [t, t + dead_time) so controllers
        # querying current t read in-range head values on the very first
        # pass.  Sample the head from the new plan itself — interp_plan
        # clamps, so this restates row 0, matching the reference's
        # back-extrapolation closely (fill_value='extrapolate' on a plan
        # whose head row IS the current state).
        prev_np = traj_np
    ts = np.arange(t, t + dead_time, dt)
    if len(ts) == 0:
        return traj_np
    head = interp_plan(ts, prev_np, angle_col=angle_col)
    return np.concatenate((head, traj_np), axis=0)


def trajectory_from_array(arr, emergency=False):
    """Assemble a :class:`Trajectory` from an (N, >=8) array with columns
    [t, s, x, y, v, a, heading, curvature]; emergency plans publish the
    flag only (the control side falls back to constant deceleration)."""
    traj = Trajectory()
    traj.emergency = emergency
    if not emergency:
        traj.time = arr[:, 0]
        traj.s = arr[:, 1]
        traj.x = arr[:, 2]
        traj.y = arr[:, 3]
        traj.velocity = arr[:, 4]
        traj.acceleration = arr[:, 5]
        traj.orientation = arr[:, 6]
        traj.curvature = arr[:, 7]
    return traj
