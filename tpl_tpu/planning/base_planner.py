"""Planner interface.
(reference: library/tpl/planning/base_planner.py)"""

from tpl_tpu.planning.trajectory import Trajectory


class BasePlanner:

    def __init__(self, shared, lock_shared):
        self.shared = shared
        self.lock_shared = lock_shared

    def update(self, env):
        return Trajectory()
