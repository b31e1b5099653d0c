"""Ego vehicle state (reference: library/tpl/environment/vehicle_state.py).

The field set is the parity surface (param stores, controllers, and the
sim all address these names); the container itself follows this
framework's dataclass idiom (see simulation/state.py).
"""

from dataclasses import dataclass, field

import numpy as np


@dataclass
class VehicleState:
    # pose and motion (rear-axle frame)
    x: float = 0.0
    y: float = 0.0
    phi: float = 0.0
    phi_dot: float = 0.0
    k: float = 0.0
    v: float = 0.0
    a: float = 0.0
    lat_acc: float = 0.0
    pitch: float = 0.0

    # steering
    delta: float = 0.0
    delta_dot: float = 0.0
    delta_max: float = field(default_factory=lambda: float(np.radians(35.0)))
    a_lat_max: float = 2.5

    # geometry
    width: float = 2.0
    track_width: float = 1.5
    wheel_base: float = 2.0
    rear_axis_to_rear: float = 2.0
    rear_axis_to_front: float = 3.0
    cog_axes_ratio: float = 0.5

    # actuator dead times; brakes assumed instantaneous
    dead_time_steer: float = 0.0
    dead_time_acc: float = 0.0

    # sensors / driver interface
    imu_state: int = 0
    """off: 0, gps: 1, rtk-float: 2, rtk-lock: 3"""
    turn_indicator: int = 0
    """off: 0, right: -1, left: 1, hazard: 2"""
    steering_wheel_button: bool = False
    automated: bool = True
