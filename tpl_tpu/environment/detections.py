"""Detection / object / prediction containers.
(reference: library/tpl/environment/detections.py — the field sets are
the parity surface; containers follow this framework's dataclass idiom.)
"""

from dataclasses import dataclass, field

import numpy as np


def _vec2():
    return np.zeros(2)


@dataclass
class TrafficLightDetection:
    t: float = 0.0
    near_point: np.ndarray = field(default_factory=_vec2)
    far_point: np.ndarray = field(default_factory=_vec2)
    state: int = 3            # TrafficLight.NONE
    confidence: float = 0.0


@dataclass
class DynamicObject:
    id: object = None
    t: float = 0.0
    object_class: object = None
    pos: np.ndarray = field(default_factory=_vec2)
    yaw: object = None
    v: object = None
    a: object = None
    hull: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    hull_radius: float = 0.0
    evade: str = ""           # "left"/"right": planners evade on that side
    cam_id: object = None
    meta_info: list = field(default_factory=list)
    predictions: list = field(default_factory=list)
    covar: np.ndarray = field(default_factory=lambda: np.eye(4))
    stationary: bool = False
    on_local_map: bool = False


@dataclass
class Prediction:
    proj_assoc_map: object = None
    uuid_assoc_map: object = None
    cos_angle_dist: float = 0.0
    # states array dims: t, x, y, yaw, v
    states: np.ndarray = field(default_factory=lambda: np.zeros((0, 5)))
