"""Detection / object / prediction containers.
(reference: library/tpl/environment/detections.py)"""

import numpy as np


class TrafficLightDetection:

    def __init__(self):
        self.t = 0.0
        self.near_point = np.array([0.0, 0.0])
        self.far_point = np.array([0.0, 0.0])
        self.state = 3  # TrafficLight.NONE
        self.confidence = 0.0


class DynamicObject:

    def __init__(self):
        self.id = None
        self.t = 0.0
        self.object_class = None
        self.pos = np.zeros(2)
        self.yaw = None
        self.v = None
        self.a = None
        self.hull = np.zeros((0, 2))
        self.hull_radius = 0.0
        # if "left"/"right", planners evade on that side
        self.evade = ""
        self.cam_id = None
        self.meta_info = []
        self.predictions = []
        self.covar = np.eye(4)
        self.stationary = False
        self.on_local_map = False


class Prediction:

    def __init__(self):
        self.proj_assoc_map = None
        self.uuid_assoc_map = None
        self.cos_angle_dist = 0.0
        # states array dims: t, x, y, yaw, v
        self.states = np.zeros((0, 5))
