from tpl_tpu.environment.vehicle_state import VehicleState
from tpl_tpu.environment.detections import (
    TrafficLightDetection,
    DynamicObject,
    Prediction,
)
from tpl_tpu.environment.env_state import (
    EnvironmentState,
    SharedEnvironmentState,
)
from tpl_tpu.environment import map_module
from tpl_tpu.environment.map_module import (
    Map,
    LocalMap,
    VelocityLimit,
    TrafficLight,
    CrossWalk,
    TurnIndPoint,
    MapSwitchPoint,
    IntersectionPath,
    load_map_store,
)
from tpl_tpu.environment.tracking_module import TrackingModule
from tpl_tpu.environment.prediction_module import PredictionModule
