from tpl_tpu.simulation.state import (
    SimState,
    SimCar,
    SimEgo,
    SimTrafficLight,
    SimTimeConstraint,
    SimSettings,
    SimRuleViolation,
    SimRuleChecker,
    SimIdmParams,
    load_sim_state,
    save_sim_state,
)
from tpl_tpu.simulation.core import SimCore, ScenarioLoadError
from tpl_tpu.simulation.standalone import SimStandalone
from tpl_tpu.simulation.record import (
    SimRecorder,
    SimReplay,
    SimAttach,
    load_recording,
)
