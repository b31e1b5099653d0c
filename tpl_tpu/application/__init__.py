from tpl_tpu.application.environment_app import EnvironmentApp
from tpl_tpu.application.planning_app import PlanningApp
from tpl_tpu.application.control_app import ControlApp
