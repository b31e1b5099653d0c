from tpl_tpu.control.base_controller import BaseController
from tpl_tpu.control.const_acc_controller import ConstAccController
from tpl_tpu.control.direct_controller import DirectController
from tpl_tpu.control.model_predictive_controller import (
    ModelPredictiveController,
)
