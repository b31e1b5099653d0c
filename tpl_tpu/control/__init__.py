from tpl_tpu.control.base_controller import BaseController
from tpl_tpu.control.const_acc_controller import ConstAccController
from tpl_tpu.control.direct_controller import DirectController
from tpl_tpu.control.model_predictive_controller import (
    ModelPredictiveController,
)
from tpl_tpu.control.model_predictive_controller_time import (
    ModelPredictiveControllerTime,
)
from tpl_tpu.control.feedforward_controller import FeedforwardController
from tpl_tpu.control.flat_controller import FlatController
