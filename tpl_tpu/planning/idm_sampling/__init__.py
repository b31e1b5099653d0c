from tpl_tpu.planning.idm_sampling.idm_sampling_planner import (
    IdmSamplingPlanner,
)
