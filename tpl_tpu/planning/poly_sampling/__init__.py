from tpl_tpu.planning.poly_sampling.poly_sampling_planner import (
    PolySamplingPlanner,
)
