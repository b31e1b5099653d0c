from tpl_tpu.parallel.mesh import (
    scenario_mesh,
    shard_scenarios,
    sharded_best_candidate,
    init_distributed,
)
from tpl_tpu.parallel.kernels import (
    sharded_idm_sweep,
    sharded_latlon_batch,
    sharded_env_build,
)
