from tpl_tpu.parallel.mesh import (
    scenario_mesh,
    shard_scenarios,
    sharded_best_candidate,
    init_distributed,
)
