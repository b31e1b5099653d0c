"""Device-mesh scale-out tests (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpl_tpu.parallel import (
    scenario_mesh, shard_scenarios, sharded_best_candidate,
)


def test_mesh_and_sharding():
    mesh = scenario_mesh(8)
    assert mesh.devices.shape == (8,)

    batch = jnp.arange(16.0).reshape(16, 1)
    sharded = shard_scenarios(batch, mesh)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(batch))


def test_sharded_best_candidate_reduction():
    mesh = scenario_mesh(8)

    def batched_solve(x0):
        # toy per-scenario "solve": cost = squared distance to 3
        costs = (x0[:, 0] - 3.0) ** 2
        return x0 * 2.0, costs

    solve = sharded_best_candidate(batched_solve, mesh)
    x0 = jnp.arange(16.0).reshape(16, 1)
    out, costs, best = solve(x0)

    np.testing.assert_allclose(np.asarray(out), np.asarray(x0) * 2.0)
    # global best = scenario x0 == 3 -> cost 0, reduced across devices
    assert float(best) == 0.0


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
