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


def test_sharded_idm_sweep_matches_unsharded():
    """Candidate axis sharded over 8 devices == plain vmap kernel."""
    from tpl_tpu.planning.idm_sampling import idm_kernel
    from tpl_tpu.parallel import sharded_idm_sweep
    from tests.test_idm_kernel import _scene

    rl, objs, pp, init_ref, init_con = _scene()
    spec = dict(steps_t=20, n_ref=rl.shape[0], n_obj=4, n_pred=8, n_hull=8)
    kernel = idm_kernel.make_idm_kernel(spec)
    mesh = scenario_mesh(8)
    sweep = sharded_idm_sweep(kernel, mesh)

    C = 64
    l_trgs = jnp.asarray(np.linspace(-3, 3, C).astype(np.float32))
    d_stops = jnp.full(C, 1e6, jnp.float32)
    objs_dev = {k: jnp.asarray(v) for k, v in objs.items()}
    args = (jnp.asarray(init_ref), jnp.asarray(init_con), l_trgs, d_stops,
            jnp.float32(0.1), jnp.asarray(rl), jnp.float32(0.5),
            objs_dev, pp.dynamic_dict(), jnp.float32(0.0))

    refs_s, cons_s, costs_s = sweep(*args)
    refs_u, cons_u, costs_u = kernel(*args)

    np.testing.assert_allclose(np.asarray(refs_s), np.asarray(refs_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cons_s), np.asarray(cons_u),
                               rtol=1e-5, atol=1e-5)
    for k in costs_u:
        np.testing.assert_allclose(np.asarray(costs_s[k]),
                                   np.asarray(costs_u[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_sharded_latlon_batch_matches_vmap():
    """Scenario-batched DP value iteration sharded over 8 devices ==
    per-scenario solves."""
    from tpl_tpu.planning.dyn_prog import lat_lon_kernel as llk
    from tpl_tpu.parallel import sharded_latlon_batch
    from tests.test_dp_planner import _straight_env

    # S and L must match the env grid; the ds axis is solver-internal
    solver, _ = llk.make_latlon_solver(dict(
        t_steps=10, s_steps=201, ds_steps=9, l_steps=21))
    mesh = scenario_mesh(8)
    batch = sharded_latlon_batch(solver, mesh)

    B = 8
    env_free = _straight_env(obstacle=False)
    env_blk = _straight_env(obstacle=True)
    dms, rls, pps, x0s = [], [], [], []
    for i in range(B):
        env = env_blk if i % 2 else env_free
        dms.append(np.asarray(env.grid.dist_map_lon))
        rls.append(np.asarray(env.grid.ref_line))
        pp = llk.LatLonParams()
        pp.l_trg = (i - 4) * 0.25
        pps.append(pp.dynamic_dict())
        x0 = np.zeros(12, np.float32)
        x0[llk.C_DS] = 4.0 + i * 0.5
        x0s.append(x0)

    dms = jnp.asarray(np.stack(dms))
    rls = jnp.asarray(np.stack(rls))
    pps_b = jax.tree.map(lambda *ls: jnp.stack(ls), *pps)
    x0s = jnp.asarray(np.stack(x0s))

    nodes_s, trajs_s = batch(dms, rls, jnp.float32(0.5), pps_b, x0s)

    for i in range(B):
        _, traj_i = solver(dms[i], rls[i], jnp.float32(0.5), pps[i], x0s[i])
        np.testing.assert_allclose(np.asarray(trajs_s[i]),
                                   np.asarray(traj_i),
                                   rtol=1e-5, atol=1e-5)


def test_sharded_env_build_matches_unsharded():
    """Scenario-batched DP env grid build sharded over 8 devices ==
    per-scenario _build_grids: rasterization + distance scans are
    bitwise-independent per scenario."""
    from tpl_tpu.planning.dyn_prog.dp_environment import _build_grids
    from tpl_tpu.parallel import scenario_mesh, sharded_env_build

    T, S, L, NR, Q, B = 6, 101, 11, 221, 8, 8
    rng = np.random.default_rng(3)

    ref_lines = np.zeros((B, NR, 8), np.float32)
    ref_lines[:, :, 0] = np.arange(NR) * 0.5          # x
    ref_lines[:, :, 2] = 0.05 * rng.normal(size=(B, 1))  # heading
    ref_lines[:, :, 4] = 4.0                          # d_left
    ref_lines[:, :, 5] = 4.0                          # d_right

    quads = np.zeros((B, Q, 4, 2), np.float32)
    base = np.array([[0., -1.], [3., -1.], [3., 1.], [0., 1.]], np.float32)
    for b in range(B):
        for q in range(Q):
            off = np.array([10.0 + 9 * q + 2 * b, (q % 3 - 1) * 2.0],
                           np.float32)
            quads[b, q] = base + off
    tbits = rng.integers(0, T, size=(B, Q)).astype(np.int32)
    stats = rng.random((B, Q)) < 0.3
    valids = rng.random((B, Q)) < 0.8

    scalars = dict(ref_step=np.float32(0.5), dilation=np.float32(1.0),
                   s_min=np.float32(0.0), s_step=np.float32(1.0),
                   l_min=np.float32(-5.0), l_step=np.float32(1.0))

    mesh = scenario_mesh(8)
    build = sharded_env_build(mesh, T, S, L)
    occ_s, dist_s = build(ref_lines, scalars["ref_step"], quads, tbits,
                          stats, valids, scalars["dilation"],
                          scalars["s_min"], scalars["s_step"],
                          scalars["l_min"], scalars["l_step"])

    for b in range(B):
        occ_u, dist_u = _build_grids(
            ref_lines[b], scalars["ref_step"], quads[b], tbits[b],
            stats[b], valids[b], scalars["dilation"], scalars["s_min"],
            scalars["s_step"], scalars["l_min"], scalars["l_step"],
            t_steps=T, s_steps=S, l_steps=L)
        np.testing.assert_array_equal(np.asarray(occ_s[b]),
                                      np.asarray(occ_u))
        np.testing.assert_allclose(np.asarray(dist_s[b]),
                                   np.asarray(dist_u), rtol=1e-6)
