"""
Mesh-sharded entry points for the planning workhorse kernels.

Two fan-out patterns cover the throughput-critical kernels:

* ``sharded_idm_sweep`` — ONE scene, MANY candidates: the IDM rollout
  planner's candidate axis shards over the mesh, the scene (ref line,
  predicted objects, params) is replicated, and each device rolls out
  and evaluates only its candidate shard.  The costs come back sharded;
  the argmin is a trailing gather of a (C,) vector.

* ``sharded_latlon_batch`` — MANY scenes, one solve each: the DP
  lat/lon value iteration vmaps over a scenario batch (each with its own
  distance grid, ref line, params, start state) and the batch shards
  over the mesh.  This is the multi-hypothesis / fleet-evaluation
  pattern: every chip runs whole value iterations locally, with no
  cross-device traffic until results are read.

Both wrappers produce collective-free stepping programs (scenarios and
candidates are independent); shard_map is used rather than auto-sharding
so XLA cannot insert all-gathers inside the solver while_loops.

The reference has no counterpart (single GPU, SURVEY §2.4); this is the
scale-out axis demanded by BASELINE.md.
"""

import jax
from jax.sharding import PartitionSpec as P
from jax import shard_map


def sharded_idm_sweep(kernel, mesh, axis="dp"):
    """Shard an IDM sampling kernel's candidate axis over ``mesh``.

    ``kernel`` is the jitted fn from ``make_idm_kernel(spec)``; returns
    a drop-in with the same signature.  ``l_trgs``/``d_stops`` must have
    length divisible by the mesh size.
    """
    scene = P()           # replicated scene inputs
    cand = P(axis)        # candidate-sharded

    fn = shard_map(
        kernel, mesh=mesh,
        #         init_ref, init_con, l_trgs, d_stops, dt_replan,
        in_specs=(scene, scene, cand, cand, scene,
                  # ref_line, ref_step, objs, pp, l_trg_global
                  scene, scene, scene, scene, scene),
        out_specs=(cand, cand, cand),
        check_vma=False)
    return jax.jit(fn)


def sharded_latlon_batch(solve, mesh, axis="dp"):
    """Scenario-batched DP lat/lon solve, batch sharded over ``mesh``.

    ``solve`` is the jitted fn from ``make_latlon_solver(spec)``.
    Returns ``batch(dist_maps (B,...), ref_lines (B,...), ref_step,
    pps (dict of (B,) leaves), x0s (B, 12)) -> (nodes (B,...),
    trajs (B, T, 12))`` with B divisible by the mesh size.
    """
    vsolve = jax.vmap(solve, in_axes=(0, 0, None, 0, 0))

    fn = shard_map(
        vsolve, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False)
    return jax.jit(fn)


def sharded_env_build(mesh, t_steps, s_steps, l_steps, axis="dp"):
    """Scenario-batched DP environment grid build, batch sharded over
    ``mesh``: every device rasterizes the swept prediction quads and
    runs the forward/backward distance scans for its own scenario shard
    (multi-hypothesis world models, fleet evaluation).

    Returns ``build(ref_lines (B, N, 8), ref_step, quads (B, Q, 4, 2),
    tbits (B, Q), stats (B, Q), valids (B, Q), dilation, s_min, s_step,
    l_min, l_step) -> (occ (B, T, S, L), dist_lon (B, T, S, L))`` with B
    divisible by the mesh size; scalar args are shared across scenarios.
    """
    import functools
    from tpl_tpu.planning.dyn_prog.dp_environment import _build_grids

    build = functools.partial(_build_grids, t_steps=t_steps,
                              s_steps=s_steps, l_steps=l_steps)
    vbuild = jax.vmap(build, in_axes=(0, None, 0, 0, 0, 0,
                                      None, None, None, None, None))
    b, r = P(axis), P()
    fn = shard_map(vbuild, mesh=mesh,
                   in_specs=(b, r, b, b, b, b, r, r, r, r, r),
                   out_specs=(b, b), check_vma=False)
    return jax.jit(fn)
