"""Pallas line-search mega-kernel vs the XLA scan path.

Runs in Pallas interpret mode so the kernel logic is exercised on the CPU
test mesh; the Mosaic-compiled path is covered by the TPU benchmarks.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _mpc_problem():
    from tpl_tpu.optim import problems
    import __graft_entry__ as ge
    update, state, x0, params, cfg = ge._mpc_setup(
        horizon=60, max_iterations=6)
    prob, spec = problems.trajectory_tracking_mpc(ref_capacity=128)
    return prob, state, x0, params, cfg


def test_pallas_linesearch_matches_xla_vmapped():
    from tpl_tpu.optim import ilqr
    prob, state, x0, params, cfg = _mpc_problem()

    upd_ref = ilqr.make_update_fn(prob, 60, integrator=ilqr.HEUN,
                                  dtype=jnp.float32, jit=False)
    upd_pal = ilqr.make_update_fn(prob, 60, integrator=ilqr.HEUN,
                                  dtype=jnp.float32, jit=False,
                                  pallas_linesearch=True,
                                  pallas_interpret=True)

    B = 4
    bstate = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
    bx0 = (jnp.broadcast_to(x0, (B,) + x0.shape)
           + 0.01 * jnp.arange(B, dtype=x0.dtype)[:, None])
    v1 = jax.jit(jax.vmap(upd_ref, in_axes=(0, 0, None, None)))
    v2 = jax.jit(jax.vmap(upd_pal, in_axes=(0, 0, None, None)))
    s1, i1 = v1(bstate, bx0, params, cfg)
    s2, i2 = v2(bstate, bx0, params, cfg)

    np.testing.assert_allclose(np.asarray(i1["traj_costs"]),
                               np.asarray(i2["traj_costs"]), rtol=1e-5)
    assert float(jnp.max(jnp.abs(s1.x - s2.x))) < 1e-4
    assert float(jnp.max(jnp.abs(s1.u - s2.u))) < 1e-4


def test_pallas_linesearch_matches_xla_lanes_engine():
    from tpl_tpu.optim import ilqr, batched
    prob, state, x0, params, cfg = _mpc_problem()
    H, nx, nu, nc, B = 60, prob.nx, prob.nu, prob.nc, 4

    u1 = batched.make_batched_update_fn(prob, H, B, integrator=ilqr.HEUN,
                                        jit=True)
    u2 = batched.make_batched_update_fn(prob, H, B, integrator=ilqr.HEUN,
                                        jit=True, pallas_linesearch=True,
                                        pallas_interpret=True)

    x = jnp.zeros((H + 1, nx, B), jnp.float32)
    u = jnp.zeros((H, nu, B), jnp.float32)
    lam = jnp.zeros((H, nc, B), jnp.float32)
    mu = jnp.zeros((B,), jnp.int32)
    bx0 = (jnp.broadcast_to(x0[:, None], (nx, B))
           + 0.01 * jnp.arange(B)[None, :]).astype(jnp.float32)
    r1 = u1(x, u, lam, mu, bx0, params, cfg)
    r2 = u2(x, u, lam, mu, bx0, params, cfg)

    np.testing.assert_allclose(np.asarray(r1[-1]), np.asarray(r2[-1]),
                               rtol=1e-5)
    assert float(jnp.max(jnp.abs(r1[0] - r2[0]))) < 1e-4
