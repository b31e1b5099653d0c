"""
Pallas TPU mega-kernel for the iLQR line-search rollouts.

The XLA path evaluates the 8-alpha feedback rollout as a `lax.scan` whose
60 steps each lower to dozens of tiny fused ops; at the batch sizes used
by the batched MPC the solve becomes tiny-op-latency-bound (profiled: the
update is dominated by per-op overhead, not FLOPs).  This kernel runs the
ENTIRE line search — all alphas, all horizon steps, dynamics, control
clipping, augmented-Lagrangian cost accumulation and the terminal cost —
inside ONE Pallas program per batch tile, with every operand resident in
VMEM.

Layout: the batch rides the 128-wide LANE dimension and the 8 line
search alphas are folded into the lanes as well (L = 8*128 = 1024 lanes
per tile), so every vector op in the kernel runs at full VPU width.  The
problem's dynamics/cost/constraint functions are called DIRECTLY on
(state_dim, L) stacks — they are written with x[i] unpacking and
elementwise math, so they are lane-polymorphic without vmap (vmap with
out_axes=-1 emits bool transposes Mosaic cannot legalize, and
batch-in-sublanes layouts pad the tiny state dim to 128 lanes and
overflow VMEM).

The public function is single-instance with a `jax.custom_batching` vmap
rule, so `jax.vmap(update)` (the batched MPC path) transparently maps
the batch onto the Pallas grid with legal block shapes.

(reference: the generated C forward pass optim.c:733-793; the XLA twin is
ilqr.fb_rollout)
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpl_tpu.optim import ilqr
from tpl_tpu.ops import interp


def make_fb_rollout_v(prob, horizon, integrator, dtype, n_alpha=8,
                      interpret=False, batch_tile=128):
    """Build a Pallas twin of ``ilqr.fb_rollout_v``.

    Returns ``fn(alphas, x0, xs_ref, us_ref, ks, Ks, u_min, u_max, dt, T,
    params, lam, w) -> (xs, us, costs)`` with result shapes
    ``(n_alpha, H+1, nx) / (n_alpha, H, nu) / (n_alpha,)``; under
    ``jax.vmap`` the batch dimension maps onto the Pallas grid.
    """
    H = horizon
    nx, nu = prob.nx, prob.nu
    nc = max(prob.nc, 1)
    A = n_alpha
    has_con = prob.constraints is not None and prob.nc > 0

    def aug_cost(x, u, t, dt, params, lam, w):
        c = jnp.asarray(prob.cost(x, u, t, dt, params), dtype)
        if has_con:
            g = jnp.asarray(prob.constraints(x, u, t, dt, params), dtype)
            inactive = (g < 0.0) & (jnp.abs(lam) < ilqr._AL_ZERO)
            c = c + jnp.sum(g * lam)
            c = c + jnp.sum(jnp.where(inactive, 0.0, w * g * g))
        return c

    def end_cost(x, t, dt, params):
        if prob.end_cost is None:
            return jnp.zeros((), dtype)
        return jnp.asarray(prob.end_cost(x, t, dt, params), dtype)

    def step(x, u, t, dt, params):
        return ilqr._integrate(prob.dynamics, x, u, t, dt, params,
                               integrator)

    # kernel over one batch tile, batch in sublanes:
    #   x0 (TB, nx), xs_ref (H+1, TB, nx), us_ref/ks (H, TB, nu),
    #   Ks (H, TB, nu, nx), lam (H, TB, nc)
    def kernel(pnames, *refs):
        # rollouts only need lookup primals; custom_jvp primitives with
        # symbolic zeros do not lower through Mosaic
        with interp.primal_only():
            _kernel_body(pnames, *refs)

    def _kernel_body(pnames, *refs):
        (alphas_ref, dt_ref, T_ref, w_ref) = refs[:4]
        param_refs = refs[4:4 + len(pnames)]
        (x0_ref, xsr_ref, usr_ref, ks_ref, Ks_ref,
         umin_ref, umax_ref, lam_ref) = refs[4 + len(pnames):12 + len(pnames)]
        xs_out, us_out, cost_out = refs[12 + len(pnames):]

        params = {}
        for name, ref in zip(pnames, param_refs):
            v = ref[:]
            params[name] = v[0] if v.shape == (1,) else v

        dt = dt_ref[0]
        T = T_ref[0]
        alphas = alphas_ref[:]                      # (A,)
        w = w_ref[:]                                # (nc,)
        x0 = x0_ref[:]                              # (nx, TB)
        TB = x0.shape[-1]
        L = A * TB

        def fold(v):
            # (..., TB) -> (..., A*TB): alpha-major lane folding
            return jnp.concatenate([v] * A, axis=-1)

        def rows_like(vec, nrows):
            # (nrows,) 1-D vector -> (nrows, L) without unit-dim reshapes
            ir = jax.lax.broadcasted_iota(jnp.int32, (nrows, L), 0)
            out = jnp.zeros((nrows, L), dtype)
            for j in range(nrows):
                out = jnp.where(ir == j, vec[j], out)
            return out

        # per-lane alpha: lane l belongs to alpha index l // TB
        il = jax.lax.broadcasted_iota(jnp.int32, (nu, L), 1) // TB
        alpha_L = jnp.zeros((nu, L), dtype)
        for j in range(A):
            alpha_L = jnp.where(il == j, alphas[j], alpha_L)

        def aug_cost_L(x, u, t, lam):
            # lane-stacked augmented cost: reductions over the
            # constraint axis only
            c = jnp.asarray(prob.cost(x, u, t, dt, params), dtype)
            if has_con:
                g = jnp.asarray(prob.constraints(x, u, t, dt, params),
                                dtype)
                wL = rows_like(w, nc)
                lam_a = jnp.abs(lam)
                inactive = (g < 0.0) & (lam_a < ilqr._AL_ZERO)
                c = c + jnp.sum(g * lam, axis=0)
                c = c + jnp.sum(jnp.where(inactive, 0.0, wL * g * g),
                                axis=0)
            return c

        for a in range(A):
            xs_out[a, 0, :, :] = x0

        def body(t, carry):
            x, acc = carry                          # (nx, L), (L,)
            xr = fold(xsr_ref[t, :, :])             # (nx, L)
            ur = fold(usr_ref[t, :, :])             # (nu, L)
            k = fold(ks_ref[t, :, :])               # (nu, L)
            K = fold(Ks_ref[t, :, :, :])            # (nu, nx, L)
            lo = rows_like(umin_ref[t, :], nu)      # (nu, L)
            hi = rows_like(umax_ref[t, :], nu)
            lam_t = fold(lam_ref[t, :, :])          # (nc, L)

            du = jnp.sum(K * (x - xr)[None], axis=1)  # (nu, L)
            u = ur + alpha_L * k + du
            u = jnp.clip(u, lo, hi)
            active = t < T
            u = jnp.where(active, u, ur)

            xn = jnp.asarray(step(x, u, t, dt, params), dtype)
            xn = jnp.where(active, xn, x)

            c = aug_cost_L(x, u, t, lam_t)          # (L,)
            acc = acc + jnp.where(active, c, 0.0)

            for a in range(A):
                us_out[a, t, :, :] = u[:, a * TB:(a + 1) * TB]
                xs_out[a, t + 1, :, :] = xn[:, a * TB:(a + 1) * TB]
            return xn, acc

        x = fold(x0)
        acc = jnp.zeros((L,), dtype)
        x, acc = jax.lax.fori_loop(0, H, body, (x, acc))

        # terminal cost at the active-horizon end state
        if prob.end_cost is not None:
            xT = jnp.concatenate(
                [xs_out[a, pl.ds(T, 1), :, :][0] for a in range(A)],
                axis=-1)                            # (nx, L)
            acc = acc + jnp.asarray(
                prob.end_cost(xT, T, dt, params), dtype)
        for a in range(A):
            cost_out[a, :] = acc[a * TB:(a + 1) * TB]

    @functools.lru_cache(maxsize=None)
    def build(param_names, B, TB):
        kern = functools.partial(kernel, param_names)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)

        def bspec(*lead):
            # batch-in-lanes operand: block (lead..., TB) at batch tile i
            nd = len(lead)
            return pl.BlockSpec(
                lead + (TB,),
                (lambda i, _nd=nd: (0,) * _nd + (i,)),
                memory_space=pltpu.VMEM)

        n_par = len(param_names)
        in_specs = (
            [full] * (4 + n_par)
            + [bspec(nx), bspec(H + 1, nx), bspec(H, nu), bspec(H, nu),
               bspec(H, nu, nx), full, full, bspec(H, nc)])
        out_specs = (bspec(A, H + 1, nx), bspec(A, H, nu), bspec(A))
        return pl.pallas_call(
            kern,
            grid=(B // TB,),
            out_shape=(
                jax.ShapeDtypeStruct((A, H + 1, nx, B), dtype),
                jax.ShapeDtypeStruct((A, H, nu, B), dtype),
                jax.ShapeDtypeStruct((A, B), dtype),
            ),
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )

    def batched_call(alphas, dt, T, w, plist, names, x0b, xsrb, usrb, ksb,
                     Ksb, umin, umax, lamb):
        """All batched operands arrive batch-LEADING; returns
        batch-leading results."""
        B = x0b.shape[0]
        TB = batch_tile
        while B % TB != 0:
            TB //= 2
        call = build(tuple(names), B, TB)
        xs, us, costs = call(
            alphas, dt, T, w, *plist,
            jnp.moveaxis(x0b, 0, -1), jnp.moveaxis(xsrb, 0, -1),
            jnp.moveaxis(usrb, 0, -1), jnp.moveaxis(ksb, 0, -1),
            jnp.moveaxis(Ksb, 0, -1), umin, umax,
            jnp.moveaxis(lamb, 0, -1))
        return (jnp.moveaxis(xs, -1, 0), jnp.moveaxis(us, -1, 0),
                jnp.moveaxis(costs, -1, 0))

    def prep(alphas, dt, T, w, params, lam):
        names = sorted(params.keys())
        plist = []
        for n in names:
            v = jnp.asarray(params[n], dtype)
            plist.append(v[None] if v.ndim == 0 else v)
        return (jnp.asarray(alphas, dtype), jnp.asarray(dt, dtype)[None],
                jnp.asarray(T, jnp.int32)[None], jnp.asarray(w, dtype),
                plist, names, jnp.asarray(lam, dtype))

    @jax.custom_batching.custom_vmap
    def fn(alphas, x0, xs_ref, us_ref, ks, Ks, u_min, u_max, dt, T,
           params, lam, w):
        al, dtp, Tp, wp, plist, names, lamp = prep(alphas, dt, T, w,
                                                   params, lam)
        xs, us, costs = batched_call(
            al, dtp, Tp, wp, plist, names,
            jnp.asarray(x0, dtype)[None],
            jnp.asarray(xs_ref, dtype)[None],
            jnp.asarray(us_ref, dtype)[None],
            jnp.asarray(ks, dtype)[None], jnp.asarray(Ks, dtype)[None],
            jnp.asarray(u_min, dtype), jnp.asarray(u_max, dtype),
            lamp[None])
        return xs[0], us[0], costs[0]

    @fn.def_vmap
    def fn_vmap(axis_size, in_batched, alphas, x0, xs_ref, us_ref, ks, Ks,
                u_min, u_max, dt, T, params, lam, w):
        (ab, x0b_, xsb_, usb_, ksb_, Ksb_, lob_, hib_, dtb_, Tb_,
         pb_, lamb_, wb_) = in_batched
        # the batched-MPC pattern: per-instance trajectories batched,
        # config/params shared (vmap in_axes=(0, 0, None, None))
        expected = (not ab and x0b_ and xsb_ and usb_ and ksb_ and Ksb_
                    and not lob_ and not hib_ and not dtb_ and not Tb_
                    and not any(jax.tree.leaves(pb_)) and lamb_
                    and not wb_)
        if not expected:
            raise NotImplementedError(
                "pallas fb_rollout batching expects batched "
                "(x0, xs_ref, us_ref, ks, Ks, lam) and shared config")
        al, dtp, Tp, wp, plist, names, lamp = prep(alphas, dt, T, w,
                                                   params, lam)
        xs, us, costs = batched_call(
            al, dtp, Tp, wp, plist, names,
            jnp.asarray(x0, dtype), jnp.asarray(xs_ref, dtype),
            jnp.asarray(us_ref, dtype), jnp.asarray(ks, dtype),
            jnp.asarray(Ks, dtype), jnp.asarray(u_min, dtype),
            jnp.asarray(u_max, dtype), lamp)
        return (xs, us, costs), (True, True, True)

    return fn


def make_fb_rollout_lanes(prob, horizon, batch, integrator, dtype,
                          n_alpha=8, interpret=False, batch_tile=128):
    """Pallas line-search rollout for the batch-in-lanes engine.

    Drop-in for ``batched.make_batched_update_fn``'s ``fb_rollout``: all
    operands already carry the trailing batch dim the kernel wants, so
    integration is transpose-free (the transposes are what erase the
    kernel's win when plugged into the vmapped engine).

    Signature: ``fn(alphas, x0 (nx,B), xs_ref (H+1,nx,B), us_ref (H,nu,B),
    ks (H,nu,B), Ks (H,nu,nx,B), u_min (H,nu), u_max (H,nu), dt, T,
    params, lam (H,nc,B), w) -> (xs (H+1,nx,A,B), us (H,nu,A,B),
    costs (A,B))``.
    """
    H = horizon
    B = batch
    nx, nu = prob.nx, prob.nu
    nc = max(prob.nc, 1)
    A = n_alpha
    has_con = prob.constraints is not None and prob.nc > 0

    TB = batch_tile
    while B % TB != 0:
        TB //= 2

    def step(x, u, t, dt, params):
        return ilqr._integrate(prob.dynamics, x, u, t, dt, params,
                               integrator)

    def kernel(pnames, *refs):
        with interp.primal_only():
            _kernel_body(pnames, *refs)

    def _kernel_body(pnames, *refs):
        (alphas_ref, dt_ref, T_ref, w_ref) = refs[:4]
        param_refs = refs[4:4 + len(pnames)]
        (x0_ref, xsr_ref, usr_ref, ks_ref, Ks_ref,
         umin_ref, umax_ref, lam_ref) = refs[4 + len(pnames):12 + len(pnames)]
        xs_out, us_out, cost_out = refs[12 + len(pnames):]

        params = {}
        for name, ref in zip(pnames, param_refs):
            v = ref[:]
            params[name] = v[0] if v.shape == (1,) else v

        dt = dt_ref[0]
        T = T_ref[0]
        alphas = alphas_ref[:]
        w = w_ref[:]
        x0 = x0_ref[:]                              # (nx, TB)
        L = A * TB

        def fold(v):
            return jnp.concatenate([v] * A, axis=-1)

        def rows_like(vec, nrows):
            ir = jax.lax.broadcasted_iota(jnp.int32, (nrows, L), 0)
            out = jnp.zeros((nrows, L), dtype)
            for j in range(nrows):
                out = jnp.where(ir == j, vec[j], out)
            return out

        il = jax.lax.broadcasted_iota(jnp.int32, (nu, L), 1) // TB
        alpha_L = jnp.zeros((nu, L), dtype)
        for j in range(A):
            alpha_L = jnp.where(il == j, alphas[j], alpha_L)

        def aug_cost_L(x, u, t, lam):
            c = jnp.asarray(prob.cost(x, u, t, dt, params), dtype)
            if has_con:
                g = jnp.asarray(prob.constraints(x, u, t, dt, params),
                                dtype)
                wL = rows_like(w, nc)
                inactive = (g < 0.0) & (jnp.abs(lam) < ilqr._AL_ZERO)
                c = c + jnp.sum(g * lam, axis=0)
                c = c + jnp.sum(jnp.where(inactive, 0.0, wL * g * g),
                                axis=0)
            return c

        for a in range(A):
            xs_out[0, :, a, :] = x0

        def body(t, carry):
            x, acc = carry
            xr = fold(xsr_ref[t, :, :])
            ur = fold(usr_ref[t, :, :])
            k = fold(ks_ref[t, :, :])
            K = fold(Ks_ref[t, :, :, :])
            lo = rows_like(umin_ref[t, :], nu)
            hi = rows_like(umax_ref[t, :], nu)
            lam_t = fold(lam_ref[t, :, :])

            du = jnp.sum(K * (x - xr)[None], axis=1)
            u = ur + alpha_L * k + du
            u = jnp.clip(u, lo, hi)
            active = t < T
            u = jnp.where(active, u, ur)

            xn = jnp.asarray(step(x, u, t, dt, params), dtype)
            xn = jnp.where(active, xn, x)

            c = aug_cost_L(x, u, t, lam_t)
            acc = acc + jnp.where(active, c, 0.0)

            for a in range(A):
                us_out[t, :, a, :] = u[:, a * TB:(a + 1) * TB]
                xs_out[t + 1, :, a, :] = xn[:, a * TB:(a + 1) * TB]
            return xn, acc

        x = fold(x0)
        acc = jnp.zeros((L,), dtype)
        x, acc = jax.lax.fori_loop(0, H, body, (x, acc))

        if prob.end_cost is not None:
            xT = jnp.concatenate(
                [xs_out[pl.ds(T, 1), :, a, :][0] for a in range(A)],
                axis=-1)
            acc = acc + jnp.asarray(
                prob.end_cost(xT, T, dt, params), dtype)
        for a in range(A):
            cost_out[a, :] = acc[a * TB:(a + 1) * TB]

    @functools.lru_cache(maxsize=None)
    def build(param_names):
        kern = functools.partial(kernel, param_names)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)

        def bspec(*lead):
            nd = len(lead)
            return pl.BlockSpec(
                lead + (TB,),
                (lambda i, _nd=nd: (0,) * _nd + (i,)),
                memory_space=pltpu.VMEM)

        n_par = len(param_names)
        in_specs = (
            [full] * (4 + n_par)
            + [bspec(nx), bspec(H + 1, nx), bspec(H, nu), bspec(H, nu),
               bspec(H, nu, nx), full, full, bspec(H, nc)])
        out_specs = (bspec(H + 1, nx, A), bspec(H, nu, A), bspec(A))
        return pl.pallas_call(
            kern,
            grid=(B // TB,),
            out_shape=(
                jax.ShapeDtypeStruct((H + 1, nx, A, B), dtype),
                jax.ShapeDtypeStruct((H, nu, A, B), dtype),
                jax.ShapeDtypeStruct((A, B), dtype),
            ),
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )

    def fn(alphas, x0, xs_ref, us_ref, ks, Ks, u_min, u_max, dt, T,
           params, lam, w):
        names = sorted(params.keys())
        plist = []
        for n in names:
            v = jnp.asarray(params[n], dtype)
            plist.append(v[None] if v.ndim == 0 else v)
        call = build(tuple(names))
        return call(
            jnp.asarray(alphas, dtype), jnp.asarray(dt, dtype)[None],
            jnp.asarray(T, jnp.int32)[None], jnp.asarray(w, dtype),
            *plist,
            jnp.asarray(x0, dtype), jnp.asarray(xs_ref, dtype),
            jnp.asarray(us_ref, dtype), jnp.asarray(ks, dtype),
            jnp.asarray(Ks, dtype), jnp.asarray(u_min, dtype),
            jnp.asarray(u_max, dtype), jnp.asarray(lam, dtype))

    return fn
