"""
genopt sympy frontend: translated problems must match the native JAX
problem definitions (tpl_tpu/optim/problems.py) and solve identically.
"""

import numpy as np
import sympy as sp
import jax
import jax.numpy as jnp
import pytest

from tpl_tpu.optim import genopt, problems, symext as spx
from tpl_tpu.optim.solver import Solver


def _syms(names):
    return {n: sp.Symbol(n) for n in names.split()}


def mpc_config():
    """The spatial tracking MPC as a user would define it with the sympy
    frontend (the reference's config_trajectory_tracking_mpc shape)."""
    g = _syms("x y phi delta v s_r a j delta_dot "
              "ref_step l v_ch max_delta max_acc min_acc a_offset "
              "pd pv pdelta min_pdelta_dot pdelta_dot min_p_phi_dot p_phi_dot "
              "pa pj p_phi p_phi_ref_dot_diff")
    arrs = {n: spx.ArraySymbol(n) for n in
            ["ref_x", "ref_y", "ref_phi", "ref_k", "ref_v"]}

    s_r = g["s_r"]
    r_x = spx.lerp(0.0, g["ref_step"], s_r, arrs["ref_x"])
    r_y = spx.lerp(0.0, g["ref_step"], s_r, arrs["ref_y"])
    r_phi = spx.lerp_angle(0.0, g["ref_step"], s_r, arrs["ref_phi"])
    r_k = spx.lerp(0.0, g["ref_step"], s_r, arrs["ref_k"])
    v_trg = spx.lerp(0.0, g["ref_step"], spx.fixed(s_r), arrs["ref_v"])

    v, phi, delta = g["v"], g["phi"], g["delta"]
    phi_dot = v / (g["l"] * (1 + (v / g["v_ch"]) ** 2)) * sp.tan(delta)
    d_r = sp.cos(r_phi) * (g["y"] - r_y) - sp.sin(r_phi) * (g["x"] - r_x)
    s_dot = v * sp.cos(phi - r_phi) / (1 - d_r * r_k)

    dynamics = sp.Matrix([
        v * sp.cos(phi), v * sp.sin(phi), phi_dot, g["delta_dot"],
        g["a"] + g["a_offset"], s_dot, g["j"]])

    costs = sp.Matrix([
        (g["min_pdelta_dot"] + g["pdelta_dot"] * v ** 2) * g["delta_dot"] ** 2
        + (g["min_p_phi_dot"] + g["p_phi_dot"] * v ** 2) * phi_dot ** 2
        + g["pa"] * g["a"] ** 2 + g["pj"] * g["j"] ** 2
        + g["pv"] * (v - v_trg) ** 2 + g["pd"] * d_r ** 2
        + g["p_phi"] * (1 - sp.cos(phi - r_phi))
        + g["p_phi_ref_dot_diff"] * (phi_dot - s_dot * r_k) ** 2 * v ** 2])

    constraints = [
        delta - g["max_delta"], -g["max_delta"] - delta,
        g["a"] - g["max_acc"], g["min_acc"] - g["a"]]

    params = {g[n]: None for n in
              ["ref_step", "l", "v_ch", "max_delta", "max_acc", "min_acc",
               "a_offset", "pd", "pv", "pdelta", "min_pdelta_dot",
               "pdelta_dot",
               "min_p_phi_dot", "p_phi_dot", "pa", "pj", "p_phi",
               "p_phi_ref_dot_diff"]}
    params.update({arrs[n]: None for n in arrs})
    params[g["l"]] = 2.7

    return genopt.Config(
        states=[g[n] for n in "x y phi delta v s_r a".split()],
        actions=[g["j"], g["delta_dot"]],
        params=params,
        dynamics=dynamics, costs=costs, constraints=constraints,
        name="mpc_sympy", array_capacity=128)


def _rand_params(spec, rng):
    p = {}
    for name, s in spec.items():
        if hasattr(s, "capacity"):
            p[name] = jnp.asarray(rng.uniform(-1.0, 1.0, s.capacity),
                                  jnp.float64)
        else:
            p[name] = jnp.asarray(rng.uniform(0.1, 2.0), jnp.float64)
    return p


def test_mpc_config_matches_native():
    prob_s, spec_s = genopt.make_problem(mpc_config())
    prob_n, spec_n = problems.trajectory_tracking_mpc(ref_capacity=128)

    assert set(spec_s) == set(spec_n)
    assert (prob_s.nx, prob_s.nu, prob_s.nc) == (prob_n.nx, prob_n.nu,
                                                 prob_n.nc)

    rng = np.random.default_rng(0)
    p = _rand_params(spec_n, rng)
    p["ref_step"] = jnp.asarray(0.5, jnp.float64)

    for _ in range(5):
        x = jnp.asarray(rng.uniform(-2, 2, prob_n.nx), jnp.float64)
        u = jnp.asarray(rng.uniform(-1, 1, prob_n.nu), jnp.float64)
        np.testing.assert_allclose(
            prob_s.dynamics(x, u, 3, 0.05, p),
            prob_n.dynamics(x, u, 3, 0.05, p), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(
            prob_s.cost(x, u, 3, 0.05, p),
            prob_n.cost(x, u, 3, 0.05, p), rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(
            prob_s.constraints(x, u, 3, 0.05, p),
            prob_n.constraints(x, u, 3, 0.05, p), rtol=1e-12, atol=1e-12)

    # autodiff through both must agree too (incl. the stop_gradient of
    # fixed(s_r) inside the velocity target lookup)
    gs = jax.grad(lambda x: prob_s.cost(x, u, 3, 0.05, p))(x)
    gn = jax.grad(lambda x: prob_n.cost(x, u, 3, 0.05, p))(x)
    np.testing.assert_allclose(gs, gn, rtol=1e-10, atol=1e-12)


def test_full_solve_matches_native():
    builder = genopt.build(mpc_config(), device="cpu")
    opt_s = builder()

    prob_n, spec_n = problems.trajectory_tracking_mpc(ref_capacity=128)
    opt_n = Solver(prob_n, spec_n, horizon_max=300, device="cpu")

    n = 100
    s = np.arange(n) * 0.5
    refs = dict(ref_x=s, ref_y=0.02 * s ** 2, ref_phi=np.arctan(0.04 * s),
                ref_k=np.full(n, 0.01), ref_v=np.full(n, 8.0))
    weights = dict(pd=1.0, pv=0.3, pa=0.1, pj=0.05, min_pdelta_dot=0.2,
                   pdelta_dot=0.01, min_p_phi_dot=0.1, p_phi_dot=0.01,
                   p_phi=2.0, p_phi_ref_dot_diff=0.1, ref_step=0.5,
                   l=2.7, v_ch=30.0, max_delta=0.7, max_acc=2.5,
                   min_acc=-3.0, a_offset=0.0)

    for opt in (opt_s, opt_n):
        for k, v in {**refs, **weights}.items():
            setattr(opt.params, k, v)
        opt.horizon = 60
        opt.step = 0.05
        opt.max_iterations = 8
        opt.x[0] = [0.0, 0.5, 0.1, 0.0, 5.0, 0.0, 0.0]
        opt.update()

    assert opt_s.params.l == 2.7  # dict default applied by the builder
    # f32 solvers: expression-order differences (lerp_multi vs individual
    # lerps) put the two programs a few ulps apart per step
    np.testing.assert_allclose(opt_s.x, opt_n.x, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(opt_s.u, opt_n.u, rtol=1e-4, atol=1e-5)
    # solver actually moved (not a trivial zero solution)
    assert float(np.abs(opt_n.u).max()) > 1e-3


def test_lerp_wrap_oracle():
    rng = np.random.default_rng(1)
    arr = rng.uniform(-1, 1, 9)
    xs = 2.0 + np.arange(9) * 0.5   # table over [2.0, 6.0]
    length = 5.5                     # gap of 1.5 after the last sample

    def oracle(x):
        first, dx, n = xs[0], 0.5, len(arr)
        last = first + (n - 1) * dx
        gap = length - (last - first)
        xm = np.mod(x - first, length) + first
        if xm >= last and gap > 0:
            a = (xm - last) / gap
            return (1 - a) * arr[-1] + a * arr[0]
        q = (xm - first) / dx
        lo = int(np.floor(q))
        return (1 - (q - lo)) * arr[lo] + (q - lo) * arr[min(lo + 1, n - 1)]

    for x in [2.0, 2.3, 5.9, 6.2, 7.49, 7.5001, 13.2, -1.7, 0.0]:
        got = genopt._lerp_wrap(length, 0.5, jnp.asarray(x, jnp.float64),
                                jnp.asarray(xs), jnp.asarray(arr))
        np.testing.assert_allclose(float(got), oracle(x), rtol=1e-9,
                                   atol=1e-12, err_msg=f"x={x}")


def test_fixed_blocks_gradients():
    x = sp.Symbol("x")
    cfg = genopt.Config(states=[x], actions=[sp.Symbol("u0")], params=[],
                        dynamics=[sp.Symbol("u0")],
                        costs=[x * spx.fixed(x)], name="frozen")
    prob, _ = genopt.make_problem(cfg)
    g = jax.grad(lambda xv: prob.cost(jnp.stack([xv]),
                                      jnp.zeros(1), 0, 0.1, {}))(2.0)
    # d/dx [x * stop_grad(x)] = stop_grad(x) = 2, not 2x = 4
    np.testing.assert_allclose(g, 2.0)


def test_unknown_symbol_rejected():
    x, u = sp.Symbol("x"), sp.Symbol("u0")
    cfg = genopt.Config(states=[x], actions=[u], params=[],
                        dynamics=[u], costs=[x * sp.Symbol("mystery")])
    with pytest.raises(ValueError, match="mystery"):
        genopt.make_problem(cfg)


def test_optimizers_module_surface():
    from tpl_tpu.optim import optimizers as opts
    opts.build_optimizers()
    for name in ["trajectory_tracking_mpc", "trajectory_tracking_mpc_time",
                 "lateral_profile", "velocity_profile_space",
                 "velocity_profile_time", "ref_line_smoother_k",
                 "ref_line_smoother_dk"]:
        assert name in vars(opts)
    opt = opts.ref_line_smoother_k()
    assert opt.horizon > 0 and hasattr(opt.params, "_spec")
