"""iLQR core vs an independent finite-horizon LQR oracle + behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpl_tpu.optim import ilqr
from tpl_tpu.optim.ilqr import Problem, init_state, make_update_fn
from tpl_tpu.optim.solver import Solver
from tpl_tpu.optim import problems


DT = 0.1
H = 40


def lqr_oracle(A, B, Q, R, x0, T):
    """Finite-horizon discrete LQR via plain Riccati recursion (numpy)."""
    P = Q.copy()
    Ks = []
    for _ in range(T):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
        Ks.append(K)
    Ks = Ks[::-1]
    xs = [x0]
    us = []
    for t in range(T):
        u = -Ks[t] @ xs[-1]
        us.append(u)
        xs.append(A @ xs[-1] + B @ u)
    return np.array(xs), np.array(us)


def _double_integrator_problem():
    # continuous dynamics dx = [v, u]; cost x'Qx + u'Ru per step
    def dynamics(x, u, t, dt, p):
        return jnp.stack([x[1], u[0]])

    def cost(x, u, t, dt, p):
        return 1.0 * x[0] ** 2 + 0.1 * x[1] ** 2 + 0.01 * u[0] ** 2

    return Problem("di", nx=2, nu=1, nc=0, dynamics=dynamics, cost=cost)


def _cfg(T=H, max_iter=50, u_lim=1e30):
    return dict(
        u_min=jnp.full((H, 1), -u_lim),
        u_max=jnp.full((H, 1), u_lim),
        barrier_weight=jnp.ones(1),
        lg_mult_limit=jnp.full(1, 1e30),
        dt=jnp.asarray(DT),
        T=jnp.asarray(T, jnp.int32),
        max_iterations=jnp.asarray(max_iter, jnp.int32),
        max_lg_iterations=jnp.asarray(1, jnp.int32),
        min_rel_cost_change=jnp.asarray(1e-12),
    )


def test_matches_lqr_oracle():
    prob = _double_integrator_problem()
    update = make_update_fn(prob, H, dtype=jnp.float64)

    state = init_state(prob, H, jnp.float64)
    x0 = jnp.array([2.0, -1.0])
    state, info = update(state, x0, {}, _cfg())

    # oracle on the euler-discretized system
    A = np.array([[1.0, DT], [0.0, 1.0]])
    B = np.array([[0.0], [DT]])
    Q = np.diag([1.0, 0.1])
    R = np.array([[0.01]])
    xs_gt, us_gt = lqr_oracle(A, B, Q, R, np.array([2.0, -1.0]), H)

    # Note: iLQR minimizes sum_{t<T} l(x_t, u_t) (no terminal cost), the
    # oracle ends with terminal weight Q at x_T. For H=40 both converge to
    # the same stabilizing behavior; compare trajectories loosely and the
    # early controls tightly.
    np.testing.assert_allclose(np.asarray(state.u)[:20, 0], us_gt[:20, 0],
                               rtol=0.05, atol=0.05)
    assert abs(np.asarray(state.x)[-1, 0]) < 0.05


def test_control_limits_respected():
    prob = _double_integrator_problem()
    update = make_update_fn(prob, H, dtype=jnp.float64)
    state = init_state(prob, H, jnp.float64)
    state, _ = update(state, jnp.array([5.0, 0.0]), {}, _cfg(u_lim=0.5))
    assert np.max(np.abs(np.asarray(state.u))) <= 0.5 + 1e-9


def test_active_horizon_masking():
    prob = _double_integrator_problem()
    update = make_update_fn(prob, H, dtype=jnp.float64)
    state = init_state(prob, H, jnp.float64)
    T = 25
    state, _ = update(state, jnp.array([1.0, 0.0]), {}, _cfg(T=T))
    u = np.asarray(state.u)
    # steps beyond T untouched (still zero)
    np.testing.assert_array_equal(u[T:], 0.0)
    assert np.any(u[:T] != 0.0)


def test_constraint_satisfaction_lateral_profile():
    prob, spec = problems.lateral_profile(ref_capacity=128)
    s = Solver(prob, spec, horizon_max=100, dtype=jnp.float64)
    s.horizon = 100
    s.step = 0.5
    s.max_iterations = 30
    s.max_lg_iterations = 3
    s.barrier_weight[:] = 1000.0
    s.lg_mult_limit = 0.0
    s.u_min[:] = -2.5
    s.u_max[:] = 2.5
    s.params.ref_step = 0.5
    s.params.k_ref = np.zeros(100)
    s.params.d_offset = np.zeros(100)
    # corridor forces an excursion to d >= 1 between s in [20, 30]
    lower = np.full(100, -2.0)
    lower[40:60] = 1.0
    upper = np.full(100, 2.0)
    s.params.d_lower_constr = lower
    s.params.d_upper_constr = upper
    s.x[0] = [0.0, 0.0]
    s.update()

    d = s.x[:-1, 0]
    assert np.all(d[45:55] > 0.5), d[40:60]
    assert np.all(d < 2.1)
    assert np.all(d > -2.1)


def test_velocity_profile_solver():
    prob, spec = problems.velocity_profile_space(ref_capacity=128)
    s = Solver(prob, spec, horizon_max=100, dtype=jnp.float64)
    s.horizon = 100
    s.step = 0.5
    s.max_iterations = 20
    s.max_lg_iterations = 1
    s.barrier_weight[:] = 1000.0
    s.lg_mult_limit = 0.1
    s.u_min[:] = -2.5
    s.u_max[:] = 2.5
    s.params.ref_step = 0.5
    v_ref = np.full(100, 10.0)
    v_ref[60:] = 3.0
    s.params.ref_v = v_ref
    s.params.ref_k = np.zeros(100)
    s.params.ref_t_max = np.full(100, 1e10)
    s.params.ref_t_min = np.zeros(100)
    s.params.ref_t_offset = np.ones(100)
    s.params.ref_v_weight = np.ones(100)
    s.x[0] = [5.0, 0.0]
    for _ in range(3):   # a few receding-horizon ticks, warm started
        s.update()
    v = s.x[:-1, 0]
    # rides below the reference and respects the slowdown
    assert np.all(v <= np.maximum(v_ref, 1.0) + 0.5)
    assert v[50] > 4.0
    # time channel is monotone
    t = s.x[:-1, 1]
    assert np.all(np.diff(t) > 0)


def test_ref_line_smoother():
    prob, spec = problems.ref_line_smoother_k(ref_capacity=256)
    s = Solver(prob, spec, horizon_max=200, dtype=jnp.float64)
    s.horizon = 200
    s.step = 0.5
    s.max_iterations = 30
    s.params.ref_step = 0.5
    ss = np.arange(200) * 0.5
    ref_x = ss
    ref_y = 1.0 * np.sin(ss * 0.1) + 0.05 * np.sin(ss * 4.0)  # noisy
    s.params.ref_x = ref_x
    s.params.ref_y = ref_y
    s.params.w_pos = 1.0
    s.params.w_k = 1.0
    s.u_min[:] = -1.0
    s.u_max[:] = 1.0
    s.x[0] = [0.0, 0.0, 0.1]
    s.u = 0.0 * np.ones((200, 1))
    s.update()
    # path follows reference within a lane width and smooths the noise
    err = np.hypot(s.x[:-1, 0] - ref_x, s.x[:-1, 1] - ref_y)
    assert np.mean(err) < 0.5
    # curvature stays small
    assert np.max(np.abs(s.u)) <= 1.0 + 1e-9


def test_batched_vmap_matches_sequential():
    prob = _double_integrator_problem()
    update = make_update_fn(prob, H, dtype=jnp.float64, jit=False)
    batched = jax.jit(jax.vmap(update, in_axes=(0, 0, None, None)))

    x0s = jnp.array([[1.0, 0.0], [2.0, -1.0], [-3.0, 0.5], [0.5, 2.0]])
    states = jax.vmap(lambda _: init_state(prob, H, jnp.float64))(
        jnp.arange(4))
    bstates, _ = batched(states, x0s, {}, _cfg())

    for i in range(4):
        s0 = init_state(prob, H, jnp.float64)
        s1, _ = update(s0, x0s[i], {}, _cfg())
        np.testing.assert_allclose(np.asarray(bstates.u)[i],
                                   np.asarray(s1.u), rtol=1e-6, atol=1e-8)


def test_batched_lanes_general_nu_matches_vmap():
    """nu=3 exercises the general linalg.solve path of the lanes engine."""
    from tpl_tpu.optim import batched

    def dynamics(x, u, t, dt, p):
        return jnp.stack([u[0] + 0.3 * x[2], u[1] - 0.1 * x[0], u[2]])

    def cost(x, u, t, dt, p):
        return (x[0] ** 2 + 0.5 * x[1] ** 2 + 0.2 * x[2] ** 2
                + 0.01 * (u[0] ** 2 + u[1] ** 2 + u[2] ** 2)
                + 0.004 * u[0] * u[1] + 0.002 * u[1] * u[2])

    prob = Problem("tri", nx=3, nu=3, nc=0, dynamics=dynamics, cost=cost)
    B = 4
    cfg = dict(
        u_min=jnp.full((H, 3), -1.0),
        u_max=jnp.full((H, 3), 1.0),
        barrier_weight=jnp.ones(1),
        lg_mult_limit=jnp.full(1, 1e30),
        dt=jnp.asarray(DT),
        T=jnp.asarray(H, jnp.int32),
        max_iterations=jnp.asarray(15, jnp.int32),
        max_lg_iterations=jnp.asarray(1, jnp.int32),
        min_rel_cost_change=jnp.asarray(1e-12),
    )

    upd = make_update_fn(prob, H, dtype=jnp.float64, jit=False)
    vupd = jax.jit(jax.vmap(upd, in_axes=(0, 0, None, None)))
    x0s = jnp.array([[1.0, 0.0, -0.5], [2.0, -1.0, 0.2],
                     [-3.0, 0.5, 1.0], [0.5, 2.0, -1.5]], jnp.float64)
    states = jax.vmap(lambda _: init_state(prob, H, jnp.float64))(
        jnp.arange(B))
    vs, _ = vupd(states, x0s, {}, cfg)

    bupd = batched.make_batched_update_fn(prob, H, B, dtype=jnp.float64)
    x = jnp.zeros((H + 1, 3, B), jnp.float64)
    u = jnp.zeros((H, 3, B), jnp.float64)
    lam = jnp.zeros((H, 1, B), jnp.float64)
    mu = jnp.zeros((B,), jnp.int32)
    bx, bu, *_ = bupd(x, u, lam, mu, x0s.T, {}, cfg)

    np.testing.assert_allclose(np.moveaxis(np.asarray(bu), -1, 0),
                               np.asarray(vs.u), rtol=1e-6, atol=1e-8)
    # control limits respected on the general path too
    assert float(jnp.max(jnp.abs(bu))) <= 1.0 + 1e-9


def test_solver_shift():
    prob, spec = problems.ref_line_smoother_k()
    s = Solver(prob, spec, horizon_max=10)
    s.horizon = 10
    s.x = np.arange(11 * 3).reshape(11, 3).astype(float)
    s.u = np.arange(10).reshape(10, 1).astype(float)
    s.shift(3)
    assert s.x[0, 0] == 9.0       # x[3]
    assert s.x[8, 0] == 30.0      # x[10] (clamped at T)
    assert s.u[0, 0] == 3.0
    assert s.u[9, 0] == 9.0       # clamped at T-1
