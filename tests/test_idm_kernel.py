"""IDM sampling kernel: hull-interp matmul form + chunked candidate eval.

The kernel contracts hull time-interpolation with a 2-hot weight vector
(matmul form) and evaluates candidates in 1024-wide chunks beyond 1024
candidates (idm_kernel.py run()); both must be exact re-expressions of
the plain gather/vmap forms.
"""

import numpy as np
import jax.numpy as jnp

from tpl_tpu.planning.idm_sampling import idm_kernel
from tpl_tpu.planning.idm_sampling.idm_kernel import (
    IdmSamplingParams, _interp_by_t, _interp_hulls_by_t)


def test_hull_interp_matmul_matches_gather():
    rng = np.random.default_rng(1)
    ts = jnp.asarray(np.sort(rng.uniform(0, 10, 16)).astype(np.float32))
    hulls = jnp.asarray(rng.normal(size=(16, 16, 2)).astype(np.float32))
    for t in [-1.0, 0.0, 3.7, 9.99, 12.0]:
        a = _interp_by_t(ts, hulls, jnp.float32(t))
        b = _interp_hulls_by_t(ts, hulls, jnp.float32(t))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _scene(n_obj=4, n_pred=8, n_hull=8):
    rng = np.random.default_rng(0)
    NR = 201
    rl = np.zeros((NR, 7), np.float32)
    rl[:, 0] = np.arange(NR) * 0.5 - 50.0
    rl[:, 4] = 12.0
    rl[:, 5] = 4.0
    rl[:, 6] = 4.0

    O, P, K = n_obj, n_pred, n_hull
    objs = dict(
        pred_t=np.tile(np.arange(P, dtype=np.float32), (O, 1)),
        pred_xy=np.zeros((O, P, 2), np.float32),
        pred_heading=np.zeros((O, P), np.float32),
        pred_v=np.zeros((O, P), np.float32),
        pred_dists=np.tile(np.arange(P, dtype=np.float32), (O, 1)),
        hull_preds=np.zeros((O, P, K, 2), np.float32),
        hull_projs=np.full((O, P, 4), -1000.0, np.float32),
        radius_hull=np.ones(O, np.float32),
        valid=np.ones(O, bool),
        on_local_map=np.ones(O, bool))
    box = rng.normal(scale=0.5, size=(K, 2)).astype(np.float32)
    for i in range(O):
        objs["pred_xy"][i, :, 0] = 20.0 + 8 * i + np.arange(P) * 1.5
        objs["pred_xy"][i, :, 1] = (i % 3 - 1) * 2.0
        objs["hull_preds"][i] = objs["pred_xy"][i][:, None, :] + box[None]

    pp = IdmSamplingParams()
    pp.width_veh = 2.0
    pp.length_veh = 5.0
    pp.radius_veh = 2.7
    pp.dist_front_veh = 3.8
    pp.dist_back_veh = -1.1

    init_ref = np.zeros(10, np.float32)
    init_ref[4] = 8.0
    init_con = np.zeros(9, np.float32)
    init_con[5] = 8.0
    return rl, objs, pp, init_ref, init_con


def test_lanes_evaluate_matches_vmap_oracle():
    """The lanes-form evaluate (candidates in the minor axis, shared
    per-time-slice object data, rectangle-analytic SAT) must reproduce
    the per-candidate vmap evaluate exactly — including collision
    verdicts, first-collision times, and the interaction costs."""
    rl, objs, pp, init_ref, init_con = _scene()
    # park one object on the ego path so collisions actually occur
    objs["pred_xy"][0, :, 0] = 8.0
    objs["pred_xy"][0, :, 1] = 0.0
    objs["pred_v"][0] = 0.0
    box = objs["hull_preds"][0][0] - objs["hull_preds"][0][0].mean(0)
    objs["hull_preds"][0] = objs["pred_xy"][0][:, None, :] + box[None]
    spec = dict(steps_t=20, n_ref=rl.shape[0], n_obj=4, n_pred=8,
                n_hull=8)
    kernel = idm_kernel.make_idm_kernel(spec)
    ppd = {k: jnp.asarray(v, jnp.float32)
           for k, v in pp.dynamic_dict().items()}
    objs_dev = {k: jnp.asarray(v, jnp.float32 if v.dtype.kind == "f"
                               else None) for k, v in objs.items()}

    C = 64
    l_trgs = jnp.asarray(np.linspace(-3, 3, C).astype(np.float32))
    # fabricated trajectories that drive straight THROUGH the scene (a
    # real rollout brakes for the parked car and never collides):
    # candidates fan out laterally, so some hit object 0 and some miss
    T_, rng = 20, np.random.default_rng(3)
    cons_np = np.zeros((C, T_, 9), np.float32)
    ts_grid = np.arange(T_, dtype=np.float32) * 0.1
    for c in range(C):
        y = np.float32(-4.0 + 8.0 * c / (C - 1))
        cons_np[c, :, 0] = ts_grid                      # V_T (shared)
        cons_np[c, :, 1] = ts_grid * 8.0                # V_X
        cons_np[c, :, 2] = y                            # V_Y
        cons_np[c, :, 3] = rng.normal(scale=0.1)        # V_H
        cons_np[c, :, 5] = 8.0                          # V_V
        cons_np[c, :, 6] = rng.normal(scale=0.5)        # V_A
        cons_np[c, :, 7] = ts_grid * 8.0 + 50.0 * 0.5   # V_S (on rl)
        cons_np[c, :, 8] = y                            # V_L
    refs_np = np.zeros((C, T_, 10), np.float32)
    refs_np[:, :, 8] = 4.0 - np.abs(cons_np[:, :, 2])   # R_DR
    refs_np[:, :, 9] = 4.0 + cons_np[:, :, 2]           # R_DL
    refs = jnp.asarray(refs_np)
    cons = jnp.asarray(cons_np)

    args = (refs, cons, l_trgs, objs_dev, jnp.asarray(rl, jnp.float32),
            jnp.float32(0.5), ppd, jnp.float32(0.0))
    got = kernel.evaluate(*args)
    want = kernel.evaluate_ref(*args)
    assert bool(np.any(np.asarray(want["invalid"]))) or \
        np.any(np.asarray(want["cost_collision"]) > 0), \
        "scene produced no collisions; the screen paths were not covered"
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]),
            rtol=1e-5, atol=1e-5, err_msg=k)


def test_lanes_rollout_matches_vmap_oracle():
    """The lanes-form rollout (candidate axis minor, shared per-step
    object sampling, table-based stop lookup) must reproduce the
    per-candidate vmap rollout across a scene with live leaders, stop
    cells, and off-road excursions."""
    rl, objs, pp, init_ref, init_con = _scene()
    rl[150:, 4] = 0.0          # a stop cell ahead (zero-v leg)
    spec = dict(steps_t=30, n_ref=rl.shape[0], n_obj=4, n_pred=8,
                n_hull=8)
    kernel = idm_kernel.make_idm_kernel(spec)
    ppd = {k: jnp.asarray(v, jnp.float32)
           for k, v in pp.dynamic_dict().items()}
    objs_dev = {k: jnp.asarray(v, jnp.float32 if v.dtype.kind == "f"
                               else None) for k, v in objs.items()}

    C = 48
    l_trgs = jnp.asarray(np.linspace(-5, 5, C).astype(np.float32))
    d_stops = jnp.asarray(
        np.where(np.arange(C) % 3 == 0, 30.0, 1e6).astype(np.float32))
    args = (jnp.asarray(init_ref), jnp.asarray(init_con), l_trgs,
            d_stops, jnp.float32(0.1), jnp.asarray(rl),
            jnp.float32(0.5), objs_dev, ppd)
    refs_l, cons_l = kernel.rollout(*args)
    refs_r, cons_r = kernel.rollout_ref(*args)
    np.testing.assert_allclose(np.asarray(refs_l), np.asarray(refs_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cons_l), np.asarray(cons_r),
                               rtol=1e-5, atol=1e-5)


def test_chunked_candidates_match_vmap():
    rl, objs, pp, init_ref, init_con = _scene()
    spec = dict(steps_t=20, n_ref=rl.shape[0], n_obj=4, n_pred=8, n_hull=8)
    kernel = idm_kernel.make_idm_kernel(spec)
    ppd = pp.dynamic_dict()
    objs_dev = {k: jnp.asarray(v) for k, v in objs.items()}

    C = 1100   # > 1024 forces the lax.map chunked path (with remainder)
    l_trgs = np.linspace(-3, 3, C).astype(np.float32)
    d_stops = np.full(C, 1e6, np.float32)

    def run(lt, ds):
        refs, cons, costs = kernel(
            jnp.asarray(init_ref), jnp.asarray(init_con),
            jnp.asarray(lt), jnp.asarray(ds), jnp.float32(0.1),
            jnp.asarray(rl), jnp.float32(0.5), objs_dev, ppd,
            jnp.float32(0.0))
        return np.asarray(refs), np.asarray(cons), {
            k: np.asarray(v) for k, v in costs.items()}

    refs_c, cons_c, costs_c = run(l_trgs, d_stops)

    # same candidates through the plain-vmap path, in two halves
    h = C // 2
    refs_a, cons_a, costs_a = run(l_trgs[:h], d_stops[:h])
    refs_b, cons_b, costs_b = run(l_trgs[h:], d_stops[h:])

    np.testing.assert_allclose(refs_c, np.concatenate([refs_a, refs_b]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(cons_c, np.concatenate([cons_a, cons_b]),
                               rtol=1e-6, atol=1e-6)
    for k in costs_c:
        np.testing.assert_allclose(
            costs_c[k], np.concatenate([costs_a[k], costs_b[k]]),
            rtol=1e-6, atol=1e-6, err_msg=k)
