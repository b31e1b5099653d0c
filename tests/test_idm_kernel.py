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
