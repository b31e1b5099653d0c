"""
JAX twins of the host geometry kernel for use inside jitted programs.

Semantics follow :mod:`tpl_tpu.ops.geometry` (and thereby the reference's
library/src/utils.cpp:257 ``project``): signed distance positive left of the
path, arc length at the foot point, in_bounds False when clamping at an open
polyline's outermost vertices.
"""

import jax
import jax.numpy as jnp


def project_polyline(points, pos):
    """Project position(s) onto an open polyline.

    points: (N, 2); pos: (..., 2).
    Returns dict with arc_len, distance, in_bounds, angle, point (leading
    dims match pos).
    """
    seg_a = points[:-1]                       # (S, 2)
    seg_b = points[1:]
    v = seg_b - seg_a                         # (S, 2)
    vv = jnp.maximum(jnp.sum(v * v, axis=-1), 1e-12)
    seg_len = jnp.sqrt(vv)
    arc0 = jnp.concatenate([jnp.zeros(1, seg_len.dtype),
                            jnp.cumsum(seg_len)])[:-1]

    pv = pos[..., None, :] - seg_a            # (..., S, 2)
    q = jnp.sum(pv * v, axis=-1) / vv         # (..., S)
    qc = jnp.clip(q, 0.0, 1.0)
    foot = seg_a + v * qc[..., None]          # (..., S, 2)
    d2 = jnp.sum((pos[..., None, :] - foot) ** 2, axis=-1)

    best = jnp.argmin(d2, axis=-1)            # (...,)
    take = lambda arr: jnp.take_along_axis(
        arr, best[..., None], axis=-1)[..., 0]

    alpha = take(qc)
    dist = jnp.sqrt(take(d2))
    point = jnp.take_along_axis(
        foot, best[..., None, None], axis=-2)[..., 0, :]

    n_seg = seg_a.shape[0]
    in_bounds = ~(((best == 0) & (take(q) < 0.0))
                  | ((best == n_seg - 1) & (take(q) > 1.0)))

    arc_len = arc0[best] + jnp.linalg.norm(point - seg_a[best], axis=-1)

    seg_dir = v[best] / seg_len[best][..., None]
    angle = jnp.arctan2(seg_dir[..., 1], seg_dir[..., 0])

    # sign: positive when pos is left of the path
    ortho = point - pos
    on = jnp.linalg.norm(ortho, axis=-1, keepdims=True)
    ortho = ortho / jnp.maximum(on, 1e-12)
    ortho_rot = jnp.stack([-ortho[..., 1], ortho[..., 0]], axis=-1)
    sign_neg = jnp.sum(seg_dir * ortho_rot, axis=-1) <= 0.0
    dist = jnp.where(sign_neg, -dist, dist)
    dist = jnp.where(on[..., 0] < 1e-9, 0.0, dist)

    return dict(arc_len=arc_len, distance=dist, in_bounds=in_bounds,
                angle=angle, point=point, alpha=alpha, index=best)


def polygons_intersect(poly_a, poly_b, valid_b=None):
    """SAT convex intersection test, batched over leading dims.

    poly_a: (..., Ka, 2); poly_b: (..., Kb, 2). Degenerate repeated
    vertices are handled (zero-length edge axes skipped).
    """
    def separated(p, q):
        e = jnp.roll(p, -1, axis=-2) - p
        elen = jnp.linalg.norm(e, axis=-1)
        n = jnp.stack([-e[..., 1], e[..., 0]], axis=-1)
        pa = jnp.einsum("...kd,...ad->...ka", n, p)
        pb = jnp.einsum("...kd,...ad->...ka", n, q)
        gap = ((jnp.max(pa, axis=-1) < jnp.min(pb, axis=-1))
               | (jnp.max(pb, axis=-1) < jnp.min(pa, axis=-1)))
        gap = gap & (elen > 1e-9)
        return jnp.any(gap, axis=-1)

    return ~(separated(poly_a, poly_b) | separated(poly_b, poly_a))
