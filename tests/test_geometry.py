"""Geometry kernel vs independent oracles (scipy / brute force).

Mirrors the reference's oracle strategy (library/test/test_convex_hull.py).
"""

import numpy as np
from scipy.spatial import ConvexHull

from tpl_tpu.ops import (
    project, resample, resample_path, convex_hull, point_in_polygon,
    intersect_polygons, build_route,
)


RNG = np.random.default_rng(12345)


def _wavy_path(n=200, step=0.5):
    s = np.arange(n) * step
    x = s
    y = 2.0 * np.sin(s * 0.05)
    return np.column_stack([x, y])


def brute_force_project(points, pos):
    """O(N * K) oracle: densely sample every segment."""
    best_d = np.inf
    best = None
    arc = 0.0
    for i in range(len(points) - 1):
        p0, p1 = points[i], points[i + 1]
        l = np.linalg.norm(p1 - p0)
        for q in np.linspace(0, 1, 200):
            p = p0 + q * (p1 - p0)
            d = np.linalg.norm(pos - p)
            if d < best_d:
                best_d = d
                best = (arc + q * l, p)
        arc += l
    return best


def test_project_matches_brute_force():
    path = _wavy_path()
    for _ in range(20):
        pos = np.array([RNG.uniform(5, 90), RNG.uniform(-5, 5)])
        proj = project(path, pos)
        arc_gt, point_gt = brute_force_project(path, pos)
        assert abs(proj.arc_len - arc_gt) < 0.01
        assert np.linalg.norm(proj.point - point_gt) < 0.01
        assert abs(abs(proj.distance) - np.linalg.norm(pos - proj.point)) < 1e-9


def test_project_distance_sign():
    # straight path along +x: left of the path (positive y) => positive dist
    path = np.column_stack([np.arange(10.0), np.zeros(10)])
    assert project(path, (4.2, 1.0)).distance > 0
    assert project(path, (4.2, -1.0)).distance < 0


def test_project_in_bounds():
    path = np.column_stack([np.arange(10.0), np.zeros(10)])
    assert project(path, (5.0, 1.0)).in_bounds
    assert not project(path, (-2.0, 0.0)).in_bounds
    assert not project(path, (12.0, 0.0)).in_bounds


def test_project_closed():
    # square, closed
    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    path = np.column_stack([np.cos(t), np.sin(t)])
    proj = project(path, (2.0, 0.0), closed=True)
    assert np.linalg.norm(proj.point - np.array([1.0, 0.0])) < 0.01
    assert proj.distance < 0  # outside a CCW circle = right of path


def test_project_many_list():
    path = _wavy_path()
    pts = RNG.uniform(0, 50, size=(7, 2))
    projs = project(path, pts)
    assert len(projs) == 7
    for p, pos in zip(projs, pts):
        single = project(path, pos)
        assert np.isclose(p.arc_len, single.arc_len)
        assert np.isclose(p.distance, single.distance)


def test_resample_equidistant():
    path = _wavy_path()
    rs = resample(path, 0.7, 50)
    d = np.linalg.norm(np.diff(rs[:, :2], axis=0), axis=1)
    np.testing.assert_allclose(d, 0.7, atol=1e-6)


def test_resample_path_channels():
    path6 = build_route(_wavy_path())
    rs = resample_path(path6, 0.5, 120)
    assert rs.shape == (120, 6)
    # orientation should match the local tangent
    d = np.diff(rs[:, :2], axis=0)
    ang = np.arctan2(d[:, 1], d[:, 0])
    err = np.abs(np.angle(np.exp(1j * (ang - rs[:-1, 2]))))
    assert np.max(err) < 0.05
    # s channel equidistant
    np.testing.assert_allclose(np.diff(rs[:, 3]), 0.5, atol=1e-9)


def test_convex_hull_vs_scipy():
    pts = RNG.normal(size=(50, 2))
    hull = convex_hull(pts)
    gt = ConvexHull(pts)
    gt_pts = pts[gt.vertices]
    # same vertex set (order may differ by starting point)
    assert hull.shape[0] == gt_pts.shape[0]
    hs = set(map(tuple, np.round(hull, 9)))
    gs = set(map(tuple, np.round(gt_pts, 9)))
    assert hs == gs


def test_point_in_polygon():
    square = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    assert point_in_polygon((1, 1), square)
    assert not point_in_polygon((3, 1), square)
    assert not point_in_polygon((-1, -1), square)


def test_intersect_polygons():
    a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    b = a + np.array([1.0, 1.0])
    c = a + np.array([5.0, 0.0])
    assert intersect_polygons(a, b)
    assert not intersect_polygons(a, c)
    # containment
    d = np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]])
    assert intersect_polygons(a, d)


def test_intersect_polygons_batch_matches_scalar():
    """Batched SAT must agree pair-for-pair with the scalar oracle over
    random rotated rectangles vs a random convex polygon."""
    from tpl_tpu.ops import intersect_polygons_batch, convex_hull

    rng = np.random.default_rng(3)
    poly = convex_hull(rng.normal(0, 2.0, (12, 2)))
    box = np.array([[-2, -1], [2, -1], [2, 1], [-2, 1]], dtype=float)

    yaws = rng.uniform(-np.pi, np.pi, 200)
    pos = rng.uniform(-6, 6, (200, 2))
    cs, sn = np.cos(yaws), np.sin(yaws)
    rot = np.stack([np.stack([cs, -sn], -1), np.stack([sn, cs], -1)], -2)
    hulls = np.einsum("ka,mba->mkb", box, rot) + pos[:, None, :]

    got = intersect_polygons_batch(hulls, poly)
    want = np.array([intersect_polygons(h, poly) for h in hulls])
    assert got.dtype == bool and got.shape == (200,)
    np.testing.assert_array_equal(got, want)
    assert 0 < want.sum() < 200  # both classes exercised

    assert intersect_polygons_batch(np.zeros((0, 4, 2)), poly).shape == (0,)


def test_native_project_matches_numpy_core():
    """The C kernel must agree with the numpy oracle field-for-field."""
    from tpl_tpu import native
    from tpl_tpu.ops import geometry as geom

    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(7)
    for closed in (False, True):
        for trial in range(10):
            n = rng.integers(3, 60)
            pts = np.cumsum(rng.normal(0, 1.0, (n, 2)), axis=0)
            pos = rng.normal(0, 5.0, (17, 2)) + pts.mean(axis=0)
            res = native.project(pts, pos, closed)
            assert res is not None

            # numpy oracle path (bypass the native fast path)
            import unittest.mock as mock
            with mock.patch.object(native, "project",
                                   lambda *a, **k: None):
                ref = geom._project_core(pts, pos, closed)

            np.testing.assert_array_equal(
                res[:, 0].astype(np.int64), ref["start"])
            np.testing.assert_array_equal(
                res[:, 1].astype(np.int64), ref["end"])
            np.testing.assert_allclose(res[:, 2], ref["alpha"], atol=1e-12)
            np.testing.assert_array_equal(
                res[:, 3].astype(np.int64), ref["index"])
            np.testing.assert_allclose(res[:, 4:6], ref["point"], atol=1e-9)
            np.testing.assert_allclose(
                res[:, 6], ref["distance"], atol=1e-9)
            np.testing.assert_allclose(
                res[:, 7], ref["arc_len"], atol=1e-9)
            np.testing.assert_allclose(res[:, 8], ref["angle"], atol=1e-9)
            np.testing.assert_allclose(
                res[:, 9:11], ref["tangent"], atol=1e-9)
            np.testing.assert_array_equal(
                res[:, 11] != 0.0, ref["in_bounds"])


def test_project_degenerate_polyline():
    """Paths with < 2 points have no segments: the reference returns a
    default projection with distance = INFINITY (utils.cpp:257-263).
    Hit in practice by IDM leader lookups on a path_segment window
    clipped at an open path's end (core.py update_cars)."""
    from tpl_tpu import util

    p = util.project(np.zeros((0, 2)), (1.0, 2.0))
    assert p.distance == np.inf and not p.in_bounds

    p = util.project(np.array([[3.0, 4.0]]), (1.0, 2.0))
    assert p.distance == np.inf and not p.in_bounds
    assert np.allclose(p.point, [3.0, 4.0])

    # batched form
    ps = util.project(np.zeros((1, 2)), [(0.0, 0.0), (1.0, 1.0)])
    assert all(not q.in_bounds for q in ps)
