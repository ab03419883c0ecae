"""geom2d kernels: point2line vs projection ground truth, hull +
rotating calipers vs brute-force angle sweep."""

from __future__ import annotations

import math

import numpy as np
import pytest

from my_ocr_spark.kernel.geom2d import (
    convex_hull,
    min_area_rect_size,
    point2line_dist,
)


def _reference_truth(px, py, x1, y1, x2, y2):
    """Scalar re-derivation of the REFERENCE semantics
    (base_textdet_targets.py:18-52): perpendicular distance 2*area/c
    while the angle at the query point is >= 90deg (inside the Thales
    circle over the segment), nearer-ENDPOINT distance outside it.
    Deliberately not the clamped-projection segment distance: DB's
    border map overestimates far from the segment, and the kernel is
    byte-faithful to that."""
    a2 = (px - x1) ** 2 + (py - y1) ** 2
    b2 = (px - x2) ** 2 + (py - y2) ** 2
    c2 = (x1 - x2) ** 2 + (y1 - y2) ** 2
    if c2 < a2 + b2:  # acute angle at the query point -> endpoint branch
        return math.sqrt(min(a2, b2))
    area2 = abs((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1))
    return area2 / math.sqrt(c2)


class TestPoint2Line:
    def test_matches_reference_semantics(self):
        rng = np.random.RandomState(7)
        for _ in range(300):
            x1, y1, x2, y2 = rng.uniform(-50, 50, 4)
            if math.hypot(x2 - x1, y2 - y1) < 1e-6:
                continue
            px, py = rng.uniform(-80, 80, 2)
            got = float(point2line_dist(px, py, x1, y1, x2, y2))
            want = _reference_truth(px, py, x1, y1, x2, y2)
            assert got == pytest.approx(want, abs=1e-5), (
                (px, py, x1, y1, x2, y2))

    def test_perpendicular_inside_thales_circle(self):
        # (2, 1) over segment (0,0)-(4,0): a2+b2 = 10 < c2 = 16
        assert float(point2line_dist(2.0, 1.0, 0.0, 0.0, 4.0, 0.0)) \
            == pytest.approx(1.0, abs=1e-6)

    def test_endpoint_branch_outside_circle(self):
        # (1, 2): a2+b2 = 5+13 > 16 -> min endpoint distance sqrt(5),
        # NOT the perpendicular 2.0 (reference behavior)
        assert float(point2line_dist(1.0, 2.0, 0.0, 0.0, 4.0, 0.0)) \
            == pytest.approx(math.sqrt(5.0), abs=1e-6)

    def test_vectorized_grid_shape(self):
        xs, ys = np.meshgrid(np.arange(5.0), np.arange(4.0))
        d = point2line_dist(xs, ys, 0.0, 0.0, 4.0, 0.0)
        assert d.shape == (4, 5)
        want = np.vectorize(
            lambda px, py: _reference_truth(px, py, 0.0, 0.0, 4.0, 0.0))(
            xs, ys)
        # points exactly ON the segment pick up ~2e-4 from the formula's
        # own eps guard (the reference has the identical fuzz)
        assert np.allclose(d, want, atol=1e-3)

    def test_point_on_endpoint_is_zero(self):
        assert float(point2line_dist(3.0, 4.0, 3.0, 4.0, 10.0, 4.0)) \
            == pytest.approx(0.0, abs=1e-6)


class TestConvexHull:
    def test_square_with_interior_points(self):
        pts = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (1, 3)]
        hull = convex_hull(np.array(pts, dtype=float))
        assert sorted(map(tuple, hull)) == [(0, 0), (0, 4), (4, 0), (4, 4)]

    def test_collinear(self):
        hull = convex_hull(np.array([(0, 0), (1, 1), (2, 2), (3, 3)],
                                    dtype=float))
        assert len(hull) == 2


def _brute_rect_size(points, steps=20000):
    pts = np.asarray(points, dtype=float).reshape(-1, 2)
    best = None
    for ang in np.linspace(0, math.pi / 2, steps, endpoint=False):
        c, s = math.cos(ang), math.sin(ang)
        proj = pts @ np.array([c, s])
        perp = pts @ np.array([-s, c])
        w, h = proj.max() - proj.min(), perp.max() - perp.min()
        if best is None or w * h < best[0]:
            best = (w * h, min(w, h), max(w, h))
    return best[1], best[2]


class TestMinAreaRect:
    def test_axis_aligned_rect(self):
        assert min_area_rect_size([(0, 0), (10, 0), (10, 3), (0, 3)]) \
            == pytest.approx((3.0, 10.0))

    def test_rotated_rect_recovers_sides(self):
        a, b, c, s = 12.0, 7.0, 0.6, 0.8
        quad = [(0, 0), (a * c, a * s), (a * c - b * s, a * s + b * c),
                (-b * s, b * c)]
        short, long_ = min_area_rect_size(quad)
        assert (short, long_) == pytest.approx((7.0, 12.0), abs=1e-9)

    def test_matches_brute_force_on_random_clouds(self):
        rng = np.random.RandomState(3)
        for _ in range(10):
            pts = rng.uniform(-30, 30, size=(12, 2))
            short, long_ = min_area_rect_size(pts)
            bs, bl = _brute_rect_size(pts)
            # the optimal rect is edge-aligned; the sweep samples angles,
            # so it can only (slightly) overshoot the true minimum area
            assert short * long_ <= bs * bl + 1e-6
            assert short == pytest.approx(bs, rel=2e-3)
            assert long_ == pytest.approx(bl, rel=2e-3)

    def test_degenerate(self):
        assert min_area_rect_size([(5, 5)]) == (0.0, 0.0)
        s, l = min_area_rect_size([(0, 0), (3, 4)])
        assert (s, l) == pytest.approx((0.0, 5.0))


def test_min_area_rect_batch_matches_scalar():
    """min_area_rect_sizes_convex must equal the scalar hull+calipers
    path on the rotated-rect fixture family and on random convex
    quads."""
    import numpy as np

    from my_ocr_spark.kernel.geom2d import (
        min_area_rect_size, min_area_rect_sizes_convex,
    )

    rots = np.array([(1.0, 0.0), (0.6, 0.8), (0.28, 0.96), (0.8, 0.6)])
    quads = []
    for k in range(300):
        a, b = 20 + k % 30, 5 + k % 17
        c, s = rots[k % 4]
        tx, ty = k % 50, k % 70
        quads.append([(tx, ty), (tx + a * c, ty + a * s),
                      (tx + a * c - b * s, ty + a * s + b * c),
                      (tx - b * s, ty + b * c)])
    rng = np.random.default_rng(1)
    for _ in range(200):
        # random convex quad: points on an ellipse at sorted angles
        # (varying per-vertex radii can create reflex vertices, where
        # the scalar path's hull would legitimately find an edge
        # direction the 4 polygon edges don't contain)
        while True:
            ang = np.sort(rng.uniform(0, 2 * np.pi, 4))
            gaps = np.diff(np.append(ang, ang[0] + 2 * np.pi))
            # well-separated angles: near-collinear vertices make the
            # scalar path's hull merge two edges into one direction
            # the polygon's own edge set doesn't contain
            if gaps.min() > 0.5:
                break
        ax, bx = rng.uniform(3, 20, 2)
        quads.append(np.stack([ax * np.cos(ang), bx * np.sin(ang)], 1)
                     + rng.uniform(-5, 5, 2))
    quads = np.asarray(quads, dtype=np.float64)
    short, long_ = min_area_rect_sizes_convex(quads)
    for i, q in enumerate(quads):
        s_ref, l_ref = min_area_rect_size(q)
        if abs(short[i] * long_[i] - s_ref * l_ref) < 1e-9 \
                and abs(short[i] - s_ref) > 1e-9:
            # two directions tie in AREA with different aspect ratios
            # (happens for some inscribed quads): the scalar pick
            # depends on hull vertex order, the batch pick on polygon
            # edge order — both are valid minimum rectangles. The
            # fixture family (first 300) is tie-free and must match
            # exactly.
            assert i >= 300, (i, short[i], s_ref)
            continue
        assert abs(short[i] - s_ref) < 1e-9, (i, short[i], s_ref)
        assert abs(long_[i] - l_ref) < 1e-9, (i, long_[i], l_ref)
