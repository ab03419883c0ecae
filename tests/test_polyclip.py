"""Polygon clip/IoU/offset kernels: exact tiny goldens (mmocr test style,
cf. tests/test_utils/test_wrapper.py in the reference) + randomized
cross-checks against an independent Monte-Carlo estimate."""

import math

import numpy as np
import pytest

from my_ocr_spark.kernel import polyclip as pc


SQ = [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]  # 10x10 CCW square


def test_area_and_perimeter():
    assert pc.polygon_area(SQ) == 100.0
    assert pc.polygon_perimeter(SQ) == 40.0
    # clockwise order → same unsigned area
    assert pc.polygon_area(list(reversed(np.array(SQ).reshape(-1, 2).tolist()))) == 100.0


def test_identical_polys_iou_one():
    assert pc.poly_iou(SQ, SQ) == 1.0


def test_disjoint_polys_iou_zero():
    other = [20.0, 20.0, 30.0, 20.0, 30.0, 30.0, 20.0, 30.0]
    assert pc.poly_iou(SQ, other) == 0.0


def test_axis_aligned_overlap_closed_form():
    # [0,10]x[0,10] vs [5,15]x[5,15]: inter 25, union 175
    other = [5.0, 5.0, 15.0, 5.0, 15.0, 15.0, 5.0, 15.0]
    assert pc.poly_intersection_area(SQ, other) == 25.0
    assert pc.poly_union_area(SQ, other) == 175.0
    assert pc.poly_iou(SQ, other) == 25.0 / 175.0


def test_rotated_square_in_square():
    # diamond inscribed in the square: half the area
    diamond = [5.0, 0.0, 10.0, 5.0, 5.0, 10.0, 0.0, 5.0]
    assert abs(pc.poly_intersection_area(diamond, SQ) - 50.0) < 1e-9
    assert abs(pc.poly_iou(diamond, SQ) - 50.0 / 100.0) < 1e-9


def test_triangle_clip():
    tri = [0.0, 0.0, 20.0, 0.0, 0.0, 20.0]  # right triangle area 200
    # clip by the square: keeps [0,10]^2 minus the corner above x+y=20 → all
    # of the square below the hypotenuse: area = 100 - 0 (hypotenuse passes
    # through (10,10)) → intersection is the square minus nothing above
    # x+y<=20 → the full square except corner where x+y>20 (empty) = 100?
    # No: triangle is x>=0, y>=0, x+y<=20; square corner (10,10) has
    # x+y=20 → entire square inside. Use a tighter triangle too.
    assert abs(pc.poly_intersection_area(tri, SQ) - 100.0) < 1e-9
    tri2 = [0.0, 0.0, 10.0, 0.0, 0.0, 10.0]  # x+y<=10 → half the square
    assert abs(pc.poly_intersection_area(tri2, SQ) - 50.0) < 1e-9


def test_iou_symmetry_and_rotation_invariance():
    rng = np.random.RandomState(11)
    for _ in range(50):
        c1 = rng.uniform(0, 20, 2)
        c2 = rng.uniform(0, 20, 2)
        w1, h1 = rng.uniform(2, 10, 2)
        w2, h2 = rng.uniform(2, 10, 2)
        th = rng.uniform(0, 2 * math.pi)

        def rect(c, w, h, ang):
            base = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                             [w / 2, h / 2], [-w / 2, h / 2]])
            rot = np.array([[math.cos(ang), -math.sin(ang)],
                            [math.sin(ang), math.cos(ang)]])
            return base @ rot.T + c

        a, b = rect(c1, w1, h1, 0.0), rect(c2, w2, h2, th)
        i1, i2 = pc.poly_iou(a, b), pc.poly_iou(b, a)
        assert abs(i1 - i2) < 1e-9
        # global rotation leaves IoU invariant
        rot = np.array([[math.cos(0.7), -math.sin(0.7)],
                        [math.sin(0.7), math.cos(0.7)]])
        assert abs(pc.poly_iou(a @ rot.T, b @ rot.T) - i1) < 1e-9


def test_intersection_vs_monte_carlo():
    rng = np.random.RandomState(5)
    a = np.array([[1.0, 1.0], [9.0, 2.0], [8.0, 9.0], [2.0, 8.0]])
    b = np.array([[4.0, 0.0], [12.0, 4.0], [10.0, 12.0], [3.0, 9.0]])
    exact = pc.poly_intersection_area(a, b)
    pts = rng.uniform(0, 12, size=(200_000, 2))

    def inside(poly, p):
        q = pc._ccw(np.asarray(poly))
        e = np.roll(q, -1, axis=0) - q
        rel = p[:, None, :] - q[None, :, :]
        cross = e[None, :, 0] * rel[:, :, 1] - e[None, :, 1] * rel[:, :, 0]
        return (cross >= 0).all(axis=1)

    mc = (inside(a, pts) & inside(b, pts)).mean() * 144.0
    assert abs(exact - mc) < 0.5, (exact, mc)


def test_shrink_rectangle_closed_form():
    # rect 30x10: area 300, peri 80, r=0.4 → d = 300*0.84/80.001
    rect = [0.0, 0.0, 30.0, 0.0, 30.0, 10.0, 0.0, 10.0]
    d = 300.0 * (1 - 0.4 ** 2) / (80.0 + 0.001)
    out = pc.shrink_polygon(rect, 0.4)
    assert len(out) == 4
    assert abs(pc.polygon_area(out) - (30 - 2 * d) * (10 - 2 * d)) < 1e-9
    xs, ys = sorted(set(np.round(out[:, 0], 9))), sorted(set(np.round(out[:, 1], 9)))
    assert abs(xs[0] - d) < 1e-9 and abs(ys[0] - d) < 1e-9


def test_inset_collapse_returns_empty():
    # d = A(1-r^2)/P is always below a convex polygon's inradius, so the
    # DBNet shrink itself never collapses a valid convex input; collapse
    # happens for over-large insets (the pyclipper-returns-[] path)
    tiny = [0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0]
    assert len(pc.offset_polygon(tiny, -5.0)) == 0
    assert len(pc.shrink_polygon(tiny, 0.4)) == 4


def test_unclip_rectangle_closed_form():
    rect = [0.0, 0.0, 30.0, 0.0, 30.0, 10.0, 0.0, 10.0]
    d = 300.0 * 1.5 / 80.0
    out = pc.unclip_polygon(rect, 1.5)
    assert len(out) == 4
    assert abs(pc.polygon_area(out) - (30 + 2 * d) * (10 + 2 * d)) < 1e-9


def test_offset_roundtrip():
    rect = np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 6.0], [0.0, 6.0]])
    out = pc.offset_polygon(pc.offset_polygon(rect, 1.0), -1.0)
    assert np.allclose(np.sort(out, axis=0), np.sort(rect, axis=0))


def test_degenerate_inputs_never_raise():
    assert pc.poly_iou([0, 0, 0, 0, 0, 0, 0, 0], SQ) == 0.0
    assert len(pc.offset_polygon([0, 0, 1, 1], -1)) == 0
    assert pc.polygon_area([]) == 0.0


def test_quad_intersection_areas_batch_matches_scalar():
    """The batch Sutherland–Hodgman (quad_intersection_areas) must equal
    the scalar kernel pair-by-pair on random ROTATED quads — including
    disjoint pairs (area 0) and either clip orientation."""
    import numpy as np

    from my_ocr_spark.kernel.polyclip import (
        poly_intersection_area, quad_intersection_areas,
    )

    rng = np.random.default_rng(0)

    def rand_quad():
        w, h = rng.uniform(1, 30, 2)
        th = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(th), np.sin(th)
        base = np.array([[0, 0], [w, 0], [w, h], [0, h]], float)
        rot = np.array([[c, -s], [s, c]])
        return base @ rot.T + rng.uniform(-20, 20, 2)

    a = np.stack([rand_quad() for _ in range(800)])
    b = np.stack([rand_quad() for _ in range(800)])
    batch = quad_intersection_areas(a, b)
    n_zero = 0
    for i in range(len(a)):
        ref = poly_intersection_area(a[i], b[i])
        assert abs(batch[i] - ref) < 1e-9 * max(1.0, ref)
        n_zero += ref == 0.0
    assert 0 < n_zero < len(a)  # both branches exercised
    assert np.allclose(batch, quad_intersection_areas(a, b[:, ::-1]))


def test_quad_intersection_areas_fuzz_arbitrary_orders():
    """Arbitrary (possibly self-intersecting) subject vertex orders
    must either raise the documented ValueError (buffer bound) or
    match the scalar kernel exactly — never silently corrupt."""
    import numpy as np

    from my_ocr_spark.kernel.polyclip import (
        poly_intersection_area, quad_intersection_areas,
    )

    rng = np.random.default_rng(9)
    n_raised = 0
    for _ in range(400):
        a = rng.uniform(-10, 10, (4, 2))
        b_base = rng.uniform(-8, 8, 2)
        w, h = rng.uniform(2, 12, 2)
        b = np.array([b_base, b_base + [w, 0],
                      b_base + [w, h], b_base + [0, h]])
        try:
            got = quad_intersection_areas(a[None], b[None])[0]
        except ValueError:
            n_raised += 1
            continue
        ref = poly_intersection_area(a, b)
        assert abs(got - ref) < 1e-9 * max(1.0, ref)
    assert n_raised < 40  # the guard fires rarely, not routinely
