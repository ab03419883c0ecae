"""Homography rectification (warp_img / TPS coordinate analog)."""

import numpy as np

from my_ocr_spark.kernel.warp import (
    apply_homography, homography_from_quad, rectify_quad_points,
)


def test_identity_on_axis_aligned_rect():
    quad = np.array([[10, 20], [110, 20], [110, 70], [10, 70]], float)
    h = homography_from_quad(quad, 100, 50)
    # rect corners map exactly onto the quad
    out = apply_homography(h, [[0, 0], [100, 0], [100, 50], [0, 50]])
    assert np.allclose(out, quad)
    # center maps to center
    assert np.allclose(apply_homography(h, [[50, 25]]), [[60, 45]])


def test_skewed_quad_roundtrip():
    quad = np.array([[0, 0], [120, 15], [130, 80], [-5, 60]], float)
    h = homography_from_quad(quad, 100, 50)
    rect_pts = np.array([[0, 0], [100, 0], [100, 50], [0, 50],
                         [37.5, 21.0]])
    warped = apply_homography(h, rect_pts)
    back = rectify_quad_points(quad, warped, 100, 50)
    assert np.allclose(back, rect_pts, atol=1e-8)
    # corners land on the quad exactly
    assert np.allclose(warped[:4], quad)


def test_collinear_interior_preserved_along_edges():
    quad = np.array([[0, 0], [200, 40], [210, 140], [10, 100]], float)
    h = homography_from_quad(quad, 100, 50)
    # midpoint of the top rect edge maps onto the quad's top edge segment
    mid = apply_homography(h, [[50, 0]])[0]
    a, b = quad[0], quad[1]
    t = np.linalg.norm(mid - a) / np.linalg.norm(b - a)
    assert 0 < t < 1
    assert np.allclose(np.cross(b - a, mid - a), 0, atol=1e-6)


def test_sort_quad_vertices():
    from my_ocr_spark.kernel.warp import sort_quad_vertices
    quad = np.array([[110, 20], [10, 70], [10, 20], [110, 70]], float)
    out = sort_quad_vertices(quad)
    assert np.allclose(out, [[10, 20], [110, 20], [110, 70], [10, 70]])
    # already-ordered input is preserved
    ordered = np.array([[0, 0], [100, 5], [95, 60], [-2, 55]], float)
    assert np.allclose(sort_quad_vertices(ordered), ordered)
