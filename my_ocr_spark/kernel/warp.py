"""Perspective (homography) rectification of quadrilateral regions.

Reference analogs: ``warp_img`` perspective crop
(``mmocr/datasets/pipelines/crop.py:40-83``) and TPS rectification
(``mmocr/models/textrecog/preprocessor/tps_preprocessor.py:25-271``).
The pixel-level warp needs an image library (absent in this container —
see multimodal_decode_stub); the COORDINATE transform is pure numpy and
is what the layout branch needs: map points between a skewed quad and
its rectified box (e.g. dewarping PDF block coordinates).
"""

from __future__ import annotations

import numpy as np


def sort_quad_vertices(pts: np.ndarray) -> np.ndarray:
    """Order 4 points clockwise starting top-left — the reference's
    ``sort_vertex`` (``mmocr/datasets/pipelines/box_utils.py:6-54``):
    angular sort around the centroid, rotated so the point closest to
    the bounding-box top-left comes first. Deterministic ties by index."""
    pts = np.asarray(pts, dtype=np.float64).reshape(4, 2)
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    order = sorted(range(4), key=lambda i: (ang[i], i))  # CW in y-down
    ring = [pts[i] for i in order]
    tl_ref = pts.min(axis=0)
    start = min(range(4),
                key=lambda i: (np.hypot(*(ring[i] - tl_ref)), i))
    return np.array(ring[start:] + ring[:start])


def homography_from_quad(quad: np.ndarray, width: float, height: float,
                         normalize_order: bool = True) -> np.ndarray:
    """3x3 homography H mapping rectified rect (0,0)-(w,h) → quad.

    ``quad``: 4x2 points; by default they are normalized to TL, TR, BR,
    BL via sort_quad_vertices (self-enforcing precondition — a caller
    with a deliberately rotated region passes normalize_order=False).
    Solved via the standard 8-equation DLT system."""
    quad = np.asarray(quad, dtype=np.float64).reshape(4, 2)
    if normalize_order:
        quad = sort_quad_vertices(quad)
    src = np.array([[0, 0], [width, 0], [width, height], [0, height]],
                   dtype=np.float64)
    a = []
    b = []
    for (x, y), (u, v) in zip(src, quad):
        a.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        a.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b.extend([u, v])
    h = np.linalg.solve(np.asarray(a), np.asarray(b))
    return np.append(h, 1.0).reshape(3, 3)


def apply_homography(h: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply 3x3 homography to Nx2 points."""
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    ones = np.ones((len(pts), 1))
    p = np.hstack([pts, ones]) @ h.T
    return p[:, :2] / p[:, 2:3]


def rectify_quad_points(quad: np.ndarray, pts: np.ndarray,
                        width: float, height: float) -> np.ndarray:
    """Map points given in quad coordinates back into the rectified
    (0,0)-(w,h) frame — the dewarp direction."""
    h = homography_from_quad(quad, width, height)
    return apply_homography(np.linalg.inv(h), pts)
