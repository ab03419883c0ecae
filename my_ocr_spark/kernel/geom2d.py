"""2-D geometry kernels: point-to-segment distance field, min-area rect.

Reference analogs:
* ``point2line`` — DBNet border-map distance from grid points to a
  polygon edge (``mmocr/datasets/pipelines/textdet_targets/
  base_textdet_targets.py:18-52``, itself adapted from MhLiao/DB): the
  triangle form 2*area/c for the perpendicular distance, falling back to
  the nearer endpoint when the angle at the query point is acute.
* ``polygon_size`` — min-area bounding rectangle of a polygon
  (``base_textdet_targets.py:72-85``, ``cv2.minAreaRect``): convex hull
  + rotating calipers, pure numpy (cv2 absent in this engine).

Both are float64 throughout and use only IEEE-correctly-rounded ops
(*, /, sqrt), so the same formula evaluated as SQL doubles is
bit-identical — which is what lets ``point2line_distance_field`` carry
an exact DuckDB oracle.
"""

from __future__ import annotations

import numpy as np

# the reference uses float32 machine eps as its guard even in f64 math
_EPS = float(np.finfo(np.float32).eps)


def point2line_dist(xs, ys, x1, y1, x2, y2):
    """Vectorized distance from points (xs, ys) to segment
    (x1,y1)-(x2,y2); every argument may be an ndarray (broadcast).
    Matches the reference triangle formulation exactly, except that
    square_sin is clamped at 0 (the reference's nan_to_num handles the
    same fp underflow one step later)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    a_sq = np.square(xs - x1) + np.square(ys - y1)
    b_sq = np.square(xs - x2) + np.square(ys - y2)
    c_sq = np.square(np.float64(x1) - x2) + np.square(np.float64(y1) - y2)
    neg_cos_c = (c_sq - a_sq - b_sq) / (_EPS + 2.0 * np.sqrt(a_sq * b_sq))
    square_sin = np.maximum(1.0 - np.square(neg_cos_c), 0.0)
    result = np.sqrt(a_sq * b_sq * square_sin / (_EPS + c_sq))
    endpoint = np.sqrt(np.fmin(a_sq, b_sq))
    return np.where(neg_cos_c < 0, endpoint, result)


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns hull vertices CCW (no repeat of
    the first point). Collinear points are dropped."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort is what unique(axis=0) already gives
    def half(iterable):
        out: list[np.ndarray] = []
        for p in iterable:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if ((a[0] - o[0]) * (p[1] - o[1])
                        - (a[1] - o[1]) * (p[0] - o[0])) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect_size(points) -> tuple[float, float]:
    """(short_side, long_side) of the minimum-area bounding rectangle
    (rotating calipers over the convex hull — the cv2.minAreaRect size
    tuple, sorted). Degenerate inputs: a single point is (0, 0); a
    collinear set is (0, length)."""
    hull = convex_hull(np.asarray(points, dtype=np.float64).reshape(-1, 2))
    if len(hull) == 1:
        return 0.0, 0.0
    if len(hull) == 2:
        d = float(np.hypot(*(hull[1] - hull[0])))
        return 0.0, d
    best = None
    n = len(hull)
    for i in range(n):
        edge = hull[(i + 1) % n] - hull[i]
        ln = np.hypot(edge[0], edge[1])
        if ln == 0.0:
            continue
        ux, uy = edge[0] / ln, edge[1] / ln
        proj = hull @ np.array([ux, uy])      # extent along the edge
        perp = hull @ np.array([-uy, ux])     # extent perpendicular
        w = float(proj.max() - proj.min())
        h = float(perp.max() - perp.min())
        if best is None or w * h < best[0]:
            best = (w * h, w, h)
    _, w, h = best
    return (w, h) if w <= h else (h, w)


def min_area_rect_sizes_convex(polys: np.ndarray
                               ) -> tuple[np.ndarray, np.ndarray]:
    """Batch (short_side, long_side) of the minimum-area bounding
    rectangles for CONVEX polygons with a fixed vertex count —
    ``polys`` is (n, k, 2). Same rotating-calipers result as
    ``min_area_rect_size`` per polygon (differential-tested): for a
    convex input the hull is the vertex set itself, and projecting all
    vertices onto every edge direction yields identical extents
    regardless of hull vertex order or edge orientation (a reversed
    edge only negates the projection axis). When two directions tie in
    AREA with different aspect ratios (possible for some inscribed
    quads), the scalar and batch picks can legitimately differ — the
    scalar depends on hull vertex order, this on polygon edge order;
    tie-free inputs (like the rotated-rect fixture) match exactly to
    1e-9. Vectorized
    over the batch — the scalar hull+calipers loop cost ~115 us/poly
    and dominated min_area_rect_size at sf0.1."""
    p = np.asarray(polys, dtype=np.float64)
    edges = np.roll(p, -1, axis=1) - p
    ln = np.hypot(edges[..., 0], edges[..., 1])
    with np.errstate(invalid="ignore", divide="ignore"):
        ux = edges[..., 0] / ln
        uy = edges[..., 1] / ln
    # proj[n, e, v]: vertex v onto edge e's direction / normal
    proj = (ux[:, :, None] * p[:, None, :, 0]
            + uy[:, :, None] * p[:, None, :, 1])
    perp = (-uy[:, :, None] * p[:, None, :, 0]
            + ux[:, :, None] * p[:, None, :, 1])
    w = proj.max(axis=2) - proj.min(axis=2)
    h = perp.max(axis=2) - perp.min(axis=2)
    area = np.where(ln > 0, w * h, np.inf)
    best = np.argmin(area, axis=1)
    rows = np.arange(len(p))
    bw, bh = w[rows, best], h[rows, best]
    # fully degenerate polygon (every edge zero-length): match the
    # scalar kernel's (0, 0) instead of NaN from the 0/0 unit vector
    degen = ~(ln > 0).any(axis=1)
    if degen.any():
        bw = np.where(degen, 0.0, bw)
        bh = np.where(degen, 0.0, bh)
    return np.minimum(bw, bh), np.maximum(bw, bh)
