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


def warp_pixels(img: np.ndarray, h: np.ndarray,
                out_shape: tuple[int, int],
                fill: float = 0.0) -> np.ndarray:
    """Pixel-level perspective warp — pure-numpy grid sample with
    bilinear interpolation (the pixel path of ``warp_img``,
    ``mmocr/datasets/pipelines/crop.py:40-83``, which the reference
    delegates to cv2.warpPerspective; cv2 is absent here so the sampler
    is explicit).

    ``h`` maps OUTPUT coordinates (x, y) to input coordinates (the same
    convention as homography_from_quad: rectified → quad), so rectifying
    a region is ``warp_pixels(img, homography_from_quad(quad, w, h),
    (h, w))``. Out-of-bounds samples take ``fill``. Fully vectorized:
    one 3x3 matmul over the whole output grid, four gathers, no Python
    per-pixel loop."""
    img = np.asarray(img, dtype=np.float64)
    out_h, out_w = out_shape
    ys, xs = np.mgrid[0:out_h, 0:out_w]
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(out_h * out_w)])
    src = h @ pts
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    hh, ww = img.shape

    def gather(yy, xx):
        ok = (yy >= 0) & (yy < hh) & (xx >= 0) & (xx < ww)
        vals = np.full(yy.shape, fill, dtype=np.float64)
        vals[ok] = img[yy[ok], xx[ok]]
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return (top * (1.0 - fy) + bot * fy).reshape(out_h, out_w)


def crop_quad_pixels(img: np.ndarray, quad: np.ndarray,
                     width: int, height: int) -> np.ndarray:
    """Rectified pixel crop of a quadrilateral region (warp_img's
    crop+rectify in one step): sample the quad's interior onto a
    width x height grid."""
    hmat = homography_from_quad(quad, float(width), float(height))
    return warp_pixels(img, hmat, (height, width))


# --- Thin-plate-spline rectification (RARE/STN grid generator) --------------
#
# Pure-numpy re-derivation of the reference's TPS GridGenerator
# (``mmocr/models/textrecog/preprocessor/tps_preprocessor.py:152-271``):
# fiducials C on the top/bottom edges of the rectified frame, radial
# basis U(r) = r^2 log r, the (K+3)x(K+3) delta_C system inverted once,
# per-instance transform T = inv_delta_C @ [C'; 0_3x2], dense grid
# P' = P_hat @ T. A homography cannot rectify *curved* text; this can.

_TPS_EPS = 1e-6


def tps_fiducials(num_fiducial: int = 20) -> np.ndarray:
    """Base fiducials C (K x 2) in [-1,1]^2: K/2 along the top edge,
    K/2 along the bottom (tps_preprocessor.py:195-203)."""
    half = num_fiducial // 2
    x = np.linspace(-1.0, 1.0, half)
    top = np.stack([x, -np.ones(half)], axis=1)
    bot = np.stack([x, np.ones(half)], axis=1)
    return np.concatenate([top, bot], axis=0)


def tps_inv_delta_c(c: np.ndarray) -> np.ndarray:
    """Inverse of the TPS system matrix delta_C
    (tps_preprocessor.py:205-228). The diagonal r=0 entries use the
    log(1)=0 trick (fill_diagonal with 1) exactly as the reference."""
    k = len(c)
    d = np.linalg.norm(c[:, None, :] - c[None, :, :], axis=2)
    np.fill_diagonal(d, 1.0)
    hat_c = (d ** 2) * np.log(d)
    delta = np.concatenate([
        np.concatenate([np.ones((k, 1)), c, hat_c], axis=1),
        np.concatenate([np.zeros((2, 3)), c.T], axis=1),
        np.concatenate([np.zeros((1, 3)), np.ones((1, k))], axis=1),
    ], axis=0)
    return np.linalg.inv(delta)


def _tps_p_hat(c: np.ndarray, p: np.ndarray) -> np.ndarray:
    """[1 | P | U(|P - C|)] design rows (tps_preprocessor.py:245-258);
    note the reference's asymmetric eps: log(r + 1e-6) here vs the
    fill-diagonal trick in delta_C — reproduced as-is."""
    r = np.linalg.norm(p[:, None, :] - c[None, :, :], axis=2)
    rbf = (r ** 2) * np.log(r + _TPS_EPS)
    return np.concatenate([np.ones((len(p), 1)), p, rbf], axis=1)


_TPS_CACHE: dict = {}


def tps_grid(c_prime: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Sampling grid (out_h, out_w, 2) in normalized [-1,1] input
    coordinates for rectifying an instance whose fiducials moved to
    ``c_prime`` (K x 2) — build_P + build_P_hat + build_P_prime
    (tps_preprocessor.py:230-271) without the torch batching.

    The design matrices depend only on (K, out_w, out_h) and are cached
    (the reference registers them as buffers for the same reason); the
    per-instance cost is one (n x K+3) @ (K+3 x 2) matmul."""
    c_prime = np.asarray(c_prime, dtype=np.float64)
    key = (len(c_prime), out_w, out_h)
    cached = _TPS_CACHE.get(key)
    if cached is None:
        c = tps_fiducials(len(c_prime))
        inv_delta = tps_inv_delta_c(c)
        gx = (np.arange(-out_w, out_w, 2) + 1.0) / out_w
        gy = (np.arange(-out_h, out_h, 2) + 1.0) / out_h
        p = np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)
        cached = _tps_p_hat(c, p) @ inv_delta
        if len(_TPS_CACHE) < 64:
            _TPS_CACHE[key] = cached
    t = cached @ np.concatenate([c_prime, np.zeros((3, 2))], axis=0)
    return t.reshape(out_h, out_w, 2)


def tps_warp_pixels(img: np.ndarray, c_prime: np.ndarray,
                    out_shape: tuple[int, int]) -> np.ndarray:
    """Rectify ``img`` through the TPS grid — the pixel path of the
    reference's F.grid_sample(padding_mode='border',
    align_corners=True): normalized coords map to pixels as
    (x+1)/2*(W-1), out-of-range samples clamp to the border, bilinear
    interpolation. Fully vectorized."""
    img = np.asarray(img, dtype=np.float64)
    out_h, out_w = out_shape
    grid = tps_grid(c_prime, out_w, out_h)
    hh, ww = img.shape
    # border padding == clamping the sample coordinate: once a coord
    # leaves [0, n-1], both bilinear neighbors clamp to the same border
    # pixel, which is exactly the clamped-coordinate sample.
    sx = np.clip((grid[..., 0] + 1.0) / 2.0 * (ww - 1), 0.0, ww - 1.0)
    sy = np.clip((grid[..., 1] + 1.0) / 2.0 * (hh - 1), 0.0, hh - 1.0)
    x0 = np.maximum(np.minimum(np.floor(sx).astype(np.int64), ww - 2), 0)
    y0 = np.maximum(np.minimum(np.floor(sy).astype(np.int64), hh - 2), 0)
    fx = sx - x0
    fy = sy - y0
    # degenerate 1-px-wide/tall images: the +1 neighbor clamps onto the
    # same (only) pixel instead of indexing out of bounds
    x1 = np.minimum(x0 + 1, ww - 1)
    y1 = np.minimum(y0 + 1, hh - 1)
    top = img[y0, x0] * (1.0 - fx) + img[y0, x1] * fx
    bot = img[y1, x0] * (1.0 - fx) + img[y1, x1] * fx
    return top * (1.0 - fy) + bot * fy
