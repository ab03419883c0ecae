"""Binary pixel morphology for mask decode: hole filling + thinning.

Reference analogs (semantics, not code):
* ``fill_hole`` (``mmocr/models/textdet/postprocess/wrapper.py:232-242``):
  cv2.floodFill from the padded border, then ``~reachable | mask`` — holes
  are the zero-regions NOT 4-connected to the outside.
* ``skeletonize`` (``wrapper.py:12,359``): skimage Zhang-Suen thinning of
  per-instance center masks in textsnake_decode.

Pure numpy, no cv2/skimage (absent in this environment). ``fill_hole``
is hybrid: a vectorized frontier fixpoint (fastest on the small
instance crops decode actually processes — the pure-Python scanline is
4-14x slower there) capped at ~2(h+w) sweeps, falling back to an
O(area) scanline flood fill for pathological geodesics (spiral
corridors), where the fixpoint would degrade to O(diameter·area).
Both paths are differential-tested against each other.
"""

from __future__ import annotations

import numpy as np


def _reach_from_border(free: np.ndarray) -> np.ndarray:
    """Scanline flood fill over ``free`` cells, seeded at (0, 0) (the
    caller guarantees a connected all-free border ring): pop a seed,
    extend its maximal free run left/right, mark it, then push one seed
    per unvisited free run in the rows above/below. Each cell is
    visited O(1) times → O(area) total."""
    h, w = free.shape
    reach = np.zeros_like(free)
    stack = [(0, 0)]
    while stack:
        r, c = stack.pop()
        if reach[r, c] or not free[r, c]:
            continue
        c0 = c
        while c0 > 0 and free[r, c0 - 1] and not reach[r, c0 - 1]:
            c0 -= 1
        c1 = c
        while c1 + 1 < w and free[r, c1 + 1] and not reach[r, c1 + 1]:
            c1 += 1
        reach[r, c0:c1 + 1] = True
        for rn in (r - 1, r + 1):
            if 0 <= rn < h:
                row = free[rn, c0:c1 + 1] & ~reach[rn, c0:c1 + 1]
                if row.any():
                    # one seed per run: a cell whose left neighbor
                    # (within the window) is not a candidate
                    idx = np.flatnonzero(row)
                    starts = idx[np.concatenate(
                        ([True], np.diff(idx) > 1))]
                    for s in starts:
                        stack.append((rn, c0 + int(s)))
    return reach


def fill_hole(mask: np.ndarray) -> np.ndarray:
    """Fill interior holes of a binary mask (reference semantics:
    wrapper.py:232-242). A hole is a zero-region with no 4-connected
    path to the image border; the one-pixel pad makes the whole outside
    a single seed region, exactly like the reference's padded canvas."""
    m = np.asarray(mask) != 0
    if m.ndim != 2 or m.size == 0:
        return m.copy()
    h, w = m.shape
    free = np.ones((h + 2, w + 2), dtype=bool)
    free[1:h + 1, 1:w + 1] = ~m
    if m.size > 16384:
        # large masks go straight to the O(area) scanline: even the
        # CAPPED fixpoint costs O((h+w)·area) before giving up, which
        # at page scale dwarfs the scanline it would fall back to
        reach = _reach_from_border(free)
        return ~reach[1:h + 1, 1:w + 1] | m
    # vectorized frontier fixpoint, capped: geodesic border distance
    # exceeds 2(h+w) only for corridor shapes (spirals), where the
    # fixpoint is the wrong algorithm — hand those to the scanline
    reach = np.zeros_like(free)
    reach[[0, -1], :] = True
    reach[:, [0, -1]] = True
    for _ in range(2 * (h + w) + 4):
        grown = reach.copy()
        grown[1:, :] |= reach[:-1, :]
        grown[:-1, :] |= reach[1:, :]
        grown[:, 1:] |= reach[:, :-1]
        grown[:, :-1] |= reach[:, 1:]
        grown &= free
        if (grown == reach).all():
            break
        reach = grown
    else:
        reach = _reach_from_border(free)
    return ~reach[1:h + 1, 1:w + 1] | m


def skeletonize(mask: np.ndarray) -> np.ndarray:
    """Zhang-Suen two-subiteration thinning (the algorithm behind the
    reference's skimage ``skeletonize`` call, wrapper.py:359): repeat
    (north/east-biased pass, then south/west-biased pass) deleting
    simple border pixels — 2 <= B(p) <= 6 neighbors, exactly one 0->1
    transition around the ring, and the pass's two corner products
    zero — until a fixpoint. Fully vectorized over the grid; each pass
    applies its deletions simultaneously (the standard parallel
    formulation)."""
    img = (np.asarray(mask) != 0).astype(np.uint8)
    if img.ndim != 2 or img.size == 0:
        return img.astype(bool)
    img = np.pad(img, 1)
    changed = True
    while changed:
        changed = False
        for step in (0, 1):
            p = img
            # ring neighbors, Zhang-Suen order: P2=N then clockwise
            p2 = p[:-2, 1:-1]
            p3 = p[:-2, 2:]
            p4 = p[1:-1, 2:]
            p5 = p[2:, 2:]
            p6 = p[2:, 1:-1]
            p7 = p[2:, :-2]
            p8 = p[1:-1, :-2]
            p9 = p[:-2, :-2]
            center = p[1:-1, 1:-1]
            ring = (p2, p3, p4, p5, p6, p7, p8, p9)
            b = p2.astype(np.int8) + p3 + p4 + p5 + p6 + p7 + p8 + p9
            a = np.zeros_like(b)
            for i in range(8):
                a += (ring[i] == 0) & (ring[(i + 1) % 8] == 1)
            if step == 0:
                c1 = (p2 * p4 * p6) == 0
                c2 = (p4 * p6 * p8) == 0
            else:
                c1 = (p2 * p4 * p8) == 0
                c2 = (p2 * p6 * p8) == 0
            cond = ((center == 1) & (b >= 2) & (b <= 6) & (a == 1)
                    & c1 & c2)
            if cond.any():
                img[1:-1, 1:-1][cond] = 0
                changed = True
    return img[1:-1, 1:-1].astype(bool)


def label_components(mask: np.ndarray, connectivity: int = 8) -> np.ndarray:
    """Connected-component labels for the true-regions of a binary mask
    (the per-instance step of textsnake_decode, wrapper.py:350-358,
    where cv2.findContours + drawContours isolates each instance).
    Label = row-major index (r*w + c) of the component's first (and
    therefore minimum) pixel; background = -1. 8-connectivity by
    default, matching contour semantics; pass 4 for strict edges."""
    m = np.asarray(mask) != 0
    h, w = m.shape
    lab = np.full((h, w), -1, dtype=np.int64)
    if connectivity == 8:
        nbrs = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
                (0, 1), (1, -1), (1, 0), (1, 1)]
    else:
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    for r0 in range(h):
        for c0 in range(w):
            if not m[r0, c0] or lab[r0, c0] >= 0:
                continue
            seed = r0 * w + c0
            stack = [(r0, c0)]
            lab[r0, c0] = seed
            while stack:
                r, c = stack.pop()
                for dr, dc in nbrs:
                    rn, cn = r + dr, c + dc
                    if (0 <= rn < h and 0 <= cn < w and m[rn, cn]
                            and lab[rn, cn] < 0):
                        lab[rn, cn] = seed
                        stack.append((rn, cn))
    return lab


def march_along_normals(points_yx: np.ndarray, step: np.ndarray,
                        contour_mask: np.ndarray,
                        direction: int = 1) -> np.ndarray:
    """One marching half of ``centralize`` (wrapper.py:252-270): every
    point advances by ``direction * step`` while the int-truncated NEXT
    position stays inside the contour mask and inside the image — with
    the reference's asymmetric bound quirk preserved and documented:
    ``next_y >= 0`` but ``next_x > 0``, so leftward marches stop one
    short of column 0 even when the mask covers it. Points stop
    individually; the loop runs while any point still moves."""
    h, w = contour_mask.shape
    pos = np.asarray(points_yx, dtype=np.float64).copy()
    step = np.asarray(step, dtype=np.float64) * direction
    flags = np.ones(len(pos), dtype=bool)
    while flags.any():
        nxt = (pos + step).astype(np.int32)
        ny, nx = nxt[:, 0], nxt[:, 1]
        flags = ((ny >= 0) & (ny < h) & (nx > 0) & (nx < w)
                 & contour_mask[np.clip(ny, 0, h - 1),
                                np.clip(nx, 0, w - 1)])
        pos = pos + flags[:, None] * step
    return pos


def centralize(points_yx: np.ndarray, normal_sin: np.ndarray,
               normal_cos: np.ndarray, radius: np.ndarray,
               contour_mask: np.ndarray,
               step_ratio: float = 0.03) -> np.ndarray:
    """Textsnake center-point refinement (wrapper.py:245-272): march
    each skeleton point both ways along its normal (step =
    step_ratio * radius * (sin, cos)) until the probe leaves the
    contour mask; the center is the int32-truncated midpoint of the two
    stopping positions. Same observable semantics as the reference,
    including int32 probe truncation and the x-vs-y bound asymmetry
    (see march_along_normals)."""
    sin = np.asarray(normal_sin, dtype=np.float64).reshape(-1, 1)
    cos = np.asarray(normal_cos, dtype=np.float64).reshape(-1, 1)
    r = np.asarray(radius, dtype=np.float64).reshape(-1, 1)
    step = step_ratio * r * np.hstack([sin, cos])
    top = march_along_normals(points_yx, step, contour_mask, 1)
    bot = march_along_normals(points_yx, step, contour_mask, -1)
    return ((top + bot) * 0.5).astype(np.int32)
