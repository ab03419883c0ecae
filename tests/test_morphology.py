"""fill_hole + Zhang-Suen skeletonize kernels (wrapper.py:232-242,359)."""

import numpy as np

from my_ocr_spark.kernel.morphology import fill_hole, skeletonize


def _grid(lines):
    return np.array([[ch == "#" for ch in row] for row in lines])


def test_fill_hole_closed_ring():
    m = np.zeros((8, 8), bool)
    m[1, 1:6] = m[5, 1:6] = True
    m[1:6, 1] = m[1:6, 5] = True
    f = fill_hole(m)
    assert f[2:5, 2:5].all()                  # interior filled
    assert f.sum() == m.sum() + 9
    assert (f[0, :] == 0).all() and (f[:, 6:] == 0).all()  # outside intact


def test_fill_hole_broken_ring_connects_outside():
    m = np.zeros((8, 8), bool)
    m[1, 1:6] = m[5, 1:6] = True
    m[1:6, 1] = m[1:6, 5] = True
    m[1, 3] = False                           # one-pixel gap in the ring
    assert (fill_hole(m) == m).all()          # 4-connected to outside


def test_fill_hole_border_touching_cavity_not_filled():
    # C-shape opening onto the image border: the cavity is outside
    m = _grid(["#####",
               "#...#",
               "#...#",
               "#...#",
               "#...#"])                      # open bottom edge
    assert (fill_hole(m) == m).all()


def test_fill_hole_nested_and_diagonal():
    # diagonal gap does NOT leak (4-connectivity, like cv2.floodFill)
    m = _grid([".....",
               ".###.",
               ".#.#.",
               ".###.",
               "....."])
    f = fill_hole(m)
    assert f[2, 2]
    assert f.sum() == m.sum() + 1


def test_skeletonize_bar_golden():
    bar = np.zeros((5, 9), bool)
    bar[1:4, 1:8] = True
    exp = _grid([".........",
                 ".........",
                 "..####...",
                 ".........",
                 "........."])
    assert (skeletonize(bar) == exp).all()


def test_skeletonize_block_golden():
    blk = np.zeros((7, 7), bool)
    blk[1:6, 1:6] = True
    exp = np.zeros((7, 7), bool)
    exp[3, 3] = True
    assert (skeletonize(blk) == exp).all()


def test_skeletonize_l_shape_golden():
    L = np.zeros((9, 9), bool)
    L[1:8, 1:4] = True
    L[5:8, 1:8] = True
    exp = _grid([".........",
                 ".........",
                 "..#......",
                 "..#......",
                 "..#......",
                 "..#......",
                 "..####...",
                 ".........",
                 "........."])
    assert (skeletonize(L) == exp).all()


def test_skeletonize_thin_line_unchanged():
    m = np.zeros((5, 7), bool)
    m[2, 1:6] = True
    assert (skeletonize(m) == m).all()


def test_morphology_properties_random():
    rng = np.random.RandomState(0)
    for _ in range(80):
        m = rng.rand(12, 12) > 0.55
        s = skeletonize(m)
        assert (s <= m).all()                 # skeleton subset of mask
        assert (skeletonize(s) == s).all()    # idempotent
        f = fill_hole(m)
        assert (f >= m).all()                 # fill only adds
        assert (fill_hole(f) == f).all()      # idempotent
        # no interior hole survives: refilling the complement's
        # border-reachable set is exactly f (checked via idempotence
        # above) and every added pixel was a non-border-reachable zero
        assert not (f & ~m)[0, :].any() and not (f & ~m)[-1, :].any()
        assert not (f & ~m)[:, 0].any() and not (f & ~m)[:, -1].any()


def test_empty_and_degenerate():
    assert fill_hole(np.zeros((0, 0), bool)).size == 0
    assert skeletonize(np.zeros((0, 0), bool)).size == 0
    one = np.ones((1, 1), bool)
    assert fill_hole(one).all()
    assert skeletonize(one).all()             # isolated pixel survives


def test_skeletonize_fixture_family_converges_within_unroll():
    """The skeletonize_masks oracle unrolls _SKEL_PASSES Zhang-Suen
    passes; the kernel loops to quiescence. Equality requires every
    fixture mask to converge within the unroll — pin it by replaying
    bounded passes here for a dense key sweep."""
    import numpy as np

    from my_ocr_spark.plans.geometry import _SKEL_PASSES, _skel_mask_numpy

    def one_subiter(img, step):
        p = np.pad(img, 1)
        ring = [p[:-2, 1:-1], p[:-2, 2:], p[1:-1, 2:], p[2:, 2:],
                p[2:, 1:-1], p[2:, :-2], p[1:-1, :-2], p[:-2, :-2]]
        center = p[1:-1, 1:-1]
        b = sum(r.astype(np.int8) for r in ring)
        a = sum(((ring[i] == 0) & (ring[(i + 1) % 8] == 1))
                for i in range(8))
        if step == 0:
            c1 = (ring[0] * ring[2] * ring[4]) == 0
            c2 = (ring[2] * ring[4] * ring[6]) == 0
        else:
            c1 = (ring[0] * ring[2] * ring[6]) == 0
            c2 = (ring[0] * ring[4] * ring[6]) == 0
        cond = (center == 1) & (b >= 2) & (b <= 6) & (a == 1) & c1 & c2
        out = img.copy()
        out[cond] = 0
        return out

    rr, cc = np.mgrid[0:8, 0:8]
    for k in range(0, 1000, 7):
        g = _skel_mask_numpy(k, rr, cc).astype(np.uint8)
        for _ in range(_SKEL_PASSES):
            for step in (0, 1):
                g = one_subiter(g, step)
        # one more full pass must be a no-op (converged within unroll)
        assert (one_subiter(one_subiter(g, 0), 1) == g).all(), k
        from my_ocr_spark.kernel.morphology import skeletonize
        assert (skeletonize(_skel_mask_numpy(k, rr, cc))
                == g.astype(bool)).all(), k


def test_fill_hole_scanline_matches_frontier_reference():
    """Differential: the O(area) scanline flood fill must equal the
    O(diameter·area) vectorized frontier fixpoint it replaced, on dense
    random masks and on a long spiral corridor (the shape the scanline
    rewrite exists for)."""
    import numpy as np

    def fill_reference(mask):
        m = np.asarray(mask) != 0
        h, w = m.shape
        free = np.ones((h + 2, w + 2), dtype=bool)
        free[1:h + 1, 1:w + 1] = ~m
        reach = np.zeros_like(free)
        reach[[0, -1], :] = True
        reach[:, [0, -1]] = True
        while True:
            grown = reach.copy()
            grown[1:, :] |= reach[:-1, :]
            grown[:-1, :] |= reach[1:, :]
            grown[:, 1:] |= reach[:, :-1]
            grown[:, :-1] |= reach[:, 1:]
            grown &= free
            if (grown == reach).all():
                break
            reach = grown
        return ~reach[1:h + 1, 1:w + 1] | m

    from my_ocr_spark.kernel.morphology import _reach_from_border

    def fill_scanline(mask):
        # drive the scanline path directly: fill_hole's hybrid would
        # route these easy masks to the vectorized fixpoint
        m = np.asarray(mask) != 0
        h, w = m.shape
        free = np.ones((h + 2, w + 2), dtype=bool)
        free[1:h + 1, 1:w + 1] = ~m
        reach = _reach_from_border(free)
        return ~reach[1:h + 1, 1:w + 1] | m

    rng = np.random.RandomState(3)
    for density in (0.3, 0.5, 0.7):
        for _ in range(25):
            m = rng.rand(20, 20) < density
            ref = fill_reference(m)
            assert (fill_scanline(m) == ref).all()
            assert (fill_hole(m) == ref).all()

    # spiral: walls every other ring, one corridor connecting everything
    # (geodesic diameter >> 2(h+w) -> fill_hole's hybrid takes the
    # scanline fallback here)
    n = 41
    sp = np.zeros((n, n), bool)
    for ring in range(1, n // 2, 2):
        sp[ring, ring:n - ring] = True
        sp[n - 1 - ring, ring:n - ring] = True
        sp[ring:n - ring, ring] = True
        sp[ring:n - ring, n - 1 - ring] = True
        sp[ring, ring + 1] = False          # gap -> corridor into ring
    assert (fill_hole(sp) == fill_reference(sp)).all()


def test_fill_hole_scanline_scales_linearly():
    """A 400x400 nested-frames mask (worst case for the old frontier
    sweep) completes fast — the scanline pass is O(area)."""
    import time

    import numpy as np

    n = 400
    m = np.zeros((n, n), bool)
    for ring in range(2, n // 2 - 2, 4):
        m[ring, ring:n - ring] = True
        m[n - 1 - ring, ring:n - ring] = True
        m[ring:n - ring, ring] = True
        m[ring:n - ring, n - 1 - ring] = True
    t0 = time.monotonic()
    f = fill_hole(m)
    assert time.monotonic() - t0 < 2.0
    # closed nested rings: everything inside the outermost ring fills
    assert f[2:n - 2, 2:n - 2].all()


def test_label_components_semantics():
    from my_ocr_spark.kernel.morphology import label_components

    m = _grid([".......",
               ".##....",
               "..#..#.",
               "....#..",
               "......."])
    lab8 = label_components(m)
    # label = row-major index of the component's first pixel
    assert lab8[1, 1] == lab8[1, 2] == lab8[2, 2] == 1 * 7 + 1
    assert lab8[2, 5] == lab8[3, 4] == 2 * 7 + 5   # diagonal joins in 8-conn
    lab4 = label_components(m, connectivity=4)
    assert lab4[2, 5] != lab4[3, 4]                # but not in 4-conn
    assert (lab4[m == 0] == -1).all()


def test_textsnake_fixture_family_converges_within_unroll():
    """The textsnake_center_decode oracle reuses the 5-pass Zhang-Suen
    unroll at 12x12 — pin that the filled fixture masks converge within
    it (same bounded-pass replay as the 8x8 pin)."""
    import numpy as np

    from my_ocr_spark.kernel.morphology import fill_hole, skeletonize
    from my_ocr_spark.plans.geometry import _SKEL_PASSES, _ts_mask_numpy

    rr, cc = np.mgrid[0:12, 0:12]
    for k in range(0, 500, 7):
        f = fill_hole(_ts_mask_numpy(k, rr, cc))
        s = skeletonize(f)
        # bounded replay: _SKEL_PASSES full passes of the parallel
        # rule must already be the fixpoint the kernel converged to
        img = f.copy()
        for _ in range(_SKEL_PASSES):
            img = skeletonize_one_pass(img)
        assert (img == s).all(), k


def skeletonize_one_pass(mask):
    """One full Zhang-Suen pass (both subiterations), parallel rule —
    used to pin oracle unroll depth."""
    import numpy as np

    img = (np.asarray(mask) != 0).astype(np.uint8)
    img = np.pad(img, 1)
    for step in (0, 1):
        p = img
        ring = [p[:-2, 1:-1], p[:-2, 2:], p[1:-1, 2:], p[2:, 2:],
                p[2:, 1:-1], p[2:, :-2], p[1:-1, :-2], p[:-2, :-2]]
        center = p[1:-1, 1:-1]
        b = sum(r.astype(np.int8) for r in ring)
        a = sum(((ring[i] == 0) & (ring[(i + 1) % 8] == 1))
                for i in range(8))
        if step == 0:
            c1 = (ring[0] * ring[2] * ring[4]) == 0
            c2 = (ring[2] * ring[4] * ring[6]) == 0
        else:
            c1 = (ring[0] * ring[2] * ring[6]) == 0
            c2 = (ring[0] * ring[4] * ring[6]) == 0
        cond = (center == 1) & (b >= 2) & (b <= 6) & (a == 1) & c1 & c2
        img[1:-1, 1:-1][cond] = 0
    return img[1:-1, 1:-1].astype(bool)


def test_centralize_reference_semantics():
    """centralize (wrapper.py:245-272): closed-form stopping positions
    on bar masks, int32 midpoint truncation, and the reference's
    asymmetric next_x > 0 bound (leftward marches stop at column 1 even
    when the mask covers column 0)."""
    import numpy as np

    from my_ocr_spark.kernel.morphology import (
        centralize, march_along_normals,
    )

    m = np.zeros((16, 16), bool)
    m[3:10, :] = True                       # rows 3..9
    pts = np.array([[4.0, 8.0]])
    step = np.array([[0.5, 0.0]])
    assert march_along_normals(pts, step, m, 1)[0, 0] == 9.5
    assert march_along_normals(pts, step, m, -1)[0, 0] == 3.0
    c = centralize(pts, [1.0], [0.0], [2.0], m, step_ratio=0.25)
    assert (c[0] == [6, 8]).all()           # trunc((9.5+3)/2) = 6

    full = np.ones((16, 16), bool)          # mask covers column 0...
    left = march_along_normals(np.array([[8.0, 5.0]]),
                               np.array([[0.0, 1.0]]), full, -1)
    assert left[0, 1] == 1.0                # ...but next_x > 0 stops at 1

    # vectorized: points stop individually
    pts2 = np.array([[4.0, 8.0], [9.0, 8.0]])
    step2 = np.array([[1.0, 0.0], [1.0, 0.0]])
    top2 = march_along_normals(pts2, step2, m, 1)
    assert top2[0, 0] == 9.0 and top2[1, 0] == 9.0
