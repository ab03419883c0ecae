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


# --- Moore boundary tracing + db_decode chain (round 5) ---------------------

from my_ocr_spark.kernel.morphology import (  # noqa: E402
    compress_ring, db_decode_regions, label_components, trace_boundary,
)


def test_trace_boundary_rectangle_corners():
    m = np.zeros((8, 8), bool)
    m[1:4, 1:5] = True
    walk = trace_boundary(m)
    ring = compress_ring(walk)
    # closed clockwise ring over the 4 corners (start = first corner
    # after the seed's first move)
    assert ring.tolist() == [[1, 4], [3, 4], [3, 1], [1, 1]]
    assert len(walk) == 10  # boundary pixel count of a 3x4 rect


def test_trace_boundary_one_px_bar_two_vertices():
    m = np.zeros((8, 8), bool)
    m[2:6, 3] = True
    walk = trace_boundary(m)
    # out AND back: 6 walk steps over 4 pixels
    assert walk.tolist() == [[3, 3], [4, 3], [5, 3], [4, 3], [3, 3],
                             [2, 3]]
    assert compress_ring(walk).tolist() == [[5, 3], [2, 3]]


def test_trace_boundary_diagonal_terminates():
    # re-enters the seed with a different backtrack than the initial W:
    # the transition-repeat (s1) criterion must terminate where the
    # naive seed-state criterion would loop forever
    m = np.zeros((8, 8), bool)
    for i in range(4):
        m[i + 1, i + 1] = True
    walk = trace_boundary(m)
    assert walk.tolist() == [[2, 2], [3, 3], [4, 4], [3, 3], [2, 2],
                             [1, 1]]


def test_trace_boundary_single_pixel_and_empty():
    m = np.zeros((4, 4), bool)
    assert trace_boundary(m).shape == (0, 2)
    m[2, 2] = True
    assert trace_boundary(m).tolist() == [[2, 2]]


def test_trace_boundary_random_soak_terminates_and_stays_inside():
    rng = np.random.default_rng(7)
    for _ in range(150):
        m = rng.random((12, 12)) < 0.35
        lab = label_components(m, 8)
        for lv in np.unique(lab[lab >= 0]):
            sel = lab == lv
            walk = trace_boundary(sel)
            assert len(walk) <= 8 * int(sel.sum()) + 8
            assert all(sel[r, c] for r, c in walk)
            # every OUTER boundary pixel is visited (the trace follows
            # the outer contour only — pixels bordering interior holes
            # are not on it, so test against the hole-filled shape,
            # whose boundary pixels are exactly the outer ones)
            filled = fill_hole(sel)
            pad = np.pad(filled, 1)
            interior = (pad[:-2, 1:-1] & pad[2:, 1:-1]
                        & pad[1:-1, :-2] & pad[1:-1, 2:])
            boundary = filled & ~interior
            visited = np.zeros_like(sel)
            visited[walk[:, 0], walk[:, 1]] = True
            assert (boundary & ~visited).sum() == 0


def test_db_decode_regions_golden_chain():
    # one solid rect + one low-score rect + one 1-px bar
    prob = np.full((12, 12), 0.1)
    prob[1:5, 1:6] = 0.9          # kept: score .9, short side ~ 4.9
    prob[7:10, 1:6] = 0.35        # dropped by score (< 0.5)
    prob[2:7, 9] = 0.9            # dropped: 2-vertex contour
    regs = db_decode_regions(prob, mask_thr=0.3, min_text_score=0.5,
                             min_text_width=3.0, unclip_ratio=1.5)
    assert [r["label"] for r in regs] == [1 * 12 + 1]
    r = regs[0]
    assert r["n_vertices"] == 4 and r["n_walk"] == 14
    assert r["area"] == 12.0 and r["peri"] == 14.0  # 3x4 traced ring
    assert abs(r["unclip_d"] - 12.0 * 1.5 / 14.0) < 1e-15
    assert abs(r["rect_short"] - (3 + 2 * r["unclip_d"])) < 1e-9
    assert abs(r["rect_long"] - (4 + 2 * r["unclip_d"])) < 1e-9


def test_db_decode_fixture_family_closed_forms_hold():
    """Pins every assumption the db_decode_boundaries oracle makes
    about the fixture family, over all residue classes (lcm of the key
    moduli): (a) exactly 3 components; (b) kept rings have 4 or 7
    vertices (< 8 ⇒ numpy's perimeter sum is sequential, matching the
    oracle's left-to-right fold); (c) the kernel's calipers rect ==
    ring bbox + 2d to 1e-9 (the oracle's closed form); (d) no rect
    side sits within 1e-6 of a 4dp floor-half-up boundary; (e) width
    decisions have >= 0.05 margin."""
    from my_ocr_spark.plans.geometry import _dbd_prob_numpy

    rr, cc = np.mgrid[0:16, 0:16]
    for k in range(420):  # lcm(3,5,4)=60 key residues, 7x over
        prob = _dbd_prob_numpy(k, rr, cc)
        labels = label_components(prob > 0.3, 8)
        assert len(np.unique(labels[labels >= 0])) == 3
        for reg in db_decode_regions(prob, 0.3, 0.62, 3.0, 1.5):
            assert reg["n_vertices"] in (4, 7)
            ring = reg["ring"]
            h = ring[:, 0].max() - ring[:, 0].min()
            w = ring[:, 1].max() - ring[:, 1].min()
            d = reg["unclip_d"]
            cf_short, cf_long = min(h, w) + 2 * d, max(h, w) + 2 * d
            assert abs(cf_short - reg["rect_short"]) < 1e-9
            assert abs(cf_long - reg["rect_long"]) < 1e-9
            for x in (cf_short, cf_long):
                fr = abs((x * 1e4 + 0.5) - round(x * 1e4 + 0.5))
                assert fr > 1e-6
            assert abs(cf_short - 3.0) > 0.05


def test_march_mixed_zero_step_batch_terminates():
    """A zero-step point in the SAME batch as moving points must stay
    stopped: the flag recomputation inside the loop would otherwise
    re-enable it (in-mask, x>0) and spin forever once any other point
    still moves (review finding, round 5)."""
    from my_ocr_spark.kernel.morphology import march_along_normals

    m = np.ones((8, 8), dtype=bool)
    m[:, 6:] = False
    pts = np.array([[4.0, 4.0], [4.0, 1.0]])
    step = np.array([[0.0, 0.0], [0.0, 1.0]])
    out = march_along_normals(pts, step, m, 1)
    assert out[0].tolist() == [4.0, 4.0]   # never moved
    assert out[1][1] > 1.0                 # the real point marched


def test_label_components_matches_dfs_reference():
    """The run-based union-find labeling must equal the per-pixel DFS
    it replaced — same labels (raster-first pixel index), background
    -1 — on random masks at both connectivities, plus a page-scale
    smoke (long runs, many components)."""
    def dfs_ref(mask, connectivity):
        m = np.asarray(mask) != 0
        h, w = m.shape
        lab = np.full((h, w), -1, dtype=np.int64)
        nbrs = ([(-1, -1), (-1, 0), (-1, 1), (0, -1),
                 (0, 1), (1, -1), (1, 0), (1, 1)]
                if connectivity == 8
                else [(-1, 0), (1, 0), (0, -1), (0, 1)])
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

    from my_ocr_spark.kernel.morphology import label_components

    rng = np.random.RandomState(5)
    for density in (0.2, 0.45, 0.7):
        for _ in range(40):
            m = rng.rand(14, 14) < density
            for conn in (4, 8):
                assert (label_components(m, conn)
                        == dfs_ref(m, conn)).all(), (density, conn)
    # degenerate shapes
    for m in (np.zeros((5, 5), bool), np.ones((5, 5), bool),
              np.eye(6, dtype=bool), np.zeros((0, 0), bool)):
        for conn in (4, 8):
            assert (label_components(m, conn)
                    == dfs_ref(m, conn)).all()
    # page-scale: stripes + noise, run-based must stay fast and exact
    big = rng.rand(300, 400) < 0.55
    big[::7, :] = True
    for conn in (4, 8):
        assert (label_components(big, conn)
                == dfs_ref(big, conn)).all()
