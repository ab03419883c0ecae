"""Property-based tests for the round-2 kernels: total functions never
raise, geometric invariants hold on random inputs."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from my_ocr_spark.kernel.codec import ctc_topk_select
from my_ocr_spark.kernel.geom2d import (
    convex_hull,
    min_area_rect_size,
    point2line_dist,
)
from my_ocr_spark.kernel.imagemeta import (
    jpeg_exif_orientation,
    orientation_plan,
    sniff_format,
)
from my_ocr_spark.kernel.pathops import (
    canonical_path_order,
    merge_disks,
    min_connect_path,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_imagemeta_total_on_random_bytes(payload):
    fmt = sniff_format(payload)
    assert fmt in ("png", "jpeg", "gif", "unknown")
    orient = jpeg_exif_orientation(payload)
    assert orient is None or 1 <= orient <= 8
    f, o, needs, ext = orientation_plan(payload)
    assert needs == (o in (5, 6, 7, 8))


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400).map(lambda b: b"\xff\xd8\xff" + b))
def test_exif_walk_total_on_jpeg_prefixed_garbage(payload):
    orient = jpeg_exif_orientation(payload)
    assert orient is None or 1 <= orient <= 8


_coords = st.floats(min_value=-1000, max_value=1000,
                    allow_nan=False, allow_infinity=False)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_coords, _coords), min_size=1, max_size=20))
def test_hull_contains_all_points(pts):
    arr = np.array(pts, dtype=float)
    hull = convex_hull(arr)
    if len(hull) < 3:
        return
    n = len(hull)
    for p in arr:
        for i in range(n):
            a, b = hull[i], hull[(i + 1) % n]
            cross = ((b[0] - a[0]) * (p[1] - a[1])
                     - (b[1] - a[1]) * (p[0] - a[0]))
            assert cross >= -1e-6 * max(1.0, abs(cross)), (p, hull)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_coords, _coords), min_size=1, max_size=16))
def test_min_area_rect_bounds_axis_bbox(pts):
    arr = np.array(pts, dtype=float)
    short, long_ = min_area_rect_size(arr)
    assert short >= -1e-9 and long_ >= short - 1e-9
    # min-area rect area <= axis-aligned bbox area (bbox is a candidate)
    w = arr[:, 0].max() - arr[:, 0].min()
    h = arr[:, 1].max() - arr[:, 1].min()
    assert short * long_ <= w * h + 1e-6
    # and the rect must be able to contain the point set's diameter
    if len(arr) >= 2:
        d2 = max(((a - b) ** 2).sum() for a in arr for b in arr)
        assert math.hypot(short, long_) >= math.sqrt(d2) - 1e-6


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_coords, _coords), min_size=1, max_size=1),
       st.tuples(_coords, _coords), st.tuples(_coords, _coords))
def test_point2line_nonnegative_and_bounded(pts, p1, p2):
    (px, py), = pts
    d = float(point2line_dist(px, py, p1[0], p1[1], p2[0], p2[1]))
    assert d >= 0.0
    # never exceeds the nearer-endpoint distance (its own fallback)
    de = min(math.hypot(px - p1[0], py - p1[1]),
             math.hypot(px - p2[0], py - p2[1]))
    assert d <= de + 1e-6


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_coords, _coords), min_size=0, max_size=12))
def test_min_connect_path_is_permutation(pts):
    order = min_connect_path(pts)
    assert sorted(order) == list(range(len(pts)))
    canon = canonical_path_order(pts)
    assert sorted(canon) == list(range(len(pts)))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_coords, _coords,
                          st.floats(min_value=0.1, max_value=50),
                          st.floats(min_value=0, max_value=1,
                                    allow_nan=False)),
                min_size=0, max_size=12),
       st.floats(min_value=0.1, max_value=2.0))
def test_merge_disks_count_and_bounds(disks, thr):
    out = merge_disks(disks, thr)
    assert 0 <= len(out) <= len(disks)
    if len(disks):
        d = np.asarray(disks, dtype=float)
        # merged disks are means of input subsets -> stay in the hullbox
        assert out[:, 0].min() >= d[:, 0].min() - 1e-9
        assert out[:, 0].max() <= d[:, 0].max() + 1e-9


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.floats(min_value=-10, max_value=10,
                                   allow_nan=False), min_size=3,
                         max_size=3), min_size=1, max_size=10),
       st.floats(min_value=0.05, max_value=1.0))
def test_ctc_topk_select_invariants(scores, vr):
    out = ctc_topk_select(scores, blank=2, valid_ratio=vr, k=2)
    decode_len = min(len(scores), math.ceil(len(scores) * vr))
    prev_t = -1
    for t, idx, vals in out:
        assert 0 <= t < decode_len
        assert t > prev_t  # strictly increasing timesteps
        prev_t = t
        assert idx[0] != 2  # never the blank as top-1 of a selected step
        assert len(idx) == len(vals) <= 2
        assert vals == sorted(vals, reverse=True) or vals[0] >= vals[-1]


def test_c4_demo_plant_literals_match_across_engines():
    """The demo plants must be VERBATIM identical in the rendered
    oracle SQL and the Spark expressions (a round-5 f-string refactor
    silently turned '{ code }' into '{{ code }}' on the SQL side —
    masked because no current output emits the line text)."""
    import inspect

    from my_ocr_spark.plans import textpipe

    sql = textpipe._c4_oracle(plant=True)
    assert "' { code }'" in sql, sql[:400]
    assert "' lorem ipsum'" in sql
    src = inspect.getsource(textpipe._c4_lines)
    assert '" { code }"' in src
    assert '" lorem ipsum"' in src
