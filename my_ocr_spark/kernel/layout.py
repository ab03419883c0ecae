"""PDF/layout branch kernels: XY-cut region segmentation + reading-order
line stitching.

Capability analogs in the reference:
* ``stitch_boxes_into_lines`` / ``is_on_same_line``
  (``mmocr/utils/box_util.py:4-117``): merge word boxes sharing a y-band
  into reading-order lines, splitting on x-gaps > max_x_dist.
* XY-cut recursion echoes the axis-projection region finding of
  ``EastRandomCrop`` (``mmocr/datasets/pipelines/dbnet_transforms.py:205-233``)
  and ``RandomCropFlip.generate_crop_target``'s h/w occupancy arrays
  (``mmocr/datasets/pipelines/transforms.py:930-967``).

Boxes are ``(x0, y0, x1, y1, text)`` tuples in page coordinates
(y grows downward). All comparisons are float but thresholds are fixed and
ties break on box index → deterministic.
"""

from __future__ import annotations


def is_on_same_line(box_a, box_b, min_y_overlap_ratio: float = 0.8) -> bool:
    """True when the two boxes' y-intervals overlap by >= ratio of the
    shorter interval (reference semantics: ``box_util.py:4-39``)."""
    a_y0, a_y1 = box_a[1], box_a[3]
    b_y0, b_y1 = box_b[1], box_b[3]
    lo = max(a_y0, b_y0)
    hi = min(a_y1, b_y1)
    if hi <= lo:
        return False
    overlap = hi - lo
    shorter = min(a_y1 - a_y0, b_y1 - b_y0)
    if shorter <= 0:
        return False
    return overlap / shorter >= min_y_overlap_ratio


def stitch_boxes_into_lines(boxes, max_x_dist: float = 10.0,
                            min_y_overlap_ratio: float = 0.8):
    """Group word boxes into reading-order lines.

    Returns list of merged lines, each
    ``{x0, y0, x1, y1, text, word_ids}``; lines ordered top-to-bottom then
    left-to-right; words inside a line ordered by x0 and joined by spaces.
    Same observable semantics as the reference implementation
    (``box_util.py:42-117``): transitive same-line chaining, then split
    where the x-gap to the rightmost edge so far exceeds ``max_x_dist``.
    """
    import heapq

    n = len(boxes)
    if n == 0:
        return []
    # transitive chaining into line groups: union-find over same-line
    # pairs, enumerated by a y-interval sweep instead of all pairs.
    # is_on_same_line is False whenever the y-intervals don't strictly
    # overlap, so only overlapping-interval pairs can contribute edges —
    # sweeping boxes in y0 order against a y1-keyed active set visits
    # exactly those pairs: O(n log n + overlapping_pairs) vs the old
    # O(n²), same union-find closure (edge order is irrelevant, and
    # linking max-root under min-root keeps each component's root = its
    # min index either way).
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    active: list[tuple[float, int]] = []  # (y1, idx) min-heap
    for i in sorted(range(n), key=lambda i: (boxes[i][1], i)):
        y0 = boxes[i][1]
        while active and active[0][0] <= y0:
            heapq.heappop(active)  # y1 <= y0: no strict overlap, ever again
        for _, j in active:
            if is_on_same_line(boxes[i], boxes[j], min_y_overlap_ratio):
                union(i, j)
        heapq.heappush(active, (boxes[i][3], i))

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)

    lines = []
    for members in groups.values():
        members.sort(key=lambda i: (boxes[i][0], i))
        # split on x-gap > max_x_dist from the rightmost edge seen so far
        segments: list[list[int]] = [[members[0]]]
        right = boxes[members[0]][2]
        for i in members[1:]:
            if boxes[i][0] - right > max_x_dist:
                segments.append([i])
            else:
                segments[-1].append(i)
            right = max(right, boxes[i][2])
        for seg in segments:
            lines.append({
                "x0": min(boxes[i][0] for i in seg),
                "y0": min(boxes[i][1] for i in seg),
                "x1": max(boxes[i][2] for i in seg),
                "y1": max(boxes[i][3] for i in seg),
                "text": " ".join(boxes[i][4] for i in seg),
                "word_ids": seg,
            })
    lines.sort(key=lambda ln: (ln["y0"], ln["x0"]))
    return lines


def xy_cut(boxes, gap: float | None = None,
           x_gap: float = 40.0, y_gap: float = 8.0):
    """Recursive XY-cut: split a page's boxes along whitespace gaps,
    alternating axes; returns box indices in reading order (top-to-bottom
    for horizontal cuts, left-to-right for vertical cuts).

    Gap thresholds are per-axis: an x-axis (vertical) cut needs a column
    gutter (``x_gap``), much wider than inter-word spacing; a y-axis
    (horizontal) cut needs only inter-paragraph spacing (``y_gap``).
    Passing ``gap`` sets both. ``boxes``: (x0, y0, x1, y1, ...) tuples.
    Handles multi-column pages the reference's single-column stitcher
    cannot (SURVEY.md §7.3.5).
    """
    if gap is not None:
        x_gap = y_gap = gap
    idx = list(range(len(boxes)))
    return _xy_cut_rec(boxes, idx, (x_gap, y_gap), axis=1, depth=0)


def _projection_gaps(boxes, idx, axis):
    """Maximal whitespace intervals along axis within the group's extent."""
    lo_k, hi_k = (1, 3) if axis == 1 else (0, 2)
    ivals = sorted((boxes[i][lo_k], boxes[i][hi_k]) for i in idx)
    gaps = []
    cur_end = ivals[0][1]
    for lo, hi in ivals[1:]:
        if lo > cur_end:
            gaps.append((cur_end, lo))
        cur_end = max(cur_end, hi)
    return gaps


def _xy_cut_rec(boxes, idx, gap_xy, axis, depth):
    if len(idx) <= 1 or depth > 24:
        # leaf: reading order = top-to-bottom, left-to-right, stable
        return sorted(idx, key=lambda i: (boxes[i][1], boxes[i][0], i))
    for ax in (axis, 1 - axis):  # try preferred axis, then the other
        gaps = [g for g in _projection_gaps(boxes, idx, ax)
                if g[1] - g[0] >= gap_xy[ax]]
        if gaps:
            # split at every qualifying gap along this axis
            cuts = sorted(g[0] for g in gaps)
            lo_k = 1 if ax == 1 else 0
            buckets: list[list[int]] = [[] for _ in range(len(cuts) + 1)]
            for i in idx:
                pos = sum(1 for c in cuts if boxes[i][lo_k] > c)
                buckets[pos].append(i)
            out = []
            for b in buckets:
                if b:
                    out.extend(_xy_cut_rec(boxes, b, gap_xy, 1 - ax,
                                           depth + 1))
            return out
    return sorted(idx, key=lambda i: (boxes[i][1], boxes[i][0], i))


def page_reading_order_text(boxes, gap: float | None = None,
                            x_gap: float = 40.0, y_gap: float = 8.0,
                            max_x_dist: float = 10.0,
                            min_y_overlap_ratio: float = 0.8) -> str:
    """Full layout pipeline for one page: XY-cut regions → stitch lines
    within each region → newline-joined text (the PDF-branch analog of the
    det→recog→stitch composition, ``mmocr/utils/ocr.py:113-116``)."""
    if not boxes:
        return ""
    if gap is not None:
        x_gap = y_gap = gap
    # stitch lines per leaf region produced by the cut so multi-column
    # pages read column-by-column.
    regions = _xy_regions(boxes, (x_gap, y_gap))
    out_lines = []
    for region in regions:
        rboxes = [boxes[i] for i in region]
        for ln in stitch_boxes_into_lines(rboxes, max_x_dist,
                                          min_y_overlap_ratio):
            out_lines.append(ln["text"])
    return "\n".join(out_lines)


def _xy_regions(boxes, gap_xy):
    """Like xy_cut but returns leaf groups (regions) instead of a flat
    index order."""
    regions: list[list[int]] = []

    def rec(idx, axis, depth):
        if len(idx) <= 1 or depth > 24:
            regions.append(sorted(idx, key=lambda i: (boxes[i][1],
                                                      boxes[i][0], i)))
            return
        for ax in (axis, 1 - axis):
            gaps = [g for g in _projection_gaps(boxes, idx, ax)
                    if g[1] - g[0] >= gap_xy[ax]]
            if gaps:
                cuts = sorted(g[0] for g in gaps)
                lo_k = 1 if ax == 1 else 0
                buckets = [[] for _ in range(len(cuts) + 1)]
                for i in idx:
                    pos = sum(1 for c in cuts if boxes[i][lo_k] > c)
                    buckets[pos].append(i)
                for b in buckets:
                    if b:
                        rec(b, 1 - ax, depth + 1)
                return
        regions.append(sorted(idx, key=lambda i: (boxes[i][1],
                                                  boxes[i][0], i)))

    rec(list(range(len(boxes))), axis=1, depth=0)
    return regions
