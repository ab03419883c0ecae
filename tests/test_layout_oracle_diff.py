"""Randomized differential test: the pure-python layout kernel
(page_reading_order_text) vs the DuckDB XY-cut + stitch oracle
(plans.analytics._pdf_oracle) over random pages drawn from the fixture
grammar — guards the kernel/oracle pairing against future edits to
either side (the oracle re-derives gap windows, recursion order, the
same-line closure and every sort key; any drift shows up here first)."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _synth_pages(rng, n_pages):
    rows = []
    for _ in range(n_pages):
        ok = int(rng.integers(0, 100_000)) * 10  # %10==0 keeps the page
        lns = rng.choice(np.arange(1, 8), size=rng.integers(1, 8),
                         replace=False)
        for ln in lns:
            rows.append((ok, int(ln), int(rng.integers(0, 100_000)),
                         int(rng.integers(0, 10_000))))
    return pd.DataFrame(rows, columns=[
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])


def _kernel_pages(df):
    from my_ocr_spark.kernel.layout import page_reading_order_text

    pages = {}
    for ok, ln, pk, sk in df.itertuples(index=False):
        x0 = (300.0 if ok % 2 == 0 and ln % 2 == 1 else 0.0) \
            + (pk % 5) * 30.0
        y0 = ((ln - 1) // 2) * 20.0 + (sk % 3) * 2.0
        word = "w" + str(pk % 100)
        pages.setdefault(ok, []).append(
            (x0, y0, x0 + 8.0 * len(word), y0 + 12.0, word))
    out = {}
    for ok, bxs in pages.items():
        bxs = sorted(bxs, key=lambda b: (b[1], b[0], b[4]))
        out[ok] = (len(bxs),
                   page_reading_order_text(bxs, x_gap=60.0, y_gap=6.0))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_layout_oracle_matches_kernel_on_random_pages(seed):
    from my_ocr_spark.plans.analytics import _pdf_oracle

    rng = np.random.default_rng(seed)
    li = _synth_pages(rng, 300)
    # duplicate lineitem keys across pages are fine (distinct orderkeys)
    con = duckdb.connect()
    con.register("lineitem", li)
    oracle = {int(r[0]): (int(r[1]), r[2])
              for r in con.sql(_pdf_oracle()).fetchall()}
    kernel = _kernel_pages(li)
    assert set(oracle) == set(kernel)
    mism = {k for k in kernel if oracle[k] != kernel[k]}
    assert not mism, sorted(mism)[:5]


def _clipped_runs_tp(a, b):
    """Pure-python twin of the _charpr_oracle recursion: global maximal
    diagonal runs, best clipped run per segment (len DESC, i, j),
    divide and conquer."""
    ms = {(i + 1, j + 1) for i, ca in enumerate(a)
          for j, cb in enumerate(b) if ca == cb}
    runs = []
    for (i, j) in ms:
        if (i - 1, j - 1) not in ms:
            ln = 0
            while (i + ln, j + ln) in ms:
                ln += 1
            runs.append((i - j, i, ln))
    total = 0
    stack = [(1, len(a) + 1, 1, len(b) + 1)]
    while stack:
        alo, ahi, blo, bhi = stack.pop()
        best = None
        for d, i0, ln in runs:
            ci = max(i0, alo, d + blo)
            ck = min(i0 + ln, ahi, d + bhi) - ci
            if ck > 0:
                key = (-ck, ci, ci - d)
                if best is None or key < best[0]:
                    best = (key, ci, ci - d, ck)
        if best is None:
            continue
        _, bi, bj, bk = best
        total += bk
        if alo < bi and blo < bj:
            stack.append((alo, bi, blo, bj))
        if bi + bk < ahi and bj + bk < bhi:
            stack.append((bi + bk, ahi, bj + bk, bhi))
    return total


@pytest.mark.parametrize("seed", [0, 1])
def test_charpr_oracle_model_matches_difflib(seed):
    """The char-P/R oracle's Ratcliff–Obershelp replay (clipped maximal
    runs + (len, i, j) tie rule) must agree with difflib's
    SequenceMatcher — the kernel's matcher — on random strings,
    including tiny alphabets where matches are dense and tie rules
    matter."""
    import random
    from difflib import SequenceMatcher

    rng = random.Random(seed)
    for _ in range(1500):
        n, m = rng.randint(0, 24), rng.randint(0, 24)
        k = rng.choice([2, 3, 4, 6])
        a = "".join(rng.choice("abcdef"[:k]) for _ in range(n))
        b = "".join(rng.choice("abcdef"[:k]) for _ in range(m))
        sm = SequenceMatcher(None, a, b, autojunk=False)
        want = sum(bl.size for bl in sm.get_matching_blocks())
        assert _clipped_runs_tp(a, b) == want, (a, b)


def test_stitch_sweep_matches_all_pairs_union():
    """Differential: the y-sweep edge enumeration must produce
    byte-identical lines to the O(n²) all-pairs union it replaced, on
    dense random pages (y-ties, zero-height boxes, nested intervals,
    full-page columns included)."""
    import random

    from my_ocr_spark.kernel.layout import (
        is_on_same_line, stitch_boxes_into_lines,
    )

    def stitch_reference(boxes, max_x_dist=10.0, min_y_overlap_ratio=0.8):
        # the pre-sweep kernel, verbatim: all-pairs union + x-gap split
        n = len(boxes)
        if n == 0:
            return []
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(n):
            for j in range(i + 1, n):
                if is_on_same_line(boxes[i], boxes[j],
                                   min_y_overlap_ratio):
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        groups = {}
        for i in range(n):
            groups.setdefault(find(i), []).append(i)
        lines = []
        for members in groups.values():
            members.sort(key=lambda i: (boxes[i][0], i))
            segments = [[members[0]]]
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

    rng = random.Random(7)
    for trial in range(80):
        nb = rng.randrange(0, 70)
        boxes = []
        for b in range(nb):
            x0 = rng.randrange(0, 200)
            y0 = rng.choice([0, 4, 8, 12, 16]) + rng.random() * 2
            h = rng.choice([0.0, 1.0, 3.0, 6.0, 20.0])
            boxes.append((x0, y0, x0 + rng.randrange(5, 40), y0 + h,
                          f"w{b}"))
        assert stitch_boxes_into_lines(boxes) == stitch_reference(boxes), \
            trial
