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
