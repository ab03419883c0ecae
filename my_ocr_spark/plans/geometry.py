"""Geometric operators (SURVEY.md §2.3/2.5/2.7/2.8): NMS, polygon area,
global hmean accumulation, worst-first ranklist, word-box line stitching —
boxes synthesized deterministically from the relational tables so both
engines compute from identical inputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F, types as T

from my_ocr_spark.plans.registry import query, t
from my_ocr_spark.session import spread_small_scan
from my_ocr_spark.plans.relational import _GT_SQL, _PRED_SQL, _gt_pred


_BOXES_SQL = """
    SELECT l_orderkey * 10 + l_linenumber AS box_id,
           l_orderkey // 10 AS img,
           CAST(l_partkey % 1000 AS DOUBLE) AS s,
           CAST(l_partkey % 1000 + 40 + l_suppkey % 89 AS DOUBLE) AS e,
           round(l_discount * 10, 2) AS score
    FROM lineitem
"""


def _boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, pred = _gt_pred(spark, sf_dir)
    return pred.select(F.col("pred_id").alias("box_id"), "img", "s", "e",
                       "score")


@query(
    "nms_suppress",
    oracle=f"""
    WITH b AS ({_BOXES_SQL})
    SELECT a.box_id, a.img, a.score FROM b a
    WHERE NOT EXISTS (
        SELECT 1 FROM b h
        WHERE h.img = a.img AND h.box_id <> a.box_id
          AND (h.score > a.score
               OR (h.score = a.score AND h.box_id < a.box_id))
          AND least(a.e, h.e) > greatest(a.s, h.s)
          AND greatest(0.0, least(a.e, h.e) - greatest(a.s, h.s))
              / ((a.e - a.s) + (h.e - h.s)
                 - greatest(0.0, least(a.e, h.e) - greatest(a.s, h.s)))
              > CAST(0.5 AS DOUBLE)
    )
    """,
)
def nms_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppression-by-any-higher NMS (the SQL-expressible deterministic
    variant of poly_nms, wrapper.py:477-498; exact greedy semantics in
    poly_nms_greedy below): anti-join each box against higher-scored
    overlapping boxes in the same image. Equi-join on img bounds the
    quadratic term to per-image box counts — the max_candidates skew cap."""
    b = _boxes(spark, sf_dir)
    h = b.select(F.col("box_id").alias("h_id"), F.col("img").alias("h_img"),
                 F.col("s").alias("h_s"), F.col("e").alias("h_e"),
                 F.col("score").alias("h_score"))
    inter = F.greatest(F.lit(0.0),
                       F.least("e", "h_e") - F.greatest("s", "h_s"))
    union = (F.col("e") - F.col("s")) + (F.col("h_e") - F.col("h_s")) - inter
    cond = ((F.col("h_img") == F.col("img"))
            & (F.col("h_id") != F.col("box_id"))
            & ((F.col("h_score") > F.col("score"))
               | ((F.col("h_score") == F.col("score"))
                  & (F.col("h_id") < F.col("box_id"))))
            & (F.least("e", "h_e") > F.greatest("s", "h_s"))
            & (inter / union > 0.5))
    return (b.join(h, cond, "left_anti")
             .select("box_id", "img", "score"))


_NMS_OUT = T.StructType([
    T.StructField("img", T.LongType(), False),
    T.StructField("box_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])


_NMS_GREEDY_ORACLE = f"""
    WITH RECURSIVE boxes AS MATERIALIZED (
        -- materialized: the greedy recursion below re-evaluates its
        -- inputs per iteration when inlined (rank-count iterations x
        -- a full window scan — measured 171 s at sf0.1)
        SELECT box_id, img, s, e, score,
               row_number() OVER (PARTITION BY img
                                  ORDER BY score DESC, box_id, s, e)
                   AS rnk
        FROM ({_BOXES_SQL})
    ),
    sizes AS MATERIALIZED (
        SELECT img, max(rnk) AS mx FROM boxes GROUP BY img),
    greedy(img, r, kept) AS (
        -- kept tracks per-img RANKS (box_id is not unique in the
        -- synthetic lineitem; rnk is unique by construction)
        SELECT img, 0, []::BIGINT[] FROM sizes
        UNION ALL
        SELECT g.img, g.r + 1,
            CASE WHEN NOT EXISTS (
                SELECT 1 FROM boxes k
                WHERE k.img = g.img AND list_contains(g.kept, k.rnk)
                  AND greatest(0.0, least(k.e, b.e) - greatest(k.s, b.s))
                      / ((b.e - b.s) + (k.e - k.s)
                         - greatest(0.0, least(k.e, b.e)
                                    - greatest(k.s, b.s)))
                      > CAST(0.5 AS DOUBLE)
            ) THEN list_append(g.kept, b.rnk) ELSE g.kept END
        FROM greedy g
        JOIN boxes b ON b.img = g.img AND b.rnk = g.r + 1
    )
    SELECT b.img, b.box_id, b.score
    FROM greedy g
    JOIN sizes n ON n.img = g.img AND g.r = n.mx
    JOIN boxes b ON b.img = g.img AND list_contains(g.kept, b.rnk)
"""


@query("poly_nms_greedy", oracle=_NMS_GREEDY_ORACLE)
def poly_nms_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact greedy NMS (wrapper.py:477-498 semantics: take best-scored,
    suppress overlapping, repeat) per image via applyInPandas — bounded
    per-image work, images processed in parallel. Stable tie-break by
    box_id mirrors the reference's stable sort (wrapper.py:480).
    Oracle: the greedy recurrence itself, as a per-image recursive CTE
    that advances one rank per iteration carrying the kept set — exact,
    not rows-only (sequential != nondeterministic)."""
    b = _boxes(spark, sf_dir)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # TOTAL order: box_id alone is not unique in the synthetic data,
        # and ties with different geometry would make the greedy result
        # depend on arrival order — (s, e) completes the key. Bucket
        # frames hold many images; the leading img key restores the
        # original per-image frame order (stable mergesort).
        pdf = pdf.sort_values(["img", "score", "box_id", "s", "e"],
                              ascending=[True, False, True, True, True],
                              kind="mergesort")
        img = pdf["img"].to_numpy(np.int64)
        s = pdf["s"].to_numpy(np.float64)
        e = pdf["e"].to_numpy(np.float64)
        bid = pdf["box_id"].to_numpy(np.int64)
        sc = pdf["score"].to_numpy(np.float64)
        starts = np.unique(img, return_index=True)[1]
        bounds = np.append(starts, len(img))
        keep = np.zeros(len(img), dtype=bool)
        ks = np.empty(len(img))
        ke = np.empty(len(img))
        with np.errstate(divide="ignore", invalid="ignore"):
            for gi in range(len(starts)):
                lo, hi = bounds[gi], bounds[gi + 1]
                nk = 0  # kept set restarts per image
                for i in range(lo, hi):
                    if nk:
                        # same float64 op order as the scalar loop this
                        # replaces: inter, union, then the ratio compare
                        inter = np.minimum(e[i], ke[:nk]) \
                            - np.maximum(s[i], ks[:nk])
                        np.maximum(inter, 0.0, out=inter)
                        union = (e[i] - s[i]) + (ke[:nk] - ks[:nk]) - inter
                        if bool(np.any((union > 0)
                                       & (inter / union > 0.5))):
                            continue
                    ks[nk] = s[i]
                    ke[nk] = e[i]
                    nk += 1
                    keep[i] = True
        return pd.DataFrame({"img": img[keep], "box_id": bid[keep],
                             "score": sc[keep]})

    # bucket many small image groups per Python call (CLAUDE.md
    # invariant 5: per-group launcher overhead dominated at 150k
    # images/sf1.0 — 25.7 s; bucketed: per-image work unchanged)
    from my_ocr_spark.session import bucket_count
    B = bucket_count(spark)
    return (b.withColumn("_b", F.pmod("img", F.lit(B)))
             .groupBy("_b").applyInPandas(run, schema=_NMS_OUT))


@query(
    "polygon_area_green",
    oracle="""
    WITH poly AS (
        SELECT o_orderkey AS poly_id,
               [CAST(o_orderkey % 100 AS DOUBLE),
                CAST(o_orderkey % 71 AS DOUBLE),
                CAST(o_orderkey % 100 + 50 + o_orderkey % 13 AS DOUBLE),
                CAST(o_orderkey % 71 AS DOUBLE),
                CAST(o_orderkey % 100 + 50 + o_orderkey % 13 AS DOUBLE),
                CAST(o_orderkey % 71 + 30 + o_orderkey % 7 AS DOUBLE),
                CAST(o_orderkey % 100 AS DOUBLE),
                CAST(o_orderkey % 71 + 30 + o_orderkey % 7 AS DOUBLE)]
               AS pts
        FROM orders
    )
    SELECT poly_id,
           abs(list_aggregate(list_transform(generate_series(1, 4), i ->
               pts[2*i - 1] * pts[(2*i + 2 - CASE WHEN i = 4 THEN 8
                                              ELSE 0 END)]
               - pts[(2*i + 1 - CASE WHEN i = 4 THEN 8 ELSE 0 END)]
                 * pts[2*i]), 'sum')) / 2 AS area
    FROM poly
    """,
)
def polygon_area_green(spark: SparkSession, sf_dir: str) -> DataFrame:
    """polygon_area via Green's theorem (base_textdet_targets.py:54-70),
    as an explicit shoelace fold over a flat [x1,y1,...,x4,y4] array —
    the reference's polygon representation (SURVEY.md §1.2) on array
    columns, pure JVM expressions."""
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    x0 = (k % 100).cast("double")
    y0 = (k % 71).cast("double")
    x1 = (k % 100 + 50 + k % 13).cast("double")
    y1 = (k % 71 + 30 + k % 7).cast("double")
    pts = F.array(x0, y0, x1, y0, x1, y1, x0, y1)
    poly = o.select(k.alias("poly_id"), pts.alias("pts"))
    # shoelace: sum over i of x_i*y_{i+1} - x_{i+1}*y_i (indices cyclic)
    area = F.abs(F.aggregate(
        F.sequence(F.lit(1), F.lit(4)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at("pts", (i * 2 - 1).cast("int"))
        * F.element_at("pts",
                       F.when(i == 4, F.lit(2)).otherwise(i * 2 + 2)
                       .cast("int"))
        - F.element_at("pts",
                       F.when(i == 4, F.lit(1)).otherwise(i * 2 + 1)
                       .cast("int"))
        * F.element_at("pts", (i * 2).cast("int")),
    )) / 2
    return poly.select("poly_id", area.alias("area"))


@query(
    "global_hmean",
    oracle=f"""
    WITH gt AS ({_GT_SQL}), pred AS ({_PRED_SQL}),
    pairs AS (
        SELECT gt.gt_id, pred.pred_id,
               greatest(0.0, least(gt.e, pred.e) - greatest(gt.s, pred.s))
                 / ((gt.e - gt.s) + (pred.e - pred.s)
                    - greatest(0.0, least(gt.e, pred.e)
                               - greatest(gt.s, pred.s))) AS iou
        FROM gt JOIN pred ON gt.img = pred.img
        WHERE least(gt.e, pred.e) > greatest(gt.s, pred.s)
    ),
    matched AS (
        SELECT gt_id FROM (
            SELECT gt_id, row_number() OVER
                (PARTITION BY gt_id ORDER BY iou DESC, pred_id) AS rn
            FROM pairs WHERE iou > 0.3) WHERE rn = 1
    )
    SELECT (SELECT count(*) FROM matched) AS hits,
           (SELECT count(*) FROM gt) AS n_gt,
           (SELECT count(*) FROM pred) AS n_pred,
           CAST((SELECT count(*) FROM matched) AS DOUBLE)
               / (SELECT count(*) FROM pred) AS precision_v,
           CAST((SELECT count(*) FROM matched) AS DOUBLE)
               / (SELECT count(*) FROM gt) AS recall_v
    """,
)
def global_hmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eval_hmean dataset-level accumulation (hmean.py:76-149): the
    partial (per-image) counts fold into ONE global row — the map-side
    partial + tiny final shuffle shape that scales to any corpus.

    One lazy plan, zero driver-side actions: hits/n_gt/n_pred are three
    1-row aggregates cross-joined (each side broadcasts trivially), and
    precision/recall are guarded-division columns (NULL on empty input
    instead of ZeroDivisionError)."""
    from my_ocr_spark.plans.relational import iou_theta_join_match

    gt, pred = _gt_pred(spark, sf_dir)
    hits = (iou_theta_join_match(spark, sf_dir)
            .agg(F.count("*").alias("hits")))
    n_gt = gt.agg(F.count("*").alias("n_gt"))
    n_pred = pred.agg(F.count("*").alias("n_pred"))
    one = hits.crossJoin(n_gt).crossJoin(n_pred)
    hits_d = F.col("hits").cast("double")
    return one.select(
        "hits", "n_gt", "n_pred",
        (hits_d / F.when(F.col("n_pred") != 0, F.col("n_pred")))
        .alias("precision_v"),
        (hits_d / F.when(F.col("n_gt") != 0, F.col("n_gt")))
        .alias("recall_v"))


@query(
    "hmean_ranklist",
    oracle=f"""
    WITH gt AS ({_GT_SQL}), pred AS ({_PRED_SQL}),
    per_img AS (
        SELECT g.img, count(*) AS n_gt
        FROM gt g GROUP BY g.img
    )
    SELECT img, n_gt FROM per_img ORDER BY n_gt ASC, img ASC LIMIT 10
    """,
)
def hmean_ranklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """output_ranklist worst-first debugging sort (hmean.py:13-40):
    global orderBy with deterministic tie-break + limit (top-k via
    TakeOrderedAndProject — no full sort materialization)."""
    gt, _ = _gt_pred(spark, sf_dir)
    per = gt.groupBy("img").agg(F.count("*").alias("n_gt"))
    return per.orderBy(F.asc("n_gt"), F.asc("img")).limit(10)


_QUAD_GT_SQL = """
    SELECT o_orderkey AS gt_id,
           o_orderkey // 10 AS img,
           CAST(o_orderkey % 97 AS DOUBLE) AS x0,
           CAST(o_orderkey % 83 AS DOUBLE) AS y0,
           CAST(o_orderkey % 97 + 15 + o_orderkey % 23 AS DOUBLE) AS x1,
           CAST(o_orderkey % 83 + 12 + o_orderkey % 19 AS DOUBLE) AS y1
    FROM orders
"""
_QUAD_PRED_SQL = """
    SELECT l_orderkey * 10 + l_linenumber AS pred_id,
           l_orderkey // 10 AS img,
           CAST(l_partkey % 97 AS DOUBLE) AS x0,
           CAST(l_suppkey % 83 AS DOUBLE) AS y0,
           CAST(l_partkey % 97 + 14 + l_partkey % 25 AS DOUBLE) AS x1,
           CAST(l_suppkey % 83 + 11 + l_linenumber * 4 AS DOUBLE) AS y1
    FROM lineitem
"""


def _quad_tables(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    gt = o.select(
        k.alias("gt_id"), F.expr("o_orderkey div 10").alias("img"),
        (k % 97).cast("double").alias("x0"),
        (k % 83).cast("double").alias("y0"),
        (k % 97 + 15 + k % 23).cast("double").alias("x1"),
        (k % 83 + 12 + k % 19).cast("double").alias("y1"))
    li = t(spark, sf_dir, "lineitem")
    pred = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pred_id"),
        F.expr("l_orderkey div 10").alias("img"),
        (F.col("l_partkey") % 97).cast("double").alias("x0"),
        (F.col("l_suppkey") % 83).cast("double").alias("y0"),
        (F.col("l_partkey") % 97 + 14 + F.col("l_partkey") % 25)
        .cast("double").alias("x1"),
        (F.col("l_suppkey") % 83 + 11 + F.col("l_linenumber") * 4)
        .cast("double").alias("y1"))
    return gt, pred


_IOU2D_OUT = T.StructType([
    T.StructField("gt_id", T.LongType(), False),
    T.StructField("pred_id", T.LongType(), False),
    T.StructField("inter", T.LongType(), False),
    T.StructField("iou", T.DoubleType(), False),
])


@query(
    "poly_iou_match_2d",
    oracle=f"""
    WITH gt AS ({_QUAD_GT_SQL}), pred AS ({_QUAD_PRED_SQL}),
    pairs AS (
        SELECT g.gt_id, p.pred_id,
               CAST(greatest(CAST(0 AS DOUBLE),
                             least(g.x1, p.x1) - greatest(g.x0, p.x0))
                    * greatest(CAST(0 AS DOUBLE),
                               least(g.y1, p.y1) - greatest(g.y0, p.y0))
                    AS BIGINT) AS inter,
               (g.x1 - g.x0) * (g.y1 - g.y0)
                   + (p.x1 - p.x0) * (p.y1 - p.y0) AS sum_areas
        FROM gt g JOIN pred p ON g.img = p.img
        WHERE least(g.x1, p.x1) > greatest(g.x0, p.x0)
          AND least(g.y1, p.y1) > greatest(g.y0, p.y0)
    )
    SELECT gt_id, pred_id, inter,
           CAST(inter AS DOUBLE) / (sum_areas - inter) AS iou
    FROM pairs
    WHERE CAST(inter AS DOUBLE) / (sum_areas - inter) > CAST(0.3 AS DOUBLE)
    """,
)
def poly_iou_match_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE 2-D polygon IoU matching (poly_intersection/poly_union/
    poly_iou, ``mmocr/core/evaluation/utils.py:138-210``) — upgrades the
    engine's IoU surface from 1-D intervals to real geometry via the
    pure-numpy Sutherland–Hodgman kernel (kernel/polyclip.py).

    Scale shape: equi-join on img bounds the pair count; a CHEAP JVM
    bbox-overlap predicate prunes pairs before the Arrow-batched clip
    kernel sees them (expensive geometry only on plausible pairs).
    The synthetic img key is orderkey // 10 so PER-IMAGE density stays
    constant as SF grows — the old % 2000 key packed 75x300 boxes per
    image at sf0.1 (45M raw pairs, quadratic in SF; hung the sweep),
    which no real page exhibits: images must scale with data, box
    counts per image must not (the round-1 join-key lesson).
    Determinism: integer-valued coords make the clipped area an exact
    integer, so `inter` is rounded to BIGINT and the IoU division is
    bit-identical to the closed-form DuckDB oracle — no float rounding
    anywhere."""
    from my_ocr_spark.kernel import polyclip as pc
    from my_ocr_spark.session import spread_small_scan

    gt, pred = _quad_tables(spark, sf_dir)
    # spread the probe side: the gt side broadcasts, so the join AND
    # the clip stage below it execute in the probe scan's own stage —
    # a 1-2-split fixture scan ran the 1.3M-pair Sutherland-Hodgman
    # kernel on 2 of 32 cores (measured 7.6 s; ~1 s after; the kernel
    # itself does 0.21M pairs/s/core). Cost-modeled no-op at corpus
    # scale (invariant 5).
    g = gt.alias("g")
    p = spread_small_scan(pred).alias("p")
    cond = ((F.col("g.img") == F.col("p.img"))
            & (F.least("g.x1", "p.x1") > F.greatest("g.x0", "p.x0"))
            & (F.least("g.y1", "p.y1") > F.greatest("g.y0", "p.y0")))
    pairs = g.join(p, cond).select(
        "g.gt_id", "p.pred_id",
        F.col("g.x0").alias("gx0"), F.col("g.y0").alias("gy0"),
        F.col("g.x1").alias("gx1"), F.col("g.y1").alias("gy1"),
        F.col("p.x0").alias("px0"), F.col("p.y0").alias("py0"),
        F.col("p.x1").alias("px1"), F.col("p.y1").alias("py1"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batch Sutherland–Hodgman (kernel/polyclip.quad_intersection_
        # areas): the old per-row itertuples + scalar clip was the
        # per-row-Python anti-pattern and dominated the query at
        # realistic pair densities (differential-tested equal)
        for pdf in batches:
            g = np.stack([pdf[c].to_numpy() for c in
                          ("gx0", "gy0", "gx1", "gy1")], axis=1)
            p = np.stack([pdf[c].to_numpy() for c in
                          ("px0", "py0", "px1", "py1")], axis=1)
            quads_g = np.stack([g[:, [0, 1]], g[:, [2, 1]],
                                g[:, [2, 3]], g[:, [0, 3]]], axis=1)
            quads_p = np.stack([p[:, [0, 1]], p[:, [2, 1]],
                                p[:, [2, 3]], p[:, [0, 3]]], axis=1)
            areas = pc.quad_intersection_areas(quads_g, quads_p)
            inter = np.floor(areas + 0.5).astype(np.int64)
            sum_areas = ((g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
                         + (p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1]))
            yield pd.DataFrame({
                "gt_id": pdf["gt_id"], "pred_id": pdf["pred_id"],
                "inter": pd.Series(inter, dtype="int64"),
                "iou": pd.Series(inter / (sum_areas - inter),
                                 dtype="float64")})

    out = pairs.mapInPandas(run, schema=_IOU2D_OUT)
    return out.filter(F.col("iou") > 0.3)


@query(
    "polygon_shrink_inset",
    oracle="""
    WITH poly AS (
        SELECT o_orderkey AS poly_id,
               CAST(10 + o_orderkey % 60 AS DOUBLE) AS w,
               CAST(8 + o_orderkey % 40 AS DOUBLE) AS h
        FROM orders
    ),
    calc AS (
        SELECT poly_id, w, h,
               w * h * (CAST(1 AS DOUBLE)
                        - CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE))
                 / (2 * (w + h) + CAST(0.001 AS DOUBLE)) AS inset_d
        FROM poly
    )
    SELECT poly_id, inset_d,
           round((w - 2 * inset_d) * (h - 2 * inset_d), 4) AS inset_area
    FROM calc
    """,
)
def polygon_shrink_inset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBNet kernel shrink (base_textdet_targets.py:110-116): offset
    distance d = area·(1−r²)/(peri+0.001), inward vertex-normal inset
    (kernel/polyclip.py — the pyclipper-free exact form for convex
    polys). Oracle: closed form on rectangles (inset by d on each side).
    `inset_d` is bit-identical across engines (same IEEE op sequence on
    integer-valued inputs → emitted raw); the inset AREA goes through
    the generic offset kernel, so it is rounded to 4dp on both sides."""
    from my_ocr_spark.kernel import polyclip as pc

    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    src = o.select(
        k.alias("poly_id"),
        (k % 60 + 10).cast("double").alias("w"),
        (k % 40 + 8).cast("double").alias("h"))

    out_schema = T.StructType([
        T.StructField("poly_id", T.LongType(), False),
        T.StructField("inset_d", T.DoubleType(), False),
        T.StructField("inset_area", T.DoubleType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the kernel runs once per DISTINCT (w, h) — 50x40 classes at
        # most — and the results broadcast back over the batch:
        # dictionary-encoding repeated inputs before an expensive
        # transform (the old per-row loop re-ran the full offset kernel
        # 150k times at sf0.1 for 120 distinct inputs — 44 s of pure
        # recomputation)
        memo: dict[tuple[float, float], tuple[float, float]] = {}

        def solve(w: float, h: float) -> tuple[float, float]:
            key = (w, h)
            if key not in memo:
                rect = [0.0, 0.0, w, 0.0, w, h, 0.0, h]
                area = pc.polygon_area(rect)
                peri = pc.polygon_perimeter(rect)
                d = area * (1.0 - 0.4 * 0.4) / (peri + 0.001)
                inset = pc.shrink_polygon(rect, 0.4)
                memo[key] = (
                    d, pc.polygon_area(inset) if len(inset) else 0.0)
            return memo[key]

        for pdf in batches:
            key = pd.Series(list(zip(pdf["w"], pdf["h"])),
                            index=pdf.index)
            table = {t_: solve(*t_) for t_ in set(key)}
            ds = key.map(lambda t_: table[t_][0])
            areas = key.map(lambda t_: table[t_][1])
            yield pd.DataFrame({
                "poly_id": pdf["poly_id"],
                "inset_d": pd.Series(ds, dtype="float64"),
                "inset_area": pd.Series(areas, dtype="float64")})

    out = src.mapInPandas(run, schema=out_schema)
    return out.select("poly_id", "inset_d",
                      F.round("inset_area", 4).alias("inset_area"))


@query(
    "min_connect_path_order",
    oracle="""
    WITH pts AS (
        SELECT DISTINCT l_orderkey % 1000 AS img,
               CAST(l_partkey % 500 AS BIGINT) AS x
        FROM lineitem
    )
    SELECT img, CAST(row_number() OVER (PARTITION BY img ORDER BY x)
                AS BIGINT) AS seq, x AS pid
    FROM pts
    """,
)
def min_connect_path_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_connect_path (wrapper.py:690-741): greedy two-ended nearest
    chaining of component centers into a traversal order, per image in
    applyInPandas (kernel/pathops.py). Oracle trick: on COLLINEAR points
    the greedy path provably visits in coordinate order, so the
    canonical traversal equals a row_number over x — an exact SQL check
    of a sequential graph algorithm. Generic 2-D behavior is
    golden-tested in tests/test_pathops.py."""
    from my_ocr_spark.kernel.pathops import canonical_path_order

    li = t(spark, sf_dir, "lineitem")
    pts = li.select(
        (F.col("l_orderkey") % 1000).alias("img"),
        (F.col("l_partkey") % 500).cast("bigint").alias("x")).distinct()

    out_schema = T.StructType([
        T.StructField("img", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("pid", T.LongType(), False),
    ])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {"img": [], "seq": [], "pid": []}
        for img, g in pdf.groupby("img", sort=False):
            xs = g["x"].to_numpy()
            pts2 = [[float(x), 0.0] for x in xs]
            order = canonical_path_order(pts2)
            out["img"].extend([img] * len(order))
            out["seq"].extend(range(1, len(order) + 1))
            out["pid"].extend(int(xs[i]) for i in order)
        return pd.DataFrame(out, dtype="int64") if out["img"] else \
            pd.DataFrame({c: pd.Series(dtype="int64") for c in out})

    bucketed = pts.withColumn("_b", F.pmod(F.col("img"), F.lit(128)))
    return bucketed.groupBy("_b").applyInPandas(
        lambda pdf: run(pdf), schema=out_schema)


_DISKS_OUT = T.StructType([
    T.StructField("img", T.LongType(), False),
    T.StructField("mx", T.DoubleType(), False),
    T.StructField("my", T.DoubleType(), False),
    T.StructField("mr", T.DoubleType(), False),
    T.StructField("mscore", T.DoubleType(), False),
])


_MERGE_DISKS_ORACLE = """
    WITH RECURSIVE disks AS (
        SELECT l_orderkey // 10 AS img,
               CAST(l_partkey % 300 AS DOUBLE) AS x,
               CAST(l_suppkey % 200 AS DOUBLE) AS y,
               CAST(l_linenumber * 3 + 5 AS DOUBLE) AS r,
               round(l_discount * 10, 2) AS score
        FROM lineitem
    ),
    ranked AS (
        -- input order (x, y, r, score) asc, then greedy order
        -- (score desc, input index asc) == one total rank
        SELECT img, x, y, r, score,
               row_number() OVER (PARTITION BY img
                                  ORDER BY score DESC, x, y, r) AS rnk
        FROM disks
    ),
    packed AS (
        -- rnk-indexed coordinate arrays per image: the recursion and
        -- its lambdas index these directly (DuckDB forbids subqueries
        -- inside lambda expressions)
        SELECT img,
               array_agg(x ORDER BY rnk) AS xs,
               array_agg(y ORDER BY rnk) AS ys,
               array_agg(r ORDER BY rnk) AS rs,
               array_agg(score ORDER BY rnk) AS ss,
               max(rnk) AS mx
        FROM ranked GROUP BY img
    ),
    greedy(img, xs, ys, rs, ss, remaining, head, absorbed) AS (
        SELECT img, xs, ys, rs, ss,
               list_transform(generate_series(1, mx), i -> i),
               CAST(NULL AS BIGINT), []::BIGINT[]
        FROM packed
        UNION ALL
        SELECT img, xs, ys, rs, ss,
               list_filter(remaining[2:], j ->
                   NOT (sqrt((xs[j] - xs[remaining[1]]) ** 2
                             + (ys[j] - ys[remaining[1]]) ** 2)
                        <= (rs[remaining[1]] + rs[j])
                           * CAST(0.5 AS DOUBLE))),
               remaining[1],
               list_filter(remaining[2:], j ->
                   sqrt((xs[j] - xs[remaining[1]]) ** 2
                        + (ys[j] - ys[remaining[1]]) ** 2)
                   <= (rs[remaining[1]] + rs[j]) * CAST(0.5 AS DOUBLE))
        FROM greedy WHERE len(remaining) > 0
    ),
    agg AS (
        SELECT img, len(list_prepend(head, absorbed)) AS n,
               list_aggregate(list_transform(list_prepend(head, absorbed),
                   j -> xs[j]), 'sum') AS sx,
               list_aggregate(list_transform(list_prepend(head, absorbed),
                   j -> ys[j]), 'sum') AS sy,
               list_aggregate(list_transform(list_prepend(head, absorbed),
                   j -> rs[j]), 'sum') AS sr,
               list_aggregate(list_transform(list_prepend(head, absorbed),
                   j -> ss[j]), 'sum') AS sum_s
        FROM greedy WHERE head IS NOT NULL
    )
    SELECT img,
           floor(sx / n * 10000 + 0.5) / 10000 AS mx,
           floor(sy / n * 10000 + 0.5) / 10000 AS my,
           floor(sr / n * 10000 + 0.5) / 10000 AS mr,
           floor(sum_s / n * 10000 + 0.5) / 10000 AS mscore
    FROM agg
"""


@query("merge_disks_greedy", oracle=_MERGE_DISKS_ORACLE)
def merge_disks_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextSnake merge_disks (wrapper.py:275-303): greedy score-ordered
    merge of overlapping center disks, merged disk = group mean — per
    image in applyInPandas over the kernel (exact goldens in
    tests/test_pathops.py). Stable score-tie break by input index
    (documented divergence from the reference's unstable argsort).
    Oracle: the greedy recurrence as a recursive CTE carrying the
    remaining-rank list; group means summed in the same order and
    rounded identically (floor-based — Python round() is banker's and
    diverges from DuckDB at exact dyadic halves like k/32)."""
    from my_ocr_spark.kernel.pathops import merge_disks

    li = t(spark, sf_dir, "lineitem")
    # img = orderkey // 10: ~10 disks per image at every SF (TextSnake
    # images carry tens of center disks, never thousands). The old
    # % 1000 key grew per-image disk counts linearly with SF, making the
    # per-image greedy quadratic in SF and the oracle recursion carry
    # ~6000-element coordinate arrays through ~100 levels at sf1.0
    # (the synthtext OOM class; CLAUDE.md invariant 6).
    disks = li.select(
        F.expr("l_orderkey div 10").alias("img"),
        (F.col("l_partkey") % 300).cast("double").alias("x"),
        (F.col("l_suppkey") % 200).cast("double").alias("y"),
        (F.col("l_linenumber") * 3 + 5).cast("double").alias("r"),
        F.round(F.col("l_discount") * 10, 2).alias("score"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {"img": [], "mx": [], "my": [], "mr": [], "mscore": []}
        for img, g in pdf.groupby("img", sort=False):
            arr = g[["x", "y", "r", "score"]].to_numpy()
            # deterministic input order for the tie-break: sort rows
            arr = arr[np.lexsort((arr[:, 3], arr[:, 2], arr[:, 1],
                                  arr[:, 0]))]
            for mx, my, mr, ms in merge_disks(arr, 0.5):
                out["img"].append(int(img))
                # floor-based 4dp rounding, NOT round(): Python rounds
                # half-to-even, DuckDB half-away — floor(x*1e4+0.5) is
                # the same function on the same doubles in both engines
                out["mx"].append(np.floor(mx * 10000 + 0.5) / 10000)
                out["my"].append(np.floor(my * 10000 + 0.5) / 10000)
                out["mr"].append(np.floor(mr * 10000 + 0.5) / 10000)
                out["mscore"].append(np.floor(ms * 10000 + 0.5) / 10000)
        return pd.DataFrame(out) if out["img"] else pd.DataFrame({
            "img": pd.Series(dtype="int64"),
            "mx": pd.Series(dtype="float64"),
            "my": pd.Series(dtype="float64"),
            "mr": pd.Series(dtype="float64"),
            "mscore": pd.Series(dtype="float64")})

    bucketed = disks.withColumn("_b", F.pmod(F.col("img"), F.lit(128)))
    return bucketed.groupBy("_b").applyInPandas(
        lambda pdf: run(pdf), schema=_DISKS_OUT)


@query(
    "stitch_words_gap_split",
    oracle="""
    WITH boxes AS (
        SELECT l_orderkey AS img, l_linenumber AS line_no,
               l_partkey AS pk, l_suppkey AS sk,
               CAST((l_partkey % 50) * 12 AS DOUBLE) AS x0,
               CAST((l_partkey % 50) * 12 + 8 + l_suppkey % 7 AS DOUBLE)
                   AS x1
        FROM lineitem
    ),
    flagged AS (
        SELECT img, line_no, x0, x1, pk, sk,
               CASE WHEN x0 - max(x1) OVER
                    (PARTITION BY img, line_no ORDER BY x0, x1, pk, sk
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 15
                    OR max(x1) OVER
                    (PARTITION BY img, line_no ORDER BY x0, x1, pk, sk
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
               THEN 1 ELSE 0 END AS new_seg
        FROM boxes
    ),
    segs AS (
        SELECT img, line_no,
               sum(new_seg) OVER (PARTITION BY img, line_no
                                  ORDER BY x0, x1, pk, sk
                                  ROWS UNBOUNDED PRECEDING) AS seg
        FROM flagged
    )
    SELECT img, line_no, CAST(seg AS BIGINT) AS seg, count(*) AS n_words
    FROM segs GROUP BY img, line_no, seg
    """,
)
def stitch_words_gap_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stitch_boxes_into_lines gap splitting (box_util.py:65-98) in pure
    window algebra: running max(x1) over x-order, gap>max_x_dist opens a
    segment, running sum assigns segment ids — the same sessionization
    skeleton as sessionize_events, on spatial data.

    Both window passes order by a TOTAL key — (x0, x1, partkey,
    suppkey), unique per box at both scales: the flag pass and the
    cumsum pass re-sort independently in the oracle, and tied (x0, x1)
    rows landing in different orders per pass corrupted segment ids
    nondeterministically (found by the sf0.1 sweep; the round-3
    pdf_reading_order lesson recurring)."""
    li = t(spark, sf_dir, "lineitem")
    boxes = li.select(
        F.col("l_orderkey").alias("img"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"),
        ((F.col("l_partkey") % 50) * 12).cast("double").alias("x0"),
        ((F.col("l_partkey") % 50) * 12 + 8 + F.col("l_suppkey") % 7)
        .cast("double").alias("x1"),
    )
    w = Window.partitionBy("img", "line_no").orderBy("x0", "x1",
                                                     "pk", "sk")
    prev_max = F.max("x1").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_seg = F.when(prev_max.isNull()
                     | (F.col("x0") - prev_max > 15), 1).otherwise(0)
    seg = F.sum(new_seg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (boxes.withColumn("seg", seg.cast("bigint"))
                 .groupBy("img", "line_no", "seg")
                 .agg(F.count("*").alias("n_words")))


_P2L_EPS = "1.1920928955078125e-07"  # float32 eps, the reference's guard

_P2L_OUT = T.StructType([
    T.StructField("pid", T.LongType(), False),
    T.StructField("dist", T.DoubleType(), False),
])


@query(
    "point2line_distance_field",
    oracle=f"""
    WITH pts AS (
        SELECT l_orderkey * 10 + l_linenumber AS pid,
               CAST(l_partkey % 200 AS DOUBLE) AS px,
               CAST(l_suppkey % 200 AS DOUBLE) AS py,
               CAST(l_orderkey % 100 AS DOUBLE) AS x1,
               CAST((l_orderkey * 3) % 100 AS DOUBLE) AS y1,
               CAST(l_orderkey % 100 + 1 + l_orderkey % 50 AS DOUBLE) AS x2,
               CAST((l_orderkey * 7) % 100 AS DOUBLE) AS y2
        FROM lineitem
    ),
    tri AS (
        SELECT pid,
               (px - x1) * (px - x1) + (py - y1) * (py - y1) AS a2,
               (px - x2) * (px - x2) + (py - y2) * (py - y2) AS b2,
               (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) AS c2
        FROM pts
    ),
    ang AS (
        SELECT pid, a2, b2, c2,
               (c2 - a2 - b2) / ({_P2L_EPS} + 2.0 * sqrt(a2 * b2)) AS neg
        FROM tri
    )
    SELECT pid,
           CASE WHEN neg < 0 THEN sqrt(least(a2, b2))
                ELSE sqrt(a2 * b2 * greatest(1.0 - neg * neg, 0.0)
                          / ({_P2L_EPS} + c2)) END AS dist
    FROM ang
    """,
)
def point2line_distance_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBNet border-map distance field (base_textdet_targets.py:18-52):
    point-to-segment distance via the reference's triangle form
    (2*area/c perpendicular, nearer endpoint when the angle at the query
    point is acute). The Spark side runs the vectorized numpy kernel
    (kernel/geom2d.point2line_dist) over Arrow batches; the oracle
    evaluates the identical float64 formula in SQL — every op involved
    (*, /, sqrt) is IEEE-correctly-rounded, so the match is bit-exact,
    not rounded."""
    from my_ocr_spark.kernel.geom2d import point2line_dist

    li = t(spark, sf_dir, "lineitem")
    pts = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pid"),
        (F.col("l_partkey") % 200).cast("double").alias("px"),
        (F.col("l_suppkey") % 200).cast("double").alias("py"),
        (F.col("l_orderkey") % 100).cast("double").alias("x1"),
        ((F.col("l_orderkey") * 3) % 100).cast("double").alias("y1"),
        (F.col("l_orderkey") % 100 + 1 + F.col("l_orderkey") % 50)
        .cast("double").alias("x2"),
        ((F.col("l_orderkey") * 7) % 100).cast("double").alias("y2"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            d = point2line_dist(
                pdf["px"].to_numpy(), pdf["py"].to_numpy(),
                pdf["x1"].to_numpy(), pdf["y1"].to_numpy(),
                pdf["x2"].to_numpy(), pdf["y2"].to_numpy())
            yield pd.DataFrame({"pid": pdf["pid"], "dist": d})

    return pts.mapInPandas(run, schema=_P2L_OUT)


_MAR_OUT = T.StructType([
    T.StructField("poly_id", T.LongType(), False),
    T.StructField("short_side", T.DoubleType(), False),
    T.StructField("long_side", T.DoubleType(), False),
])


@query(
    "min_area_rect_size",
    oracle="""
    SELECT o_orderkey AS poly_id,
           round(CAST(least(20 + o_orderkey % 30, 5 + o_orderkey % 17)
                 AS DOUBLE), 4) AS short_side,
           round(CAST(greatest(20 + o_orderkey % 30, 5 + o_orderkey % 17)
                 AS DOUBLE), 4) AS long_side
    FROM orders
    """,
)
def min_area_rect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """polygon_size / cv2.minAreaRect (base_textdet_targets.py:72-85):
    min-area bounding-rect side lengths via convex hull + rotating
    calipers (kernel/geom2d.min_area_rect_size). Fixture: rectangles
    with integer sides (a, b), rotated by one of four Pythagorean
    (cos, sin) pairs and translated — the minimum rectangle of a
    rotated rectangle is itself, so the oracle knows the sides in
    closed form; the kernel recovers them through the full hull +
    calipers path (fp error ~1e-12, rounded to 4 dp on both sides)."""
    from my_ocr_spark.kernel.geom2d import min_area_rect_sizes_convex

    o = t(spark, sf_dir, "orders").select("o_orderkey")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batch calipers (min_area_rect_sizes_convex): the quads are
        # convex by construction, and the scalar hull+calipers loop
        # was the per-row-Python hot path of this query at sf0.1
        rots = np.array([(1.0, 0.0), (0.6, 0.8), (0.28, 0.96),
                         (0.8, 0.6)])
        for pdf in batches:
            k = pdf["o_orderkey"].to_numpy(dtype=np.int64)
            a = (20 + k % 30).astype(np.float64)
            b = (5 + k % 17).astype(np.float64)
            c = rots[k % 4, 0]
            s = rots[k % 4, 1]
            tx = (k % 50).astype(np.float64)
            ty = (k % 70).astype(np.float64)
            quads = np.stack([
                np.stack([tx, ty], 1),
                np.stack([tx + a * c, ty + a * s], 1),
                np.stack([tx + a * c - b * s, ty + a * s + b * c], 1),
                np.stack([tx - b * s, ty + b * c], 1)], axis=1)
            short, long_ = min_area_rect_sizes_convex(quads)
            yield pd.DataFrame({
                "poly_id": k,
                "short_side": np.round(short, 4),
                "long_side": np.round(long_, 4)})

    return spread_small_scan(o).mapInPandas(run, schema=_MAR_OUT)


_WARP_OUT = T.StructType([
    T.StructField("doc_key", T.LongType(), False),
    T.StructField("crop_sum", T.LongType(), False),
    T.StructField("tl_px", T.DoubleType(), False),
    T.StructField("br_px", T.DoubleType(), False),
])


@query(
    "warp_crop_checksum",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS doc_key,
               o_orderkey % 4 AS x0, o_orderkey % 3 AS y0
        FROM orders
    )
    SELECT doc_key,
           CAST(list_aggregate(flatten(list_transform(generate_series(0, 2),
                i -> list_transform(generate_series(0, 3),
                     j -> (doc_key + 3 * (y0 + i) + 7 * (x0 + j)) % 17))),
                'sum') AS BIGINT) AS crop_sum,
           CAST((doc_key + 3 * y0 + 7 * x0) % 17 AS DOUBLE) AS tl_px,
           CAST((doc_key + 3 * (y0 + 2) + 7 * (x0 + 3)) % 17 AS DOUBLE)
               AS br_px
    FROM k
    """,
)
def warp_crop_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-level warp_img crop (crop.py:40-83 / tps_preprocessor.py
    pixel path): per row, synthesize an 8x10 'image' matrix
    img[i][j] = (key + 3i + 7j) % 17, rectify an axis-aligned integer
    quad through the FULL pipeline — DLT homography solve + bilinear
    grid sample (kernel/warp.crop_quad_pixels) — and emit the crop's
    checksum plus corner probes. Integer-aligned quads make every
    bilinear sample land on a grid point, so the oracle predicts the
    values in closed form; fractional warps are covered by unit tests
    (tests/test_warp_pixels.py). round() guards the ~1e-12 DLT solve
    noise before the BIGINT cast."""
    from my_ocr_spark.kernel.warp import crop_quad_pixels

    o = t(spark, sf_dir, "orders").select("o_orderkey")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ii, jj = np.mgrid[0:8, 0:10]
        # every output is a pure function of (k % 17, k % 4, k % 3) —
        # 204 classes — so the DLT solve + bilinear sample runs once
        # per class, not once per row (the old per-row loop spent 31 s
        # at sf0.1 recomputing 204 distinct answers 150k times)
        memo: dict[tuple[int, int, int], tuple[int, float, float]] = {}

        def solve(k: int) -> tuple[int, float, float]:
            key = (k % 17, k % 4, k % 3)
            if key not in memo:
                img = (key[0] + 3 * ii + 7 * jj) % 17
                x0, y0 = key[1], key[2]
                quad = [(x0, y0), (x0 + 4, y0),
                        (x0 + 4, y0 + 3), (x0, y0 + 3)]
                c = crop_quad_pixels(img.astype(float), quad, 4, 3)
                memo[key] = (int(round(c.sum())),
                             round(float(c[0, 0]), 6),
                             round(float(c[2, 3]), 6))
            return memo[key]

        for pdf in batches:
            # 17, 4, 3 are pairwise coprime, so k % 204 indexes the
            # class (CRT); one kernel run per class, C-speed map back
            cls = pdf["o_orderkey"] % 204
            table = {c: solve(int(c)) for c in cls.unique()}
            yield pd.DataFrame({
                "doc_key": pdf["o_orderkey"],
                "crop_sum": cls.map(lambda c: table[c][0]),
                "tl_px": cls.map(lambda c: table[c][1]),
                "br_px": cls.map(lambda c: table[c][2])})

    return spread_small_scan(o).mapInPandas(run, schema=_WARP_OUT)


_SV_OUT = T.StructType([
    T.StructField("poly_id", T.LongType(), False),
    T.StructField("ring_csv", T.StringType(), False),
])


@query(
    "sort_vertex_ring",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS poly_id,
               CAST(20 + o_orderkey % 30 AS DOUBLE) AS a,
               CAST(5 + o_orderkey % 17 AS DOUBLE) AS b,
               CAST(o_orderkey % 50 AS DOUBLE) AS tx,
               CAST(o_orderkey % 70 AS DOUBLE) AS ty,
               o_orderkey % 4 AS rot, o_orderkey % 2 AS flip
        FROM orders
    ),
    corners AS (
        SELECT poly_id, rot, flip,
               [[tx, ty],
                [tx + a * 0.6, ty + a * 0.8],
                [tx + a * 0.6 - b * 0.8, ty + a * 0.8 + b * 0.6],
                [tx - b * 0.8, ty + b * 0.6]] AS ring
        FROM base
    ),
    scrambled AS (
        SELECT poly_id,
               list_transform(generate_series(0, 3), j ->
                   ring[((j * (1 + 2 * flip) + rot) % 4) + 1]) AS pts
        FROM corners
    ),
    cent AS (
        SELECT poly_id, pts,
               (pts[1][1] + pts[2][1] + pts[3][1] + pts[4][1]) / 4 AS cx,
               (pts[1][2] + pts[2][2] + pts[3][2] + pts[4][2]) / 4 AS cy,
               least(pts[1][1], pts[2][1], pts[3][1], pts[4][1]) AS mnx,
               least(pts[1][2], pts[2][2], pts[3][2], pts[4][2]) AS mny
        FROM scrambled
    ),
    ring AS (
        SELECT poly_id, mnx, mny,
               list_transform(
                   list_sort(list_transform(generate_series(1, 4), i ->
                       [atan2(pts[i][2] - cy, pts[i][1] - cx),
                        CAST(i AS DOUBLE),
                        pts[i][1], pts[i][2]])),
                   e -> [e[3], e[4]]) AS ring
        FROM cent
    ),
    rot2 AS (
        SELECT poly_id, ring,
               CAST(list_min(list_transform(generate_series(1, 4), i ->
                   [sqrt((ring[i][1] - mnx) ** 2
                         + (ring[i][2] - mny) ** 2),
                    CAST(i AS DOUBLE)]))[2] AS BIGINT) AS start_i
        FROM ring
    )
    SELECT poly_id,
           array_to_string(list_transform(generate_series(0, 3), j ->
               CAST(round(ring[((start_i - 1 + j) % 4) + 1][1], 4)
                    AS VARCHAR)
               || ':'
               || CAST(round(ring[((start_i - 1 + j) % 4) + 1][2], 4)
                       AS VARCHAR)), ',') AS ring_csv
    FROM rot2
    """,
)
def sort_vertex_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_vertex quad normalization (box_utils.py:6-54 via
    kernel/warp.sort_quad_vertices): corners of a rotated rectangle,
    scrambled by a key-dependent permutation, are re-ordered clockwise
    starting at the corner nearest the bbox top-left. The Spark side
    runs the real kernel (angular sort around the centroid); the oracle
    replays the same sort in SQL — atan2/hypot are only used for
    ORDERING and the fixture's corner angles are ~90 degrees apart, so
    cross-engine libm ulp differences cannot flip the order. Ring
    emitted as a rounded CSV (array outputs are hasher-risky)."""
    from my_ocr_spark.kernel.warp import sort_quad_vertices

    o = t(spark, sf_dir, "orders").select("o_orderkey")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"poly_id": [], "ring_csv": []}
            for k in pdf["o_orderkey"]:
                k = int(k)
                a, b = 20.0 + k % 30, 5.0 + k % 17
                tx, ty = float(k % 50), float(k % 70)
                ring = [(tx, ty),
                        (tx + a * 0.6, ty + a * 0.8),
                        (tx + a * 0.6 - b * 0.8, ty + a * 0.8 + b * 0.6),
                        (tx - b * 0.8, ty + b * 0.6)]
                rot, flip = k % 4, k % 2
                pts = [ring[(j * (1 + 2 * flip) + rot) % 4]
                       for j in range(4)]
                srt = sort_quad_vertices(np.array(pts, dtype=np.float64))
                out["poly_id"].append(k)
                out["ring_csv"].append(",".join(
                    f"{round(x, 4)}:{round(y, 4)}" for x, y in srt))
            yield pd.DataFrame(out)

    return spread_small_scan(o).mapInPandas(run, schema=_SV_OUT)


# --- TPS rectification (tps_preprocessor.py grid generator) -----------------

_TPS_OUT = T.StructType([
    T.StructField("doc_key", T.LongType(), False),
    T.StructField("warp_sum", T.LongType(), False),
    T.StructField("tl_px", T.DoubleType(), False),
    T.StructField("br_px", T.DoubleType(), False),
])

# (a, b, tx, c, d, ty): fiducial displacement C' = [[a,b],[c,d]] @ C + t.
# Each tuple makes every TPS sample land on an integer pixel of the 9x17
# fixture image (dyadic coefficients chosen so a(2j-7) + 2b(2i-3) + 8tx
# and c(2j-7)/2 + d(2i-3) + 4ty are integral for all grid cells), so the
# oracle predicts the bilinear samples in closed form.
_TPS_PARAMS = [
    (1.0, 0.0, 0.25, 0.0, 1.0, 0.25),       # translate
    (1.0, 0.25, 0.0625, 0.0, 1.0, 0.25),    # x-shear
    (-1.0, 0.0, -0.25, 0.0, 1.0, 0.0),      # x-flip
    (1.0, 0.0, 0.0, 1.0, -1.0, 0.125),      # y-flip + y-shear
    (0.5, 0.25, 0.125, 0.0, 0.5, 0.125),    # shrink + shear
    (0.0, 1.0, 0.0, 1.0, 0.0, 0.125),       # axis swap
]


def _tps_oracle() -> str:
    """Closed-form twin of the degenerate (affine-fiducial) TPS path:
    when C' is an exact affine image of C, the thin-plate solution has
    zero RBF weights, so the sampling grid is the affine map itself and
    every sample is a known integer pixel of img[y][x] =
    (k + 3y + 7x) % 17 (border-clamped). The kernel still runs the FULL
    solve (design matrix, inversion, RBF evaluation) — its ~1e-12
    residue is absorbed by round() before the BIGINT cast. Curved
    (non-affine) fiducials are covered by unit goldens in
    tests/test_warp_pixels.py."""
    lit = lambda vals: "[" + ", ".join(
        f"CAST({v!r} AS DOUBLE)" for v in vals) + "]"
    pa = lit([p[0] for p in _TPS_PARAMS])
    pb = lit([p[1] for p in _TPS_PARAMS])
    ptx = lit([p[2] for p in _TPS_PARAMS])
    pc = lit([p[3] for p in _TPS_PARAMS])
    pd_ = lit([p[4] for p in _TPS_PARAMS])
    pty = lit([p[5] for p in _TPS_PARAMS])
    # sxp(i, j) = a(2j-7) + 2b(2i-3) + 8tx + 8 ; syp = c(2j-7)/2
    #   + d(2i-3) + 4ty + 4  (the affine grid in pixel coordinates)
    sxp = "(a * (2*j - 7) + 2 * b * (2*i - 3) + 8 * tx + 8)"
    syp = "(c * (2*j - 7) / 2 + d * (2*i - 3) + 4 * ty + 4)"
    cx = f"CAST(round(least(greatest({sxp}, 0), 16), 0) AS BIGINT)"
    cy = f"CAST(round(least(greatest({syp}, 0), 8), 0) AS BIGINT)"
    px = f"(doc_key + 3 * {cy} + 7 * {cx}) % 17"
    return f"""
    WITH params AS (SELECT {pa} AS la, {pb} AS lb, {ptx} AS ltx,
                           {pc} AS lc, {pd_} AS ld, {pty} AS lty),
    k AS (SELECT o_orderkey AS doc_key,
                 la[CAST(o_orderkey % 6 AS INT) + 1] AS a,
                 lb[CAST(o_orderkey % 6 AS INT) + 1] AS b,
                 ltx[CAST(o_orderkey % 6 AS INT) + 1] AS tx,
                 lc[CAST(o_orderkey % 6 AS INT) + 1] AS c,
                 ld[CAST(o_orderkey % 6 AS INT) + 1] AS d,
                 lty[CAST(o_orderkey % 6 AS INT) + 1] AS ty
          FROM orders, params),
    cells AS (SELECT doc_key, a, b, tx, c, d, ty,
                     unnest(generate_series(0, 3)) AS i
              FROM k),
    cells2 AS (SELECT *, unnest(generate_series(0, 7)) AS j FROM cells)
    SELECT doc_key,
           CAST(sum({px}) AS BIGINT) AS warp_sum,
           CAST(min(CASE WHEN i = 0 AND j = 0 THEN {px} END)
                AS DOUBLE) AS tl_px,
           CAST(min(CASE WHEN i = 3 AND j = 7 THEN {px} END)
                AS DOUBLE) AS br_px
    FROM cells2 GROUP BY doc_key
    """


@query("tps_warp_checksum", oracle=_tps_oracle())
def tps_warp_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True thin-plate-spline rectification (tps_preprocessor.py:25-271),
    pixel path: per row, synthesize a 9x17 image
    img[y][x] = (key + 3y + 7x) % 17, move the 20 base fiducials by an
    affine map (key-selected from _TPS_PARAMS), and rectify onto a 4x8
    grid through the FULL TPS pipeline — RBF system solve, dense-grid
    spline evaluation, border-clamped bilinear sampling
    (kernel/warp.tps_grid/tps_warp_pixels). Emits the crop checksum and
    corner probes; the oracle predicts them in closed form because an
    affine fiducial layout collapses the spline to its affine term."""
    from my_ocr_spark.kernel.warp import tps_fiducials, tps_warp_pixels

    o = t(spark, sf_dir, "orders").select("o_orderkey")
    base = tps_fiducials(20)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ii, jj = np.mgrid[0:9, 0:17]
        for pdf in batches:
            out = {"doc_key": [], "warp_sum": [], "tl_px": [], "br_px": []}
            for k in pdf["o_orderkey"]:
                k = int(k)
                a, b, tx, c, d, ty = _TPS_PARAMS[k % 6]
                cp = base @ np.array([[a, b], [c, d]]).T + np.array([tx, ty])
                img = ((k + 3 * ii + 7 * jj) % 17).astype(np.float64)
                w = tps_warp_pixels(img, cp, (4, 8))
                out["doc_key"].append(k)
                out["warp_sum"].append(int(round(float(w.sum()))))
                out["tl_px"].append(round(float(w[0, 0]), 6))
                out["br_px"].append(round(float(w[3, 7]), 6))
            yield pd.DataFrame(out)

    return spread_small_scan(o).mapInPandas(run, schema=_TPS_OUT)


# --- EastRandomCrop region finding (deterministic core) ---------------------

_CROP_BOXES = """
    SELECT l_orderkey AS img,
           CAST((l_partkey % 5) * 30 AS DOUBLE) AS x0,
           CAST((l_partkey % 5) * 30 + 8 + l_suppkey % 25 AS DOUBLE) AS x1,
           CAST(((l_linenumber - 1) % 4) * 20 AS DOUBLE) AS y0,
           CAST(((l_linenumber - 1) % 4) * 20 + 12 AS DOUBLE) AS y1
    FROM lineitem WHERE l_orderkey % 10 = 1
"""


@query(
    "crop_region_gaps",
    oracle=f"""
    WITH boxes AS ({_CROP_BOXES}),
    iv AS (
        SELECT img, 'x' AS axis, x0 AS lo, x1 AS hi FROM boxes
        UNION ALL
        SELECT img, 'y' AS axis, y0 AS lo, y1 AS hi FROM boxes
    ),
    g AS (
        SELECT img, axis, lo, hi,
               max(hi) OVER (PARTITION BY img, axis ORDER BY lo, hi
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pm
        FROM iv
    )
    SELECT img, axis, pm AS gap_start, lo AS gap_end,
           lo - pm AS gap_len
    FROM g WHERE pm IS NOT NULL AND lo > pm
    """,
)
def crop_region_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic core of EastRandomCrop / RandomCropFlip's
    region finding (dbnet_transforms.py:205-233, transforms.py:930-967):
    per image and axis, project box intervals onto the coordinate axis
    and enumerate the free gaps between occupied runs — exactly the
    candidate crop-cut regions the reference's random_select then
    samples from (the sampling is the only nondeterministic part and is
    excluded per SURVEY §2.9; the region enumeration is the engine op).
    Native window-function plan, no Python: one shuffle on (img, axis),
    a running-max frame, a filter. Same occupancy-gap math the XY-cut
    oracle uses."""
    li = (t(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % 10 == 1))
    boxes = li.select(
        F.col("l_orderkey").alias("img"),
        ((F.col("l_partkey") % 5) * 30.0).alias("x0"),
        ((F.col("l_partkey") % 5) * 30.0 + 8
         + F.col("l_suppkey") % 25).alias("x1"),
        (((F.col("l_linenumber") - 1) % 4) * 20.0).alias("y0"),
        (((F.col("l_linenumber") - 1) % 4) * 20.0 + 12).alias("y1"))
    iv = (boxes.select("img", F.lit("x").alias("axis"),
                       F.col("x0").alias("lo"), F.col("x1").alias("hi"))
          .unionAll(boxes.select("img", F.lit("y").alias("axis"),
                                 F.col("y0").alias("lo"),
                                 F.col("y1").alias("hi"))))
    w = (Window.partitionBy("img", "axis").orderBy("lo", "hi")
         .rowsBetween(Window.unboundedPreceding, -1))
    g = iv.withColumn("pm", F.max("hi").over(w))
    return (g.filter(F.col("pm").isNotNull() & (F.col("lo") > F.col("pm")))
            .select("img", "axis", F.col("pm").alias("gap_start"),
                    F.col("lo").alias("gap_end"),
                    (F.col("lo") - F.col("pm")).alias("gap_len")))


# --- Fourier shape descriptors (fcenet poly2fourier / fourier2poly) ---------

_FOURIER_COLS = ("cm1_re", "cm1_im", "c0_re", "c0_im", "c1_re", "c1_im",
                 "r0x", "r0y", "r1x", "r1y", "r2x", "r2y", "r3x", "r3y")

_FOURIER_OUT = T.StructType(
    [T.StructField("poly_id", T.LongType(), False),
     T.StructField("shape", T.StringType(), False)]
    + [T.StructField(n, T.DoubleType(), False) for n in _FOURIER_COLS])


def _fourier_oracle() -> str:
    """Closed-form DFT replay for the exact-dyadic contour fixtures.

    With 4 equal-arc sample points the forward FFT's n=4 butterflies are
    pure add/sub/swap (twiddles in {1, i, -1, -i}) — exact on the
    integer-coordinate fixtures — so the oracle computes the same
    c_{-1}, c_0, c_1 sums directly from the vertices, and the inverse
    evaluation at t = j/4 is the same sign arithmetic (the kernel's
    np.exp(i*pi/2) carries a ~1e-16 residue that the shared
    floor-half-up 4dp rounding absorbs — the tps_warp_checksum
    pattern)."""
    r4 = lambda x: f"floor(({x}) * 1e4 + 0.5) / 1e4"
    cm1_re = "(x0 - x2 - (y1 - y3)) / 4"
    cm1_im = "(y0 - y2 + (x1 - x3)) / 4"
    c0_re = "(x0 + x1 + x2 + x3) / 4"
    c0_im = "(y0 + y1 + y2 + y3) / 4"
    c1_re = "(x0 - x2 + (y1 - y3)) / 4"
    c1_im = "(y0 - y2 - (x1 - x3)) / 4"
    # z(t_j) = c_{-1} e^{-2pi i t_j} + c_0 + c_1 e^{2pi i t_j},
    # t_j = j/4 -> twiddles {1, i, -1, -i}: pure sign arithmetic
    recon = {
        "r0x": "cm1_re + c0_re + c1_re", "r0y": "cm1_im + c0_im + c1_im",
        "r1x": "cm1_im + c0_re - c1_im", "r1y": "c0_im - cm1_re + c1_re",
        "r2x": "c0_re - cm1_re - c1_re", "r2y": "c0_im - cm1_im - c1_im",
        "r3x": "c0_re - cm1_im + c1_im", "r3y": "cm1_re + c0_im - c1_re",
    }
    coef_sel = ",\n           ".join(
        f"{r4(e)} AS {n}"
        for n, e in (("cm1_re", cm1_re), ("cm1_im", cm1_im),
                     ("c0_re", c0_re), ("c0_im", c0_im),
                     ("c1_re", c1_re), ("c1_im", c1_im)))
    recon_sel = ",\n           ".join(
        f"{r4(e)} AS {n}" for n, e in recon.items())
    return f"""
    WITH base AS (
        SELECT o_orderkey AS poly_id,
               CAST(o_orderkey % 97 AS DOUBLE) AS cx,
               CAST((3 * o_orderkey) % 89 AS DOUBLE) AS cy,
               CAST(1 + o_orderkey % 13 AS DOUBLE) AS r,
               o_orderkey % 2 = 0 AS is_sq
        FROM orders WHERE o_orderkey % 3 = 0),
    v AS (
        SELECT poly_id,
               CASE WHEN is_sq THEN 'square' ELSE 'diamond' END AS shape,
               CASE WHEN is_sq THEN cx - r ELSE cx + r END AS x0,
               CASE WHEN is_sq THEN cy - r ELSE cy END AS y0,
               CASE WHEN is_sq THEN cx + r ELSE cx END AS x1,
               CASE WHEN is_sq THEN cy - r ELSE cy + r END AS y1,
               CASE WHEN is_sq THEN cx + r ELSE cx - r END AS x2,
               CASE WHEN is_sq THEN cy + r ELSE cy END AS y2,
               CASE WHEN is_sq THEN cx - r ELSE cx END AS x3,
               CASE WHEN is_sq THEN cy + r ELSE cy - r END AS y3
        FROM base),
    c AS (
        SELECT poly_id, shape,
           {coef_sel}
        FROM v)
    SELECT poly_id, shape, cm1_re, cm1_im, c0_re, c0_im, c1_re, c1_im,
           {recon_sel}
    FROM c
    """


@query("fourier_descriptor_roundtrip", oracle=_fourier_oracle())
def fourier_descriptor_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourier shape descriptors + inverse reconstruction
    (fcenet_targets.py:165-220 ``cal_fourier_signature`` forward,
    wrapper.py:501-522 ``fourier2poly`` inverse), run end-to-end through
    the real kernel (arc-length resample -> np.fft -> truncation ->
    inverse evaluation) on key-derived exact-dyadic contours: even keys
    get axis-aligned squares, odd keys diamonds (45-degree squares), so
    every c_{-1}/c_0/c_1 coefficient and every reconstructed point has a
    closed form the oracle re-derives as explicit DFT sign arithmetic.
    k=1 captures all non-zero frequencies of a 4-point regular contour,
    so the roundtrip returns the input vertices — descriptor AND inverse
    are both pinned, not just a checksum. One narrow mapInPandas over
    the scan (no shuffle); per-row numpy work is O(n_sample log n)."""
    import math

    from my_ocr_spark.kernel.fourier import fourier2poly, poly2fourier

    o = (t(spark, sf_dir, "orders").select("o_orderkey")
         .filter(F.col("o_orderkey") % 3 == 0))

    def r4(x: float) -> float:
        return math.floor(x * 1e4 + 0.5) / 1e4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["poly_id", "shape", *_FOURIER_COLS]
        for pdf in batches:
            recs = []
            for key in pdf["o_orderkey"]:
                key = int(key)
                cx = float(key % 97)
                cy = float((3 * key) % 89)
                r = float(1 + key % 13)
                if key % 2 == 0:
                    shape = "square"
                    v = [(cx - r, cy - r), (cx + r, cy - r),
                         (cx + r, cy + r), (cx - r, cy + r)]
                else:
                    shape = "diamond"
                    v = [(cx + r, cy), (cx, cy + r),
                         (cx - r, cy), (cx, cy - r)]
                c = poly2fourier(np.array(v, dtype=np.float64),
                                 k=1, n_sample=4)
                rec = fourier2poly(c, n_points=4)
                recs.append(
                    [key, shape]
                    + [r4(x) for z in c for x in (z.real, z.imag)]
                    + [r4(float(x)) for p in rec for x in p])
            yield pd.DataFrame(recs, columns=cols)

    return spread_small_scan(o).mapInPandas(run, schema=_FOURIER_OUT)


# --- fill_hole mask morphology (textsnake/fcenet decode pixel path) ---------

_FILL_OUT = T.StructType([
    T.StructField("img_id", T.LongType(), False),
    T.StructField("n_mask", T.LongType(), False),
    T.StructField("n_filled", T.LongType(), False),
    T.StructField("fill_checksum", T.LongType(), False),
])


@query(
    "fill_holes_mask",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT o_orderkey AS img_id,
               CAST(o_orderkey % 3 AS INT) AS x0,
               CAST(o_orderkey % 2 AS INT) AS y0,
               CAST(4 + o_orderkey % 4 AS INT) AS x1,
               CAST(5 + o_orderkey % 3 AS INT) AS y1,
               o_orderkey % 2 = 1 AS gap
        FROM orders WHERE o_orderkey % 7 = 0),
    cells AS (
        SELECT img_id, r, c,
               (((c = x0 OR c = x1) AND r BETWEEN y0 AND y1)
                OR ((r = y0 OR r = y1) AND c BETWEEN x0 AND x1))
               AND NOT (gap AND r = y0 + 1 AND c = x0) AS m
        FROM base,
             (SELECT unnest(generate_series(0, 7)) AS r),
             (SELECT unnest(generate_series(0, 7)) AS c)),
    reach AS (
        SELECT img_id, r, c FROM cells
        WHERE NOT m AND (r = 0 OR r = 7 OR c = 0 OR c = 7)
        UNION
        SELECT cl.img_id, cl.r, cl.c
        FROM reach rc,
             (VALUES (0, 1), (0, -1), (1, 0), (-1, 0)) AS o(dr, dc)
        JOIN cells cl
          ON cl.img_id = rc.img_id AND cl.r = rc.r + o.dr
         AND cl.c = rc.c + o.dc AND NOT cl.m),
    filled AS (
        SELECT cl.img_id, cl.r, cl.c, cl.m,
               (cl.m OR rc.r IS NULL) AS f
        FROM cells cl LEFT JOIN reach rc
          ON rc.img_id = cl.img_id AND rc.r = cl.r AND rc.c = cl.c)
    SELECT img_id,
           CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_mask,
           CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(sum(CASE WHEN f THEN r * 8 + c + 1 ELSE 0 END)
                AS BIGINT) AS fill_checksum
    FROM filled GROUP BY img_id
    """,
)
def fill_holes_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hole filling on synthesized instance masks (the decode pixel step
    of textsnake/fcenet: wrapper.py:232-242,349,435): per key, an 8x8
    grid carries a rectangle ring — closed for even keys (interior is a
    hole and must fill), broken by one pixel for odd keys (interior is
    4-connected to the outside through the gap and must NOT fill). The
    kernel runs the real border flood-fill (kernel/morphology.fill_hole);
    the oracle re-derives reachability as a recursive-CTE BFS over free
    cells seeded at the grid border, equi-joined on (img, r+dr, c+dc).
    Counts and the positional checksum are exact integers. One narrow
    mapInPandas over the scan; per-mask work is bounded (8x8)."""
    from my_ocr_spark.kernel.morphology import fill_hole

    o = (t(spark, sf_dir, "orders").select("o_orderkey")
         .filter(F.col("o_orderkey") % 7 == 0))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr, cc = np.mgrid[0:8, 0:8]
        wgt = rr * 8 + cc + 1
        for pdf in batches:
            out = {"img_id": [], "n_mask": [], "n_filled": [],
                   "fill_checksum": []}
            for k in pdf["o_orderkey"]:
                k = int(k)
                x0, y0 = k % 3, k % 2
                x1, y1 = 4 + k % 4, 5 + k % 3
                ring = ((((cc == x0) | (cc == x1))
                         & (rr >= y0) & (rr <= y1))
                        | (((rr == y0) | (rr == y1))
                           & (cc >= x0) & (cc <= x1)))
                if k % 2 == 1:
                    ring &= ~((rr == y0 + 1) & (cc == x0))
                f = fill_hole(ring)
                out["img_id"].append(k)
                out["n_mask"].append(int(ring.sum()))
                out["n_filled"].append(int(f.sum()))
                out["fill_checksum"].append(int(wgt[f].sum()))
            yield pd.DataFrame(out)

    return spread_small_scan(o).mapInPandas(run, schema=_FILL_OUT)


# --- Zhang-Suen skeletonize (textsnake decode center-line path) -------------

_SKEL_OUT = T.StructType([
    T.StructField("img_id", T.LongType(), False),
    T.StructField("n_in", T.LongType(), False),
    T.StructField("n_skel", T.LongType(), False),
    T.StructField("skel_checksum", T.LongType(), False),
])

_SKEL_PASSES = 5  # unroll depth; kernel convergence within it is pytest-pinned


def _skel_mask_numpy(k: int, rr: np.ndarray, cc: np.ndarray) -> np.ndarray:
    """Key-derived 8x8 fixture masks: thick bar / solid block / L-shape —
    the three shapes textsnake center-masks degenerate to. Mirrored
    exactly by the SQL mask expression in _skeletonize_oracle."""
    fam = k % 3
    if fam == 0:
        r0, c0 = k % 4, k % 2
        return ((rr >= r0) & (rr <= r0 + 2) & (cc >= c0) & (cc <= c0 + 5))
    if fam == 1:
        s = 3 + k % 2
        return (rr >= 1) & (rr <= 1 + s) & (cc >= 2) & (cc <= 2 + s)
    c0 = k % 3
    return (((cc >= c0) & (cc <= c0 + 1) & (rr >= 1) & (rr <= 6))
            | ((rr >= 5) & (rr <= 6) & (cc >= c0) & (cc <= c0 + 4)))


def _zs_levels(passes: int, h: int, w: int, src: str) -> tuple[str, str]:
    """Unrolled Zhang-Suen CTE chain over an h*w-int list column ``g``
    starting from CTE ``src``; returns (chain_sql, final_cte_name).
    Shared by the standalone skeletonize oracle (8x8) and the
    textsnake_center_decode composition (12x12)."""
    def nb(dr: int, dc: int) -> str:
        return (f"(CASE WHEN r + ({dr}) BETWEEN 0 AND {h - 1} "
                f"AND c + ({dc}) BETWEEN 0 AND {w - 1} "
                f"THEN g[(r + ({dr})) * {w} + c + ({dc}) + 1] "
                f"ELSE 0 END)")

    ring = [nb(-1, 0), nb(-1, 1), nb(0, 1), nb(1, 1),
            nb(1, 0), nb(1, -1), nb(0, -1), nb(-1, -1)]  # p2..p9
    b_expr = " + ".join(ring)
    a_expr = " + ".join(
        f"(CASE WHEN {ring[i]} = 0 AND {ring[(i + 1) % 8]} = 1 "
        f"THEN 1 ELSE 0 END)" for i in range(8))
    levels = []
    prev = src
    n = 0
    for _ in range(passes):
        for step in (0, 1):
            n += 1
            if step == 0:
                corner = (f"({ring[0]} * {ring[2]} * {ring[4]} = 0) "
                          f"AND ({ring[2]} * {ring[4]} * {ring[6]} = 0)")
            else:
                corner = (f"({ring[0]} * {ring[2]} * {ring[6]} = 0) "
                          f"AND ({ring[0]} * {ring[4]} * {ring[6]} = 0)")
            levels.append(f"""
    {src}_{n} AS (
        SELECT img_id, list(v ORDER BY i) AS g FROM (
            SELECT img_id, i,
                   CASE WHEN g[i] = 1 AND ({b_expr}) BETWEEN 2 AND 6
                             AND ({a_expr}) = 1 AND {corner}
                        THEN 0 ELSE g[i] END AS v
            FROM (SELECT img_id, g, (i - 1) // {w} AS r,
                         (i - 1) % {w} AS c, i
                  FROM (SELECT img_id, g,
                               unnest(generate_series(1, {h * w})) AS i
                        FROM {prev})))
        GROUP BY img_id)""")
            prev = f"{src}_{n}"
    return ",".join(levels), prev


def _skeletonize_oracle(passes: int = _SKEL_PASSES) -> str:
    """DuckDB replay of the FULL Zhang-Suen algorithm: the 8x8 grid is a
    64-int list column; each unrolled subiteration recomputes every cell
    from its ring neighbors (same B / A / corner-product conditions,
    same simultaneous application), two sub-steps per pass. ``passes``
    exceeds the fixture family's convergence depth (pytest-pinned), and
    converged grids are fixpoints of further sub-steps, so the unroll
    equals the kernel's run-to-quiescence loop."""
    chain, final = _zs_levels(passes, 8, 8, "g0")
    mask = """
        CASE WHEN k % 3 = 0 THEN
                 CASE WHEN r BETWEEN k % 4 AND k % 4 + 2
                           AND c BETWEEN k % 2 AND k % 2 + 5
                      THEN 1 ELSE 0 END
             WHEN k % 3 = 1 THEN
                 CASE WHEN r BETWEEN 1 AND 4 + k % 2
                           AND c BETWEEN 2 AND 5 + k % 2
                      THEN 1 ELSE 0 END
             ELSE
                 CASE WHEN (c BETWEEN k % 3 AND k % 3 + 1
                            AND r BETWEEN 1 AND 6)
                           OR (r BETWEEN 5 AND 6
                               AND c BETWEEN k % 3 AND k % 3 + 4)
                      THEN 1 ELSE 0 END
        END"""
    return f"""
    WITH keys AS (SELECT o_orderkey AS img_id, o_orderkey AS k
                  FROM orders WHERE o_orderkey % 31 = 0),
    g0 AS (
        SELECT img_id, list({mask} ORDER BY i) AS g FROM (
            SELECT img_id, k, i, (i - 1) // 8 AS r, (i - 1) % 8 AS c
            FROM (SELECT img_id, k, unnest(generate_series(1, 64)) AS i
                  FROM keys))
        GROUP BY img_id),
    {chain}
    SELECT a.img_id,
           CAST(list_aggregate(a.g, 'sum') AS BIGINT) AS n_in,
           CAST(list_aggregate(z.g, 'sum') AS BIGINT) AS n_skel,
           CAST((SELECT sum(CASE WHEN z.g[i] = 1 THEN i ELSE 0 END)
                 FROM unnest(generate_series(1, 64)) AS t(i))
                AS BIGINT) AS skel_checksum
    FROM g0 a JOIN {final} z USING (img_id)
    """


@query("skeletonize_masks", oracle=_skeletonize_oracle())
def skeletonize_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zhang-Suen thinning on synthesized instance masks (the
    textsnake_decode center-line step, wrapper.py:359): bars, blocks and
    L-shapes keyed off orders, thinned by the real kernel
    (kernel/morphology.skeletonize, run to quiescence); the oracle
    unrolls the SAME two-subiteration parallel algorithm as chained SQL
    grid levels (5 passes — beyond the fixture family's convergence,
    which test_morphology pins). Counts and positional checksum are
    exact integers; one narrow mapInPandas over the scan."""
    from my_ocr_spark.kernel.morphology import skeletonize

    o = (t(spark, sf_dir, "orders").select("o_orderkey")
         .filter(F.col("o_orderkey") % 31 == 0))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr, cc = np.mgrid[0:8, 0:8]
        wgt = rr * 8 + cc + 1
        for pdf in batches:
            out = {"img_id": [], "n_in": [], "n_skel": [],
                   "skel_checksum": []}
            for k in pdf["o_orderkey"]:
                k = int(k)
                m = _skel_mask_numpy(k, rr, cc)
                s = skeletonize(m)
                out["img_id"].append(k)
                out["n_in"].append(int(m.sum()))
                out["n_skel"].append(int(s.sum()))
                out["skel_checksum"].append(int(wgt[s].sum()))
            yield pd.DataFrame(out)

    return spread_small_scan(o).mapInPandas(run, schema=_SKEL_OUT)


# --- textsnake center-mask decode: fill -> instances -> skeletons -----------

_TS_OUT = T.StructType([
    T.StructField("img_id", T.LongType(), False),
    T.StructField("instance", T.LongType(), False),
    T.StructField("n_fill_px", T.LongType(), False),
    T.StructField("n_skel_px", T.LongType(), False),
    T.StructField("skel_checksum", T.LongType(), False),
])


def _ts_mask_numpy(k: int, rr: np.ndarray, cc: np.ndarray) -> np.ndarray:
    """Two disjoint instances per 12x12 image: a rectangle RING (its
    hole must fill) and a solid 3x6 bar, row-separated by >= 2 so
    whole-grid thinning equals per-instance thinning. Mirrored exactly
    by the SQL mask expression in _textsnake_oracle."""
    x0 = 1 + k % 2
    ring = ((((cc == x0) | (cc == x0 + 4)) & (rr >= 1) & (rr <= 5))
            | (((rr == 1) | (rr == 5)) & (cc >= x0) & (cc <= x0 + 4)))
    cb = 1 + k % 3
    bar = (rr >= 8) & (rr <= 10) & (cc >= cb) & (cc <= cb + 5)
    return ring | bar


def _textsnake_oracle(passes: int = _SKEL_PASSES) -> str:
    """The full decode replayed in SQL: border-BFS hole filling
    (recursive CTE), 8-connected min-label instance closure (recursive
    CTE over an offsets table), and the shared unrolled Zhang-Suen
    chain (_zs_levels at 12x12) — joined into per-(image, instance)
    exact-integer counts."""
    chain, final = _zs_levels(passes, 12, 12, "sg0")
    mask = """
        ((c = 1 + k % 2 OR c = 5 + k % 2) AND r BETWEEN 1 AND 5)
        OR ((r = 1 OR r = 5) AND c BETWEEN 1 + k % 2 AND 5 + k % 2)
        OR (r BETWEEN 8 AND 10 AND c BETWEEN 1 + k % 3 AND 6 + k % 3)"""
    return f"""
    WITH RECURSIVE keys AS (
        SELECT o_orderkey AS img_id, o_orderkey AS k
        FROM orders WHERE o_orderkey % 37 = 0),
    cells AS MATERIALIZED (
        SELECT img_id, r, c, ({mask}) AS m
        FROM keys,
             (SELECT unnest(generate_series(0, 11)) AS r),
             (SELECT unnest(generate_series(0, 11)) AS c)),
    reach AS (
        SELECT img_id, r, c FROM cells
        WHERE NOT m AND (r = 0 OR r = 11 OR c = 0 OR c = 11)
        UNION
        SELECT cl.img_id, cl.r, cl.c
        FROM reach rc,
             (VALUES (0, 1), (0, -1), (1, 0), (-1, 0)) AS o(dr, dc)
        JOIN cells cl
          ON cl.img_id = rc.img_id AND cl.r = rc.r + o.dr
         AND cl.c = rc.c + o.dc AND NOT cl.m),
    filled AS MATERIALIZED (
        SELECT cl.img_id, cl.r, cl.c,
               (cl.m OR rc.r IS NULL) AS f
        FROM cells cl LEFT JOIN reach rc
          ON rc.img_id = cl.img_id AND rc.r = cl.r AND rc.c = cl.c),
    fpix AS MATERIALIZED (SELECT img_id, r, c FROM filled WHERE f),
    lbl AS (
        SELECT img_id, r, c, r * 12 + c AS lab FROM fpix
        UNION
        SELECT p.img_id, p.r, p.c, l.lab
        FROM lbl l,
             (VALUES (-1, -1), (-1, 0), (-1, 1), (0, -1),
                     (0, 1), (1, -1), (1, 0), (1, 1)) AS o(dr, dc)
        JOIN fpix p
          ON p.img_id = l.img_id AND p.r = l.r + o.dr
         AND p.c = l.c + o.dc),
    comp AS MATERIALIZED (
             SELECT img_id, r, c, min(lab) AS inst
             FROM lbl GROUP BY img_id, r, c),
    sg0 AS (
        SELECT img_id, list(CASE WHEN f THEN 1 ELSE 0 END ORDER BY i)
                   AS g
        FROM (SELECT img_id, f, r * 12 + c + 1 AS i FROM filled)
        GROUP BY img_id),
    {chain},
    skel AS (
        SELECT img_id, (i - 1) // 12 AS r, (i - 1) % 12 AS c
        FROM (SELECT img_id, unnest(g) AS v,
                     unnest(generate_series(1, 144)) AS i
              FROM {final})
        WHERE v = 1)
    SELECT comp.img_id, CAST(comp.inst AS BIGINT) AS instance,
           CAST(count(*) AS BIGINT) AS n_fill_px,
           CAST(sum(CASE WHEN sk.r IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_skel_px,
           CAST(sum(CASE WHEN sk.r IS NOT NULL
                         THEN comp.r * 12 + comp.c + 1 ELSE 0 END)
                AS BIGINT) AS skel_checksum
    FROM comp LEFT JOIN skel sk
      ON sk.img_id = comp.img_id AND sk.r = comp.r AND sk.c = comp.c
    GROUP BY comp.img_id, comp.inst
    """


@query("textsnake_center_decode", oracle=_textsnake_oracle())
def textsnake_center_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textsnake center-mask decode chain composed end-to-end
    (wrapper.py:306-370: fill_hole on the center mask -> per-instance
    isolation via contours -> skeletonize each instance): key-derived
    12x12 masks carry a holed ring and a solid bar per image; the real
    kernels run the whole chain (fill_hole, 8-connected
    label_components, Zhang-Suen skeletonize — instances are
    row-separated >= 2 so whole-grid thinning == per-instance), and the
    oracle replays all three stages in SQL (BFS reachability, min-label
    closure over an 8-neighbor offsets table, the shared unrolled
    Zhang-Suen chain). Per-(image, instance) pixel counts and the
    positional checksum are exact integers. One narrow mapInPandas."""
    from my_ocr_spark.kernel.morphology import (
        fill_hole, label_components, skeletonize,
    )

    o = (t(spark, sf_dir, "orders").select("o_orderkey")
         .filter(F.col("o_orderkey") % 37 == 0))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr, cc = np.mgrid[0:12, 0:12]
        wgt = rr * 12 + cc + 1
        for pdf in batches:
            out = {"img_id": [], "instance": [], "n_fill_px": [],
                   "n_skel_px": [], "skel_checksum": []}
            for k in pdf["o_orderkey"]:
                k = int(k)
                m = _ts_mask_numpy(k, rr, cc)
                f = fill_hole(m)
                lab = label_components(f, connectivity=8)
                sk = skeletonize(f)
                for inst in np.unique(lab[lab >= 0]):
                    sel = lab == inst
                    out["img_id"].append(k)
                    out["instance"].append(int(inst))
                    out["n_fill_px"].append(int(sel.sum()))
                    out["n_skel_px"].append(int((sk & sel).sum()))
                    out["skel_checksum"].append(int(wgt[sk & sel].sum()))
            yield pd.DataFrame(out)

    return spread_small_scan(o).mapInPandas(run, schema=_TS_OUT)


# --- textsnake centralize (normal marching, wrapper.py:245-272) -------------

_CEN_OUT = T.StructType([
    T.StructField("img_id", T.LongType(), False),
    T.StructField("axis", T.StringType(), False),
    T.StructField("top_pos", T.DoubleType(), False),
    T.StructField("bot_pos", T.DoubleType(), False),
    T.StructField("center_y", T.LongType(), False),
    T.StructField("center_x", T.LongType(), False),
])


@query(
    "centralize_normals",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS img_id, o_orderkey AS k,
               CAST(0.25 AS DOUBLE) * (2 + 2 * (o_orderkey % 3)) AS s
        FROM orders WHERE o_orderkey % 23 = 0),
    cfg AS (
        SELECT img_id, 'y' AS axis, s,
               CAST(2 + k % 3 AS BIGINT) AS lo,
               CAST(2 + k % 3 + 5 + k % 4 AS BIGINT) AS hi,
               CAST(2 + k % 3 + k % (6 + k % 4) AS BIGINT) AS p0
        FROM base WHERE k % 2 = 0
        UNION ALL
        SELECT img_id, 'x' AS axis, s,
               greatest(CAST((k // 2) % 2 AS BIGINT), 1) AS lo,
               CAST(9 + k % 5 AS BIGINT) AS hi,
               CAST((k // 2) % 2 + 1
                    + k % (9 + k % 5 - (k // 2) % 2) AS BIGINT) AS p0
        FROM base WHERE k % 2 = 1),
    m AS (
        SELECT img_id, axis,
               p0 + (ceil((hi + 1 - p0) / s) - 1) * s AS top_pos,
               p0 - floor((p0 - lo) / s) * s AS bot_pos
        FROM cfg)
    SELECT img_id, axis, top_pos, bot_pos,
           CASE WHEN axis = 'y'
                THEN CAST(floor((top_pos + bot_pos) / 2) AS BIGINT)
                ELSE 8 END AS center_y,
           CASE WHEN axis = 'x'
                THEN CAST(floor((top_pos + bot_pos) / 2) AS BIGINT)
                ELSE 8 END AS center_x
    FROM m
    """,
)
def centralize_normals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textsnake centralize (wrapper.py:245-272): skeleton points march
    both ways along their normals until the int-truncated probe leaves
    the contour mask, center = truncated midpoint. Fixtures make every
    stopping position closed-form: dyadic steps (0.25 * radius with
    radius in {2,4,6} → step {0.5,1,1.5}, all arithmetic exact in
    float64), bar masks with integer bounds, even keys marching
    vertically and odd keys horizontally — the horizontal family pins
    the reference's asymmetric ``next_x > 0`` bound: bars with
    a = (k // 2) % 2 = 0 cover column 0, yet the leftward march stops
    at column 1 (lo is greatest(a, 1) in the oracle for exactly that
    reason, and it now binds for half the odd keys). The kernel
    runs the real per-point marching loop; the oracle computes the
    stop counts as ceil/floor closed forms. One narrow mapInPandas."""
    from my_ocr_spark.kernel.morphology import march_along_normals

    o = (t(spark, sf_dir, "orders").select("o_orderkey")
         .filter(F.col("o_orderkey") % 23 == 0))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"img_id": [], "axis": [], "top_pos": [],
                   "bot_pos": [], "center_y": [], "center_x": []}
            for k in pdf["o_orderkey"]:
                k = int(k)
                s = 0.25 * (2 + 2 * (k % 3))
                mask = np.zeros((16, 16), dtype=bool)
                if k % 2 == 0:
                    a = 2 + k % 3
                    b = a + 5 + k % 4
                    p0 = a + k % (b - a + 1)
                    mask[a:b + 1, :] = True
                    pts = np.array([[float(p0), 8.0]])
                    step = np.array([[s, 0.0]])
                    axis = "y"
                else:
                    # (k // 2) % 2: half the odd keys start the bar at
                    # column 0, so the reference's asymmetric next_x > 0
                    # stop GENUINELY diverges from the mask bound (the
                    # oracle's lo = greatest(a, 1)); with a = k % 2 the
                    # mask never covered column 0 and the quirk was
                    # unexercised
                    a = (k // 2) % 2
                    b = 9 + k % 5
                    p0 = a + 1 + k % (b - a)
                    mask[:, a:b + 1] = True
                    pts = np.array([[8.0, float(p0)]])
                    step = np.array([[0.0, s]])
                    axis = "x"
                top = march_along_normals(pts, step, mask, 1)[0]
                bot = march_along_normals(pts, step, mask, -1)[0]
                dim = 0 if axis == "y" else 1
                center = int((top[dim] + bot[dim]) * 0.5)  # trunc, +ve
                out["img_id"].append(k)
                out["axis"].append(axis)
                out["top_pos"].append(float(top[dim]))
                out["bot_pos"].append(float(bot[dim]))
                out["center_y"].append(center if axis == "y" else 8)
                out["center_x"].append(center if axis == "x" else 8)
            yield pd.DataFrame(out)

    return spread_small_scan(o).mapInPandas(run, schema=_CEN_OUT)


# --- DBNet bitmap decode: binarize -> trace -> unclip -> minAreaRect --------

_DBD_OUT = T.StructType([
    T.StructField("img_id", T.LongType(), False),
    T.StructField("comp", T.LongType(), False),
    T.StructField("n_walk", T.LongType(), False),
    T.StructField("n_vertices", T.LongType(), False),
    T.StructField("vtx_checksum", T.LongType(), False),
    T.StructField("area2", T.LongType(), False),
    T.StructField("peri", T.DoubleType(), False),
    T.StructField("unclip_d", T.DoubleType(), False),
    T.StructField("score", T.DoubleType(), False),
    T.StructField("rect_short", T.DoubleType(), False),
    T.StructField("rect_long", T.DoubleType(), False),
])


def _dbd_prob_numpy(k: int, rr: np.ndarray, cc: np.ndarray) -> np.ndarray:
    """Three instances per 16x16 prob map, mirrored exactly by the SQL
    ``cells`` expression in the oracle: a solid rectangle (keyed height
    2..4 — the 2-tall family fails the width filter), an L (whose
    8-connected trace crosses the reflex corner DIAGONALLY, putting one
    sqrt(2) edge in the perimeter fold), and a 1-px-wide bar whose
    compressed trace has 2 vertices — the reference's ``< 4 points``
    drop. On-shape probability is dyadic (0.5 + (..%5)/16, always >
    mask_thr) so binarize recovers the shapes and every score sum is
    exact; background 0.125."""
    a = (rr >= 1) & (rr <= 2 + k % 3) & (cc >= 1) & (cc <= 3 + k % 5)
    bar = (cc == 13) & (rr >= 1) & (rr <= 4 + k % 3)
    cb = 1 + k % 3
    ell = (((rr >= 7) & (rr <= 13) & (cc >= cb) & (cc <= cb + 2))
           | ((rr >= 11) & (rr <= 13) & (cc >= cb)
              & (cc <= cb + 5 + k % 4)))
    shape = a | bar | ell
    return np.where(shape,
                    0.5 + ((k * 7 + 3 * rr + 11 * cc) % 5) / 16.0,
                    0.125)


_DBD_ORACLE = """
    WITH RECURSIVE keys AS (
        SELECT o_orderkey AS img, o_orderkey AS k
        FROM orders WHERE o_orderkey % 41 = 0),
    dirs AS MATERIALIZED (
        SELECT * FROM (VALUES (0,0,1),(1,1,1),(2,1,0),(3,1,-1),
                              (4,0,-1),(5,-1,-1),(6,-1,0),(7,-1,1))
            t(di, dr, dc)),
    cells AS (
        SELECT img, k, r, c,
               ((r BETWEEN 1 AND 2 + k % 3 AND c BETWEEN 1 AND 3 + k % 5)
                OR (c = 13 AND r BETWEEN 1 AND 4 + k % 3)
                OR (r BETWEEN 7 AND 13
                    AND c BETWEEN 1 + k % 3 AND 3 + k % 3)
                OR (r BETWEEN 11 AND 13
                    AND c BETWEEN 1 + k % 3 AND 6 + k % 3 + k % 4)) AS m
        FROM keys,
             (SELECT unnest(generate_series(0, 15)) AS r),
             (SELECT unnest(generate_series(0, 15)) AS c)),
    px AS MATERIALIZED (SELECT img, k, r, c FROM cells WHERE m),
    lbl AS (
        SELECT img, r, c, r * 16 + c AS lab FROM px
        UNION
        SELECT p.img, p.r, p.c, l.lab
        FROM lbl l, dirs o
        JOIN px p
          ON p.img = l.img AND p.r = l.r + o.dr AND p.c = l.c + o.dc),
    comp AS MATERIALIZED (
        SELECT img, r, c, min(lab) AS comp FROM lbl GROUP BY img, r, c),
    succ AS MATERIALIZED (
        SELECT img, comp, r, c, bdir, nr, nc, nbdir FROM (
            SELECT s.img, s.comp, s.r, s.c, b.bdir,
                   p.r AS nr, p.c AS nc,
                   ((d.di // 2) * 2 + 6) % 8 AS nbdir,
                   row_number() OVER (
                       PARTITION BY s.img, s.comp, s.r, s.c, b.bdir
                       ORDER BY (d.di - b.bdir + 7) % 8) AS rn
            FROM comp s
            CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bdir) b
            CROSS JOIN dirs d
            JOIN comp p
              ON p.img = s.img AND p.comp = s.comp
             AND p.r = s.r + d.dr AND p.c = s.c + d.dc)
        WHERE rn = 1),
    start AS MATERIALIZED (
        SELECT img, comp, r, c FROM (
            SELECT img, comp, r, c,
                   row_number() OVER (
                       PARTITION BY img, comp ORDER BY r, c) AS rn
            FROM comp) WHERE rn = 1),
    walk AS (
        SELECT st.img, st.comp, 0 AS step,
               u.nr AS r, u.nc AS c, u.nbdir AS bdir,
               u.nr AS fr, u.nc AS fc, u.nbdir AS fb
        FROM start st
        JOIN succ u ON u.img = st.img AND u.comp = st.comp
                   AND u.r = st.r AND u.c = st.c AND u.bdir = 4
        UNION ALL
        SELECT w.img, w.comp, w.step + 1, u.nr, u.nc, u.nbdir,
               w.fr, w.fc, w.fb
        FROM walk w
        JOIN succ u ON u.img = w.img AND u.comp = w.comp
                   AND u.r = w.r AND u.c = w.c AND u.bdir = w.bdir
        WHERE NOT (u.nr = w.fr AND u.nc = w.fc AND u.nbdir = w.fb)),
    wl AS MATERIALIZED (
        SELECT img, comp, count(*) AS n FROM walk GROUP BY img, comp),
    ring0 AS (
        SELECT w.img, w.comp, w.step, w.r, w.c,
               wn.r - w.r AS odr, wn.c - w.c AS odc,
               w.r - wp.r AS idr, w.c - wp.c AS idc
        FROM walk w
        JOIN wl ON wl.img = w.img AND wl.comp = w.comp
        JOIN walk wn ON wn.img = w.img AND wn.comp = w.comp
                   AND wn.step = (w.step + 1) % wl.n
        JOIN walk wp ON wp.img = w.img AND wp.comp = w.comp
                   AND wp.step = (w.step + wl.n - 1) % wl.n),
    verts AS (
        SELECT img, comp, step, r, c,
               row_number() OVER (
                   PARTITION BY img, comp ORDER BY step) AS vi,
               count(*) OVER (PARTITION BY img, comp) AS nv
        FROM ring0 WHERE odr != idr OR odc != idc),
    vend AS (
        SELECT v.img, v.comp, v.vi, v.nv, v.r, v.c,
               v2.r AS nr, v2.c AS nc
        FROM verts v
        JOIN verts v2 ON v2.img = v.img AND v2.comp = v.comp
                     AND v2.vi = v.vi % v.nv + 1),
    geom AS (
        SELECT img, comp, max(nv) AS n_vertices,
               abs(sum(c * nr - nc * r)) AS area2,
               list_aggregate(list(sqrt(CAST((nr - r) * (nr - r)
                   + (nc - c) * (nc - c) AS DOUBLE)) ORDER BY vi),
                   'sum') AS peri,
               min(r) AS mr, max(r) AS xr, min(c) AS mc, max(c) AS xc,
               sum(vi * (r * 16 + c + 1)) AS vtx_checksum
        FROM vend GROUP BY img, comp),
    scores AS (
        SELECT c.img, c.comp,
               sum(0.5 + CAST((k.k * 7 + 3 * c.r + 11 * c.c) % 5
                   AS DOUBLE) / 16.0) / count(*) AS score
        FROM comp c JOIN keys k ON k.img = c.img
        GROUP BY c.img, c.comp)
    SELECT g.img AS img_id, CAST(g.comp AS BIGINT) AS comp,
           CAST(wl.n AS BIGINT) AS n_walk,
           CAST(g.n_vertices AS BIGINT) AS n_vertices,
           CAST(g.vtx_checksum AS BIGINT) AS vtx_checksum,
           CAST(g.area2 AS BIGINT) AS area2,
           g.peri AS peri,
           CAST(g.area2 AS DOUBLE) * 0.75 / g.peri AS unclip_d,
           s.score AS score,
           floor((least(g.xr - g.mr, g.xc - g.mc)
                  + 2 * (CAST(g.area2 AS DOUBLE) * 0.75 / g.peri)) * 1e4
                 + 0.5) / 1e4 AS rect_short,
           floor((greatest(g.xr - g.mr, g.xc - g.mc)
                  + 2 * (CAST(g.area2 AS DOUBLE) * 0.75 / g.peri)) * 1e4
                 + 0.5) / 1e4 AS rect_long
    FROM geom g
    JOIN wl ON wl.img = g.img AND wl.comp = g.comp
    JOIN scores s ON s.img = g.img AND s.comp = g.comp
    WHERE g.n_vertices >= 4 AND s.score >= 0.62
      AND least(g.xr - g.mr, g.xc - g.mc)
          + 2 * (CAST(g.area2 AS DOUBLE) * 0.75 / g.peri) > 3.0
"""


@query("db_decode_boundaries", oracle=_DBD_ORACLE)
def db_decode_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DBNet bitmap-decode chain composed end-to-end
    (``db_decode``, wrapper.py:177-229 + the quad branch of
    points2boundary, mask.py:26-31): binarize the prob map ->
    8-connected components -> Moore boundary trace + collinear-run
    compression (the findContours/approxPolyDP stage) -> drop < 4
    vertices -> exact region-score filter -> unclip
    (d = area*1.5/peri, polyclip.unclip_polygon miter offset) ->
    min-area rect via hull + rotating calipers -> width filter.

    The Spark side runs the real kernels for every stage
    (kernel/morphology.db_decode_regions). The oracle replays the
    trace EXACTLY in SQL: min-label component closure, then the Moore
    successor relation materialized as a rank-1 clockwise scan over an
    offsets table, then a pure-join recursive walk terminated on
    recurrence of the first-move state (Jacob's criterion), then
    direction-change compression — and the downstream stages in closed
    form: shoelace area2 / left-to-right sqrt perimeter fold (one
    diagonal edge per L — bit-exact vs numpy's sequential sum at < 8
    edges), unclip_d = area2*0.75/peri (single correctly-rounded
    division), and rect sides = ring bbox + 2d, which
    test_morphology pins equal to the kernel's calipers output over
    the whole fixture family (rectilinear-plus-one-diagonal shapes
    whose min-area rect IS the axis bbox; 4dp floor-half-up rounding
    margin also pinned there). Scores are exact dyadic sums. One
    narrow mapInPandas over the key scan; all shuffles happen in
    DuckDB only."""
    from my_ocr_spark.kernel.morphology import db_decode_regions

    o = (t(spark, sf_dir, "orders").select("o_orderkey")
         .filter(F.col("o_orderkey") % 41 == 0))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr, cc = np.mgrid[0:16, 0:16]
        # every fixture parameter is a function of (k%3, k%5, k%4) and
        # the score of k%5 — lcm 60 — so the full decode chain runs
        # once per class and broadcasts over the batch (the shrink/warp
        # memoization pattern; the chain is ~1.4 ms of per-image
        # Python otherwise)
        memo: dict[int, list[tuple]] = {}

        def solve(cls: int) -> list[tuple]:
            if cls not in memo:
                prob = _dbd_prob_numpy(cls, rr, cc)
                rows = []
                for reg in db_decode_regions(prob, mask_thr=0.3,
                                             min_text_score=0.62,
                                             min_text_width=3.0,
                                             unclip_ratio=1.5):
                    ring = reg["ring"]
                    cs = sum((i + 1) * (int(r) * 16 + int(c) + 1)
                             for i, (r, c) in enumerate(ring))
                    rows.append((
                        reg["label"], reg["n_walk"], reg["n_vertices"],
                        int(cs), int(round(2 * reg["area"])),
                        reg["peri"], reg["unclip_d"], reg["score"],
                        float(np.floor(reg["rect_short"] * 1e4 + 0.5)
                              / 1e4),
                        float(np.floor(reg["rect_long"] * 1e4 + 0.5)
                              / 1e4)))
                memo[cls] = rows
            return memo[cls]

        for pdf in batches:
            out = {f.name: [] for f in _DBD_OUT.fields}
            for k in pdf["o_orderkey"]:
                k = int(k)
                for row in solve(k % 60):
                    out["img_id"].append(k)
                    for name, v in zip(
                            ("comp", "n_walk", "n_vertices",
                             "vtx_checksum", "area2", "peri",
                             "unclip_d", "score", "rect_short",
                             "rect_long"), row):
                        out[name].append(v)
            yield pd.DataFrame(out)

    return spread_small_scan(o).mapInPandas(run, schema=_DBD_OUT)
