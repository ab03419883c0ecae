"""Geometric operators (SURVEY.md §2.3/2.5/2.7/2.8): NMS, polygon area,
global hmean accumulation, worst-first ranklist, word-box line stitching —
boxes synthesized deterministically from the relational tables so both
engines compute from identical inputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F, types as T

from my_ocr_spark.plans.registry import query, t
from my_ocr_spark.plans.relational import _GT_SQL, _PRED_SQL, _gt_pred


_BOXES_SQL = """
    SELECT l_orderkey * 10 + l_linenumber AS box_id,
           l_orderkey % 2000 AS img,
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


@query("poly_nms_greedy")  # greedy = inherently sequential → rows-only
def poly_nms_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact greedy NMS (wrapper.py:477-498 semantics: take best-scored,
    suppress overlapping, repeat) per image via applyInPandas — bounded
    per-image work, images processed in parallel. Stable tie-break by
    box_id mirrors the reference's stable sort (wrapper.py:480)."""
    b = _boxes(spark, sf_dir)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["score", "box_id"],
                              ascending=[False, True], kind="mergesort")
        kept: list = []
        out = {"img": [], "box_id": [], "score": []}
        for r in pdf.itertuples(index=False):
            ok = True
            for kr in kept:
                inter = max(0.0, min(r.e, kr.e) - max(r.s, kr.s))
                union = (r.e - r.s) + (kr.e - kr.s) - inter
                if union > 0 and inter / union > 0.5:
                    ok = False
                    break
            if ok:
                kept.append(r)
                out["img"].append(int(r.img))
                out["box_id"].append(int(r.box_id))
                out["score"].append(float(r.score))
        return pd.DataFrame(out)

    return b.groupBy("img").applyInPandas(run, schema=_NMS_OUT)


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


@query(
    "stitch_words_gap_split",
    oracle="""
    WITH boxes AS (
        SELECT l_orderkey AS img, l_linenumber AS line_no,
               CAST((l_partkey % 50) * 12 AS DOUBLE) AS x0,
               CAST((l_partkey % 50) * 12 + 8 + l_suppkey % 7 AS DOUBLE)
                   AS x1
        FROM lineitem
    ),
    flagged AS (
        SELECT img, line_no, x0, x1,
               CASE WHEN x0 - max(x1) OVER
                    (PARTITION BY img, line_no ORDER BY x0, x1
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 15
                    OR max(x1) OVER
                    (PARTITION BY img, line_no ORDER BY x0, x1
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
               THEN 1 ELSE 0 END AS new_seg
        FROM boxes
    ),
    segs AS (
        SELECT img, line_no,
               sum(new_seg) OVER (PARTITION BY img, line_no
                                  ORDER BY x0, x1
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
    skeleton as sessionize_events, on spatial data."""
    li = t(spark, sf_dir, "lineitem")
    boxes = li.select(
        F.col("l_orderkey").alias("img"),
        F.col("l_linenumber").alias("line_no"),
        ((F.col("l_partkey") % 50) * 12).cast("double").alias("x0"),
        ((F.col("l_partkey") % 50) * 12 + 8 + F.col("l_suppkey") % 7)
        .cast("double").alias("x1"),
    )
    w = Window.partitionBy("img", "line_no").orderBy("x0", "x1")
    prev_max = F.max("x1").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_seg = F.when(prev_max.isNull()
                     | (F.col("x0") - prev_max > 15), 1).otherwise(0)
    seg = F.sum(new_seg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (boxes.withColumn("seg", seg.cast("bigint"))
                 .groupBy("img", "line_no", "seg")
                 .agg(F.count("*").alias("n_words")))
