"""Dataset-converter ETL queries (SURVEY.md §2.1 data converters).

Reference analog: ``tools/data/textdet/icdar_converter.py:100-144``
(``load_img_info``): parse ICDAR-2015 groundtruth lines
``x1,y1,x2,y2,x3,y3,x4,y4,transcription`` into COCO-style annotation
rows — polygon → XYWH bbox via bounds, shoelace area, ``iscrowd=1``
for the '###' ignore marker. The reference runs this per-file with
``mmcv.track_parallel_progress``; here it is one DataFrame transform
(a line-parse stage, like LoaderParsertxt), so a billion-annotation
conversion is a single shuffle-free scan.

The gt lines are synthesized deterministically from lineitem keys and
then genuinely PARSED (split → cast → geometry) on both engines — the
oracle runs the identical parse in DuckDB SQL, so the string→COCO path
itself is what the driver verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_ocr_spark.plans.registry import query, t

# shared construction of the raw gt line (identical on both engines)
_LINE_SQL = """
    concat_ws(',',
        CAST(x0 AS VARCHAR), CAST(y0 AS VARCHAR),
        CAST(x0 + w AS VARCHAR), CAST(y0 AS VARCHAR),
        CAST(x0 + w AS VARCHAR), CAST(y0 + h AS VARCHAR),
        CAST(x0 AS VARCHAR), CAST(y0 + h AS VARCHAR),
        txt)
"""


@query(
    "icdar_convert_coco",
    oracle=f"""
    WITH raw AS (
        SELECT l_orderkey, l_linenumber,
               l_orderkey % 997 AS x0, l_partkey % 983 AS y0,
               l_suppkey % 50 + 10 AS w, l_linenumber * 7 + 5 AS h,
               CASE WHEN (l_orderkey + l_linenumber) % 5 = 0 THEN '###'
                    ELSE 'w' || CAST(l_linenumber AS VARCHAR) END AS txt
        FROM lineitem
    ),
    lines AS (
        SELECT l_orderkey, l_linenumber,
               {_LINE_SQL} AS gt_line
        FROM raw
    ),
    parsed AS (
        SELECT l_orderkey, l_linenumber, gt_line,
               list_transform(string_split(gt_line, ',')[1:8],
                              s -> CAST(s AS INTEGER)) AS xy,
               string_split(gt_line, ',')[9] AS transcription
        FROM lines
    )
    SELECT 'train/img_' || CAST(l_orderkey AS VARCHAR) || '.jpg'
               AS file_name,
           CAST(l_linenumber AS INTEGER) AS line_no,
           CAST(1 AS INTEGER) AS category_id,
           CAST(least(xy[1], xy[3], xy[5], xy[7]) AS INTEGER) AS bbox_x,
           CAST(least(xy[2], xy[4], xy[6], xy[8]) AS INTEGER) AS bbox_y,
           CAST(greatest(xy[1], xy[3], xy[5], xy[7])
                - least(xy[1], xy[3], xy[5], xy[7]) AS INTEGER) AS bbox_w,
           CAST(greatest(xy[2], xy[4], xy[6], xy[8])
                - least(xy[2], xy[4], xy[6], xy[8]) AS INTEGER) AS bbox_h,
           abs(CAST(xy[1] * xy[4] - xy[3] * xy[2]
                    + xy[3] * xy[6] - xy[5] * xy[4]
                    + xy[5] * xy[8] - xy[7] * xy[6]
                    + xy[7] * xy[2] - xy[1] * xy[8] AS DOUBLE)) / 2.0
               AS area,
           CASE WHEN transcription = '###' THEN 1 ELSE 0 END AS iscrowd,
           transcription
    FROM parsed
    """,
)
def icdar_convert_coco(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICDAR-2015 gt-line → COCO annotation rows
    (icdar_converter.py:100-144): synthesize the raw comma-separated gt
    line per annotation, then parse it back — split, 8 coordinate casts,
    polygon bounds → XYWH bbox, shoelace area, '###' → iscrowd. The
    parse, not the synthesis, is the operator under test; a real
    conversion swaps the synthesis CTE for ``spark.read.text`` over the
    gt files (LoaderParsertxt, sources/loaders.py) and keeps everything
    downstream unchanged."""
    li = t(spark, sf_dir, "lineitem")
    raw = li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_orderkey") % 997).alias("x0"),
        (F.col("l_partkey") % 983).alias("y0"),
        (F.col("l_suppkey") % 50 + 10).alias("w"),
        (F.col("l_linenumber") * 7 + 5).alias("h"),
        F.when((F.col("l_orderkey") + F.col("l_linenumber")) % 5 == 0,
               F.lit("###"))
         .otherwise(F.concat(F.lit("w"),
                             F.col("l_linenumber").cast("string")))
         .alias("txt"))
    lines = raw.select(
        "l_orderkey", "l_linenumber",
        F.expr(_LINE_SQL.replace(" AS VARCHAR", " AS STRING"))
            .alias("gt_line"))
    parsed = lines.select(
        "l_orderkey", "l_linenumber", "gt_line",
        F.expr("transform(slice(split(gt_line, ','), 1, 8),"
               " s -> CAST(s AS INT))").alias("xy"),
        F.expr("element_at(split(gt_line, ','), 9)")
            .alias("transcription"))
    x = [F.expr(f"element_at(xy, {i})") for i in range(1, 9)]
    min_x = F.least(x[0], x[2], x[4], x[6])
    min_y = F.least(x[1], x[3], x[5], x[7])
    max_x = F.greatest(x[0], x[2], x[4], x[6])
    max_y = F.greatest(x[1], x[3], x[5], x[7])
    shoelace = (x[0] * x[3] - x[2] * x[1]
                + x[2] * x[5] - x[4] * x[3]
                + x[4] * x[7] - x[6] * x[5]
                + x[6] * x[1] - x[0] * x[7])
    return parsed.select(
        F.concat(F.lit("train/img_"),
                 F.col("l_orderkey").cast("string"),
                 F.lit(".jpg")).alias("file_name"),
        F.col("l_linenumber").cast("int").alias("line_no"),
        F.lit(1).cast("int").alias("category_id"),
        min_x.cast("int").alias("bbox_x"),
        min_y.cast("int").alias("bbox_y"),
        (max_x - min_x).cast("int").alias("bbox_w"),
        (max_y - min_y).cast("int").alias("bbox_h"),
        (F.abs(shoelace.cast("double")) / 2.0).alias("area"),
        F.when(F.col("transcription") == "###", 1).otherwise(0)
            .cast("int").alias("iscrowd"),
        "transcription")


# ctw1500 gt line: 28 ints (14 polygon vertices) then a '####'-prefixed
# text field (ctw1500_converter.py:116-143). The 14-gon synthesis bends
# top and bottom edges independently (curved-text shape). Same formula,
# one expression per SQL dialect (array literal / concat syntax differ).
_CTW_COORD_SQL = """
    flatten(list_transform(generate_series(0, 6), i -> [
        bx + i * w7, by + (k + i * 3) % 9
    ])) || flatten(list_transform(generate_series(0, 6), i -> [
        bx + (6 - i) * w7, by + 30 + (k + (6 - i) * 5) % 9
    ]))
"""
_CTW_COORD_SPARK = """
    concat(
        flatten(transform(sequence(0, 6), i ->
            array(bx + i * w7, by + (k + i * 3) % 9))),
        flatten(transform(sequence(0, 6), i ->
            array(bx + (6 - i) * w7, by + 30 + (k + (6 - i) * 5) % 9))))
"""


@query(
    "ctw1500_convert_coco",
    oracle=f"""
    WITH raw AS (
        SELECT l_orderkey * 10 + l_linenumber AS poly_id,
               l_orderkey AS k,
               l_orderkey % 800 AS bx, l_partkey % 600 AS by,
               l_suppkey % 20 + 5 AS w7,
               'w' || CAST(l_linenumber AS VARCHAR) AS word
        FROM lineitem
    ),
    lines AS (
        SELECT poly_id,
               array_to_string({_CTW_COORD_SQL}, ',')
                   || ',####' || word AS gt_line
        FROM raw
    ),
    parsed AS (
        SELECT poly_id, gt_line,
               list_transform(string_split(gt_line, ',')[1:28],
                              s -> CAST(s AS BIGINT)) AS xy,
               string_split(gt_line, ',')[29] AS tail
        FROM lines
    ),
    geo AS (
        SELECT poly_id, tail, xy,
               list_min(list_transform(generate_series(0, 13),
                        i -> xy[2 * i + 1])) AS min_x,
               list_max(list_transform(generate_series(0, 13),
                        i -> xy[2 * i + 1])) AS max_x,
               list_min(list_transform(generate_series(0, 13),
                        i -> xy[2 * i + 2])) AS min_y,
               list_max(list_transform(generate_series(0, 13),
                        i -> xy[2 * i + 2])) AS max_y,
               list_aggregate(list_transform(generate_series(0, 13), i ->
                   xy[2 * i + 1] * xy[2 * ((i + 1) % 14) + 2]
                   - xy[2 * ((i + 1) % 14) + 1] * xy[2 * i + 2]),
                   'sum') AS shoelace2
        FROM parsed
    )
    SELECT poly_id,
           CAST(14 AS INTEGER) AS n_vertices,
           CAST(min_x AS INTEGER) AS bbox_x,
           CAST(min_y AS INTEGER) AS bbox_y,
           CAST(max_x - min_x AS INTEGER) AS bbox_w,
           CAST(max_y - min_y AS INTEGER) AS bbox_h,
           abs(CAST(shoelace2 AS DOUBLE)) / 2.0 AS area,
           substr(tail, 5) AS transcription
    FROM geo
    """,
)
def ctw1500_convert_coco(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTW1500 curved-text gt line → COCO rows
    (ctw1500_converter.py:116-143 ``load_txt_info``): 28 comma-separated
    ints form a 14-vertex polygon, the trailing '####'-prefixed field is
    the transcription. Parse: split → 28 casts → cyclic shoelace over
    the 14-gon → bounds bbox; '####' stripped for the transcription.
    Same parse in DuckDB SQL verifies the string→geometry path."""
    li = t(spark, sf_dir, "lineitem")
    raw = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("poly_id"),
        F.col("l_orderkey").alias("k"),
        (F.col("l_orderkey") % 800).alias("bx"),
        (F.col("l_partkey") % 600).alias("by"),
        (F.col("l_suppkey") % 20 + 5).alias("w7"),
        F.concat(F.lit("w"), F.col("l_linenumber").cast("string"))
        .alias("word"))
    lines = raw.select(
        "poly_id",
        F.expr(f"concat(array_join({_CTW_COORD_SPARK}, ','),"
               f" ',####', word)").alias("gt_line"))
    parsed = lines.select(
        "poly_id", "gt_line",
        F.expr("transform(slice(split(gt_line, ','), 1, 28),"
               " s -> CAST(s AS BIGINT))").alias("xy"),
        F.expr("element_at(split(gt_line, ','), 29)").alias("tail"))
    xs = "transform(sequence(0, 13), i -> element_at(xy, 2 * i + 1))"
    ys = "transform(sequence(0, 13), i -> element_at(xy, 2 * i + 2))"
    shoelace2 = F.expr(
        "aggregate(transform(sequence(0, 13), i ->"
        " element_at(xy, 2 * i + 1)"
        "   * element_at(xy, 2 * pmod(i + 1, 14) + 2)"
        " - element_at(xy, 2 * pmod(i + 1, 14) + 1)"
        "   * element_at(xy, 2 * i + 2)), 0L, (a, x) -> a + x)")
    geo = parsed.select(
        "poly_id", "tail",
        F.expr(f"array_min({xs})").alias("min_x"),
        F.expr(f"array_max({xs})").alias("max_x"),
        F.expr(f"array_min({ys})").alias("min_y"),
        F.expr(f"array_max({ys})").alias("max_y"),
        shoelace2.alias("shoelace2"))
    return geo.select(
        "poly_id",
        F.lit(14).cast("int").alias("n_vertices"),
        F.col("min_x").cast("int").alias("bbox_x"),
        F.col("min_y").cast("int").alias("bbox_y"),
        (F.col("max_x") - F.col("min_x")).cast("int").alias("bbox_w"),
        (F.col("max_y") - F.col("min_y")).cast("int").alias("bbox_h"),
        (F.abs(F.col("shoelace2").cast("double")) / 2.0).alias("area"),
        F.expr("substring(tail, 5)").alias("transcription"))
