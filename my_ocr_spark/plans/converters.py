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
from my_ocr_spark.session import spread_small_scan

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
    # spread the 1-3-split fixture scan: the synthesis/parse chains
    # below are interpreted HOF expressions (no codegen), so an
    # unspread scan runs them on 1-3 of 32 cores (invariant 5; the
    # projection is pushed below the round-robin exchange, so only
    # the referenced columns shuffle). Cost-modeled no-op at corpus
    # scale where the scan is already wide.
    li = spread_small_scan(t(spark, sf_dir, "lineitem"))
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
    # spread the 1-3-split fixture scan: the synthesis/parse chains
    # below are interpreted HOF expressions (no codegen), so an
    # unspread scan runs them on 1-3 of 32 cores (invariant 5; the
    # projection is pushed below the round-robin exchange, so only
    # the referenced columns shuffle). Cost-modeled no-op at corpus
    # scale where the scan is already wide.
    li = spread_small_scan(t(spark, sf_dir, "lineitem"))
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


# --- TotalText (curved, VARIABLE vertex count, key: value txt format) -------

# raw line synthesis shared by both engines: the TotalText txt format
# 'x: [[x1 x2 ..]], y: [[y1 y2 ..]], ornt: [u'c'], transcriptions: [u'w']'
# with m = 2 + k % 4 vertices per arc (4..10 total; m=1 rows exercise the
# reference's <3-point skip) and '#' transcriptions its ignore-skip.
_TT_XS_SQL = """
    list_transform(generate_series(0, m - 1), i -> bx + i * s) ||
    list_transform(generate_series(0, m - 1), i -> bx + (m - 1 - i) * s)
"""
_TT_YS_SQL = """
    list_transform(generate_series(0, m - 1), i -> by + (k + i * 3) % 7) ||
    list_transform(generate_series(0, m - 1),
                   i -> by + 20 + (k + (m - 1 - i) * 5) % 7)
"""
_TT_XS_SPARK = """
    concat(transform(sequence(0, m - 1), i -> bx + i * s),
           transform(sequence(0, m - 1), i -> bx + (m - 1 - i) * s))
"""
_TT_YS_SPARK = """
    concat(transform(sequence(0, m - 1), i -> by + (k + i * 3) % 7),
           transform(sequence(0, m - 1),
                     i -> by + 20 + (k + (m - 1 - i) * 5) % 7))
"""


@query(
    "totaltext_convert_coco",
    oracle=f"""
    WITH raw AS (
        SELECT l_orderkey * 10 + l_linenumber AS poly_id,
               l_orderkey AS k,
               CASE WHEN (l_orderkey + l_linenumber) % 11 = 0 THEN 1
                    ELSE 2 + l_orderkey % 4 END AS m,
               l_orderkey % 800 AS bx, l_partkey % 600 AS by,
               l_suppkey % 20 + 5 AS s,
               CASE WHEN (l_orderkey + l_linenumber) % 7 = 0 THEN '#'
                    ELSE 'w' || CAST(l_linenumber AS VARCHAR) END AS word
        FROM lineitem
    ),
    lines AS (
        SELECT poly_id,
               'x: [[' || array_to_string({_TT_XS_SQL}, ' ')
               || ']], y: [[' || array_to_string({_TT_YS_SQL}, ' ')
               || ']], ornt: [u''c''], transcriptions: [u'''
               || word || ''']' AS gt_line
        FROM raw
    ),
    parsed AS (
        SELECT poly_id, gt_line,
               list_transform(string_split(regexp_extract(gt_line,
                   'x: \\[\\[([0-9 ]+)\\]\\]', 1), ' '),
                   v -> CAST(v AS BIGINT)) AS xs,
               list_transform(string_split(regexp_extract(gt_line,
                   'y: \\[\\[([0-9 ]+)\\]\\]', 1), ' '),
                   v -> CAST(v AS BIGINT)) AS ys,
               regexp_extract(gt_line,
                   'transcriptions: \\[u''([^'']*)''\\]', 1) AS word
        FROM lines
    ),
    kept AS (
        SELECT * FROM parsed WHERE len(xs) > 2 AND word != '#'
    ),
    geo AS (
        SELECT poly_id, word, len(xs) AS n,
               list_min(xs) AS min_x, list_max(xs) AS max_x,
               list_min(ys) AS min_y, list_max(ys) AS max_y,
               list_aggregate(list_transform(
                   generate_series(0, len(xs) - 1), i ->
                   xs[i + 1] * ys[(i + 1) % len(xs) + 1]
                   - xs[(i + 1) % len(xs) + 1] * ys[i + 1]),
                   'sum') AS shoelace2
        FROM kept
    )
    SELECT poly_id,
           CAST(n AS INTEGER) AS n_vertices,
           CAST(min_x AS INTEGER) AS bbox_x,
           CAST(min_y AS INTEGER) AS bbox_y,
           CAST(max_x - min_x AS INTEGER) AS bbox_w,
           CAST(max_y - min_y AS INTEGER) AS bbox_h,
           abs(CAST(shoelace2 AS DOUBLE)) / 2.0 AS area,
           word AS transcription
    FROM geo
    """,
)
def totaltext_convert_coco(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TotalText gt line → COCO rows (totaltext_converter.py:162-206
    ``process_line``/``load_txt_info``): the 'x: [[..]], y: [[..]],
    transcriptions: [u'..']' format is regex-parsed (the reference
    regex-normalizes then yaml-loads; same extraction), VARIABLE-length
    vertex arrays (unlike CTW's fixed 14) are zipped into a polygon,
    <3-point contours are skipped (totaltext_converter.py:135-137) and
    '#' transcriptions dropped (the ignore rule, :103-106), then
    bounds → XYWH bbox and cyclic shoelace area — the COCO conversion
    (:139-155). Both engines parse the same synthesized lines; a real
    run swaps the synthesis for spark.read.text over the gt files."""
    # spread the 1-3-split fixture scan: the synthesis/parse chains
    # below are interpreted HOF expressions (no codegen), so an
    # unspread scan runs them on 1-3 of 32 cores (invariant 5; the
    # projection is pushed below the round-robin exchange, so only
    # the referenced columns shuffle). Cost-modeled no-op at corpus
    # scale where the scan is already wide.
    li = spread_small_scan(t(spark, sf_dir, "lineitem"))
    raw = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("poly_id"),
        F.col("l_orderkey").alias("k"),
        F.when((F.col("l_orderkey") + F.col("l_linenumber")) % 11 == 0,
               F.lit(1)).otherwise(2 + F.col("l_orderkey") % 4).alias("m"),
        (F.col("l_orderkey") % 800).alias("bx"),
        (F.col("l_partkey") % 600).alias("by"),
        (F.col("l_suppkey") % 20 + 5).alias("s"),
        F.when((F.col("l_orderkey") + F.col("l_linenumber")) % 7 == 0,
               F.lit("#"))
         .otherwise(F.concat(F.lit("w"),
                             F.col("l_linenumber").cast("string")))
         .alias("word"))
    # Filter on the RAW synthesis terms instead of the parsed arrays:
    # the parsed-value predicate (size(xs) > 2 AND parsed word != '#')
    # was pushed below the spread exchange and re-evaluated the whole
    # synthesis+regex+transform chain on the 1-3-split scan (measured:
    # 12.5 s with the pre-exchange stage pinned at 3 tasks; ~1.5 s
    # after). Provably the identical set: size(xs) = 2m by construction
    # (_TT_XS_SPARK concats two m-length arrays), so size(xs) > 2 <=>
    # m > 1; and the transcription regex round-trips ``word`` verbatim,
    # so parsed word != '#' <=> raw word != '#'. Oracle re-verified
    # hash-exact at sf0.01/0.1/1.0.
    raw = raw.filter((F.col("m") > 1) & (F.col("word") != "#"))
    lines = raw.select(
        "poly_id",
        F.expr(
            f"concat('x: [[', array_join({_TT_XS_SPARK}, ' '),"
            f" ']], y: [[', array_join({_TT_YS_SPARK}, ' '),"
            f" ']], ornt: [u\\'c\\'], transcriptions: [u\\'',"
            f" word, '\\']')").alias("gt_line"))
    parsed = lines.select(
        "poly_id", "gt_line",
        F.expr("transform(split(regexp_extract(gt_line,"
               " 'x: \\\\[\\\\[([0-9 ]+)\\\\]\\\\]', 1), ' '),"
               " v -> CAST(v AS BIGINT))").alias("xs"),
        F.expr("transform(split(regexp_extract(gt_line,"
               " 'y: \\\\[\\\\[([0-9 ]+)\\\\]\\\\]', 1), ' '),"
               " v -> CAST(v AS BIGINT))").alias("ys"),
        F.expr("regexp_extract(gt_line,"
               " concat('transcriptions: \\\\[u', chr(39),"
               " '([^', chr(39), ']*)', chr(39), '\\\\]'), 1)")
            .alias("word"))
    kept = parsed
    shoelace2 = F.expr(
        "aggregate(transform(sequence(0, size(xs) - 1), i ->"
        " element_at(xs, i + 1)"
        "   * element_at(ys, pmod(i + 1, size(xs)) + 1)"
        " - element_at(xs, pmod(i + 1, size(xs)) + 1)"
        "   * element_at(ys, i + 1)), 0L, (a, x) -> a + x)")
    geo = kept.select(
        "poly_id", "word", F.size("xs").alias("n"),
        F.array_min("xs").alias("min_x"), F.array_max("xs").alias("max_x"),
        F.array_min("ys").alias("min_y"), F.array_max("ys").alias("max_y"),
        shoelace2.alias("shoelace2"))
    return geo.select(
        "poly_id",
        F.col("n").cast("int").alias("n_vertices"),
        F.col("min_x").cast("int").alias("bbox_x"),
        F.col("min_y").cast("int").alias("bbox_y"),
        (F.col("max_x") - F.col("min_x")).cast("int").alias("bbox_w"),
        (F.col("max_y") - F.col("min_y")).cast("int").alias("bbox_h"),
        (F.abs(F.col("shoelace2").cast("double")) / 2.0).alias("area"),
        F.col("word").alias("transcription"))


# --- TextOCR (JSON annotations → recog crop labels) --------------------------

# shared JSON synthesis: a TextOCR-style annotation object per lineitem
# row, with dyadic-fraction bbox floats so floor/ceil are exact on both
# engines; every 9th ann is the '.' illegible marker the converter skips.
_TO_JSON_SQL = """
    '{"id": ' || CAST(poly_id AS VARCHAR)
    || ', "image_id": ' || CAST(img AS VARCHAR)
    || ', "bbox": [' || CAST(bx + 0.25 AS VARCHAR)
    || ', ' || CAST(by + 0.75 AS VARCHAR)
    || ', ' || CAST(w + 0.5 AS VARCHAR)
    || ', ' || CAST(h + 0.25 AS VARCHAR)
    || '], "utf8_string": "' || word || '"}'
"""


@query(
    "textocr_convert_labels",
    oracle=f"""
    WITH raw AS (
        SELECT l_orderkey * 10 + l_linenumber AS poly_id,
               l_orderkey AS img,
               CAST(l_orderkey % 50 - 3 AS DOUBLE) AS bx,
               CAST(l_partkey % 600 AS DOUBLE) AS by,
               CAST(l_suppkey % 40 + 8 AS DOUBLE) AS w,
               CAST(l_linenumber * 6 + 4 AS DOUBLE) AS h,
               CASE WHEN (l_orderkey + l_linenumber) % 9 = 0 THEN '.'
                    ELSE 'w' || CAST(l_partkey % 100 AS VARCHAR) END AS word
        FROM lineitem
    ),
    js AS (SELECT poly_id, img, {_TO_JSON_SQL} AS ann FROM raw),
    parsed AS (
        SELECT poly_id, img,
               CAST(json_extract(ann, '$.bbox[0]') AS DOUBLE) AS x,
               CAST(json_extract(ann, '$.bbox[1]') AS DOUBLE) AS y,
               CAST(json_extract(ann, '$.bbox[2]') AS DOUBLE) AS w,
               CAST(json_extract(ann, '$.bbox[3]') AS DOUBLE) AS h,
               json_extract_string(ann, '$.utf8_string') AS txt
        FROM js
    )
    SELECT poly_id,
           CAST(greatest(0, floor(x)) AS INTEGER) AS crop_x,
           CAST(greatest(0, floor(y)) AS INTEGER) AS crop_y,
           CAST(ceil(w) AS INTEGER) AS crop_w,
           CAST(ceil(h) AS INTEGER) AS crop_h,
           'train/img_' || CAST(img AS VARCHAR) || '_'
               || CAST(poly_id AS VARCHAR) || '.jpg ' || txt AS label_line
    FROM parsed WHERE txt != '.'
    """,
)
def textocr_convert_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextOCR JSON annotations → recog crop labels
    (textocr_converter.py:23-44 ``process_img``): parse each ann's JSON
    (from_json here, the reference mmcv.loads), skip the '.' illegible
    marker, clamp the crop to max(0, floor(x/y)) x ceil(w/h), and emit
    the 'path text' label line (list_to_file format). The JSON parse is
    the operator under test; a real run reads the annotation file with
    spark.read.json and keeps everything downstream."""
    # spread the 1-3-split fixture scan: the synthesis/parse chains
    # below are interpreted HOF expressions (no codegen), so an
    # unspread scan runs them on 1-3 of 32 cores (invariant 5; the
    # projection is pushed below the round-robin exchange, so only
    # the referenced columns shuffle). Cost-modeled no-op at corpus
    # scale where the scan is already wide.
    li = spread_small_scan(t(spark, sf_dir, "lineitem"))
    raw = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("poly_id"),
        F.col("l_orderkey").alias("img"),
        (F.col("l_orderkey") % 50 - 3).cast("double").alias("bx"),
        (F.col("l_partkey") % 600).cast("double").alias("by"),
        (F.col("l_suppkey") % 40 + 8).cast("double").alias("w"),
        (F.col("l_linenumber") * 6 + 4).cast("double").alias("h"),
        F.when((F.col("l_orderkey") + F.col("l_linenumber")) % 9 == 0,
               F.lit("."))
         .otherwise(F.concat(F.lit("w"),
                             (F.col("l_partkey") % 100).cast("string")))
         .alias("word"))
    # Filter the illegible marker on the RAW word, not the JSON-parsed
    # txt: the parsed-value predicate was pushed below the spread
    # exchange and re-ran the JSON synthesis + from_json on the
    # 1-3-split scan (same class as totaltext above). Identical set:
    # utf8_string round-trips ``word`` verbatim through the JSON
    # (values are '.' or 'w<digits>' — no escaping). Oracle
    # re-verified hash-exact at sf0.01/0.1/1.0.
    raw = raw.filter(F.col("word") != ".")
    js = raw.select(
        "poly_id", "img",
        F.expr(_TO_JSON_SQL.replace(" AS VARCHAR", " AS STRING"))
            .alias("ann"))
    parsed = js.select(
        "poly_id", "img",
        F.from_json("ann", "id LONG, image_id LONG, bbox ARRAY<DOUBLE>,"
                           " utf8_string STRING").alias("a"))
    p = parsed.select(
        "poly_id", "img",
        F.expr("a.bbox[0]").alias("x"), F.expr("a.bbox[1]").alias("y"),
        F.expr("a.bbox[2]").alias("w"), F.expr("a.bbox[3]").alias("h"),
        F.col("a.utf8_string").alias("txt"))
    return (p.select("poly_id",
                     F.greatest(F.lit(0), F.floor("x"))
                      .cast("int").alias("crop_x"),
                     F.greatest(F.lit(0), F.floor("y"))
                      .cast("int").alias("crop_y"),
                     F.ceil("w").cast("int").alias("crop_w"),
                     F.ceil("h").cast("int").alias("crop_h"),
                     F.concat(F.lit("train/img_"),
                              F.col("img").cast("string"), F.lit("_"),
                              F.col("poly_id").cast("string"),
                              F.lit(".jpg "), F.col("txt"))
                      .alias("label_line")))


# --- SynthText (char boxes → word boundary polygons) -------------------------

# Per-char box geometry as pure functions of the GLOBAL char index i
# (integers, identical on both engines):
#   X(i) = bx + 10*i .. X(i)+8 ; Ytop(i) = by + (k+i)%5 ;
#   Ybot(i) = by + 14 + (k+3*i)%5
# The ops under test are match_bbox_char_str's word segmentation (cumsum
# of word lengths over the space-stripped char stream) and
# trace_boundary's point order (top-left→top-right per char left-to-
# right, then bottom-right→bottom-left in reverse char order).
_ST_XS_SQL = """
    flatten(list_transform(generate_series(0, wl - 1), c ->
        [bx + 10 * (s0 + c), bx + 10 * (s0 + c) + 8])) ||
    flatten(list_transform(generate_series(0, wl - 1), c ->
        [bx + 10 * (s0 + wl - 1 - c) + 8, bx + 10 * (s0 + wl - 1 - c)]))
"""
_ST_YS_SQL = """
    flatten(list_transform(generate_series(0, wl - 1), c ->
        [by + (k + s0 + c) % 5, by + (k + s0 + c) % 5])) ||
    flatten(list_transform(generate_series(0, wl - 1), c ->
        [by + 14 + (k + 3 * (s0 + wl - 1 - c)) % 5,
         by + 14 + (k + 3 * (s0 + wl - 1 - c)) % 5]))
"""
_ST_XS_SPARK = """
    concat(
      flatten(transform(sequence(0, wl - 1), c ->
        array(bx + 10 * (s0 + c), bx + 10 * (s0 + c) + 8))),
      flatten(transform(sequence(0, wl - 1), c ->
        array(bx + 10 * (s0 + wl - 1 - c) + 8,
              bx + 10 * (s0 + wl - 1 - c)))))
"""
_ST_YS_SPARK = """
    concat(
      flatten(transform(sequence(0, wl - 1), c ->
        array(by + (k + s0 + c) % 5, by + (k + s0 + c) % 5))),
      flatten(transform(sequence(0, wl - 1), c ->
        array(by + 14 + (k + 3 * (s0 + wl - 1 - c)) % 5,
              by + 14 + (k + 3 * (s0 + wl - 1 - c)) % 5))))
"""


@query(
    "synthtext_convert_boundary",
    oracle=f"""
    WITH raw AS (
        SELECT l_orderkey * 10 + l_linenumber AS inst_id,
               l_orderkey AS k,
               l_orderkey % 700 AS bx, l_partkey % 500 AS by,
               'w' || CAST(l_partkey % 100 AS VARCHAR) || ' '
                   || 'x' || CAST(l_suppkey % 100 AS VARCHAR)
                   || CASE WHEN l_linenumber % 2 = 0
                           THEN ' z' || CAST(l_linenumber AS VARCHAR)
                           ELSE '' END AS text
        FROM lineitem
    ),
    wds AS (
        SELECT inst_id, k, bx, by, text,
               string_split(text, ' ') AS words
        FROM raw
    ),
    expl AS (
        SELECT inst_id, k, bx, by, words,
               unnest(generate_series(1, len(words))) AS wpos,
               unnest(words) AS word
        FROM wds
    ),
    segd AS MATERIALIZED (
        SELECT inst_id, k, bx, by, wpos, word,
               len(array_to_string(words[1:wpos], '')) - len(word) AS s0,
               len(word) AS wl
        FROM expl
    ),
    bnd AS MATERIALIZED (
        -- materialized: inlining this into the final shoelace
        -- projection stacks three levels of list-lambda expressions
        -- and exhausted DuckDB's memory limit at sf0.1 (found by the
        -- full-registry sweep); materialized it peaks at ~0.7 GB
        SELECT inst_id, wpos, word, wl,
               {_ST_XS_SQL} AS xs, {_ST_YS_SQL} AS ys
        FROM segd
    )
    SELECT inst_id, CAST(wpos AS INTEGER) AS word_idx, word,
           CAST(4 * wl AS INTEGER) AS n_points,
           CAST(list_min(xs) AS INTEGER) AS bbox_x,
           CAST(list_min(ys) AS INTEGER) AS bbox_y,
           CAST(list_max(xs) - list_min(xs) AS INTEGER) AS bbox_w,
           CAST(list_max(ys) - list_min(ys) AS INTEGER) AS bbox_h,
           abs(CAST(list_aggregate(list_transform(
               generate_series(0, len(xs) - 1), i ->
               xs[i + 1] * ys[(i + 1) % len(xs) + 1]
               - xs[(i + 1) % len(xs) + 1] * ys[i + 1]), 'sum')
               AS DOUBLE)) / 2.0 AS area
    FROM bnd
    """,
)
def synthtext_convert_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SynthText char boxes → per-word boundary polygons
    (synthtext_converter.py:15-38 ``trace_boundary`` + :42-105
    ``match_bbox_char_str``): the instance string splits into words, the
    cumulative word-length windows assign each word its global char-index
    range over the space-stripped char stream, and the word boundary is
    traced top edge left-to-right then bottom edge in reverse char order
    (2 points per char per edge). Bounds bbox + cyclic shoelace area
    finish the COCO row. All arithmetic integer; same derivation in
    DuckDB SQL."""
    # spread the 1-3-split fixture scan: the synthesis/parse chains
    # below are interpreted HOF expressions (no codegen), so an
    # unspread scan runs them on 1-3 of 32 cores (invariant 5; the
    # projection is pushed below the round-robin exchange, so only
    # the referenced columns shuffle). Cost-modeled no-op at corpus
    # scale where the scan is already wide.
    li = spread_small_scan(t(spark, sf_dir, "lineitem"))
    raw = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("inst_id"),
        F.col("l_orderkey").alias("k"),
        (F.col("l_orderkey") % 700).alias("bx"),
        (F.col("l_partkey") % 500).alias("by"),
        F.concat(
            F.lit("w"), (F.col("l_partkey") % 100).cast("string"),
            F.lit(" x"), (F.col("l_suppkey") % 100).cast("string"),
            F.when(F.col("l_linenumber") % 2 == 0,
                   F.concat(F.lit(" z"),
                            F.col("l_linenumber").cast("string")))
             .otherwise(F.lit(""))).alias("text"))
    wds = raw.withColumn("words", F.split("text", " "))
    expl = wds.select(
        "inst_id", "k", "bx", "by", "words",
        F.posexplode("words").alias("pos0", "word"))
    segd = expl.select(
        "inst_id", "k", "bx", "by", "word",
        (F.col("pos0") + 1).alias("wpos"),
        (F.expr("length(concat_ws('', slice(words, 1, pos0 + 1)))")
         - F.length("word")).alias("s0"),
        F.length("word").alias("wl"))
    bnd = segd.select(
        "inst_id", "wpos", "word", "wl",
        F.expr(_ST_XS_SPARK).alias("xs"),
        F.expr(_ST_YS_SPARK).alias("ys"))
    shoelace2 = F.expr(
        "aggregate(transform(sequence(0, size(xs) - 1), i ->"
        " element_at(xs, i + 1)"
        "   * element_at(ys, pmod(i + 1, size(xs)) + 1)"
        " - element_at(xs, pmod(i + 1, size(xs)) + 1)"
        "   * element_at(ys, i + 1)), 0L, (a, x) -> a + x)")
    return bnd.select(
        "inst_id",
        F.col("wpos").cast("int").alias("word_idx"),
        "word",
        (4 * F.col("wl")).cast("int").alias("n_points"),
        F.array_min("xs").cast("int").alias("bbox_x"),
        F.array_min("ys").cast("int").alias("bbox_y"),
        (F.array_max("xs") - F.array_min("xs")).cast("int").alias("bbox_w"),
        (F.array_max("ys") - F.array_min("ys")).cast("int").alias("bbox_h"),
        (F.abs(shoelace2.cast("double")) / 2.0).alias("area"))
