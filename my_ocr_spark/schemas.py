"""Explicit StructTypes for every table in the engine (SURVEY.md §1.2):
the input docs table (BASELINE.json input_hint) and all derived tables.

The reference's schema is key-convention in a mutable dict
(``mmocr/datasets/base_dataset.py:95-98``, field registries
``text_det_dataset.py:72-74``); here every table is a fixed StructType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# input: Iceberg/parquet table of Common-Crawl-style pages (input_hint)
DOCS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

# span of one kept block inside the extracted text
SPAN_TYPE = T.StructType([
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("block_id", T.IntegerType(), False),
])

# extraction output: one row per document
EXTRACTED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("title", T.StringType(), True),
    T.StructField("text", T.StringType(), True),          # extracted main text
    T.StructField("spans", T.ArrayType(SPAN_TYPE), True),
    T.StructField("n_blocks", T.IntegerType(), True),
    T.StructField("n_kept", T.IntegerType(), True),
    T.StructField("html_bytes", T.LongType(), True),
    T.StructField("parse_ok", T.BooleanType(), True),     # quarantine flag
])

# per-document block table (detect-stage analog)
BLOCKS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("tag", T.StringType(), True),
    T.StructField("tag_path", T.StringType(), True),
    T.StructField("depth", T.IntegerType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("n_chars", T.IntegerType(), True),
    T.StructField("n_link_chars", T.IntegerType(), True),
    T.StructField("n_words", T.IntegerType(), True),
    T.StructField("n_punct", T.IntegerType(), True),
    T.StructField("is_heading", T.BooleanType(), True),
    T.StructField("in_nav_footer", T.BooleanType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("keep", T.BooleanType(), True),
])

# pdf layout branch
PDF_PAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("page", T.IntegerType(), False),
    T.StructField("blocks", T.ArrayType(T.StructType([
        T.StructField("x0", T.DoubleType(), False),
        T.StructField("y0", T.DoubleType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("text", T.StringType(), False),
    ])), True),
])

PDF_TEXT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("page", T.IntegerType(), False),
    T.StructField("ordered_text", T.StringType(), True),
])

# per-partition lineage rows (north_rule): written alongside every sink so
# a resumed job can identify committed partition ranges.
LINEAGE_SCHEMA = T.StructType([
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("doc_count", T.LongType(), False),
    T.StructField("byte_count", T.LongType(), False),
    T.StructField("checksum", T.LongType(), False),
])
