"""Flagship end-to-end extraction query (SURVEY.md §3.1 Spark equivalent).

The driver's testdata ``documents`` table is (doc_id, text, lang, source,
n_chars) — not the CC shape — so the flagship synthesizes the CC-style
table *declaratively in Spark* (JVM-side concat, deterministic: url from
source+doc_id, warc_ts from doc_id, html wrapping text in the boilerplate
template), then runs the real extraction pipeline and returns the
extracted table. This keeps the driver smoke check on the true engine
while tests/bench use the richer generated fixture corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from my_ocr_spark.operators.extract import extract_docs, latest_snapshot

_HTML_PREFIX = (
    '<!DOCTYPE html><html><head><title>doc</title>'
    '<style>nav{display:flex}</style><script>var x=1;</script></head>'
    '<body><header><nav><ul><li><a href="/home">Home</a></li>'
    '<li><a href="/about">About</a></li><li><a href="/blog">Blog</a></li>'
    '</ul></nav></header><main><article><p>'
)
_HTML_SUFFIX = (
    '</p></article></main><aside><ul><li><a href="/t/0">related link one'
    '</a></li><li><a href="/t/1">related link two</a></li></ul></aside>'
    '<footer><a href="/priv">Privacy</a> | <a href="/tos">Terms</a>'
    '<p>© 2024 Example Corp. All rights reserved.</p></footer></body></html>'
)


def synthesize_cc_docs(spark: SparkSession, sf_dir: str,
                       partitions: int | None = None) -> DataFrame:
    """documents parquet → (url, warc_ts, html, text, lang) CC-style table.

    ``partitions``: repartition the NARROW source rows before html
    synthesis — the small parquet file otherwise reads as one split and
    serializes every downstream pandas-UDF stage onto one core. The fat
    html column is built after the shuffle, so it never crosses one."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if partitions:
        docs = docs.repartition(partitions, F.col("doc_id"))
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                              F.col("doc_id").cast("double"))
         ).alias("warc_ts"),
        # paragraph break every 10 words: deterministic, and exactly
        # mirrorable in SQL → the extraction query gets a TRUE DuckDB
        # oracle (closed-form expected text; see plans/analytics.py)
        F.encode(
            F.concat(F.lit(_HTML_PREFIX),
                     F.regexp_replace(F.col("text"), r"((\S+ ){10})",
                                      r"$1</p><p>"),
                     F.lit(_HTML_SUFFIX)),
            "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def flagship_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC-table synth → latest-snapshot dedup → extraction → narrow output.

    Narrow projection before any downstream consumption: the fat html
    column dies inside the extraction stage.
    """
    cc = synthesize_cc_docs(spark, sf_dir,
                            partitions=spark.sparkContext.defaultParallelism)
    extracted = extract_docs(latest_snapshot(cc))
    return extracted.select(
        "url", "warc_ts", "lang", "title", "text",
        F.size("spans").alias("n_spans"),
        "n_blocks", "n_kept", "html_bytes", "parse_ok",
    )
