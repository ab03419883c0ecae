"""Spark-side extraction operators: mapInPandas over the pure kernel.

The flagship pipeline (SURVEY.md §3.1 Spark equivalent):

    docs → extract_docs() → extracted table (url, title, text, spans, ...)
         → explode_blocks() → block table (detect-stage analog)
         → pdf layout branch via layout.py kernels

Scale discipline (north_rule / SURVEY.md §4):
* one ``mapInPandas`` stage, no shuffle: blocks never leave their document,
  exactly like the reference's fan-out join staying in-process
  (``mmocr/utils/ocr.py:146-201``).
* the fat ``html`` column is consumed inside this stage and NOT emitted —
  downstream stages shuffle only narrow columns (design rule: Catalyst
  can't prune through an opaque UDF, so we prune manually).
* partitioning by hash(url) with optional host-salting is provided by
  ``repartition_by_url`` for callers that shuffle before extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from my_ocr_spark.kernel.extract import extract_main_text
from my_ocr_spark.kernel.htmlparse import parse_blocks
from my_ocr_spark.kernel.extract import score_block, classify_blocks
from my_ocr_spark.schemas import BLOCKS_SCHEMA, EXTRACTED_SCHEMA


def repartition_by_url(docs: DataFrame, num_partitions: int,
                       salt_buckets: int = 16) -> DataFrame:
    """hash(url)-partitioning with host salting (north_rule).

    ``xxhash64(url)`` alone already distributes urls uniformly; the salt
    column exists for callers that later need host-grouped work
    (groupBy(host)): grouping on (host, salt) caps any single host's
    partition share — the skew bound for Zipf-distributed hosts.
    """
    salted = docs.withColumn(
        "host", F.parse_url(F.col("url"), F.lit("HOST"))
    ).withColumn(
        "host_salt",
        F.concat_ws("#", F.col("host"),
                    F.pmod(F.xxhash64("url"), F.lit(salt_buckets))),
    )
    return salted.repartition(num_partitions, F.xxhash64("url"))


def extract_docs(docs: DataFrame) -> DataFrame:
    """docs(url, warc_ts, html, text, lang) → EXTRACTED_SCHEMA table.

    Vectorized: one Arrow batch in, one pandas frame out; the kernel call is
    per-row Python *inside* the batch (HTML parsing is irreducibly
    per-document, same as the reference's per-record pipeline), but batch
    transfer + no JVM round-trips per row keep the hot path Arrow-speed.
    """
    cols = ["url", "warc_ts", "html", "lang"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("url", "warc_ts", "lang", "title", "text",
                                   "spans", "n_blocks", "n_kept",
                                   "html_bytes", "parse_ok")}
            for url, ts, html, lang in zip(pdf["url"], pdf["warc_ts"],
                                           pdf["html"], pdf["lang"]):
                res = extract_main_text(html)
                out["url"].append(url)
                out["warc_ts"].append(ts)
                out["lang"].append(lang)
                out["title"].append(res["title"])
                out["text"].append(res["text"])
                out["spans"].append(
                    [{"start": s, "end": e, "block_id": b}
                     for (s, e, b) in res["spans"]])
                out["n_blocks"].append(res["n_blocks"])
                out["n_kept"].append(res["n_kept"])
                out["html_bytes"].append(len(html) if html is not None else 0)
                out["parse_ok"].append(res["parse_ok"])
            yield pd.DataFrame(out)

    return docs.select(*cols).mapInPandas(run, schema=EXTRACTED_SCHEMA)


def explode_blocks(docs: DataFrame) -> DataFrame:
    """docs → one row per text block with features + score + keep flag.

    The detect-stage analog: the block table is what the reference's
    score-map decode emits as candidate regions
    (``mmocr/models/textdet/postprocess/wrapper.py:177-229``).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "block_id", "tag", "tag_path",
                                    "depth", "text", "n_chars",
                                    "n_link_chars", "n_words", "n_punct",
                                    "is_heading", "in_nav_footer",
                                    "score", "keep")}
            for url, html in zip(pdf["url"], pdf["html"]):
                _, blocks = parse_blocks(html)
                keep = classify_blocks(blocks)
                for b, k in zip(blocks, keep):
                    rows["url"].append(url)
                    rows["block_id"].append(b.block_id)
                    rows["tag"].append(b.tag)
                    rows["tag_path"].append(b.tag_path)
                    rows["depth"].append(b.depth)
                    rows["text"].append(b.text)
                    rows["n_chars"].append(b.n_chars)
                    rows["n_link_chars"].append(b.n_link_chars)
                    rows["n_words"].append(b.n_words)
                    rows["n_punct"].append(b.n_punct)
                    rows["is_heading"].append(b.is_heading)
                    rows["in_nav_footer"].append(b.in_nav_footer)
                    rows["score"].append(score_block(b))
                    rows["keep"].append(bool(k))
            yield pd.DataFrame(rows)

    return docs.select("url", "html").mapInPandas(run, schema=BLOCKS_SCHEMA)


def latest_snapshot(docs: DataFrame, key_col: str = "url",
                    ts_col: str = "warc_ts") -> DataFrame:
    """Keep only the latest warc_ts per url — the as-of/dedup analog
    (SURVEY.md §2.3 last row). One shuffle on url.

    Ties on the timestamp break on a hash of ALL remaining columns, so
    the winner is content-determined for any input schema (works after
    extraction too — the pipeline registry allows either stage order);
    rows identical in every column are interchangeable, so the outcome
    is deterministic in all cases.
    """
    from pyspark.sql import Window
    rest = [c for c in docs.columns if c not in (key_col, ts_col)]
    tiebreak = F.xxhash64(*rest) if rest else F.lit(0)
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), tiebreak.desc())
    return (docs.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
