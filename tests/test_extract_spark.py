"""The central invariant (BASELINE.json north_rule): the Spark extraction
pipeline produces byte-identical extracted text per url vs the pure-kernel
goldens, plus block-table / snapshot-dedup / lineage behavior."""

import pyspark.sql.functions as F

from my_ocr_spark.operators.extract import (
    extract_docs, explode_blocks, latest_snapshot, repartition_by_url,
)


def test_extracted_text_byte_identical(spark, docs_df, docs_rows):
    out = extract_docs(docs_df).select("url", "warc_ts", "title", "text",
                                       "spans").collect()
    got = {(r["url"], r["warc_ts"]): r for r in out}
    assert len(out) == len(docs_rows)
    for r in docs_rows:
        g = got[(r["url"], r["warc_ts"])]
        assert g["text"].encode("utf-8") == r["golden_text"].encode("utf-8"), \
            f"text mismatch for {r['url']}"
        assert g["title"] == r["golden_title"]
        spans = [(s["start"], s["end"], s["block_id"]) for s in g["spans"]]
        assert spans == r["golden_spans"], f"span mismatch for {r['url']}"


def test_extract_is_deterministic_across_partitionings(spark, docs_df):
    a = extract_docs(docs_df).select("url", "warc_ts", "text")
    b = extract_docs(repartition_by_url(docs_df, 7)
                     .select("url", "warc_ts", "html", "text", "lang")) \
        .select("url", "warc_ts", "text")
    da = {(r[0], r[1]): r[2] for r in a.collect()}
    db = {(r[0], r[1]): r[2] for r in b.collect()}
    assert da == db


def test_block_table_features(spark, docs_df):
    blocks = explode_blocks(docs_df)
    pdf = blocks.filter(F.col("url").isNotNull()).limit(2000).toPandas()
    assert (pdf["n_link_chars"] <= pdf["n_chars"]).all()
    assert (pdf[pdf["keep"]]["score"] >= 0.5).any()
    # nav/footer boilerplate is (almost) never kept
    navkeep = pdf[(pdf["in_nav_footer"]) & (pdf["keep"])]
    assert len(navkeep) == 0


def test_latest_snapshot_dedup(spark, docs_df):
    deduped = latest_snapshot(docs_df)
    assert deduped.count() == docs_df.select("url").distinct().count()
    # kept row per url is the max warc_ts
    mx = docs_df.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
    assert deduped.select("url", "warc_ts").exceptAll(mx).count() == 0


def test_extract_plan_has_no_shuffle(spark, docs_df):
    """Scale check: extraction is a single narrow stage — no Exchange in
    the physical plan (blocks never leave their document)."""
    plan = extract_docs(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
