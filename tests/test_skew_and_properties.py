"""Skew-balance evidence + hypothesis property tests for the kernels."""

import string

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from my_ocr_spark.kernel.extract import BLOCK_SEP, extract_main_text
from my_ocr_spark.kernel.layout import stitch_boxes_into_lines
from my_ocr_spark.operators.extract import repartition_by_url
from my_ocr_spark.sources.catalog import read_table, write_table


def test_zipf_host_skew_balanced_by_url_hash(spark, docs_df):
    """The fixture corpus has Zipf-distributed hosts (host0 dominates).
    hash(url) repartitioning must spread rows near-uniformly regardless."""
    n_parts = 8
    parts = (repartition_by_url(docs_df, n_parts)
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    sizes = [r["count"] for r in parts]
    total = sum(sizes)
    assert len(sizes) == n_parts
    assert max(sizes) <= 2.5 * total / n_parts, sizes
    # contrast: the raw host distribution IS skewed (sanity of the fixture)
    hosts = (docs_df.withColumn("host",
                                F.parse_url("url", F.lit("HOST")))
             .groupBy("host").count().orderBy(F.desc("count")).collect())
    assert hosts[0]["count"] > 3 * hosts[-1]["count"]


def test_catalog_roundtrip_parquet_fallback(spark, docs_df, tmp_path):
    out = str(tmp_path / "tbl")
    fmt = write_table(docs_df.select("url", "lang"), out)
    assert fmt in ("iceberg", "parquet")
    back = read_table(spark, out)
    assert back.count() == docs_df.count()


# --- hypothesis: kernel invariants over arbitrary inputs --------------------

_text = st.text(alphabet=string.ascii_letters + string.digits + " .,!?<>&;/",
                max_size=400)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_extract_never_raises_and_spans_index_correctly(payload):
    res = extract_main_text(payload.encode("utf-8", errors="ignore"))
    text = res["text"]
    # spans tile the text left-to-right, separated by BLOCK_SEP
    prev_end = None
    for (s, e, _bid) in res["spans"]:
        assert 0 <= s <= e <= len(text)
        if prev_end is not None:
            assert text[prev_end:s] == BLOCK_SEP
        prev_end = e
    if res["spans"]:
        assert prev_end == len(text)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_extract_arbitrary_bytes_never_raise(payload):
    res = extract_main_text(payload)
    assert isinstance(res["text"], str)


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(st.floats(0, 500), st.floats(0, 500),
              st.floats(1, 100), st.floats(5, 20)),
    max_size=25))
def test_xy_cut_is_a_permutation(raw):
    from my_ocr_spark.kernel.layout import xy_cut
    boxes = [(x, y, x + w, y + h, f"w{i}")
             for i, (x, y, w, h) in enumerate(raw)]
    order = xy_cut(boxes)
    assert sorted(order) == list(range(len(boxes)))
    assert xy_cut(boxes) == order  # deterministic


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(st.floats(0, 500), st.floats(0, 500),
              st.floats(1, 100), st.floats(5, 20)),
    max_size=25))
def test_stitch_partitions_all_boxes_exactly_once(raw):
    boxes = [(x, y, x + w, y + h, f"w{i}")
             for i, (x, y, w, h) in enumerate(raw)]
    lines = stitch_boxes_into_lines(boxes)
    seen = sorted(i for ln in lines for i in ln["word_ids"])
    assert seen == list(range(len(boxes)))  # a partition, no dup/loss
    # determinism
    again = stitch_boxes_into_lines(boxes)
    assert [ln["text"] for ln in again] == [ln["text"] for ln in lines]


def test_sequence_pack_greedy_semantics(spark):
    """Packing rules through the REAL grouped map: capacity reset at
    512, an oversize doc gets a solo pack, a small doc pairs with the
    next fitting one, shards pack independently."""
    from pyspark.sql import functions as F

    from my_ocr_spark.operators.packing import greedy_pack

    rows = [("s", 0, 1, 300), ("s", 0, 2, 300), ("s", 0, 3, 601),
            ("s", 0, 4, 11), ("s", 0, 5, 501), ("s", 1, 6, 400),
            ("t", 0, 7, 400)]
    d = spark.createDataFrame(
        rows, ["source", "shard", "doc_id", "n_tok"]).select(
        "source", F.col("shard").cast("long"), "doc_id",
        F.col("n_tok").cast("long"))
    out = {(r.source, r.doc_id): r.pack_id
           for r in greedy_pack(d, capacity=512).collect()}
    assert [out[("s", i)] for i in range(1, 6)] == [1, 2, 3, 4, 4]
    assert out[("s", 6)] == 1 and out[("t", 7)] == 1  # fresh per shard


def test_sequence_pack_null_source_shard_kept(spark):
    """A NULL source is a valid shard key — pandas groupby's default
    dropna=True would silently drop the whole shard (ADVICE r5)."""
    from pyspark.sql import functions as F

    from my_ocr_spark.operators.packing import greedy_pack

    rows = [(None, 0, 1, 300), (None, 0, 2, 300), ("s", 0, 3, 100)]
    d = spark.createDataFrame(
        rows, ["source", "shard", "doc_id", "n_tok"]).select(
        "source", F.col("shard").cast("long"), "doc_id",
        F.col("n_tok").cast("long"))
    out = {(r.source, r.doc_id): r.pack_id
           for r in greedy_pack(d, capacity=512).collect()}
    assert len(out) == 3                       # no rows lost
    assert out[(None, 1)] == 1 and out[(None, 2)] == 2
    assert out[("s", 3)] == 1
