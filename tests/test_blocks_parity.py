"""explode_blocks parity vs the kernel block parser, and empty-input
robustness of the lineage writer."""

import pyspark.sql.functions as F


def test_explode_blocks_matches_kernel(spark, docs_rows, docs_df):
    from my_ocr_spark.kernel.htmlparse import parse_blocks
    from my_ocr_spark.kernel.extract import classify_blocks, score_block
    from my_ocr_spark.operators.extract import explode_blocks

    target = docs_rows[3]
    out = (explode_blocks(docs_df.filter(
        (F.col("url") == target["url"])
        & (F.col("warc_ts") == target["warc_ts"])))
        .orderBy("block_id").collect())
    _, blocks = parse_blocks(target["html"])
    keep = classify_blocks(blocks)
    assert len(out) == len(blocks)
    for row, b, k in zip(out, blocks, keep):
        assert row["block_id"] == b.block_id
        assert row["text"] == b.text
        assert row["n_link_chars"] == b.n_link_chars
        assert row["score"] == score_block(b)
        assert row["keep"] == k


def test_write_with_lineage_empty_input(spark, tmp_path):
    from my_ocr_spark.operators.lineage import (
        read_lineage_manifests, write_with_lineage,
    )
    empty = spark.createDataFrame([], "url string, text string")
    out = str(tmp_path / "empty_sink")
    stats = write_with_lineage(empty, out, n_buckets=2)
    assert sorted(stats["written"]) == [0, 1]
    manifests = read_lineage_manifests(out)
    assert [m["doc_count"] for m in manifests] == [0, 0]
    # resume on empty: everything already committed
    again = write_with_lineage(empty, out, n_buckets=2)
    assert again["written"] == [] and sorted(again["skipped"]) == [0, 1]
