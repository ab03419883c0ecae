"""Streaming checkpoint resume: a restarted query with the same
checkpoint processes only NEW files (exactly-once per input file) —
the streaming twin of the batch lineage/resume test. Plus the
deterministic-augmentation pipeline stage."""

import pyspark.sql.functions as F


def test_streaming_extract_resume_processes_only_new_files(
        spark, docs_rows, tmp_path):
    from my_ocr_spark.schemas import DOCS_SCHEMA
    from my_ocr_spark.streaming import streaming_extract

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows, mode):
        data = [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
                for r in rows]
        (spark.createDataFrame(data, schema=DOCS_SCHEMA)
              .coalesce(1).write.mode(mode).parquet(src))

    def run_once():
        q = (streaming_extract(spark, src)
             .writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    first, second = docs_rows[:40], docs_rows[40:70]
    write_batch(first, "overwrite")
    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == len(first)

    write_batch(second, "append")  # new file lands in the source dir
    run_once()  # restart with the SAME checkpoint
    out = spark.read.parquet(sink)
    assert out.count() == len(first) + len(second)  # no reprocessing
    assert out.select("url", "warc_ts").distinct().count() == \
        len(first) + len(second)


def test_deterministic_augment_stage(spark):
    from my_ocr_spark.functions import build_pipeline

    df = spark.createDataFrame(
        [("https://a.example/1", "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
         ("https://a.example/2", "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")],
        ["url", "text"])
    pipe = build_pipeline([{"type": "DeterministicAugment",
                            "drop_every": 5}])
    a = {r["url"]: r["aug_text"] for r in pipe(df).collect()}
    b = {r["url"]: r["aug_text"] for r in pipe(df).collect()}
    assert a == b  # pure function of the row
    for url, aug in a.items():
        assert len(aug.split()) == 8  # dropped exactly 2 of 10
    # different keys → different (but each deterministic) drop patterns
    assert len(set(a.values())) >= 1
