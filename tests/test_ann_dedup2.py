"""IVF ANN, minhash→exact-verify pipeline, stateful streaming dedup."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def emb16(spark):
    import numpy as np
    rng = np.random.RandomState(11)
    base = rng.randn(60, 16)
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    rows.append((60, [float(x) for x in base[0] + 0.01 * rng.randn(16)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_ivf_ann_finds_near_copy(spark, emb16):
    from my_ocr_spark.operators.similarity import (
        cosine_topk, ivf_ann_topk, train_centroids_kmeans,
    )
    cent = train_centroids_kmeans(emb16, n_centroids=4, sample_ids=64)
    assert cent.shape == (4, 16)
    out = ivf_ann_topk(emb16, emb16.filter(F.col("vec_id") == 0),
                       cent, k=3, n_probe=2)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows and rows[0]["neighbor_id"] == 60  # the planted near-copy
    # IVF top-1 matches brute force top-1 (near-copy shares the cell)
    bf = sorted(cosine_topk(emb16, emb16.filter(F.col("vec_id") == 0),
                            k=1).collect(), key=lambda r: r["rank"])
    assert rows[0]["neighbor_id"] == bf[0]["neighbor_id"]
    assert abs(rows[0]["cos"] - bf[0]["cos"]) < 1e-12


def test_minhash_then_verify_no_false_positives(spark):
    from my_ocr_spark.operators.dedup import minhash_then_verify
    from my_ocr_spark.kernel import textstats as ts

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet forest while rain falls outside")
    rows = [(0, base), (1, base + " tonight"), (2, "completely different "
            "spark shuffle words partition executor broadcast lineage "
            "snapshot resume"), (3, base)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["doc1"], r["doc2"]): r["jaccard"]
           for r in minhash_then_verify(df, "doc_id", "text",
                                        threshold=0.5).collect()}
    assert out[(0, 3)] == 1.0
    assert (0, 1) in out
    # every emitted pair passes EXACT verification
    texts = dict(rows)
    for (a, b), j in out.items():
        sa = set(ts.word_shingles(texts[a], 3))
        sb = set(ts.word_shingles(texts[b], 3))
        exact = len(sa & sb) / len(sa | sb)
        assert abs(j - exact) < 1e-12 and exact >= 0.5
    assert all(2 not in pair for pair in out)


def test_stateful_first_seen_urls(spark, tmp_path):
    import datetime as dt
    from my_ocr_spark.streaming.stateful import first_seen_urls

    rows = [
        ("u1", dt.datetime(2024, 1, 1, 0), "a"),
        ("u2", dt.datetime(2024, 1, 1, 1), "b"),
        ("u1", dt.datetime(2024, 1, 2, 0), "a2"),   # re-crawl → dropped
        ("u3", dt.datetime(2024, 1, 1, 2), "c"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                "text string").coalesce(1).write.parquet(src)
    stream = (spark.readStream
              .schema("url string, warc_ts timestamp, text string")
              .parquet(src))
    q = (first_seen_urls(stream, n_groups=4)
         .writeStream.format("memory").queryName("dedup_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["url"]: r["text"]
           for r in spark.sql("select * from dedup_stream").collect()}
    assert got == {"u1": "a", "u2": "b", "u3": "c"}
