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
    cent = train_centroids_kmeans(emb16, n_centroids=4, sample_n=64)
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


class _FakeState:
    """Minimal GroupState double for unit-testing the dedup body."""

    def __init__(self, value=None, watermark_ms=0, timed_out=False):
        self._v = value
        self.wm = watermark_ms
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def getCurrentWatermarkMs(self):
        return self.wm

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms


def test_stateful_dedup_state_is_horizon_bounded():
    """Re-crawl stream: entries older than the watermark are evicted each
    invocation, so state size tracks the horizon window, not history."""
    import datetime as dt
    import pandas as pd
    from my_ocr_spark.streaming.stateful import _make_dedup_group

    day = 86_400_000
    fn = _make_dedup_group(horizon_ms=7 * day)

    def batch(items):  # items: (url, day_index)
        return pd.DataFrame({
            "url": [u for u, _ in items],
            "warc_ts": [pd.Timestamp(dt.datetime(2024, 1, 1)
                                     + dt.timedelta(days=d))
                        for _, d in items],
            "text": [u + "-t" for u, _ in items],
            "_uh": [hash(u) for u, _ in items],
        })

    st = _FakeState(watermark_ms=0)
    out1 = pd.concat(fn(0, iter([batch([("a", 0), ("b", 0)])]), st))
    assert sorted(out1["url"]) == ["a", "b"] and len(st.get[0]) == 2

    # 100 new urls at day 30; watermark advanced past day 0 + horizon
    wm = int(pd.Timestamp(dt.datetime(2024, 1, 24)).value // 10**6)
    st.wm = wm
    items = [(f"u{i}", 30) for i in range(100)]
    out2 = pd.concat(fn(0, iter([batch(items)]), st))
    assert len(out2) == 100
    # day-0 urls evicted: state holds exactly the horizon-window set
    assert len(st.get[0]) == 100
    assert st.timeout_set > wm

    # a re-crawl of an evicted url re-emits (documented horizon semantics)
    out3 = pd.concat(fn(0, iter([batch([("a", 31)])]), st))
    assert list(out3["url"]) == ["a"]

    # timed-out group drops its state entirely
    st2 = _FakeState(value=([1], [2]), timed_out=True)
    out4 = pd.concat(fn(0, iter([]), st2))
    assert st2.removed and len(out4) == 0


def test_stateful_first_seen_urls_horizon_reemit(spark, tmp_path):
    """End-to-end: a url idle past the horizon re-emits; a refreshed url
    does not. Three single-file micro-batches advance the watermark."""
    import datetime as dt
    from my_ocr_spark.streaming.stateful import first_seen_urls

    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    batches = [
        [("u1", t0, "a0"), ("u2", t0, "b0")],
        [("u1", t0 + dt.timedelta(days=30), "a30")],   # refresh u1
        [("u1", t0 + dt.timedelta(days=31), "a31"),    # fresh → dropped
         ("u2", t0 + dt.timedelta(days=31), "b31")],   # evicted → re-emit
    ]
    for i, rows in enumerate(batches):
        (spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "text string")
         .coalesce(1).write.mode("append").parquet(src))
    stream = (spark.readStream
              .schema("url string, warc_ts timestamp, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (first_seen_urls(stream, n_groups=4, horizon="7 days")
         .writeStream.format("memory").queryName("dedup_h")
         .option("checkpointLocation", str(tmp_path / "ckpt_h"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted((r["url"], r["text"])
                 for r in spark.sql("select * from dedup_h").collect())
    assert ("u1", "a0") in got and ("u2", "b0") in got
    assert ("u2", "b31") in got          # idle past horizon → re-emitted
    assert ("u1", "a30") not in got and ("u1", "a31") not in got


def test_codebook_sampling_sparse_id_space(spark):
    """The codebook sample must be id-space independent: on sparse hash
    ids (the realistic corpus case — nothing below any fixed threshold)
    the hash-ordered rule still fills the sample, and it matches a
    driver-side numpy replay of the same md5-order + Lloyd recipe."""
    import hashlib

    import numpy as np

    from my_ocr_spark.operators.similarity import (
        quantize_vecs, train_centroids_kmeans,
    )

    rng = np.random.RandomState(5)
    ids = [10_000_019 * (i + 1) + 7_777_777 for i in range(40)]  # sparse
    vecs = rng.randn(40, 8)
    df = spark.createDataFrame(
        [(ids[i], [float(x) for x in vecs[i]]) for i in range(40)],
        ["vec_id", "embedding"])

    cent = train_centroids_kmeans(df, n_centroids=4, n_iter=3, sample_n=16)
    assert cent.shape == (4, 8)

    # numpy replay: 16 lowest by md5(str(id)), seed = first 4, 3 Lloyd
    order = sorted(range(40),
                   key=lambda i: (hashlib.md5(str(ids[i]).encode())
                                  .hexdigest(), ids[i]))[:16]
    x = quantize_vecs(vecs[order])
    ref = x[:4].copy()
    for _ in range(3):
        d = ((x[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(4):
            m = x[assign == c]
            if len(m):
                ref[c] = np.floor_divide(m.sum(axis=0), len(m))
    assert np.array_equal(cent, ref)

    # the codebook is a pure function of the data, not of the physical
    # plan: any repartitioning (which reorders what limit+collect sees
    # before the driver-side re-sort) yields the identical codebook
    assert np.array_equal(
        train_centroids_kmeans(df.repartition(7), n_centroids=4,
                               n_iter=3, sample_n=16), cent)


def test_dedup_group_state_bounded_by_horizon_window():
    """Unit bound on the state body itself (docs/SCALE.md §7): after an
    invocation with an advanced watermark, a group's kept entries are
    EXACTLY the urls last seen inside the horizon window — crawl
    history never accumulates."""
    import numpy as np
    import pandas as pd

    from my_ocr_spark.streaming.stateful import _make_dedup_group

    day = 86_400_000
    horizon_ms = 7 * day
    fn = _make_dedup_group(horizon_ms)

    # batch 1: 5000 distinct urls spread over 30 days, no watermark yet
    n = 5000
    ts = pd.to_datetime([(i * 30 * day) // n for i in range(n)], unit="ms")
    pdf = pd.DataFrame({"url": [f"u{i}" for i in range(n)],
                        "warc_ts": ts, "text": "x",
                        "_uh": np.arange(n, dtype=np.int64)})
    st = _FakeState()
    out1 = pd.concat(list(fn((0,), iter([pdf]), st)))
    assert len(out1) == n                       # all first-seen
    assert len(st.get[0]) == n                  # no wm → nothing evicted

    # batch 2: watermark at day 23 → state must shrink to the urls last
    # seen in [day 23, day 30] — and only fresh re-crawls emit
    wm = 23 * day
    st.wm = wm
    in_window = int((ts.asi8 // 10**6 >= wm).sum())
    re_ts = pd.to_datetime([31 * day] * 3, unit="ms")
    pdf2 = pd.DataFrame({"url": ["u0", "u1", "u2"], "warc_ts": re_ts,
                         "text": "y",
                         "_uh": np.array([0, 1, 2], dtype=np.int64)})
    out2 = pd.concat(list(fn((0,), iter([pdf2]), st)))
    # u0-u2 were evicted (last seen day ~0 < wm) → re-emitted
    assert sorted(out2["url"]) == ["u0", "u1", "u2"]
    assert len(st.get[0]) == in_window + 3      # window survivors + re-adds
    assert min(st.get[1]) >= wm                 # nothing older than wm kept


def test_stateful_many_groups_bounded_state(spark, tmp_path):
    """E2E at a realistic group count (n_groups=4096, >> the 32 shuffle
    partitions): 12.5k events in three watermark-advancing batches —
    re-crawls inside the horizon drop, idle-past-horizon re-emit, the
    state store's total row count stays <= n_groups, and the run
    completes at interactive speed (throughput must not collapse when
    groups are multiplexed onto tasks)."""
    import datetime as dt
    import time

    from my_ocr_spark.streaming.stateful import first_seen_urls

    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "src")
    a = [(f"a{i}", t0, "x") for i in range(5000)]
    b = [(f"b{i}", t0 + dt.timedelta(days=30), "x") for i in range(2500)]
    c = ([(f"a{i}", t0 + dt.timedelta(days=40), "y") for i in range(5000)]
         + [(f"b{i}", t0 + dt.timedelta(days=40), "y") for i in range(2500)])
    for rows in (a, b, c):
        (spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "text string")
         .coalesce(1).write.mode("append").parquet(src))
    stream = (spark.readStream
              .schema("url string, warc_ts timestamp, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    t_start = time.monotonic()
    q = (first_seen_urls(stream, n_groups=4096, horizon="7 days")
         .writeStream.format("memory").queryName("dedup_many")
         .option("checkpointLocation", str(tmp_path / "ckpt_many"))
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    elapsed = time.monotonic() - t_start
    rows = spark.sql("select url, text from dedup_many").collect()
    n_a_first = sum(1 for r in rows if r.url.startswith("a")
                    and r.text == "x")
    n_b_first = sum(1 for r in rows if r.url.startswith("b")
                    and r.text == "x")
    n_a_reemit = sum(1 for r in rows if r.url.startswith("a")
                     and r.text == "y")
    n_b_reemit = sum(1 for r in rows if r.url.startswith("b")
                     and r.text == "y")
    assert (n_a_first, n_b_first) == (5000, 2500)
    # batch 3: a* idle 40d > horizon (wm = day 23 by then) → re-emit;
    # b* last seen day 30 >= wm → refreshed silently
    assert (n_a_reemit, n_b_reemit) == (5000, 0)
    prog = q.lastProgress
    state_rows = prog["stateOperators"][0]["numRowsTotal"]
    assert state_rows <= 4096                   # one row per ACTIVE group
    assert elapsed < 200, elapsed  # loose: host noise waves reach 3x


def test_codebook_empty_and_tiny_corpus(spark):
    """Degenerate inputs: empty corpus raises a clear error; a corpus
    smaller than n_centroids yields a codebook with one row per vector
    (every cell seeded) instead of crashing."""
    import numpy as np
    import pytest as pt

    from my_ocr_spark.operators.similarity import train_centroids_kmeans

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pt.raises(ValueError, match="empty"):
        train_centroids_kmeans(empty, n_centroids=4)

    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"])
    cent = train_centroids_kmeans(tiny, n_centroids=4, n_iter=2)
    assert cent.shape == (2, 2)
    assert np.isfinite(cent).all()
