"""Dedup + similarity operators: correctness vs the pure-kernel oracles
(mmocr-style exact tiny goldens) and LSH recall guarantees."""

import pyspark.sql.functions as F
import pytest

from my_ocr_spark.kernel import textstats as ts
from my_ocr_spark.operators.dedup import (
    exact_dup_groups, minhash_lsh_candidates, ngram_jaccard_pairs,
    simhash_near_dups,
)
from my_ocr_spark.operators.similarity import cosine_topk, lsh_ann_topk


BASE = ("the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet forest while the rain falls softly outside")
NEAR = BASE + " tonight"
FAR = ("spark shuffle partition executor broadcast salt skew lineage "
       "resume snapshot checkpoint arrow codegen catalyst tungsten stage")


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [(0, BASE), (1, NEAR), (2, FAR), (3, BASE), (4, FAR + " extra")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dup_groups(spark, corpus_df):
    out = {r["fp"]: (r["n_dups"], r["keep_id"])
           for r in exact_dup_groups(corpus_df, "doc_id", "text").collect()}
    fp_base = ts.fingerprint(BASE)
    assert out[fp_base] == (2, 0)          # docs 0 and 3 identical
    assert sum(n for n, _ in out.values()) == 5


def test_ngram_jaccard_exact_vs_kernel(spark, corpus_df):
    got = {(r["doc1"], r["doc2"]): r["jaccard"]
           for r in ngram_jaccard_pairs(corpus_df, "doc_id", "text",
                                        n=1, threshold=0.0).collect()}
    docs = {0: BASE, 1: NEAR, 2: FAR, 3: BASE, 4: FAR + " extra"}
    for (d1, d2), j in got.items():
        expect = ts.jaccard(
            sorted(set(ts.normalize_for_fingerprint(docs[d1]).split())),
            sorted(set(ts.normalize_for_fingerprint(docs[d2]).split())))
        assert abs(j - expect) < 1e-12, (d1, d2)
    assert got[(0, 3)] == 1.0
    assert got[(0, 1)] > 0.9


def test_minhash_candidates_superset_of_true_dups(spark, corpus_df):
    cands = {(r["doc1"], r["doc2"]) for r in
             minhash_lsh_candidates(corpus_df, "doc_id", "text").collect()}
    # identical docs MUST be candidates (all bands equal)
    assert (0, 3) in cands
    # near-identical docs share most shingles → expected in candidates
    assert (0, 1) in cands
    # unrelated docs must not pair
    assert (0, 2) not in cands and (1, 2) not in cands


def test_minhash_batch_kernel_parity():
    """Vectorized batch MinHash must be bit-identical to the per-doc
    kernel (the round-1 reference implementation), including empty docs
    and memo reuse across calls."""
    docs = [BASE, NEAR, FAR, "", "one two", BASE]
    lists = [ts.word_shingles(t, k=3) for t in docs]
    memo: dict = {}
    got = ts.minhash_signatures_batch(lists, num_perm=32, _memo=memo)
    # second call exercises the warm-memo path
    got2 = ts.minhash_signatures_batch(lists, num_perm=32, _memo=memo)
    for i, sh in enumerate(lists):
        expect = ts.minhash_signature(sh, num_perm=32)
        assert got[i].tolist() == expect, i
        assert got2[i].tolist() == expect, i


def test_ngram_df_cap_bounds_skewed_join(spark):
    """Scale guard: one shingle shared by 1000 docs must NOT produce the
    ~500k-row df² self-join. With the cap the boilerplate shingle is
    dropped and only genuinely similar pairs survive."""
    rows = [(i, f"common boilerplate everywhere unique{i} tail{i}")
            for i in range(1000)]
    # two true near-dups that share discriminating shingles
    rows.append((2000, "alpha beta gamma delta epsilon"))
    rows.append((2001, "alpha beta gamma delta zeta"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=1,
                                threshold=0.3, df_cap=64).collect()
    got = {(r["doc1"], r["doc2"]) for r in pairs}
    assert (2000, 2001) in got
    # without the shared-shingle signal no boilerplate pair crosses 0.3:
    # every emitted pair must involve the true near-dups
    assert got == {(2000, 2001)}, sorted(got)[:5]


def test_ngram_df_cap_noop_below_cap(spark, corpus_df):
    """On a corpus where max document frequency << cap, the capped result
    equals the uncapped one (the exactness contract the oracle relies on)."""
    capped = {(r["doc1"], r["doc2"]): r["jaccard"] for r in
              ngram_jaccard_pairs(corpus_df, "doc_id", "text", n=1,
                                  threshold=0.0, df_cap=64).collect()}
    uncapped = {(r["doc1"], r["doc2"]): r["jaccard"] for r in
                ngram_jaccard_pairs(corpus_df, "doc_id", "text", n=1,
                                    threshold=0.0, df_cap=None).collect()}
    assert capped == uncapped


def test_lsh_bucket_cap_drops_mega_bucket(spark):
    """Scale guard: 600 byte-identical docs form one mega-bucket per band;
    with bucket_cap=64 they contribute zero candidate pairs (exact dedup
    owns them), while a small near-dup cluster is still found."""
    rows = [(i, BASE) for i in range(600)]
    rows += [(1000, FAR), (1001, FAR + " extra")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cands = {(r["doc1"], r["doc2"]) for r in
             minhash_lsh_candidates(df, "doc_id", "text",
                                    bucket_cap=64).collect()}
    assert (1000, 1001) in cands
    assert all(d1 >= 1000 for d1, _ in cands), len(cands)


def test_lsh_bucket_cap_noop_on_small_buckets(spark, corpus_df):
    with_cap = {(r["doc1"], r["doc2"]) for r in
                minhash_lsh_candidates(corpus_df, "doc_id", "text",
                                       bucket_cap=512).collect()}
    no_cap = {(r["doc1"], r["doc2"]) for r in
              minhash_lsh_candidates(corpus_df, "doc_id", "text",
                                     bucket_cap=None).collect()}
    assert with_cap == no_cap


def test_simhash_near_dups(spark, corpus_df):
    pairs = {(r["doc1"], r["doc2"]): r["hamming"] for r in
             simhash_near_dups(corpus_df, "doc_id", "text").collect()}
    assert pairs[(0, 3)] == 0
    assert (0, 2) not in pairs


@pytest.fixture(scope="module")
def emb_df(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.randn(8, 16)
    rows = []
    for i in range(8):
        rows.append((i, [float(x) for x in base[i]]))
    # vec 8 = near-copy of vec 0
    rows.append((8, [float(x) for x in base[0] + 0.01 * rng.randn(16)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact(spark, emb_df):
    import numpy as np
    out = cosine_topk(emb_df, emb_df.filter(F.col("vec_id") == 0), k=3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["neighbor_id"] == 8          # the near-copy wins
    assert rows[0]["cos"] > 0.99
    # verify against numpy
    pdf = emb_df.toPandas().set_index("vec_id")
    v0 = np.array(pdf.loc[0, "embedding"])
    def cos(i):
        v = np.array(pdf.loc[i, "embedding"])
        return float(v0 @ v / (np.linalg.norm(v0) * np.linalg.norm(v)))
    for r in rows:
        assert abs(r["cos"] - cos(r["neighbor_id"])) < 1e-9


def test_lsh_ann_finds_near_copy(spark, emb_df):
    out = lsh_ann_topk(emb_df, emb_df.filter(F.col("vec_id") == 0), k=3,
                       dim=16, n_planes=4)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    # near-copy lands in the same sign bucket with overwhelming likelihood
    assert rows and rows[0]["neighbor_id"] == 8


def test_duplicate_spans_df_cap_drops_hot_gram(spark):
    """Scale guard: a boilerplate 5-gram planted in 500 docs must NOT
    fan out ~500²/2 position pairs — with df_cap=16 the hot gram is
    dropped from the index entirely, while a discriminating shared span
    between two docs still surfaces with exact positions."""
    from my_ocr_spark.operators.dedup import duplicate_spans

    hot = "all rights reserved contact us"      # one hot 5-gram
    span = "unique duplicated sentence appears here twice in a row"
    rows = [(i, f"doc number {i} begins {hot}") for i in range(500)]
    rows += [(1000, f"alpha {span} omega"), (1001, f"beta {span} gamma")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    out = duplicate_spans(df, "doc_id", "text",
                          gram_width=5, df_cap=16, min_grams=2).collect()
    # only the planted pair survives; the hot gram contributes nothing
    assert {(r["doc1"], r["doc2"]) for r in out} == {(1000, 1001)}
    (r,) = out
    # span = 9 shared words -> 5 overlapping 5-grams starting at word 2
    assert (r["n_grams"], r["span_words"]) == (5, 9)
    assert (r["start1"], r["start2"]) == (2, 2)


def test_duplicate_spans_knobs(spark):
    """gram_width widens the recall floor; min_grams gates span length."""
    from my_ocr_spark.operators.dedup import duplicate_spans

    shared = "one two three four five six"      # 6 shared words
    rows = [(0, f"x {shared}"), (1, f"{shared} y z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # width 5: 2 overlapping 5-grams -> passes min_grams=2
    out5 = duplicate_spans(df, "doc_id", "text", gram_width=5).collect()
    assert [(r["n_grams"], r["span_words"]) for r in out5] == [(2, 6)]
    # width 6: a single 6-gram match -> filtered at min_grams=2,
    # surfaced at min_grams=1
    assert duplicate_spans(df, "doc_id", "text",
                           gram_width=6).collect() == []
    out6 = duplicate_spans(df, "doc_id", "text", gram_width=6,
                           min_grams=1).collect()
    assert [(r["n_grams"], r["span_words"]) for r in out6] == [(1, 6)]


def test_duplicate_spans_matches_bruteforce(spark):
    """Differential: on small corpora the postings-join span finder must
    equal a brute-force all-pairs scan (python sets over the same
    normalized word streams, same maximal-diagonal-run semantics)."""
    import random
    import re

    from my_ocr_spark.operators.dedup import duplicate_spans

    def norm(s):
        s = re.sub(r"[^a-z0-9一-龥 ]", "", s.lower())
        return re.sub(r" +", " ", s).strip()

    def brute(texts, g=5, min_grams=2):
        words = {i: norm(t).split(" ") for i, t in texts.items()}
        out = set()
        ids = sorted(words)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                wa, wb = words[a], words[b]
                if len(wa) < g or len(wb) < g:
                    continue
                ga = {}
                for i in range(len(wa) - g + 1):
                    ga.setdefault(tuple(wa[i:i + g]), []).append(i + 1)
                matches = []
                for j in range(len(wb) - g + 1):
                    for i in ga.get(tuple(wb[j:j + g]), ()):
                        matches.append((i, j + 1))
                # maximal runs along constant i-j diagonals
                mset = set(matches)
                for i, j in matches:
                    if (i - 1, j - 1) in mset:
                        continue  # not a run start
                    n = 0
                    while (i + n, j + n) in mset:
                        n += 1
                    if n >= min_grams:
                        out.add((a, b, i, j, n, n + g - 1))
        return out

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "iota", "kappa"]
    rng = random.Random(11)
    texts = {}
    for d in range(14):
        w = [rng.choice(vocab) for _ in range(rng.randrange(3, 30))]
        texts[d] = " ".join(w)
    # plant one guaranteed long shared span
    shared = "one two three four five six seven eight"
    texts[20] = f"pre {shared} post"
    texts[21] = f"{shared} tail words here"

    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {(r.doc1, r.doc2, r.start1, r.start2, r.n_grams, r.span_words)
           for r in duplicate_spans(df, "doc_id", "text",
                                    df_cap=10_000).collect()}
    assert got == brute(texts), (
        got - brute(texts), brute(texts) - got)


def test_cell_cosine_edges_bitexact_vs_catalyst_fold(spark):
    """cell_cosine_edges (vectorized grouped map) must emit EXACTLY the
    pairs the old formulation did — bucket self-join filtered on the
    Catalyst _dot fold — including pairs engineered to sit within
    float noise of the 0.95 threshold. The per-dim outer-product
    accumulation reproduces the fold's left-to-right order, so the set
    equality is bit-exact, not approximate."""
    import numpy as np
    from pyspark.sql import functions as F

    from my_ocr_spark.operators.similarity import (
        _dot, cell_cosine_edges,
    )

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for bucket in range(5):
        base = rng.normal(size=(6, 16))
        for i in range(6):
            rows.append((vid, bucket, base[i].tolist())); vid += 1
            # a scaled near-exact dup (cos == 1 up to rounding) and a
            # noisy variant that lands near the threshold
            rows.append((vid, bucket, (base[i] * 1.25).tolist())); vid += 1
            noisy = base[i] + rng.normal(scale=0.18, size=16)
            rows.append((vid, bucket, noisy.tolist())); vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "bucket", "v"]) \
        .withColumn("v", F.expr("transform(v, x -> CAST(x AS DOUBLE))"))
    nv = df.withColumn("nrm", F.sqrt(_dot("v", "v")))

    a, b = nv.alias("a"), nv.alias("b")
    old = {(r.src, r.dst) for r in
           (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .filter(_dot(F.col("a.v"), F.col("b.v"))
                    / (F.col("a.nrm") * F.col("b.nrm")) >= 0.95)
            .select(F.col("a.vec_id").alias("src"),
                    F.col("b.vec_id").alias("dst"))).collect()}
    new = {(r.src, r.dst) for r in
           cell_cosine_edges(nv, threshold=0.95).collect()}
    assert old == new and len(new) >= 10, (len(new), old ^ new)


def test_remove_duplicate_spans_deletes_higher_id_copy(spark):
    """The removal rule: the HIGHER-id doc loses the shared span, the
    lower-id doc keeps it, untouched docs pass through whole."""
    from my_ocr_spark.operators.dedup import remove_duplicate_spans

    shared = "one two three four five six seven eight"
    rows = [(1, f"pre {shared} post"),
            (2, f"{shared} tail words here"),
            (3, "totally unrelated content with enough words to count")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           remove_duplicate_spans(df, "doc_id", "text").collect()}
    assert out[1].n_removed == 0 and out[1].n_words == 10
    assert out[2].n_removed == 8          # the whole shared span
    assert out[2].n_kept == 3             # 'tail words here'
    assert out[3].n_removed == 0
    import hashlib
    assert out[2].kept_md5 == hashlib.md5(
        b"tail words here").hexdigest()


def test_spread_small_scan_cost_model(spark):
    """The small-input adaptation must be a NO-OP on already-wide inputs
    (at corpus scale a parquet table has splits >> cores, and the fat
    text column must not pay a shuffle there) and must widen a 1-split
    scan to session parallelism so per-doc python stages use every core
    (measured at sf1.0: the 2-split documents scan ran every dedup
    signature pass at 2/32 parallelism — simhash 37.6 s -> 1.2 s)."""
    from my_ocr_spark.session import spread_small_scan

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000, 1, numPartitions=1)
    wide = spark.range(0, 1000, 1, numPartitions=target + 7)
    assert spread_small_scan(narrow).rdd.getNumPartitions() == target
    # identity (not just same count): no exchange inserted at scale
    assert spread_small_scan(wide) is wide
