"""Focused gates for the round-7 operator rewrites: the per-doc Counter
form of gopher_counts and the pandas gram stage of duplicate_spans must
reproduce the exact semantics of the exploded-JVM forms they replaced."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # repeated word -> top_word fires; 10 words
        (1, "spam spam spam spam spam spam one two three four"),
        # all-distinct words, n=6
        (2, "alpha beta gamma delta epsilon zeta"),
        # normalizes to EMPTY -> split(' ') yields [''] (n_words=1),
        # the JVM-split edge the rewrite must preserve
        (3, "!!! ??? ..."),
        # fewer than 5 words -> vacuous bigram/5-gram gates
        (4, "one two"),
        # doc_id % 17 == 0 -> the _demo plant target
        (17, "a b c d e f g h i j"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_counts_matches_hand_computation(spark, docs):
    from my_ocr_spark.plans.textpipe import gopher_counts

    out = {r["doc_id"]: r.asDict()
           for r in gopher_counts(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 17}
    r1 = out[1]
    assert (r1["n_words"], r1["top_word_n"]) == (10, 6)
    assert (r1["n_bigrams"], r1["top_bigram_n"]) == (9, 5)  # 'spam spam' x5
    assert (r1["n_5grams"], r1["n_dup_5gram_pos"]) == (6, 2)
    assert not r1["keep"]  # 6*100 > 30*10
    r2 = out[2]
    assert (r2["n_words"], r2["top_word_n"]) == (6, 1)
    assert r2["keep"]
    # empty-normalized doc: JVM split('') semantics -> [''] with n=1
    r3 = out[3]
    assert (r3["n_words"], r3["top_word_n"]) == (1, 1)
    assert (r3["n_bigrams"], r3["n_5grams"]) == (0, 0)
    assert not r3["keep"]  # 1*100 > 30*1
    # 2-word doc: the 5-gram gate is vacuous (0 <= 0) but its single
    # bigram is 100% of bigrams, so the top-bigram gate (<= 20%) fails
    r4 = out[4]
    assert (r4["n_bigrams"], r4["top_bigram_n"], r4["n_5grams"]) == (1, 1, 0)
    assert not r4["keep"]


def test_gopher_plant_twin(spark, docs):
    from my_ocr_spark.plans.textpipe import gopher_counts

    clean = {r["doc_id"]: r.asDict() for r in gopher_counts(docs).collect()}
    planted = {r["doc_id"]: r.asDict()
               for r in gopher_counts(docs, plant=True).collect()}
    # only doc 17 is touched
    for k in (1, 2, 3, 4):
        assert planted[k] == clean[k]
    p = planted[17]
    # 10 words + first-5 repeated 8x = 50; 'a'..'e' now appear 9x each
    assert (p["n_words"], p["top_word_n"]) == (50, 9)
    assert not p["keep"]  # 9*100 > 30*50? no: 900 <= 1500 -> word gate
    # passes, but the planted 5-gram 'a b c d e' repeats: dup positions
    assert p["n_dup_5gram_pos"] >= 8
    assert clean[17]["keep"]


def test_duplicate_spans_gram_stage_positions(spark):
    """The pandas gram stage must emit 1-based positions over the
    normalized word stream and an md5-digest key identical (as a
    grouping) to md5(gram string)."""
    from my_ocr_spark.operators.dedup import duplicate_spans

    shared = "zero one two three four five six seven"
    rows = [(1, "XX " + shared + " tail1 a b"),
            (2, "YY yy " + shared + " other2 c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df, "doc_id", "text",
                          gram_width=5, df_cap=16, min_grams=2).collect()
    assert len(out) == 1
    r = out[0]
    # doc1 words: xx zero one ... -> shared run starts at word 2
    # doc2 words: yy yy zero ...  -> starts at word 3
    assert (r["doc1"], r["doc2"]) == (1, 2)
    assert (r["start1"], r["start2"]) == (2, 3)
    assert r["n_grams"] == 4  # 8 shared words, width 5 -> 4 grams
    assert r["span_words"] == 8


def test_duplicate_spans_digest_is_md5_prefix():
    """Pin the key construction: raw md5 digest of the utf-8 gram, so
    the grouping is provably injective with the oracle's md5-hex."""
    g = "zero one two three four"
    assert hashlib.md5(g.encode()).hexdigest().startswith(
        hashlib.md5(g.encode()).digest().hex())
