"""Char codecs, char-level metrics, and the stage registry/pipeline."""

import pytest

from my_ocr_spark.kernel import codec


def test_str2idx_idx2str_roundtrip():
    assert codec.str2idx("abc019") == [10, 11, 12, 0, 1, 9]
    assert codec.idx2str([10, 11, 12]) == "abc"
    # unknown chars → UKN bucket, render as '?'
    assert codec.str2idx("a!") == [10, codec.UKN_IDX]
    assert codec.idx2str(codec.str2idx("a!")) == "a?"


def test_ctc_greedy_decode():
    B = codec.UKN_IDX
    # collapse repeats, drop blanks: "aa-ab-b" → "aabb"
    assert codec.ctc_greedy_decode([10, 10, B, 10, 11, B, 11]) \
        == [10, 10, 11, 11]
    assert codec.ctc_greedy_decode([]) == []
    assert codec.ctc_greedy_decode([B, B]) == []


def test_attn_encode_layout():
    # [BOS, chars..., EOS, PAD...] (attn.py:114-132)
    enc = codec.attn_encode("ab", max_seq_len=8)
    assert enc == [37, 10, 11, 37, 38, 38, 38, 38]
    # truncation when too long
    enc = codec.attn_encode("abcdefgh", max_seq_len=5)
    assert enc == [37, 10, 11, 12, 13]
    assert len(codec.attn_encode("", max_seq_len=4)) == 4


def test_attn_greedy_decode_stop_at_eos_skip_pad():
    # skip PAD anywhere, stop at first EOS, keep UKN (attn.py:125-136)
    assert codec.attn_greedy_decode([5, 38, 7, 36, 37, 9]) == [5, 7, 36]
    assert codec.attn_greedy_decode([37, 1, 2]) == []
    assert codec.attn_greedy_decode([38, 38]) == []
    assert codec.attn_greedy_decode([1, 2, 3]) == [1, 2, 3]


def test_attn_roundtrip_via_kernel():
    text = "hello42"
    enc = codec.attn_encode(text, max_seq_len=40)
    # drop the BOS (model outputs never include it), decode the rest
    dec = codec.attn_greedy_decode(enc[1:])
    assert codec.idx2str(dec) == text


def test_attn_spark_expr_matches_kernel(spark):
    """The attn_decode_stop_eos column-expression decode must equal the
    kernel decode on random index sequences."""
    import random
    from pyspark.sql import functions as F
    from my_ocr_spark.plans.recog import _IDX_CASE
    rng = random.Random(9)
    rows = [(i, [rng.randrange(0, 39) for _ in range(12)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "seq_id int, raw array<int>")
    s = df.withColumn("no_pad", F.filter("raw", lambda x: x != 38))
    pos = F.array_position("no_pad", 37)
    s = s.withColumn(
        "dec_idx",
        F.when(pos > 0, F.slice("no_pad", F.lit(1), (pos - 1).cast("int")))
        .otherwise(F.col("no_pad")))
    decoded = F.expr(f"array_join(transform(dec_idx, i -> {_IDX_CASE}), '')")
    got = {r["seq_id"]: r["decoded"]
           for r in s.select("seq_id", decoded.alias("decoded")).collect()}
    for i, raw in rows:
        assert got[i] == codec.idx2str(codec.attn_greedy_decode(raw)), i


def test_char_precision_recall():
    p, r = codec.char_precision_recall("hello", "hello")
    assert (p, r) == (1.0, 1.0)
    p, r = codec.char_precision_recall("helo", "hello")
    assert p == 1.0 and r == 0.8
    p, r = codec.char_precision_recall("", "")
    assert (p, r) == (1.0, 1.0)
    p, r = codec.char_precision_recall("abc", "")
    assert (p, r) == (0.0, 1.0)


def test_pipeline_compose(spark, docs_df):
    from my_ocr_spark.functions import build_pipeline
    pipe = build_pipeline([
        {"type": "LatestSnapshot"},
        {"type": "FilterLang", "langs": ["en", "de"]},
        {"type": "ExtractMainText"},
        {"type": "SelectColumns", "columns": ["url", "text", "n_kept"]},
    ])
    out = pipe(docs_df)
    assert out.columns == ["url", "text", "n_kept"]
    assert out.count() > 0


def test_pipeline_unknown_stage_raises():
    from my_ocr_spark.functions import build_pipeline
    with pytest.raises(KeyError):
        build_pipeline([{"type": "NoSuchStage"}])


def test_fingerprint_stage_matches_kernel(spark):
    from my_ocr_spark.functions import build_pipeline
    from my_ocr_spark.kernel import textstats as ts
    df = spark.createDataFrame([("Hello, World!",)], ["text"])
    out = build_pipeline([{"type": "Fingerprint"}])(df).collect()[0]
    assert out["fp"] == ts.fingerprint("Hello, World!")
