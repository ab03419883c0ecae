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
