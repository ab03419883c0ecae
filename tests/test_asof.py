"""asof_join: tie (<=) semantics, missing snapshots, inner mode,
multiple value columns."""

from __future__ import annotations

from pyspark.sql import functions as F


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 15), (3, 10, 20), (4, 20, 7), (5, 30, 9)],
        "oid long, k long, ts long")
    right = spark.createDataFrame(
        [(10, 5, "a"), (10, 15, "b"), (10, 25, "c"), (20, 50, "z")],
        "k long, sts long, val string")
    return left, right


def test_left_semantics(spark):
    from my_ocr_spark.operators.asof import asof_join

    left, right = _frames(spark)
    out = {r["oid"]: r["val"] for r in asof_join(
        left, right, key="k", left_ts="ts", right_ts="sts",
        value_cols=["val"]).collect()}
    assert out == {
        1: "a",    # ts=5 == snapshot ts 5 -> included (<=)
        2: "b",    # ts=15 ties the second snapshot
        3: "b",    # ts=20: latest <= is 15
        4: None,   # key 20 has only a later snapshot (50)
        5: None,   # key 30 has no snapshots at all
    }


def test_inner_drops_unmatched(spark):
    from my_ocr_spark.operators.asof import asof_join

    left, right = _frames(spark)
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="sts",
                    value_cols=["val"], how="inner")
    assert sorted(r["oid"] for r in out.collect()) == [1, 2, 3]


def test_multiple_value_columns(spark):
    from my_ocr_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 7, 100)], "oid long, k long, ts long")
    right = spark.createDataFrame(
        [(7, 90, "x", 1.5), (7, 99, "y", 2.5), (7, 101, "z", 3.5)],
        "k long, sts long, name string, score double")
    row = asof_join(left, right, key="k", left_ts="ts", right_ts="sts",
                    value_cols=["name", "score"]).collect()[0]
    assert (row["name"], row["score"]) == ("y", 2.5)


def test_left_columns_preserved(spark):
    from my_ocr_spark.operators.asof import asof_join

    left, right = _frames(spark)
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="sts",
                    value_cols=["val"])
    assert out.columns == ["oid", "k", "ts", "val"]
    assert out.count() == left.count()
