"""As-of (temporal) join — latest right-side snapshot at or before each
left row's timestamp.

Spark has no native ASOF JOIN (DuckDB/kdb/Pandas do). The naive form —
theta join on ``l.ts >= r.ts`` + per-left max — explodes to
|L_key|x|R_key| pairs per key. The scale-correct form used here is the
union-and-carry trick: tag both sides, union, sort within each key by
(ts, side) so a snapshot sorts BEFORE any observation at the same ts
(<= semantics), then carry the last non-null snapshot forward with
``last(ignorenulls=True)`` over an unbounded-preceding window and keep
the left rows. One shuffle on the key, no pair blow-up, and skew is
bounded by the per-key row count rather than its square.

Reference relation: the engine's ``warc_ts`` latest-snapshot dedup
(SURVEY.md §2.3) is the self-join special case; this is the general
two-table operator the prompt's operator list calls out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the right row with
    the greatest ``right_ts`` <= ``left_ts`` within the same ``key``
    (NULLs when none exists and ``how='left'``; such rows are dropped
    when ``how='inner'``). Right (key, right_ts) pairs must be unique —
    the standard as-of precondition."""
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1))
    rt = right.select(
        key,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols])
    for c in value_cols:
        lt = lt.withColumn(f"_v_{c}", F.lit(None).cast(
            dict(rt.dtypes)[f"_v_{c}"]))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    u = lt.unionByName(rt.select(*lt.columns))
    w = (Window.partitionBy(key).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in value_cols:
        u = u.withColumn(f"_f_{c}",
                         F.last(f"_v_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col(f"_f_{value_cols[0]}").isNotNull())
    keep = [c for c in left.columns]
    return out.select(
        *keep, *[F.col(f"_f_{c}").alias(c) for c in value_cols])
