"""Custom stateful streaming operator: first-seen URL dedup via
applyInPandasWithState (SURVEY.md §2.11 — the reference has no streaming
surface; this is the north-star web-crawl shape: emit each url's first
snapshot, drop re-crawls within the state horizon).

State per url-hash group: the set of urls already emitted. Batch mode has
the same semantics via latest_snapshot/first-seen window; this operator
exists for the incremental path where a global window is impossible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("text", T.StringType(), True),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("seen", T.ArrayType(T.StringType()), True),
])


def _dedup_group(key, pdfs, state: GroupState):
    seen = set(state.get[0]) if state.exists else set()
    rows = {"url": [], "warc_ts": [], "text": []}
    for pdf in pdfs:
        pdf = pdf.sort_values(["warc_ts", "url"], kind="mergesort")
        for url, ts_, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
            if url not in seen:
                seen.add(url)
                rows["url"].append(url)
                rows["warc_ts"].append(ts_)
                rows["text"].append(text)
    state.update((sorted(seen),))
    yield pd.DataFrame(rows)


def first_seen_urls(stream: DataFrame, n_groups: int = 64) -> DataFrame:
    """Streaming first-seen-url filter. Groups by hash(url) bucket so
    state shards evenly across executors (same salting policy as the
    batch path); each group's state is its seen-url set."""
    keyed = stream.withColumn(
        "_g", F.pmod(F.xxhash64("url"), F.lit(n_groups)).cast("int"))
    return (keyed.groupBy("_g")
            .applyInPandasWithState(
                _dedup_group,
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
