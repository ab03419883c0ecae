"""Sequence packing for training-data preparation.

The capacity-reset scan that groups documents into fixed-token windows
before tokenizer batching (the packing step of every LLM data
pipeline). Sequential state lives per output shard; SHARDS are the
parallel unit — exactly how a production writer packs the shard it
owns — so the operator parallelizes with data size while every pack
stays deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_PACK_SCHEMA = T.StructType([
    T.StructField("source", T.StringType(), True),
    T.StructField("shard", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_tok", T.LongType(), False),
    T.StructField("pack_id", T.LongType(), False),
])


def greedy_pack(d: DataFrame, capacity: int = 512) -> DataFrame:
    """Capacity-reset packing scan over (source, shard, doc_id, n_tok):
    within each (source, shard), docs in doc_id order join the current
    pack while fill + n_tok <= capacity, else open a new pack (1-based
    ids; oversize docs get solo packs).

    Shards are small by construction (~hundreds of docs), so the
    grouped map runs BUCKETED: shards hash into
    defaultParallelism-scaled buckets and each Python call packs every
    complete shard in its bucket via a pandas groupby — the
    tiny-group applyInPandas launcher cost (CLAUDE.md invariant 5)
    stays amortized while shard-level determinism is untouched.

    The per-doc capacity loop stays plain Python BY MEASUREMENT (round-6
    note, per the vectorize-or-document task): isolated at sf0.1 it runs
    17.7 ms for 5000 docs (~3.5 us/doc) — 0.15% of the registered
    query's wall, which is dominated by upstream tokenization. A numpy
    capacity-reset cumsum would complicate the reset semantics for a
    sub-0.2% stage; shards are the parallel unit, so per-shard scan cost
    is bounded (~hundreds of docs) at any corpus scale."""
    spark = d.sparkSession
    from my_ocr_spark.session import bucket_count

    b = bucket_count(spark)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        # dropna=False: the schema declares source nullable, and a
        # NULL-source shard must still be packed, not silently dropped.
        for _, g in pdf.groupby(["source", "shard"], sort=True,
                                dropna=False):
            g = g.sort_values("doc_id").reset_index(drop=True)
            pack_ids = []
            pack_id, fill = 0, capacity + 1
            for n in g["n_tok"]:
                if fill + n <= capacity:
                    fill += n
                else:
                    pack_id += 1
                    fill = n
                pack_ids.append(pack_id)
            g["pack_id"] = pd.Series(pack_ids, dtype="int64")
            outs.append(g[["source", "shard", "doc_id", "n_tok",
                           "pack_id"]])
        return (pd.concat(outs) if outs
                else pd.DataFrame(columns=[f.name
                                           for f in _PACK_SCHEMA]))

    bucketed = d.withColumn(
        "_b", F.pmod(F.xxhash64("source", "shard"), F.lit(b)))
    return (bucketed.groupBy("_b")
            .applyInPandas(lambda pdf: run(pdf), schema=_PACK_SCHEMA))
