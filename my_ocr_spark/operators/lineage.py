"""Per-partition lineage + idempotent resumable writes (north_rule).

The reference's analog is checkpoint/resume of training runs
(``mmocr/apis/train.py:157-160``) and the error-tolerant scan
(``mmocr/datasets/base_dataset.py:128-149``). Here:

* ``lineage_rows(df)`` — one row per Spark partition:
  (partition_id, doc_count, byte_count, checksum). checksum is an
  order-insensitive XOR-fold of xxhash64(url, text) so it's stable under
  intra-partition reordering.
* ``write_with_lineage`` — writes data partitioned by a deterministic
  bucket column + a _lineage/ manifest per bucket. A resumed job calls
  ``completed_buckets`` and processes only missing buckets, overwriting
  per-bucket directories (idempotent overwrite-by-partition — the
  parquet-manifest emulation of Iceberg snapshot commit; with Iceberg jars
  present the same API maps to format("iceberg") + snapshot metadata).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET_COL = "_bucket"


def with_bucket(df: DataFrame, key_col: str = "url",
                n_buckets: int = 64) -> DataFrame:
    """Deterministic bucket id from the document key — the unit of commit
    and resume. Bucketing by hash(url) also co-locates snapshots of the
    same url for downstream dedup."""
    return df.withColumn(BUCKET_COL,
                         F.pmod(F.xxhash64(key_col), F.lit(n_buckets))
                          .cast("int"))


def lineage_rows(df: DataFrame, key_col: str = "url",
                 payload_col: str = "text") -> DataFrame:
    """(partition_id, doc_count, byte_count, checksum) per partition.

    XOR-fold of row hashes is commutative → stable under partition-local
    reordering; any dropped/duplicated row flips the checksum."""
    h = F.xxhash64(key_col, payload_col)
    return (df.withColumn("_pid", F.spark_partition_id())
              .groupBy(F.col("_pid").alias("partition_id"))
              .agg(F.count("*").alias("doc_count"),
                   F.sum(F.octet_length(payload_col)).alias("byte_count"),
                   # bit_xor aggregate: order-insensitive fold
                   F.expr(f"bit_xor(xxhash64({key_col}, {payload_col}))")
                    .alias("checksum"))
              .withColumn("checksum", F.col("checksum").cast("long")))


def completed_buckets(out_dir: str) -> set[int]:
    """Buckets whose manifest was committed by a previous (partial) run."""
    mdir = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("bucket=") and name.endswith(".json"):
            done.add(int(name[len("bucket="):-len(".json")]))
    return done


def write_with_lineage(df: DataFrame, out_dir: str, key_col: str = "url",
                       payload_col: str = "text", n_buckets: int = 16,
                       resume: bool = True) -> dict:
    """Idempotent bucket-partitioned write with per-bucket lineage commit.

    Returns {written: [...], skipped: [...]}. Each bucket is written with
    dynamic partition overwrite (re-running a bucket replaces it exactly),
    then its manifest (doc_count, byte_count, checksum) is committed LAST —
    a bucket without a manifest is treated as uncommitted and rewritten on
    resume. This is the directory-manifest emulation of an Iceberg
    snapshot commit (SURVEY.md §7.3.3)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    b = with_bucket(df, key_col, n_buckets)
    done = completed_buckets(out_dir) if resume else set()
    todo = sorted(set(range(n_buckets)) - done)
    mdir = os.path.join(out_dir, "_lineage")
    os.makedirs(mdir, exist_ok=True)
    written = []
    if todo:
        # each bucket is its own commit unit (two jobs: data + stats),
        # so WITHOUT materialization the upstream pipeline would re-run
        # 2 x len(todo) times — the per-bucket resume granularity is
        # worth one disk-backed cache, not that
        b = b.persist()
    try:
        written = _write_buckets(b, todo, out_dir, mdir,
                                 key_col, payload_col)
    finally:
        if todo:
            b.unpersist()
    return {"written": written, "skipped": sorted(done)}


def _write_buckets(b: DataFrame, todo, out_dir: str, mdir: str,
                   key_col: str, payload_col: str) -> list:
    import json

    written = []
    for bucket in todo:
        part = b.filter(F.col(BUCKET_COL) == bucket)
        (part.write.mode("overwrite")
             .partitionBy(BUCKET_COL)
             .parquet(out_dir))
        stats = (part.agg(
            F.count("*").alias("doc_count"),
            F.sum(F.octet_length(payload_col)).alias("byte_count"),
            F.expr(f"bit_xor(xxhash64({key_col}, {payload_col}))")
             .alias("checksum")).collect()[0])
        manifest = {
            "bucket": bucket,
            "doc_count": stats["doc_count"],
            "byte_count": int(stats["byte_count"] or 0),
            "checksum": int(stats["checksum"] or 0),
        }
        tmp = os.path.join(mdir, f".bucket={bucket}.json.tmp")
        final = os.path.join(mdir, f"bucket={bucket}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)  # atomic commit point
        written.append(bucket)
    return written


def read_lineage_manifests(out_dir: str) -> list[dict]:
    import json

    mdir = os.path.join(out_dir, "_lineage")
    out = []
    for b in sorted(completed_buckets(out_dir)):
        with open(os.path.join(mdir, f"bucket={b}.json")) as f:
            out.append(json.load(f))
    return out
