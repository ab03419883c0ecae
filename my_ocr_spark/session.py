"""SparkSession factory with scale-oriented defaults.

Tuned for the north_rule's execution profile: Arrow-batched pandas UDFs over
fat binary ``html`` rows, AQE for runtime re-planning / skew mitigation,
shuffle partition count sized to local cores here but overridable for a real
cluster via normal spark-submit confs (these are only defaults, set with
``.config`` so submit-time ``--conf`` wins).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "my_ocr_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """NOTE on precedence: builder ``.config``/``.master`` OVERRIDE
    submit-time ``--conf``/``--master`` (PySpark applies builder options
    on top of the submit SparkConf), so these local-sandbox defaults
    would hijack a spark-submit job. A cluster job must either pass
    ``master=`` explicitly / set SPARK_GRAFT_MASTER, or build its own
    SparkSession — the package itself never requires this factory."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = (master or os.environ.get("SPARK_GRAFT_MASTER")
              or f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(cpus)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing + skew-join splitting — the
        # engine's answer to host-level skew (SURVEY.md §4 item 1).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # The coalescer merges post-shuffle partitions below
        # minPartitionSize (default 1 MB) — sized by COMPRESSED shuffle
        # bytes. A fat-column shuffle feeding a CPU-bound Python stage
        # compresses to ~0.6 MB/partition here, so the default floor
        # halved extraction parallelism (flagship 2.2 s vs 1.2-1.7 s,
        # pdf_reading_order 1.75 s vs 1.1-1.6 s, A/B'd both directions).
        # 64k keeps coalescing for genuinely tiny partitions while never
        # binding at corpus scale, where partitions are 100s of MB.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDFs. Batch ROWS is the only knob Spark offers,
        # but the real constraint is BYTES/batch: pick rows ≈ target_bytes
        # / page_size. Small synthetic pages (~1 KB) want 2048-4096 (Arrow
        # per-batch overhead dominates below that — measured 4×); multi-MB
        # real pages want 64-256. Env-tunable per corpus.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "1024"))
        # read-side split size: at 100 TB this governs task count; 128 MB
        # default is fine, set explicitly for visibility.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # the correctness harness collects full results to hash them;
        # at sf1.0 a single join result passes 1 GiB serialized, so the
        # 1g default kills the collect (found live). A cluster job
        # never collects like this — the knob serves the local gate.
        .config("spark.driver.maxResultSize",
                os.environ.get("SPARK_GRAFT_MAX_RESULT", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # e.g. "-XX:ParallelGCThreads=4" — the scaling bench pins GC threads
    # so the saturated full-width level doesn't pay GC-vs-task contention
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        b = b.config("spark.driver.extraJavaOptions", java_opts)
    return b.getOrCreate()


def spread_small_scan(df, min_parallelism: int | None = None):
    """Cost-modeled small-input adaptation for python-heavy stages.

    A small parquet table scans as 1-4 input splits (file bytes /
    ``spark.sql.files.maxPartitionBytes``), so a per-document pandas
    stage downstream runs on 1-4 of the session's cores — measured:
    the sf1.0 documents table (2 splits) ran every dedup signature pass
    at 2/32 parallelism. Repartition ONLY when the scan is narrower
    than the session parallelism: at corpus scale (splits >> cores)
    this is a no-op, so the fat text column never pays a shuffle where
    the scan is already wide — the same broadcast-threshold-style cost
    model as operators/graph.py's driver path (CLAUDE.md invariant 4).
    Reading the partition count converts the plan driver-side only (no
    job)."""
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def bucket_count(spark: SparkSession, per_slot: int = 4,
                 floor: int = 64) -> int:
    """Bucket fan-out for grouped-map operators (cogrouped matchers,
    per-group KNN): track the session's parallelism instead of a fixed
    constant so a 1000-executor cluster gets 1000× the concurrency a
    hardcoded B=64 would cap it at. ``per_slot`` buckets per task slot
    smooths group-size skew; ``floor`` keeps tiny local sessions from
    degenerating to a handful of giant groups. Reading
    ``defaultParallelism`` is driver-side metadata — no job is run."""
    return max(floor, spark.sparkContext.defaultParallelism * per_slot)
