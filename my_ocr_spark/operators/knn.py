"""Per-group K-nearest-neighbor join — the DRRG local-graph analog.

Reference: ``mmocr/models/textdet/modules/local_graph.py:29-296`` builds
per-image KNN graphs over text-component features (sorted Euclidean
distance matrix → k-at-hop neighborhoods). Graphs never cross documents,
so the Spark shape is a grouped operator, not a global join: points are
shuffled once on the group key and each group's all-pairs distance matrix
lives inside one Arrow batch.

Scale notes:
* groups are tiny (components per image), so launching one Python task
  per group would drown in per-group overhead — groups are BUCKETED into
  ``n_buckets`` applyInPandas tasks and iterated with pandas groupby
  inside (measured 4x in round 1 on 15k tiny groups).
* integer coordinates → integer squared distances → deterministic
  (dist2, neighbor_id) ordering, no float ties.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

KNN_SCHEMA = T.StructType([
    T.StructField("img", T.LongType(), False),
    T.StructField("src_id", T.LongType(), False),
    T.StructField("neighbor_id", T.LongType(), False),
    T.StructField("dist2", T.LongType(), False),
    T.StructField("rnk", T.LongType(), False),
])


def knn_per_group(points: DataFrame, k: int = 4,
                  n_buckets: int | None = None) -> DataFrame:
    """KNN within each ``img`` group of a (img, pid, x, y) DataFrame →
    (img, src_id, neighbor_id, dist2, rnk) with rnk in 1..k ordered by
    (squared distance, neighbor id) — the local_graph.py k-at-hop-1 set.

    ``n_buckets`` defaults to session-parallelism-scaled (see
    session.bucket_count) — a fixed constant would cap matcher
    concurrency on a large cluster."""
    if n_buckets is None:
        from my_ocr_spark.session import bucket_count
        n_buckets = bucket_count(points.sparkSession)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {c: [] for c in ("img", "src_id", "neighbor_id", "dist2",
                               "rnk")}
        for img, g in pdf.groupby("img", sort=False):
            ids = g["pid"].to_numpy(dtype=np.int64)
            xy = g[["x", "y"]].to_numpy(dtype=np.int64)
            n = len(ids)
            if n < 2:
                continue
            d = xy[:, None, :] - xy[None, :, :]
            dist2 = (d * d).sum(axis=2)  # (n, n) exact int64
            for i in range(n):
                # order by (dist2, neighbor_id), excluding self
                order = np.lexsort((ids, dist2[i]))
                order = order[order != i][:k]
                m = len(order)
                out["img"].extend([img] * m)
                out["src_id"].extend([ids[i]] * m)
                out["neighbor_id"].extend(ids[order].tolist())
                out["dist2"].extend(dist2[i, order].tolist())
                out["rnk"].extend(range(1, m + 1))
        return pd.DataFrame(out, dtype=np.int64) if out["img"] else \
            pd.DataFrame({c: pd.Series(dtype=np.int64) for c in out})

    bucketed = points.withColumn(
        "_bucket", F.pmod(F.col("img"), F.lit(n_buckets)))
    return (bucketed.groupBy("_bucket")
            .applyInPandas(lambda pdf: run(pdf), schema=KNN_SCHEMA))
