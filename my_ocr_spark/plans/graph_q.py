"""Graph queries: connected components over a deterministic bipartite
projection of the lineitem table (orders linked by shared parts — the
relational shape of the reference's component clustering,
wrapper.py:544-628)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from my_ocr_spark.operators.graph import connected_components, \
    remove_singletons
from my_ocr_spark.plans.registry import query, t


@query("connected_components")  # iterative fixpoint → rows-only
def connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed CC via min-label propagation + pointer jumping (the
    GraphFrames pattern on plain joins; see operators/graph.py). Edges:
    order↔part from a sparse deterministic slice of lineitem; node ids
    disambiguated by range (orders ×10, parts ×10+1)."""
    li = t(spark, sf_dir, "lineitem")
    edges = (li.filter((F.col("l_orderkey") % 25 == 0)
                       & (F.col("l_linenumber") == 1))
               .select((F.col("l_orderkey") * 10).alias("src"),
                       (F.col("l_partkey") * 10 + 1).alias("dst")))
    labels = connected_components(edges)
    return remove_singletons(labels).orderBy("component", "node")
