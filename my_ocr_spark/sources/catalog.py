"""Table IO behind one interface: Iceberg when the runtime has it,
parquet + directory manifest otherwise (SURVEY.md §7.3.3).

The north_star names an Iceberg table; this sandbox has no Iceberg jars,
so ``write_table``/``read_table`` probe once and fall back. The fallback
keeps Iceberg's two properties the engine relies on:
* snapshot commit → per-bucket atomic manifests (operators/lineage.py)
* partition pruning → hive-style bucket directories + parquet min/max
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession


@lru_cache(maxsize=1)
def iceberg_available(spark_classpath_probe: str = "") -> bool:
    try:
        from py4j.java_gateway import java_import  # noqa: F401
        from pyspark.sql import SparkSession as S
        spark = S.getActiveSession()
        if spark is None:
            return False
        jvm = spark._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path_or_ident: str,
                mode: str = "overwrite") -> str:
    """Returns the format used ('iceberg' | 'parquet')."""
    if iceberg_available():
        (df.writeTo(path_or_ident).using("iceberg")
           .createOrReplace())
        return "iceberg"
    df.write.mode(mode).parquet(path_or_ident)
    return "parquet"


def read_table(spark: SparkSession, path_or_ident: str) -> DataFrame:
    if iceberg_available():
        return spark.read.format("iceberg").load(path_or_ident)
    return spark.read.parquet(path_or_ident)
