"""Registry + Compose for DataFrame stages.

A stage factory takes config kwargs and returns a DataFrame→DataFrame
callable; a pipeline is built from a list of config dicts exactly like
the reference's ``Compose(pipeline_cfg)`` (``base_dataset.py:68``), but
composition is lazy plan-building — no per-record dispatch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

Stage = Callable[[DataFrame], DataFrame]

STAGES: dict[str, Callable[..., Stage]] = {}


def register_stage(name: str):
    """@PIPELINES.register_module() analog (loading.py:20)."""
    def deco(factory: Callable[..., Stage]):
        if name in STAGES:
            raise ValueError(f"stage {name!r} already registered")
        STAGES[name] = factory
        return factory
    return deco


class Pipeline:
    """Compose analog: chain registered stages over a DataFrame."""

    def __init__(self, stages: list[Stage]):
        self.stages = stages

    def __call__(self, df: DataFrame) -> DataFrame:
        for s in self.stages:
            df = s(df)
        return df


def build_pipeline(cfg: list[dict]) -> Pipeline:
    """[{'type': 'name', **kwargs}, ...] → Pipeline, mirroring the
    reference's config-dict instantiation."""
    stages = []
    for c in cfg:
        c = dict(c)
        name = c.pop("type")
        if name not in STAGES:
            raise KeyError(f"unknown stage {name!r}; "
                           f"registered: {sorted(STAGES)}")
        stages.append(STAGES[name](**c))
    return Pipeline(stages)


# --- built-in stages ---------------------------------------------------------

@register_stage("ExtractMainText")
def _extract_stage() -> Stage:
    from my_ocr_spark.operators.extract import extract_docs
    return extract_docs


@register_stage("LatestSnapshot")
def _latest_snapshot_stage() -> Stage:
    from my_ocr_spark.operators.extract import latest_snapshot
    return latest_snapshot


@register_stage("RepartitionByUrl")
def _repartition_stage(num_partitions: int, salt_buckets: int = 16) -> Stage:
    from my_ocr_spark.operators.extract import repartition_by_url
    return lambda df: repartition_by_url(df, num_partitions, salt_buckets)


@register_stage("FilterLang")
def _filter_lang_stage(langs: list[str]) -> Stage:
    return lambda df: df.filter(F.col("lang").isin(*langs))


@register_stage("NormalizeText")
def _normalize_stage(col: str = "text", out: str = "norm_text") -> Stage:
    from my_ocr_spark.operators.dedup import normalized_col
    return lambda df: df.withColumn(out, normalized_col(col))


@register_stage("Fingerprint")
def _fingerprint_stage(col: str = "text", out: str = "fp") -> Stage:
    from my_ocr_spark.operators.dedup import normalized_col
    return lambda df: df.withColumn(out, F.md5(normalized_col(col)))


@register_stage("SelectColumns")
def _select_stage(columns: list[str]) -> Stage:
    return lambda df: df.select(*columns)


@register_stage("DeterministicAugment")
def _augment_stage(col: str = "text", out: str = "aug_text",
                   drop_every: int = 7) -> Stage:
    """§2.9 augmentation pattern, made reproducible: the reference's
    random per-record transforms (RandomCropInstances etc.,
    transforms.py:18-967) map to per-row ops seeded by xxhash64(url) —
    here, drop every k-th word with k offset by the row's key hash, so
    the 'random' choice is a pure function of the row. No RNG anywhere."""
    def stage(df: DataFrame) -> DataFrame:
        seed = F.pmod(F.xxhash64("url"), F.lit(drop_every))
        words = F.split(F.col(col), " ")
        kept = F.filter(
            words,
            lambda w, i: F.pmod(i + seed, F.lit(drop_every)) != 0)
        return df.withColumn(out, F.array_join(kept, " "))
    return stage
