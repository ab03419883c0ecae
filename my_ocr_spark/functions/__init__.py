"""Stage registry + pipeline composition (SURVEY.md §1.1/§2.12).

The reference's architecture backbone is a registry of operators
instantiated from config dicts and chained by ``Compose``
(``mmocr/datasets/base_dataset.py:68``; ``@PIPELINES.register_module()``,
``loading.py:20``). The Spark-idiomatic equivalent: a plain dict registry
of DataFrame→DataFrame stage factories and a ``Pipeline`` that chains
them lazily — Catalyst sees one plan, so stage composition costs nothing
at runtime (adjacent projections collapse).
"""

from my_ocr_spark.functions.pipeline import (  # noqa: F401
    STAGES, Pipeline, register_stage, build_pipeline,
)
