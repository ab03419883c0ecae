"""Structured Streaming surface (SURVEY.md §2.11).

The reference has no streaming operators; this wrapper exists because every
stage of the extraction engine is a pure DataFrame transform, so streaming
execution is free: readStream → same transforms → writeStream.
"""

from my_ocr_spark.streaming.pipeline import (  # noqa: F401
    session_event_agg, streaming_extract, windowed_event_agg,
)
