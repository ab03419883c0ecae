"""Sources/sinks mirroring the reference's Loader/Parser registry."""

from my_ocr_spark.sources.loaders import (  # noqa: F401
    load_jsonl, load_kv_table, load_line_str, read_annotation_lines,
    write_partitioned_by_correctness,
)
