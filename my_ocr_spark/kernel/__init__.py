"""Pure-Python deterministic kernels (stdlib + numpy only, no Spark imports).

These are the single code path for extraction semantics — called from the
pandas UDFs (operators/extract.py), the fixture generator (fixtures.py) and
the pytest goldens — which is the only reliable route to byte-identical
output per url (SURVEY.md §7.0).
"""

from my_ocr_spark.kernel.htmlparse import parse_blocks  # noqa: F401
from my_ocr_spark.kernel.extract import extract_main_text  # noqa: F401
