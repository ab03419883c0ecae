"""Build the spark-submit artifact: a zip of the my_ocr_spark package
(pure Python, no compiled deps) suitable for

    spark-submit --py-files my_ocr_spark.zip --files <confs> \
        your_job.py    # or:  python -m my_ocr_spark ... locally

The zip contains only the package sources (no tests, no caches); the
driver script imports `my_ocr_spark` exactly as locally. Usage:

    python scripts/make_pyfiles.py [out_dir]    # default: dist/
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "my_ocr_spark.zip")
    pkg = os.path.join(REPO, "my_ocr_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else
                os.path.join(REPO, "dist"))
    print(out)
