"""Realistic-page-size extraction bench (fat pages).

The headline bench corpus averages ~0.9 KB/page, which under-represents
real Common-Crawl pages (tens of KB) and over-weights Arrow per-batch
fixed costs. This bench runs the SAME extraction job over
``synthesize_fat_docs`` (log-normal html size: mean ~60 KB, multi-MB
tail, 4 MB cap) and reports docs/s + MB/s:

1. an Arrow-batch sweep at local[32] (maxRecordsPerBatch is Spark's
   only knob, but the real constraint is BYTES/batch — fat pages want
   far fewer rows per batch than 1 KB pages), then
2. the standard N vs 4N ladder (local[8] vs local[32], fresh JVM per
   level, paired host-CPU ceiling probe) at the chosen batch size.

Usage: python scripts/bench_fatpages.py [sf_dir] [copies] [ladders]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import host_cpu_ceiling  # noqa: E402

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, sf_dir, copies, arrow = (sys.argv[1], sys.argv[2],
                                int(sys.argv[3]), sys.argv[4])
import os
os.environ["SPARK_GRAFT_ARROW_BATCH"] = arrow
from my_ocr_spark.session import get_spark
from my_ocr_spark.operators.extract import extract_docs
from my_ocr_spark.plans.flagship import synthesize_fat_docs
from pyspark.sql import functions as F

spark = get_spark(app_name=f"fat-{cores}-{arrow}",
                  master=f"local[{cores}]", shuffle_partitions=int(cores))
spark.sparkContext.setLogLevel("ERROR")
corpus = synthesize_fat_docs(spark, sf_dir, copies=copies)
n_docs, n_bytes = corpus.select(
    F.count("*"), F.sum(F.octet_length("html"))).collect()[0]
# warm-up touches every partition (see bench_scaling.py note)
extract_docs(corpus.filter(
    F.pmod(F.xxhash64("url"), F.lit(50)) == 0)).count()
t0 = time.perf_counter()
n_out = extract_docs(corpus).count()
wall = time.perf_counter() - t0
assert n_out == n_docs
print(json.dumps({"cores": int(cores), "arrow_batch": int(arrow),
                  "n_docs": int(n_docs), "mb": n_bytes / 1e6,
                  "wall_sec": round(wall, 2),
                  "docs_per_sec": round(n_docs / wall),
                  "mb_per_sec": round(n_bytes / 1e6 / wall, 1)}),
      flush=True)
try:
    spark.stop()
except Exception:
    pass
"""


def run_level(cores: int, sf_dir: str, copies: int, arrow: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cores), sf_dir, str(copies),
         str(arrow)],
        capture_output=True, text=True, timeout=1800, cwd="/root/repo")
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        if isinstance(parsed, dict) and "wall_sec" in parsed:
            return parsed
    raise RuntimeError(f"fat level {cores}/{arrow}: no measurement "
                       f"(rc={out.returncode}); {out.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ladders = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    sweep = []
    for arrow in (32, 128, 1024):
        r = run_level(32, sf_dir, copies, arrow)
        sweep.append(r)
        print(json.dumps(r), flush=True)
    best = max(sweep, key=lambda r: r["mb_per_sec"])
    arrow = best["arrow_batch"]
    print(json.dumps({"chosen_arrow_batch": arrow}), flush=True)

    runs, probes = [], []
    for _ in range(ladders):
        probes.append(host_cpu_ceiling())
        print(json.dumps(probes[-1]), flush=True)
        ladder = {c: run_level(c, sf_dir, copies, arrow) for c in (8, 32)}
        for c in (8, 32):
            print(json.dumps(ladder[c]), flush=True)
        runs.append(ladder)
    effs = sorted((r[32]["docs_per_sec"] / r[8]["docs_per_sec"]) / 4.0
                  for r in runs)
    eff = statistics.median(effs)
    ceil = statistics.median(p["ceiling_8_32"] for p in probes)
    print(json.dumps({
        "eff_8_32_median": round(eff, 3), "effs": [round(e, 3)
                                                   for e in effs],
        "host_ceiling_8_32": round(ceil, 3),
        "normalized": round(eff / ceil, 3) if ceil else None,
    }), flush=True)


if __name__ == "__main__":
    main()
