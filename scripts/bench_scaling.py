"""Scaling-efficiency protocol (BASELINE.md §B / north_rule): run the
IDENTICAL extraction job at two parallelism levels — local[8] (N) and
local[32] (4N) — on the same input, report throughput at both plus
efficiency = (T_4N / T_N) / 4, and write BENCH/BASELINE.md.

Each level runs in a fresh subprocess (a JVM's master/core count is fixed
at SparkContext creation). The job is the flagship: synthesize the
CC-style corpus (amplified ~40x → ~200k pages), latest-snapshot dedup is
skipped here (measured separately) so the timed stage is pure extraction —
the stage whose scaling the north_rule grades.

Usage: python scripts/bench_scaling.py [sf_dir] [copies]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, sf_dir, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
from my_ocr_spark.session import get_spark
from my_ocr_spark.operators.extract import extract_docs
from bench import build_amplified_corpus
from pyspark.sql import functions as F

spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=int(cores))
spark.sparkContext.setLogLevel("ERROR")
corpus = build_amplified_corpus(spark, sf_dir, copies)
# materialize input stats outside the timed window
n_docs, n_bytes = corpus.select(
    F.count("*"), F.sum(F.octet_length("html"))).collect()[0]
# warm-up (JIT, Arrow, python worker pool) on a slice
extract_docs(corpus.limit(2000)).count()
t0 = time.perf_counter()
out = extract_docs(corpus)
n_out = out.count()
wall = time.perf_counter() - t0
assert n_out == n_docs
spark.stop()
print(json.dumps({"cores": int(cores), "n_docs": int(n_docs),
                  "mb": n_bytes / 1e6, "wall_sec": wall,
                  "docs_per_sec": n_docs / wall,
                  "mb_per_sec": n_bytes / 1e6 / wall}))
"""


def run_level(cores: int, sf_dir: str, copies: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cores), sf_dir, str(copies)],
        capture_output=True, text=True, timeout=1800,
        cwd="/root/repo")
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    r8 = run_level(8, sf_dir, copies)
    r32 = run_level(32, sf_dir, copies)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured throughput & scaling efficiency",
        "",
        "Protocol (BASELINE.md §B): identical extraction job, identical "
        "input, two parallelism levels (local[8] = N, local[32] = 4N); "
        "efficiency = (throughput@4N / throughput@N) / 4.",
        "",
        f"Input: {r8['n_docs']:,} synthesized Common-Crawl-style pages "
        f"({r8['mb']:.0f} MB of HTML) from {sf_dir} ×{copies} "
        "amplification; job = full HTML parse + block scoring + "
        "boilerplate strip + span emission (mapInPandas, single narrow "
        "stage).",
        "",
        "| parallelism | wall_sec | docs/sec | MB/sec |",
        "|---|---|---|---|",
        f"| local[8] (N) | {r8['wall_sec']:.1f} | "
        f"{r8['docs_per_sec']:.0f} | {r8['mb_per_sec']:.1f} |",
        f"| local[32] (4N) | {r32['wall_sec']:.1f} | "
        f"{r32['docs_per_sec']:.0f} | {r32['mb_per_sec']:.1f} |",
        "",
        f"**Scaling efficiency (N→4N): {eff:.3f}**"
        + (" — meets the ≥0.8 target." if eff >= 0.8 else
           " — below the 0.8 target; see notes."),
        "",
        "Notes: single-machine core scaling is the sandbox stand-in for "
        "executor scaling; the job has no shuffle in the timed stage, so "
        "cluster-mode scaling is bounded by input-split balance, not "
        "network. Results JSON:",
        "```json",
        json.dumps({"local8": r8, "local32": r32,
                    "efficiency": round(eff, 4)}),
        "```",
    ]
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"local8": r8, "local32": r32,
                      "efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
