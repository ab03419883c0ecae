"""Executable form of CLAUDE.md invariant 6: synthetic fixture GROUP keys
feeding per-group quadratic consumers (self/theta joins, greedy recursions,
pair emission) must keep per-group density CONSTANT as SF grows.

Every round's scale-up has re-found this fault class (round 5:
poly_iou_match_2d / drrg_local_knn at sf0.1; round 6: the _gt_pred
IoU/hmean/NMS family, kie_relation_crossjoin, and merge_disks_greedy at
sf1.0 — a 3850 s NMS oracle, 450M KIE pairs, and an unfinishable
greedy-NMS recursion). This test pins the fixed versions: for each
quadratic-consumer fixture it measures rows-per-group at sf0.001 and
sf0.01 with DuckDB (no Spark session needed) and asserts the density
ratio stays ~1 while the GROUP COUNT carries the 10x growth.

interval_range_join's % 50 key is intentionally NOT listed: interval
range joins legitimately partition by a fixed small key set (chromosomes,
streams) with per-group size growing with data — banding is exactly what
keeps that shape scalable, and its quadratic sf1.0 output is verified by
distributed per-group invariants (scripts/check_sf10_irj.py).
embedding_centroids' vec_id % 16 is an AGGREGATION key (k-means k is
constant by design), not a join key.
"""

from __future__ import annotations

import duckdb
import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"

# (name, group-key SQL, source table) — each feeds a per-group
# quadratic consumer (join, pair emission, or greedy recursion).
DENSITY_KEYED_FIXTURES = [
    ("iou/hmean/ic13 gt side", "o_orderkey // 10", "orders"),
    ("iou/nms/ic13 pred side", "l_orderkey // 10", "lineitem"),
    ("kie_relation_crossjoin", "c_custkey // 30", "customer"),
    ("merge_disks_greedy", "l_orderkey // 10", "lineitem"),
    ("poly_iou_match_2d quads", "o_orderkey // 10", "orders"),
    ("drrg_local_knn points", "l_orderkey // 10", "lineitem"),
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        for tag, d in (("s", SF_SMALL), ("b", SF_BIG)):
            c.execute(
                f"CREATE VIEW {t}_{tag} AS "
                f"SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
    return c


def _stats(con, table: str, key: str) -> tuple[int, float, int]:
    n, groups, mx = con.execute(
        f"SELECT sum(cnt), count(*), max(cnt) FROM "
        f"(SELECT {key} AS k, count(*) AS cnt FROM {table} GROUP BY 1)"
    ).fetchone()
    return int(n), n / groups, int(mx)


@pytest.mark.parametrize("name,key,table", DENSITY_KEYED_FIXTURES)
def test_per_group_density_constant_in_sf(con, name, key, table):
    n_s, avg_s, max_s = _stats(con, f"{table}_s", key)
    n_b, avg_b, max_b = _stats(con, f"{table}_b", key)
    assert n_b > 3 * n_s, f"{name}: SF step did not grow the table"
    # density (rows per group) must NOT track the 10x data growth —
    # allow generous jitter for sparse-key granularity, nothing more.
    ratio = avg_b / avg_s
    assert ratio < 2.0, (
        f"{name}: per-group density grew {ratio:.1f}x across a 10x SF "
        f"step ({avg_s:.1f} -> {avg_b:.1f} rows/group) — quadratic "
        f"consumer will not survive scale (CLAUDE.md invariant 6)")
    # and no single pathological group either
    assert max_b < 20 * max(avg_b, 1.0), (
        f"{name}: max group {max_b} vs avg {avg_b:.1f} — skewed key")


def test_fixed_group_keys_are_gone():
    """The faulty key shapes must not reappear in the quadratic-consumer
    fixtures (string-level pin; the density test above is the semantic
    one)."""
    import pathlib

    plans = pathlib.Path(__file__).resolve().parent.parent / \
        "my_ocr_spark" / "plans"
    rel = (plans / "relational.py").read_text()
    geo = (plans / "geometry.py").read_text()
    for bad in ("% 2000 AS img", '% 2000).alias("img")'):
        assert bad not in rel and bad not in geo, bad
    assert "c_nationkey = b.c_nationkey" not in rel
    assert "l_orderkey % 1000 AS img,\n               CAST(l_partkey % 300" \
        not in geo
