"""Deterministic synthetic-fixture generator for scale factors the
driver does not ship (the driver provides sf0.001/0.01/0.1 read-only;
each 10x scale step has historically exposed a new fault class, so
sf1.0 evidence needs a locally generated dir).

Mirrors the driver tables' schemas and measured distributions
(TESTDATA.md; reverse-engineered from /root/testdata/sf0.1 —
region/nation fixed; row counts linear in sf; lines-per-order
multinomial ~Poisson(4); events ts monotone in event_id over the fixed
Jan-2024 window; documents = 10..100 words uniform over the 30-word
vocab + rare 'dup' token + 0.3% copy-an-earlier-doc exact duplicates;
embeddings = unit-normalized N(0, I_64) float32 with uniform random
labels — the driver's cluster-mean norms match 1/sqrt(n) exactly, so
labels carry no geometry). Per-group join-key density is constant in
sf by construction (CLAUDE.md invariant 6).

NOT driver data: hash-exactness is Spark-vs-DuckDB on the SAME input,
so any deterministic input of the right shape is a valid (and here a
10x harsher) correctness probe.

Usage: python scripts/gen_sf.py [sf] [out_dir]
       defaults: sf=1.0, out_dir=testdata_sf{sf}
"""

from __future__ import annotations

import os
import sys

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

VOCAB = ["spark", "window", "merge", "table", "column", "vector",
         "stream", "value", "data", "small", "join", "filter", "big",
         "group", "hash", "customer", "sort", "order", "slow", "line",
         "part", "fast", "the", "row", "agg", "key", "query", "a",
         "scan", "batch"]
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE",
            "HOUSEHOLD"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
          "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
STATUSES = ["O", "P", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
FLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]

DAY_US = 86_400_000_000
EVENTS_T0 = np.datetime64("2024-01-01T00:00:00", "us")
ORDERS_D0 = np.datetime64("1995-01-01T00:00:00", "us")
ORDERS_DAYS = 2404          # .. 2001-08-01
SHIP_D0 = np.datetime64("1995-01-02T00:00:00", "us")
SHIP_DAYS = 2498            # .. 2001-11-04


def _rng(table: str) -> np.random.Generator:
    return np.random.default_rng([SEED, zlib.crc32(table.encode())])


def _write(out_dir: str, name: str, cols: dict, types: dict) -> None:
    arrays, fields = [], []
    for c, v in cols.items():
        t = types[c]
        arrays.append(pa.array(v, type=t))
        fields.append(pa.field(c, t, nullable=True))
    tbl = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {tbl.num_rows} rows", flush=True)


def gen(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)

    _write(out_dir, "region",
           {"r_regionkey": np.arange(5, dtype=np.int32),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE",
                       "MIDDLE EAST"]},
           {"r_regionkey": pa.int32(), "r_name": pa.string()})
    _write(out_dir, "nation",
           {"n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int32)},
           {"n_nationkey": pa.int32(), "n_name": pa.string(),
            "n_regionkey": pa.int32()})

    r = _rng("customer")
    _write(out_dir, "customer",
           {"c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{k:09d}" for k in range(n_cust)],
            "c_nationkey": r.integers(0, 25, n_cust).astype(np.int32),
            "c_acctbal": np.round(r.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": [SEGMENTS[i] for i in
                             r.integers(0, 5, n_cust)]},
           {"c_custkey": pa.int64(), "c_name": pa.string(),
            "c_nationkey": pa.int32(), "c_acctbal": pa.float64(),
            "c_mktsegment": pa.string()})

    r = _rng("supplier")
    _write(out_dir, "supplier",
           {"s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{k:09d}" for k in range(n_supp)],
            "s_nationkey": r.integers(0, 25, n_supp).astype(np.int32),
            "s_acctbal": np.round(r.uniform(-1000, 10000, n_supp), 2)},
           {"s_suppkey": pa.int64(), "s_name": pa.string(),
            "s_nationkey": pa.int32(), "s_acctbal": pa.float64()})

    r = _rng("part")
    adj = r.integers(0, 8, n_part)
    noun = r.integers(0, 8, n_part)
    _write(out_dir, "part",
           {"p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [f"{P_ADJ[a]} {P_NOUN[b]}"
                       for a, b in zip(adj, noun)],
            "p_brand": [f"Brand#{i + 1}" for i in
                        r.integers(0, 25, n_part)],
            "p_type": [P_TYPES[i] for i in r.integers(0, 6, n_part)],
            "p_size": r.integers(1, 51, n_part).astype(np.int32),
            "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0},
           {"p_partkey": pa.int64(), "p_name": pa.string(),
            "p_brand": pa.string(), "p_type": pa.string(),
            "p_size": pa.int32(), "p_retailprice": pa.float64()})

    r = _rng("orders")
    odate = ORDERS_D0 + (r.integers(0, ORDERS_DAYS, n_ord)
                         * DAY_US).astype("timedelta64[us]")
    _write(out_dir, "orders",
           {"o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": r.integers(0, n_cust, n_ord),
            "o_orderstatus": [STATUSES[i] for i in
                              r.integers(0, 3, n_ord)],
            "o_totalprice": np.round(r.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": odate,
            "o_orderpriority": [PRIORITIES[i] for i in
                                r.integers(0, 5, n_ord)]},
           {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
            "o_orderstatus": pa.string(), "o_totalprice": pa.float64(),
            "o_orderdate": pa.timestamp("us"),
            "o_orderpriority": pa.string()})

    r = _rng("lineitem")
    sdate = SHIP_D0 + (r.integers(0, SHIP_DAYS, n_li)
                       * DAY_US).astype("timedelta64[us]")
    _write(out_dir, "lineitem",
           {"l_orderkey": r.integers(0, n_ord, n_li),
            "l_partkey": r.integers(0, n_part, n_li),
            "l_suppkey": r.integers(0, n_supp, n_li),
            "l_linenumber": r.integers(1, 8, n_li).astype(np.int32),
            "l_quantity": r.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(
                r.uniform(900, 105000, n_li), 2),
            "l_discount": r.integers(0, 11, n_li) / 100.0,
            "l_tax": r.integers(0, 9, n_li) / 100.0,
            "l_returnflag": [FLAGS[i] for i in r.integers(0, 3, n_li)],
            "l_linestatus": [LINESTATUS[i] for i in
                             r.integers(0, 2, n_li)],
            "l_shipdate": sdate},
           {"l_orderkey": pa.int64(), "l_partkey": pa.int64(),
            "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
            "l_quantity": pa.float64(),
            "l_extendedprice": pa.float64(),
            "l_discount": pa.float64(), "l_tax": pa.float64(),
            "l_returnflag": pa.string(), "l_linestatus": pa.string(),
            "l_shipdate": pa.timestamp("us")})

    r = _rng("events")
    ts = EVENTS_T0 + np.sort(
        r.integers(0, 30 * DAY_US, n_ev)).astype("timedelta64[us]")
    _write(out_dir, "events",
           {"event_id": np.arange(n_ev, dtype=np.int64),
            "ts": ts,
            "user_id": r.integers(0, n_users, n_ev),
            "event_type": [EVENT_TYPES[i] for i in
                           r.integers(0, 5, n_ev)],
            "value": np.round(r.exponential(50.0, n_ev), 2),
            "props": ['{"k": %d}' % k for k in
                      r.integers(0, 100, n_ev)]},
           {"event_id": pa.int64(), "ts": pa.timestamp("us"),
            "user_id": pa.int64(), "event_type": pa.string(),
            "value": pa.float64(), "props": pa.string()})

    r = _rng("documents")
    n_words = r.integers(10, 101, n_doc)
    word_idx = r.integers(0, len(VOCAB), int(n_words.sum()))
    dup_tok = r.random(int(n_words.sum())) < 0.001
    copy_src = r.integers(0, max(n_doc - 1, 1), n_doc)
    is_copy = r.random(n_doc) < 0.003
    langs = r.choice(len(LANGS), n_doc, p=LANG_P)
    srcs = r.integers(0, 20, n_doc)
    texts, pos = [], 0
    for i in range(n_doc):
        k = int(n_words[i])
        if is_copy[i] and copy_src[i] < i:
            texts.append(texts[copy_src[i]])
        else:
            ws = [("dup" if dup_tok[pos + j]
                   else VOCAB[word_idx[pos + j]]) for j in range(k)]
            texts.append(" ".join(ws))
        pos += k
    _write(out_dir, "documents",
           {"doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": [LANGS[i] for i in langs],
            "source": [f"src{i}" for i in srcs],
            "n_chars": np.asarray([len(t) for t in texts],
                                  dtype=np.int64)},
           {"doc_id": pa.int64(), "text": pa.string(),
            "lang": pa.string(), "source": pa.string(),
            "n_chars": pa.int64()})

    r = _rng("embeddings")
    V = r.standard_normal((n_vec, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    _write(out_dir, "embeddings",
           {"vec_id": np.arange(n_vec, dtype=np.int64),
            "embedding": list(V),
            "label": r.integers(0, 10, n_vec).astype(np.int32)},
           {"vec_id": pa.int64(),
            "embedding": pa.list_(pa.float32()),
            "label": pa.int32()})


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (sys.argv[2] if len(sys.argv) > 2
           else f"testdata_sf{sys.argv[1] if len(sys.argv) > 1 else '1.0'}")
    gen(sf, out)
