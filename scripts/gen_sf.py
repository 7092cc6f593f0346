#!/usr/bin/env python3
"""Seeded full-star-schema generator for scale verification (SURVEY §5b).

Emits the same 10-table layout as the driver testdata (identical arrow
schemas and value domains, measured from /root/testdata/sf0.1) at an
arbitrary scale factor, so `graft.Verify` + the DuckDB gate
(scripts/check.py) can re-check ANSWERS — not just speed — above sf0.1:

  python3 scripts/gen_sf.py 1 /tmp/sf1      # 10x the bench corpus

Row counts scale linearly: lineitem 6M/sf, orders 1.5M/sf, events 1M/sf,
customer 150k/sf, part 200k/sf, documents 50k/sf, embeddings 20k/sf,
supplier 10k/sf; nation/region fixed. All RNG is seeded — identical
corpora on every run, so committed CORRECTNESS_sf1.json is reproducible.

The correctness gate compares Spark vs DuckDB on the SAME data, so the
value distributions need to exercise the same code paths as the driver
tables (planted exact/near duplicate documents, planted near-dup
embeddings, JSON props, the full flag/status/segment vocabularies), not
byte-match them.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "value", "vector", "window", "the",
])
SEGMENTS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
PTYPES = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"])
ADJ = np.array(["blue", "cold", "hot", "new", "old", "red", "small", "large"])
NOUN = np.array(["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"])
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def write(out, name, table):
    pq.write_table(table, f"{out}/{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def days_ms(rng, n, lo, hi):
    """Random date-only timestamps (ms) between ISO dates lo and hi."""
    lo_d = np.datetime64(lo, "D").astype(np.int64)
    hi_d = np.datetime64(hi, "D").astype(np.int64)
    d = rng.integers(lo_d, hi_d + 1, n)
    return pa.array(d * 86_400_000, type=pa.timestamp("ms"))


def gen(sf, out):
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_user = max(int(15_000 * sf), 10)

    write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))

    rng = np.random.default_rng(101)
    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(SEGMENTS[rng.integers(0, 5, n_cust)]),
    }))

    rng = np.random.default_rng(102)
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    }))

    rng = np.random.default_rng(103)
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array(np.char.add(np.char.add(
            ADJ[rng.integers(0, len(ADJ), n_part)], " "),
            NOUN[rng.integers(0, len(NOUN), n_part)])),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(PTYPES[rng.integers(0, len(PTYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + np.arange(n_part) * 0.1, 2)),
    }))

    rng = np.random.default_rng(104)
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord).astype(np.int64)),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
            rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500_000, n_ord), 2)),
        "o_orderdate": days_ms(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": pa.array(PRIORITIES[rng.integers(0, 5, n_ord)]),
    }))

    rng = np.random.default_rng(105)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105_000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": days_ms(rng, n_li, "1995-01-02", "2001-11-04"),
    }))

    rng = np.random.default_rng(106)
    base_ns = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    gaps = rng.exponential(30 * 86_400e9 / n_evt, n_evt)
    ts = base_ns + np.cumsum(gaps).astype(np.int64)
    # the driver testdata switched ts from TIMESTAMP(NANOS) to plain
    # TIMESTAMP(MICROS) at r14; mirror it (same ns draw, truncated) so
    # scale gates exercise the same Tables.events loader path as the
    # round gate. Value change vs <=r13 corpora: sub-µs truncation only.
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt, dtype=np.int64)),
        "ts": pa.array(ts // 1000, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_user, n_evt).astype(np.int64)),
        "event_type": pa.array(np.array(
            ["click", "view", "purchase", "signup", "error"])[rng.integers(0, 5, n_evt)]),
        "value": pa.array(np.round(rng.exponential(20.0, n_evt), 2)),
        "props": pa.array(np.array([f'{{"k": {k}}}' for k in range(100)])[
            rng.integers(0, 100, n_evt)]),
    }))

    rng = np.random.default_rng(107)
    n_near = n_doc // 25      # ~4% near-dups (mutate ~10% of words)
    n_exact = max(n_doc // 625, 2)  # matches sf0.1's 8 dup groups per 5k docs
    n_base = n_doc - n_near - n_exact
    docs = [" ".join(VOCAB[rng.integers(0, len(VOCAB), rng.integers(10, 101))])
            for _ in range(n_base)]
    for src in rng.choice(n_base, n_near, replace=False):
        w = docs[src].split(" ")
        for _ in range(max(len(w) // 10, 1)):
            w[rng.integers(0, len(w))] = VOCAB[rng.integers(0, len(VOCAB))]
        docs.append(" ".join(w))
    for src in rng.choice(n_base, n_exact, replace=False):
        docs.append(docs[src])
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(docs),
        "lang": pa.array(np.array(["en", "de", "es", "fr", "zh"])[
            rng.choice(5, n_doc, p=[0.4, 0.15, 0.15, 0.15, 0.15])]),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(x) for x in docs], dtype=np.int64)),
    }))

    rng = np.random.default_rng(108)
    d = 64
    vecs = rng.normal(0, 1, (n_emb, d)).astype(np.float32)
    n_dup = n_emb // 20       # 5% planted near-dups (cos ~ 0.96)
    for k, src in enumerate(rng.choice(n_emb // 2, n_dup, replace=False)):
        vecs[n_emb - n_dup + k] = vecs[src] + rng.normal(0, 0.25, d).astype(np.float32)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb).astype(np.int32)),
    }))


if __name__ == "__main__":
    sf, out = float(sys.argv[1]), sys.argv[2]
    os.makedirs(out, exist_ok=True)
    gen(sf, out)
    print(f"wrote sf{sf} -> {out}")
