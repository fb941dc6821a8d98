#!/usr/bin/env python3
"""Generate the sf1 fixture decade at /root/repo/fixtures/sf1 (~10x sf0.1).

/root/testdata is read-only (driver-owned), so the second ScaleTrend
decade (sf0.1 -> sf1) lives in-repo. Schemas and distribution shapes
mirror the driver fixtures (TESTDATA.md, seed=42): same columns/types,
same per-table scale ratios (lineitem 6M, orders 1.5M, events 1M over
the same 30-day window with 10x users, documents 50k from the same
31-word vocabulary with the same ~0.16% planted-duplicate rate,
embeddings 20k x 64 with 10 weak label clusters), so family runtimes
compare like-for-like against sf0.1. Values are NOT the driver's exact
streams — this decade feeds the TREND measurement (ScaleTrend), never
the DuckDB correctness oracle.

Tooling script (driver-side python/pyarrow) — not part of the engine.
"""
import os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "/root/repo/fixtures/sf1"
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(42)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet", compression="snappy")
    print(f"{name}: {table.num_rows} rows")


# ---- dimension tables (copied shapes) ----
region = pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
})
write("region", region)

nation = pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
})
write("nation", nation)

N_CUST, N_PART, N_SUPP = 150_000, 200_000, 10_000
SEGMENTS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
write("customer", pa.table({
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, N_CUST)]),
}))

ADJ = ["large", "hot", "blue", "small", "red", "green", "cold", "dark"]
NOUN = ["ring", "bolt", "case", "disk", "tube", "wheel", "pin", "cap"]
PTYPE = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
write("part", pa.table({
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{ADJ[rng.integers(0, 8)]} {NOUN[rng.integers(0, 8)]}"
               for _ in range(N_PART)],
    "p_brand": [f"Brand#{rng.integers(1, 26)}" for _ in range(N_PART)],
    "p_type": pa.array(np.array(PTYPE)[rng.integers(0, 6, N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(rng.uniform(900, 2100, N_PART), 2),
}))

write("supplier", pa.table({
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
}))

# ---- orders / lineitem ----
N_ORD, N_LI = 1_500_000, 6_000_000
day = 86_400_000_000  # us
o_date0 = np.datetime64("1995-01-01", "us").astype("int64")
write("orders", pa.table({
    "o_orderkey": pa.array(range(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, N_ORD)]),
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": pa.array(
        o_date0 + rng.integers(0, 2404, N_ORD) * (day // 1_000_000) * 1_000_000,
        pa.timestamp("us")),
    "o_orderpriority": pa.array(np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[rng.integers(0, 5, N_ORD)]),
}))

ship0 = np.datetime64("1995-01-02", "us").astype("int64")
write("lineitem", pa.table({
    "l_orderkey": pa.array(rng.integers(0, N_ORD, N_LI), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LI), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, N_LI), pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LI).astype("float64"),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LI), 2),
    "l_discount": np.round(rng.uniform(0, 0.10, N_LI), 2),
    "l_tax": np.round(rng.uniform(0, 0.08, N_LI), 2),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, N_LI)]),
    "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, N_LI)]),
    "l_shipdate": pa.array(
        ship0 + rng.integers(0, 2498, N_LI) * day, pa.timestamp("us")),
}))

# ---- events: same 30-day window, 10x users and rows ----
N_EVT, N_USERS = 1_000_000, 15_000
t0 = np.datetime64("2024-01-01", "us").astype("int64")
span = 30 * day
write("events", pa.table({
    "event_id": pa.array(range(N_EVT), pa.int64()),
    "ts": pa.array(np.sort(t0 + rng.integers(0, span, N_EVT)), pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, N_USERS, N_EVT), pa.int64()),
    "event_type": pa.array(np.array(
        ["click", "view", "purchase", "signup", "error"])[rng.integers(0, 5, N_EVT)]),
    "value": np.round(rng.uniform(0, 560, N_EVT), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVT)],
}))

# ---- documents: same 31-word vocabulary, ~0.16% planted duplicates ----
VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "batch", "part", "line", "order", "sort",
         "fast", "scan", "a", "hash", "slow", "group", "agg", "filter",
         "query", "join", "key", "row", "index", "shuffle", "cache", "plan"]
N_DOC = 50_000
LANGS = ["en", "zh", "es", "fr", "de"]
lang_w = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
texts = []
for i in range(N_DOC):
    if i > 0 and rng.random() < 0.0016:
        texts.append(texts[rng.integers(0, i)])  # planted duplicate
    else:
        n = int(rng.integers(8, 101))
        texts.append(" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), n)]))
write("documents", pa.table({
    "doc_id": pa.array(range(N_DOC), pa.int64()),
    "text": texts,
    "lang": pa.array(np.array(LANGS)[
        rng.choice(5, N_DOC, p=lang_w)]),
    "source": [f"src{rng.integers(0, 20)}" for _ in range(N_DOC)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}))

# ---- embeddings: 20k x 64, 10 weak label clusters, overall std ~0.125 ----
N_VEC, DIM, N_LBL = 20_000, 64, 10
means = rng.normal(0, 0.02, (N_LBL, DIM))
labels = rng.integers(0, N_LBL, N_VEC)
vecs = (means[labels] + rng.normal(0, 0.1234, (N_VEC, DIM))).astype("float32")
write("embeddings", pa.table({
    "vec_id": pa.array(range(N_VEC), pa.int64()),
    "embedding": pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.reshape(-1), pa.float32()), DIM).cast(
        pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}))

print("sf1 fixture complete:", OUT)
