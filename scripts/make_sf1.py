#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset (10x sf0.1) for the oracle sweep.

The driver provides sf{0.001,0.01,0.1} only; the 100 TB claims for the
corpus-shaped text/dedup operators rest on extrapolation past sf0.1
(VERDICT r9 stretch #9). This script builds a 10x dataset with the same
schemas so the Spark-vs-DuckDB gate can run at 100x the sf0.01 gate
scale. Fidelity notes:
 - documents/embeddings are FRESHLY generated (same vocab, length,
   lang/source mix, value ranges) so duplicate rates stay natural —
   cloning rows 10x would give every doc 9 exact dups and blow the
   near-dup surface quadratically;
 - relational tables (orders/lineitem/customer/supplier/part/events)
   are shifted-copy upsampled: 10 copies with all keys offset per copy,
   preserving value distributions and referential integrity exactly;
 - region/nation are fixed-size dimensions, copied as-is.
The oracle compares Spark vs DuckDB on THIS data — correctness needs
identical inputs, not driver-identical distributions.

Usage: python3 scripts/make_sf1.py [outdir]   (default /tmp/sf1)
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10
SEED = 4242

import os

os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(SEED)


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


# ---- fixed dimensions: copy as-is ----
for name in ("region", "nation"):
    write(name, read(name))

# ---- documents: fresh content, same statistical shape ----
d0 = read("documents").to_pandas()
vocab = sorted({t for s in d0["text"].head(2000) for t in s.split(" ")})
langs, lang_p = zip(*d0["lang"].value_counts(normalize=True).items())
sources = sorted(d0["source"].unique())
n_docs = len(d0) * COPIES
lens = rng.integers(10, 101, n_docs)
tok_idx = rng.integers(0, len(vocab), lens.sum())
texts = []
pos = 0
va = np.array(vocab)
for L in lens:
    texts.append(" ".join(va[tok_idx[pos:pos + L]]))
    pos += L
docs = pa.table({
    "doc_id": pa.array(np.arange(n_docs), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(rng.choice(langs, n_docs, p=lang_p), pa.string()),
    "source": pa.array([sources[i % len(sources)] for i in range(n_docs)], pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
write("documents", docs)

# ---- embeddings: fresh vectors, same dim/range/labels ----
e0 = read("embeddings").to_pandas()
dim = len(e0["embedding"].iloc[0])
lo = min(v.min() for v in e0["embedding"].head(500))
hi = max(v.max() for v in e0["embedding"].head(500))
n_vec = len(e0) * COPIES
# match the source's DISTANCE STRUCTURE, not just its value range: sf0.1
# embeddings have per-dim std ~0.125 inside a ±0.58 envelope, so nearest
# pairs sit near the ANN rows' radius thresholds. Uniform(lo, hi) draws
# (per-dim std 0.32) pushed every pairwise distance ~3x higher and the
# BRP invariants row's "found_any" oracle correctly caught the empty
# join at sf1 — a data-fidelity gap, not an engine defect.
s0 = np.stack(e0["embedding"].head(2000).values)
mu = s0.mean(axis=0)
sd = s0.std(axis=0)
vecs = np.clip(rng.normal(mu, sd, (n_vec, dim)), lo, hi).astype(np.float32)
emb = pa.table({
    "vec_id": pa.array(np.arange(n_vec), pa.int64()),
    "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, n_vec), pa.int32()),
})
write("embeddings", emb)

# ---- relational: shifted-copy upsample with per-copy key offsets ----
def upsample(name, key_offsets):
    t0 = read(name)
    parts = []
    for k in range(COPIES):
        cols = {}
        for col in t0.schema.names:
            arr = t0.column(col)
            if col in key_offsets and k > 0:
                off = key_offsets[col] * k
                cols[col] = pa.compute.add(arr, off)
            else:
                cols[col] = arr
        parts.append(pa.table(cols))
    write(name, pa.concat_tables(parts))


cust = read("customer")
supp = read("supplier")
part = read("part")
orders = read("orders")
events = read("events")


def span(table, col):
    c = table.column(col)
    return pa.compute.max(c).as_py() + 1


CK = span(cust, "c_custkey") if "c_custkey" in cust.schema.names else span(orders, "o_custkey")
SK = span(supp, "s_suppkey")
PK = span(part, "p_partkey")
OK = span(orders, "o_orderkey")
EK = span(events, "event_id")
UK = span(events, "user_id")

upsample("customer", {"c_custkey": CK})
upsample("supplier", {"s_suppkey": SK})
upsample("part", {"p_partkey": PK})
upsample("orders", {"o_orderkey": OK, "o_custkey": CK})
upsample("lineitem", {"l_orderkey": OK, "l_partkey": PK, "l_suppkey": SK})
upsample("events", {"event_id": EK, "user_id": UK})
print("done ->", OUT)
