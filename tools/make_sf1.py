#!/usr/bin/env python3
"""Build an sf1-scale dataset from the driver's sf0.1 tables (builder-side
tooling, not shipped code).

The driver generates sf{0.001,0.01,0.1} only; the scaling bench needs one
more decade. Each sf0.1 table is replicated into SHARDS disjoint key
shards so totals grow 10x while per-key group sizes stay constant — the
"more keys, same per-key density" reading of a scale factor:

- customer/supplier/part/orders/lineitem: every key column offset by
  shard * (max_key + 1); join relationships survive within a shard and
  never cross shards.
- events: event_id and user_id offset the same way (1500 users instead of
  150); timestamps keep the same range, so time-window densities grow
  10x (what a real 10x ingest into the same window does).
- documents: doc_id offset; every token in shard i > 0 is prefixed
  "s{i}_", so shingle/token spaces are DISJOINT across shards — near-dup
  pair counts scale linearly instead of exploding 45x on exact copies.
  n_chars is recomputed from the rewritten text.
- embeddings: vec_id offset; vectors cyclically rotated by shard so no
  cross-shard exact duplicates poison ANN top-k.
- nation/region: bounded dimensions of the data model — copied as-is.

Deterministic (no RNG anywhere). Output: <out>/{table}.parquet.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bench_sf1"
SHARDS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(OUT, exist_ok=True)


def load(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def save(name, tbl):
    pq.write_table(tbl, f"{OUT}/{name}.parquet")
    print(f"{name}: {tbl.num_rows} rows")


def offset_cols(tbl, cols, shard, strides):
    arrays = []
    for field in tbl.schema.names:
        a = tbl[field]
        if field in cols:
            a = pc.add(a, shard * strides[field])
        arrays.append(a)
    return pa.table(dict(zip(tbl.schema.names, arrays)), schema=tbl.schema) \
        if False else pa.Table.from_arrays(arrays, schema=tbl.schema)


def replicate(name, key_cols):
    tbl = load(name)
    strides = {c: pc.max(tbl[c]).as_py() + 1 for c in key_cols}
    shards = [offset_cols(tbl, key_cols, i, strides) for i in range(SHARDS)]
    save(name, pa.concat_tables(shards))


# bounded dims: verbatim
for t in ["nation", "region"]:
    save(t, load(t))

replicate("customer", ["c_custkey"])
replicate("supplier", ["s_suppkey"])
replicate("part", ["p_partkey"])
replicate("orders", ["o_orderkey", "o_custkey"])
replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
replicate("events", ["event_id", "user_id"])

# documents: token-prefix rewrite per shard
doc = load("documents")
texts = doc["text"].to_pylist()
doc_ids = doc["doc_id"].to_pylist()
langs = doc["lang"].to_pylist()
sources = doc["source"].to_pylist()
stride = max(doc_ids) + 1
out_ids, out_texts, out_langs, out_sources, out_chars = [], [], [], [], []
for i in range(SHARDS):
    for did, text, lang, src in zip(doc_ids, texts, langs, sources):
        if i == 0:
            t = text
        else:
            t = " ".join(f"s{i}_{tok}" for tok in text.split(" "))
        out_ids.append(did + i * stride)
        out_texts.append(t)
        out_langs.append(lang)
        out_sources.append(src)
        out_chars.append(len(t))
save("documents", pa.Table.from_arrays(
    [pa.array(out_ids, pa.int64()), pa.array(out_texts, pa.string()),
     pa.array(out_langs, pa.string()), pa.array(out_sources, pa.string()),
     pa.array(out_chars, pa.int64())],
    names=["doc_id", "text", "lang", "source", "n_chars"]))

# embeddings: rotate vector per shard
emb = load("embeddings")
vec_ids = emb["vec_id"].to_pylist()
vecs = emb["embedding"].to_pylist()
labels = emb["label"].to_pylist()
stride = max(vec_ids) + 1
e_ids, e_vecs, e_labels = [], [], []
for i in range(SHARDS):
    for vid, v, lbl in zip(vec_ids, vecs, labels):
        e_ids.append(vid + i * stride)
        e_vecs.append(v[i:] + v[:i] if i else v)
        e_labels.append(lbl)
save("embeddings", pa.Table.from_arrays(
    [pa.array(e_ids, pa.int64()),
     pa.array(e_vecs, pa.list_(pa.float32())),
     pa.array(e_labels, pa.int32())],
    names=["vec_id", "embedding", "label"]))
print("done ->", OUT)
