#!/usr/bin/env python3
"""Deterministic scale-up generator for the growth probe (driver-side
tool, like oracle_compare.py — never imported by engine code).

Tiles an existing testdata scale factor T times with per-tile key
offsets, preserving every distribution and join fan-out per key, so
per-query wall time can be measured against a corpus T times larger
WITHOUT inventing new closed forms. Output goes to a scratch directory
(e.g. /tmp/testdata/sf0.5); the real /root/testdata stays untouched and
remains the only correctness-gate input.

Tiling rules (tile k of T):
- region/nation: copied once (fixed dimensions; foreign keys into them
  keep their 0..24 range).
- fact/dim keys (custkey, suppkey, partkey, orderkey, doc_id, vec_id,
  event_id, user_id): += k * (max+1 of the source key space), keeping
  key spaces dense and parent/child joins intact per tile.
- documents.text, tile k>0: every token suffixed with "~t<k>" — token
  counts, lengths, and intra-tile span/dup structure are preserved
  exactly while cross-tile span/shingle sharing is ZERO. Plain copies
  would multiply every span's df by T, turning each shared-span pair
  into C(T*df, 2) pairs — quadratic-in-T candidate growth injected by
  the GENERATOR, which would mask the engine's own scaling. n_chars is
  recomputed for the suffixed text.
- embeddings.embedding, tile k>0: a per-tile ORTHOGONAL transform
  (cyclic shift of dimensions by k + hash-derived sign flips — a
  hypercube symmetry). Intra-tile inner products and cosines are
  preserved BIT-EXACTLY (values only move/flip), while cross-tile
  pairs decorrelate, so sign-LSH bucket occupancy and near-dup
  candidate volume grow LINEARLY in T, as a real corpus grows. This
  is the embedding twin of the ~t<k> token-suffix rule: the earlier
  element-0 nudge (k * 1e-3) left cross-tile copies sharing nearly
  every LSH hyperplane sign, so every vector became C(T, 2) candidate
  pairs — generator-injected quadratic growth that surfaced as
  super-linear exponents on q25/q52/q64 at T=10.
- customer.c_name, tile k>0: rewritten as Customer#%09d of the TILED
  custkey — the name is DERIVED from the key, so tiling the key without
  the name leaves T exact copies of every name (and T² copies of every
  distance-1 name pair): the q169 fuzzy join's true output would grow
  quadratically in T by generator fiat. With the rewrite, the name
  space is the dense range a T-times-larger corpus really has, and
  edit-distance pair density grows linearly.
- events.ts: unchanged — T times the events in the same time range
  (denser windows, how an event stream actually scales).

Determinism: pure arithmetic on the (seed=42-deterministic) source
tables; no RNG anywhere here.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf0.5"
tiles = int(sys.argv[3]) if len(sys.argv) > 3 else 5

os.makedirs(out, exist_ok=True)


def read(name):
    return pq.read_table(f"{src}/{name}.parquet")


def stride_of(table, col):
    return pc.max(table[col]).as_py() + 1


# key spaces shared across tables must use ONE stride each
customer = read("customer")
supplier = read("supplier")
part = read("part")
orders = read("orders")
events = read("events")
documents = read("documents")
embeddings = read("embeddings")

strides = {
    "custkey": stride_of(customer, "c_custkey"),
    "suppkey": stride_of(supplier, "s_suppkey"),
    "partkey": stride_of(part, "p_partkey"),
    "orderkey": stride_of(orders, "o_orderkey"),
    "event_id": stride_of(events, "event_id"),
    "doc_id": stride_of(documents, "doc_id"),
    "vec_id": stride_of(embeddings, "vec_id"),
}

KEY_COLS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    # user_id is drawn from the CUSTOMER key space (q97 joins it against
    # orders.o_custkey, q98 against customer.c_custkey) — it must tile
    # with the custkey stride or every tile k>0's user_ids land inside
    # tile 0's custkey range and the join fan-out concentrates T× onto
    # low custkeys instead of being preserved per tile.
    "events": {"event_id": "event_id", "user_id": "custkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def offset_keys(table, name, k):
    for col, space in KEY_COLS[name].items():
        i = table.schema.get_field_index(col)
        shifted = pc.add(table[col], k * strides[space]).cast(
            table.schema.field(col).type)
        table = table.set_column(i, table.schema.field(col), shifted)
    return table


def tile_plain(name, table):
    parts = [offset_keys(table, name, k) for k in range(tiles)]
    return pa.concat_tables(parts)


def tile_documents(table):
    parts = []
    texts = table["text"].to_pylist()
    for k in range(tiles):
        t = offset_keys(table, "documents", k)
        if k > 0:
            suf = f"~t{k}"
            new_texts = [" ".join(w + suf for w in s.split(" ")) for s in texts]
            ti = t.schema.get_field_index("text")
            t = t.set_column(ti, t.schema.field("text"),
                             pa.array(new_texts, type=t.schema.field("text").type))
            ni = t.schema.get_field_index("n_chars")
            n_chars = pa.array([len(s) for s in new_texts]).cast(
                t.schema.field("n_chars").type)
            t = t.set_column(ni, t.schema.field("n_chars"), n_chars)
        parts.append(t)
    return pa.concat_tables(parts)


def tile_customer(table):
    parts = []
    for k in range(tiles):
        t = offset_keys(table, "customer", k)
        if k > 0:
            names = ["Customer#%09d" % key
                     for key in t["c_custkey"].to_pylist()]
            ni = t.schema.get_field_index("c_name")
            t = t.set_column(ni, t.schema.field("c_name"),
                             pa.array(names, type=t.schema.field("c_name").type))
        parts.append(t)
    return pa.concat_tables(parts)


def tile_embeddings(table):
    parts = []
    vecs = table["embedding"].to_pylist()
    dim = len(vecs[0])
    # deterministic sign pattern per (tile, dim): multiplicative hash,
    # top bit decides the flip — pure arithmetic, no RNG
    def sign(k, d):
        return -1.0 if (2654435761 * (d + 1 + 97 * k)) & 0x80000000 else 1.0
    for k in range(tiles):
        t = offset_keys(table, "embeddings", k)
        if k > 0:
            signs = [sign(k, d) for d in range(dim)]
            rotated = [[signs[d] * v[(d + k) % dim] for d in range(dim)]
                       for v in vecs]
            ei = t.schema.get_field_index("embedding")
            t = t.set_column(ei, t.schema.field("embedding"),
                             pa.array(rotated, type=t.schema.field("embedding").type))
        parts.append(t)
    return pa.concat_tables(parts)


for name in ["region", "nation"]:
    pq.write_table(read(name), f"{out}/{name}.parquet")

for name, table in [("supplier", supplier),
                    ("part", part), ("orders", orders),
                    ("lineitem", read("lineitem")), ("events", events)]:
    pq.write_table(tile_plain(name, table), f"{out}/{name}.parquet")

pq.write_table(tile_customer(customer), f"{out}/customer.parquet")

pq.write_table(tile_documents(documents), f"{out}/documents.parquet")
pq.write_table(tile_embeddings(embeddings), f"{out}/embeddings.parquet")

for name in ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"]:
    n = pq.read_metadata(f"{out}/{name}.parquet").num_rows
    print(f"{name}: {n} rows")
print(f"wrote {out} = {tiles}x {src}")
