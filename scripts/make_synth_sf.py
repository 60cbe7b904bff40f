#!/usr/bin/env python
"""Generate a synthetic scaled-up testdata dir from sf0.1 for PERFORMANCE
measurement only (never correctness: the driver's own sf1.0 generator is
not public, so this mimics its *statistics*, not its bytes).

Scaling model (factor R, default 10):

* documents  — R x 5k docs. Replica 0 is the original corpus verbatim;
  replicas 1..R-1 keep each doc's length / lang / source but re-draw every
  word deterministically (hash of doc_id, replica, position) from the
  observed vocabulary, so replicas are NOT near-duplicates of each other
  and near-dup pair counts scale linearly like a real bigger corpus.
* embeddings — R x 2k vectors; replicas roll the vector lanes by replica
  and flip a deterministic sign pattern, keeping the norm distribution.
* lineitem/orders/customer/part/supplier — replicated with key offsets so
  join fan-outs stay constant per key (orderkey/custkey/partkey/suppkey
  all offset by replica x max).
* events — replicated with event_id/user_id offsets (10x users, same
  per-user event counts — sessionization shape preserved).
* nation/region — fixed-size dimensions, copied.

Usage: python scripts/make_synth_sf.py [out_dir] [R]
"""
from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _rng(*key) -> np.random.Generator:
    h = hashlib.md5("|".join(str(k) for k in key).encode()).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "little")))


def scale_documents(out: str, R: int) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = np.asarray(t.column("doc_id").to_pylist())
    doc_id_off = int(doc_id.max()) + 1
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    vocab = np.array(sorted({w for s in text for w in s.split()}))
    word_counts = np.array([len(s.split()) for s in text])
    chunks = [t]
    for r in range(1, R):
        rng = _rng("docs", r)
        draws = rng.integers(0, len(vocab), size=int(word_counts.sum()))
        words = vocab[draws]
        new_text = []
        pos = 0
        for n in word_counts:
            new_text.append(" ".join(words[pos : pos + n]))
            pos += n
        chunks.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_id + r * doc_id_off,
                                       type=t.schema.field("doc_id").type),
                    "text": new_text,
                    "lang": lang,
                    "source": source,
                    "n_chars": [len(s) for s in new_text],
                }
            ).cast(t.schema)
        )
    pq.write_table(pa.concat_tables(chunks), f"{out}/documents.parquet")


def scale_embeddings(out: str, R: int) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    n = t.num_rows
    vec_id = np.asarray(t.column("vec_id").to_pylist())
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    label = np.asarray(t.column("label").to_pylist())
    chunks = [t]
    for r in range(1, R):
        rolled = np.roll(emb, r, axis=1)
        sign = np.where((np.arange(emb.shape[1]) + r) % 3 == 0, -1.0, 1.0)
        chunks.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + r * (vec_id.max() + 1)),
                    "embedding": pa.array((rolled * sign).tolist(),
                                          type=t.schema.field("embedding").type),
                    "label": pa.array(label),
                }
            ).cast(t.schema)
        )
    pq.write_table(pa.concat_tables(chunks), f"{out}/embeddings.parquet")


def _replicate_offsets(name: str, out: str, R: int, offset_cols: dict) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    offs = {c: (np.asarray(t.column(c).to_pylist()),) for c in offset_cols}
    maxes = {c: int(v[0].max()) + 1 for c, v in offs.items()}
    chunks = [t]
    for r in range(1, R):
        cols = {}
        for fname in t.schema.names:
            if fname in offset_cols:
                base = offs[fname][0]
                cols[fname] = pa.array(base + r * maxes[fname],
                                       type=t.schema.field(fname).type)
            else:
                cols[fname] = t.column(fname)
        chunks.append(pa.table(cols).cast(t.schema))
    pq.write_table(pa.concat_tables(chunks), f"{out}/{name}.parquet")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/synth_sf1.0"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    scale_documents(out, R)
    scale_embeddings(out, R)
    _replicate_offsets("lineitem", out, R,
                       {"l_orderkey", "l_partkey", "l_suppkey"})
    _replicate_offsets("orders", out, R, {"o_orderkey", "o_custkey"})
    _replicate_offsets("customer", out, R, {"c_custkey", "c_nationkey"} & set(
        pq.ParquetFile(f"{SRC}/customer.parquet").schema_arrow.names) - {"c_nationkey"})
    _replicate_offsets("part", out, R, {"p_partkey"} & set(
        pq.ParquetFile(f"{SRC}/part.parquet").schema_arrow.names))
    _replicate_offsets("supplier", out, R, {"s_suppkey"} & set(
        pq.ParquetFile(f"{SRC}/supplier.parquet").schema_arrow.names))
    _replicate_offsets("events", out, R, {"event_id", "user_id"})
    for name in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{out}/{name}.parquet")
    open(os.path.join(out, "_DONE"), "w").close()
    for f in sorted(os.listdir(out)):
        if f.endswith(".parquet"):
            print(f, pq.ParquetFile(os.path.join(out, f)).metadata.num_rows)


if __name__ == "__main__":
    main()
