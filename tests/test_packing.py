"""Training-sequence packing vs a local python reference (and DuckDB via
the driver contract's pack_sequences query)."""

import random

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
)


def _py_pack(docs, L, drop_remainder=True):
    stream = []
    for _, toks in sorted(docs):
        stream.extend(toks)
    out = []
    for c in range(0, len(stream), L):
        chunk = stream[c : c + L]
        if len(chunk) == L or not drop_remainder:
            out.append((c // L, chunk))
    return out


@pytest.fixture(scope="module")
def docs():
    rnd = random.Random(7)
    out = []
    for i in range(200):
        n = rnd.choice([0, 1, 3, 17, 40, 300])  # incl. empty + multi-chunk
        out.append((i, [rnd.randrange(32000) for _ in range(n)]))
    return out


def test_exclusive_prefix_sum(spark, docs):
    df = spark.createDataFrame(
        [(i, len(t)) for i, t in docs], "doc_id long, n long"
    ).repartition(7)
    got = {
        r.doc_id: r.start
        for r in exclusive_prefix_sum(df, "doc_id", "n").collect()
    }
    acc = 0
    for i, t in sorted(docs):
        assert got[i] == acc, i
        acc += len(t)


def test_pack_sequences_matches_reference(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>").repartition(9)
    for L in (64, 128):
        got = {
            r.seq_id: list(r.tokens)
            for r in pack_sequences(df, L).collect()
        }
        want = dict(_py_pack(docs, L))
        assert got == want, f"L={L}"
        # every chunk exact length, n_docs sane
        rows = pack_sequences(df, L).collect()
        assert all(r.n_tok == L for r in rows)
        assert all(r.n_docs >= 1 for r in rows)


def test_pack_sequences_keep_remainder(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    L = 100
    got = {r.seq_id: list(r.tokens) for r in
           pack_sequences(df, L, drop_remainder=False).collect()}
    want = dict(_py_pack(docs, L, drop_remainder=False))
    assert got == want
    total = sum(len(t) for _, t in docs)
    assert sum(len(v) for v in got.values()) == total  # lossless


def test_pack_sequences_partitioning_invariant(spark, docs):
    """The result must not depend on the input's physical partitioning."""
    df1 = spark.createDataFrame(docs, "doc_id long, tokens array<int>").coalesce(1)
    df2 = spark.createDataFrame(docs, "doc_id long, tokens array<int>").repartition(13)
    a = {r.seq_id: list(r.tokens) for r in pack_sequences(df1, 77).collect()}
    b = {r.seq_id: list(r.tokens) for r in pack_sequences(df2, 77).collect()}
    assert a == b


def test_prefix_sum_integral_path_no_cached_relations(spark, docs):
    """The integral-key prefix sum is a pure deterministic plan: nothing
    may remain persisted after the call (the r4 eager-localCheckpoint
    release pattern is only needed on the sampled-range fallback)."""
    df = spark.createDataFrame(
        [(i, len(t)) for i, t in docs], "doc_id long, n long"
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = exclusive_prefix_sum(df, "doc_id", "n")
    out.count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


def test_prefix_sum_negative_sparse_and_string_keys(spark):
    """Equal-width buckets must handle negative/sparse integral keys; a
    string order key exercises the sampled-range fallback (which also
    must leak nothing once finished)."""
    rows = [(-(10**9), 3), (-5, 2), (0, 7), (99, 1), (10**12, 4)]
    df = spark.createDataFrame(rows, "k long, n long")
    got = {r.k: r.start for r in exclusive_prefix_sum(df, "k", "n").collect()}
    acc = 0
    for k, n in sorted(rows):
        assert got[k] == acc
        acc += n
    sdf = spark.createDataFrame(
        [(f"id{i:04d}", i % 5 + 1) for i in range(50)], "k string, n long"
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    sgot = {r.k: r.start for r in exclusive_prefix_sum(sdf, "k", "n").collect()}
    acc = 0
    for i in range(50):
        assert sgot[f"id{i:04d}"] == acc
        acc += i % 5 + 1
    # the fallback's localCheckpoint RDD IS the result's storage (it lives
    # until the result is GC'd); only the temporary range-partitioned cache
    # must have been released
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before + 1
