"""split_corpus + length_bucket_batches: determinism, contiguity, padding."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.packing import length_bucket_batches
from kafka_connect_gcs_spark.operators.sampling import shuffle_key, split_corpus


@pytest.fixture(scope="module")
def docs(spark):
    # lengths spread across buckets (boundaries 10/20: ≤10, 11-20, >20)
    rows = [(i, (i * 7919) % 30 + 1) for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "n_tok"])


def test_split_corpus_disjoint_exhaustive(spark, docs):
    out = split_corpus(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    counts = {r["split"]: r["c"] for r in
              out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == 200  # exhaustive, one split per row
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    # deterministic
    assert split_corpus(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                        seed=3).collect() == out.collect()


def test_split_corpus_validates(spark, docs):
    with pytest.raises(ValueError):
        split_corpus(docs, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        split_corpus(docs, {"a": 1.2, "b": -0.2})
    with pytest.raises(ValueError):
        split_corpus(docs, {})


def test_length_batches_contiguous_and_padded(spark, docs):
    out = length_bucket_batches(
        docs, batch_size=8, boundaries=[10, 20], seed=5
    ).collect()
    assert len(out) == 200
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2}
    for bkt, rows in by_bucket.items():
        # bucket by boundaries
        for r in rows:
            lo = [0, 11, 21][bkt]
            hi = [10, 20, 10**9][bkt]
            assert lo <= r["n_tok"] <= hi
        # ranks are a contiguous 0..c-1 permutation
        ranks = sorted(r["batch_idx"] * 8 + r["pos"] for r in rows)
        assert ranks == list(range(len(rows)))
        # batches full except possibly the last; padded_len = batch max
        batches = {}
        for r in rows:
            batches.setdefault(r["batch_idx"], []).append(r)
        last = max(batches)
        for bi, members in batches.items():
            if bi != last:
                assert len(members) == 8
            mx = max(m["n_tok"] for m in members)
            assert all(m["padded_len"] == mx for m in members)
            assert all(m["n_tok"] <= m["padded_len"] for m in members)


def test_length_batches_matches_window_reference(spark, docs):
    """The distributed composite-key scan must equal the naive
    row_number-per-bucket reference on the same hash order."""
    SHIFT = 1 << 44
    bucket = (F.col("n_tok") > 10).cast("int") + (F.col("n_tok") > 20).cast(
        "int"
    )
    ref = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.pmod(shuffle_key(F.col("doc_id"), 5), F.lit(SHIFT)).alias("_h"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy("_h", "doc_id")
        )
        - 1,
    )
    got = length_bucket_batches(docs, batch_size=8, boundaries=[10, 20], seed=5)
    joined = got.join(ref, ["doc_id", "bucket"]).select(
        "doc_id",
        (F.col("batch_idx") * 8 + F.col("pos")).alias("got_rk"),
        "rk",
    )
    assert joined.where(F.col("got_rk") != F.col("rk")).count() == 0
    assert joined.count() == 200


def test_length_batches_validates(spark, docs):
    with pytest.raises(ValueError):
        length_bucket_batches(docs, batch_size=0, boundaries=[10])
    with pytest.raises(ValueError):
        length_bucket_batches(docs, batch_size=8, boundaries=[10, 10])
