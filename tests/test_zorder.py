"""Z-order layout (operators/zorder.py): interleave correctness vs a
pure-Python Morton reference, layout clustering, and audit determinism."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_gcs_spark.operators.zorder import (  # noqa: E402
    with_zorder_key,
    zorder_bucket_stats,
    zorder_layout,
)


def _morton(q0: int, q1: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((q0 >> b) & 1) << (2 * b)
        z |= ((q1 >> b) & 1) << (2 * b + 1)
    return z


def test_zkey_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = {(r["a"], r["b"]): r["z"] for r in
           with_zorder_key(df, ["a", "b"], bits=6).collect()}
    amin, amax = 0, 63
    bmin, bmax = 0, 60
    top = (1 << 6) - 1
    for (a, b), z in out.items():
        q0 = (a - amin) * top // max(amax - amin, 1)
        q1 = (b - bmin) * top // max(bmax - bmin, 1)
        assert z == _morton(q0, q1, 6), (a, b)


def test_layout_clusters_both_columns(spark):
    # a 32x32 grid: after z-layout into 16 files, each file must cover a
    # far smaller a-range AND b-range than the global 0..31 span
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    laid = zorder_layout(df, ["a", "b"], bits=5, num_files=16)
    stats = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("ra"),
            (F.max("b") - F.min("b")).alias("rb"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in stats) == 1024
    # a 64-cell z-run sits inside one 16x16 major quadrant unless it
    # straddles one of the 3 major z boundaries (256/512/768) — so at
    # most 3 of 16 files may be wide; a plain sort on `a` would instead
    # give rb == 31 for EVERY file
    tight = [r for r in stats if r["ra"] <= 15 and r["rb"] <= 15]
    assert len(tight) >= len(stats) - 3


def test_bucket_stats_deterministic_and_complete(spark):
    rows = [(i * 13 % 101, i * 7 % 89) for i in range(500)]
    df = spark.createDataFrame(rows, "a long, b long")
    s1 = zorder_bucket_stats(df, ["a", "b"], bits=8, num_buckets=16)
    s2 = zorder_bucket_stats(df, ["a", "b"], bits=8, num_buckets=16)
    r1 = sorted(map(tuple, s1.collect()))
    r2 = sorted(map(tuple, s2.collect()))
    assert r1 == r2
    assert sum(r[1] for r in r1) == 500
    cols = s1.columns
    assert cols == ["bucket", "n_rows", "min_a", "max_a", "min_b", "max_b"]


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
