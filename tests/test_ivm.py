"""Incremental view maintenance (operators/ivm.py): the delta-maintained
rollup must equal a direct groupBy over the LWW final state — under
out-of-order batches, group-moving updates, deletes, and re-deliveries."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_gcs_spark.operators.ivm import (  # noqa: E402
    apply_batch,
    batch_winners,
    incremental_rollup,
    merge_rollup,
)

SCHEMA = "key string, offset long, grp string, value double, is_delete boolean"


def _direct(spark, rows):
    """Oracle: LWW per key over ALL rows, drop tombstones, groupBy."""
    feed = spark.createDataFrame(rows, SCHEMA)
    latest = batch_winners(feed)
    return (
        latest.where(~F.col("is_delete"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def _rollup_rows(df):
    return sorted(
        (r["grp"], r["n_keys"], round(r["sum_value"], 6)) for r in df.collect()
    )


def test_matches_direct_groupby_under_out_of_order(spark):
    b0 = [("a", 1, "x", 10.0, False), ("b", 2, "x", 5.0, False)]
    # update moves 'a' to group y; c arrives; stale event for b (offset 1)
    b1 = [("a", 5, "y", 7.5, False), ("c", 3, "z", 1.0, False),
          ("b", 1, "y", 99.0, False)]
    # delete c; duplicate re-delivery of a's offset-5 row; newer b
    b2 = [("c", 9, "z", 0.0, True), ("a", 5, "y", 7.5, False),
          ("b", 8, "x", 6.0, False)]
    batches = [spark.createDataFrame(b, SCHEMA) for b in (b0, b1, b2)]
    inc = incremental_rollup(batches)
    assert _rollup_rows(inc) == _rollup_rows(_direct(spark, b0 + b1 + b2))
    # expected live state: a->(y,7.5), b->(x,6.0); c deleted
    assert _rollup_rows(inc) == [("x", 1, 6.0), ("y", 1, 7.5)]


def test_replayed_batch_is_a_no_op(spark):
    b0 = [("a", 1, "x", 10.0, False), ("b", 2, "y", 5.0, False)]
    b1 = [("a", 4, "y", 2.0, False)]
    d0 = spark.createDataFrame(b0, SCHEMA)
    d1 = spark.createDataFrame(b1, SCHEMA)
    state, deltas = apply_batch(None, d0)
    rollup = merge_rollup(None, deltas)
    state, deltas = apply_batch(state, d1)
    rollup = merge_rollup(rollup, deltas)
    # exactly-once recovery: the SAME batch applied again must change nothing
    state2, replay_deltas = apply_batch(state, d1)
    assert replay_deltas.count() == 0
    rollup2 = merge_rollup(rollup, replay_deltas)
    assert _rollup_rows(rollup2.withColumn(
        "sum_value", F.col("sum_value").cast("double"))
    ) == _rollup_rows(rollup.withColumn(
        "sum_value", F.col("sum_value").cast("double")))
    assert sorted(state2.collect()) == sorted(state.collect())


def test_group_vanishes_when_last_key_deleted(spark):
    b0 = [("a", 1, "x", 3.0, False)]
    b1 = [("a", 2, "x", 0.0, True)]
    batches = [spark.createDataFrame(b, SCHEMA) for b in (b0, b1)]
    inc = incremental_rollup(batches)
    assert inc.count() == 0


def test_tombstone_order_keeps_rejecting_stale_arrivals(spark):
    b0 = [("a", 9, "x", 1.0, True)]           # delete at offset 9 first
    b1 = [("a", 3, "y", 50.0, False)]          # stale insert must NOT resurrect
    batches = [spark.createDataFrame(b, SCHEMA) for b in (b0, b1)]
    inc = incremental_rollup(batches)
    assert inc.count() == 0


def test_materialized_path_equals_lazy(spark):
    rows = [
        ("k%d" % (i % 7), i, "g%d" % (i % 3), float(i) / 4, i % 11 == 0)
        for i in range(60)
    ]
    import random

    rnd = random.Random(7)
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    batches = [shuffled[i::4] for i in range(4)]
    dfs = [spark.createDataFrame(b, SCHEMA) for b in batches]
    lazy = incremental_rollup(dfs)
    mat = incremental_rollup(dfs, materialize=True)
    assert _rollup_rows(lazy) == _rollup_rows(mat)
    assert _rollup_rows(lazy) == _rollup_rows(_direct(spark, rows))


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
