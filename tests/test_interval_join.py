"""interval_join: boundary semantics, multi-bucket intervals, key
isolation, left_points, and equivalence with the naive BETWEEN join."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.asof import interval_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny(spark):
    points = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),  # == interval start
            (2, "k1", _ts("2024-01-01 11:30:00")),  # inside
            (3, "k1", _ts("2024-01-01 12:00:00")),  # == interval end
            (4, "k1", _ts("2024-01-01 12:00:01")),  # just outside
            (5, "k2", _ts("2024-01-01 11:00:00")),  # other key, same time
            (6, "k1", _ts("2024-01-05 00:00:00")),  # inside long interval
        ],
        ["pid", "k", "pt"],
    )
    intervals = spark.createDataFrame(
        [
            (100, "k1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00")),
            (200, "k2", _ts("2024-01-01 10:59:00"), _ts("2024-01-01 11:01:00")),
            # long interval spanning many 1h buckets
            (300, "k1", _ts("2024-01-04 00:00:00"), _ts("2024-01-06 00:00:00")),
            # invalid (end < start): matches nothing
            (400, "k1", _ts("2024-01-01 11:00:00"), _ts("2024-01-01 10:00:00")),
        ],
        ["iid", "k", "ivl_start", "ivl_end"],
    )
    return points, intervals


def test_containment_and_boundaries(tiny):
    points, intervals = tiny
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "pt", "ivl_start", "ivl_end",
            on=["k"], bucket_seconds=3600,
        ).collect()
    }
    assert got == {(1, 100), (2, 100), (3, 100), (5, 200), (6, 300)}


def test_left_points_keeps_unmatched(tiny):
    points, intervals = tiny
    out = interval_join(
        points, intervals, "pt", "ivl_start", "ivl_end",
        on=["k"], bucket_seconds=3600, how="left_points", point_key="pid",
    )
    rows = {r["pid"]: r["iid"] for r in out.collect()}
    assert rows[4] is None and rows[1] == 100
    assert len(rows) == 6  # every point present exactly once (no dup pids)
    assert out.count() == 6


def test_bucket_size_does_not_change_result(tiny):
    points, intervals = tiny
    ref = None
    for w in (60, 3600, 86400, 7 * 86400):
        got = frozenset(
            (r["pid"], r["iid"])
            for r in interval_join(
                points, intervals, "pt", "ivl_start", "ivl_end",
                on=["k"], bucket_seconds=w,
            ).collect()
        )
        ref = got if ref is None else ref
        assert got == ref, w


def test_rejects_bad_args(tiny):
    points, intervals = tiny
    with pytest.raises(ValueError):
        interval_join(points, intervals, "pt", "ivl_start", "ivl_end", how="outer")
    with pytest.raises(ValueError):
        interval_join(
            points, intervals, "pt", "ivl_start", "ivl_end", bucket_seconds=0
        )
    with pytest.raises(ValueError):
        interval_join(
            points, intervals, "pt", "ivl_start", "ivl_end", how="left_points"
        )


def test_matches_naive_between_join(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from kafka_connect_gcs_spark.operators.asof import sessionize

    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    sess = (
        sessionize(views, key="user_id", ts="ts", gap_seconds=86400)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    banded = {
        (r["event_id"], r["session_id"])
        for r in interval_join(
            errors, sess, "ts", "start", "end", on=["user_id"],
            bucket_seconds=86400,
        ).collect()
    }
    naive = {
        (r["event_id"], r["session_id"])
        for r in errors.alias("e")
        .join(
            sess.alias("s"),
            (F.col("e.user_id") == F.col("s.user_id"))
            & (F.col("e.ts") >= F.col("s.start"))
            & (F.col("e.ts") <= F.col("s.end")),
        )
        .select("e.event_id", "s.session_id")
        .collect()
    }
    assert banded == naive and len(banded) > 0


def test_numeric_epoch_axis(spark):
    """Numeric ts columns are used directly as the bucketing axis —
    previously an implicit unix_timestamp cast-and-parse yielded NULL
    buckets and a silently empty join."""
    points = spark.createDataFrame(
        [(1, 100.0), (2, 3700.0), (3, 7300.0)], "pid long, pt double"
    )
    intervals = spark.createDataFrame(
        [(10, 0, 3650), (20, 7000, 8000)], "iid long, s long, e long"
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "pt", "s", "e", bucket_seconds=3600
        ).collect()
    }
    assert got == {(1, 10), (3, 20)}


def test_string_ts_rejected(spark):
    points = spark.createDataFrame([(1, "2024-01-01 10:00:00")], "pid long, pt string")
    intervals = spark.createDataFrame(
        [(10, "2024-01-01 09:00:00", "2024-01-01 11:00:00")],
        "iid long, s string, e string",
    )
    with pytest.raises(TypeError, match="to_timestamp"):
        interval_join(points, intervals, "pt", "s", "e")
