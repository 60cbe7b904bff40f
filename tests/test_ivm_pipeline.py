"""Maintained-rollup pipeline (streaming/ivm.py): the view kept fresh
from per-batch deltas must equal a direct aggregate over the feed's LWW
final state, including after a crash-and-replay at the worst window."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_gcs_spark.operators.ivm import batch_winners  # noqa: E402
from kafka_connect_gcs_spark.sources.binlog import (  # noqa: E402
    BinlogSpec,
    write_feed,
)
from kafka_connect_gcs_spark.streaming.ivm import RollupPipeline  # noqa: E402

SPEC = BinlogSpec(
    num_events=6_000,
    num_docs=700,
    seed=11,
    num_partitions=4,
    min_tokens=4,
    max_tokens=16,
)


def _direct(pipe, spark, feed_dir):
    full = spark.read.parquet(feed_dir)
    latest = batch_winners(pipe._feed_view(full))
    return (
        latest.where(~F.col("is_delete"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
    )


def _rows(df):
    return sorted(
        (r["grp"], r["n_keys"], float(r["sum_value"])) for r in df.collect()
    )


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivm") / "feed")
    write_feed(spark, SPEC, d, 8)
    return d


def test_view_matches_direct_aggregate(spark, feed, tmp_path):
    p = RollupPipeline(spark, feed, str(tmp_path / "view"))
    out = p.run_available(batch_segments=3)
    assert [r["version"] for r in out] == [1, 2, 3]
    assert _rows(p.read_rollup()) == _rows(_direct(p, spark, feed))


def test_crash_before_cursor_replays_as_noop(spark, feed, tmp_path):
    root = str(tmp_path / "view")
    p = RollupPipeline(spark, feed, root)
    segs = sorted(
        d for d in os.listdir(feed) if d.startswith("seg=")
    )
    # batch 1 commits snapshots + manifest, but we "crash" before the
    # feed checkpoint advances (the worst exactly-once window)
    res = p.run_batch(segs[0:3])
    assert res["version"] == 1
    fresh = RollupPipeline(spark, feed, root)
    out = fresh.run_available(batch_segments=3)
    # first batch replays as a manifest-guarded no-op, rest apply
    assert out[0].get("replayed_noop") is True
    assert [r.get("version") for r in out[1:]] == [2, 3]
    assert _rows(fresh.read_rollup()) == _rows(_direct(fresh, spark, feed))


def test_crash_between_rename_and_manifest_recovers(spark, feed, tmp_path):
    root = str(tmp_path / "view")
    p = RollupPipeline(spark, feed, root)
    segs = sorted(d for d in os.listdir(feed) if d.startswith("seg="))
    res1 = p.run_batch(segs[0:4])
    assert res1["version"] == 1
    # fake a batch-2 attempt killed between the version rename and the
    # manifest swap: the v2 dir exists (garbage) but the manifest still
    # points at v1 — plus a half-written tmp dir from the same kill
    os.makedirs(os.path.join(root, "v00000002", "state"), exist_ok=True)
    os.makedirs(os.path.join(root, ".tmp-dead", "state"), exist_ok=True)
    res2 = p.run_batch(segs[4:8])
    assert res2["version"] == 2 and "replayed_noop" not in res2
    assert _rows(p.read_rollup()) == _rows(_direct(p, spark, feed))
    assert not os.path.exists(os.path.join(root, ".tmp-dead"))


def test_idempotent_rerun_is_empty(spark, feed, tmp_path):
    p = RollupPipeline(spark, feed, str(tmp_path / "view"))
    p.run_available(batch_segments=2)
    v = p._manifest()["version"]
    assert p.run_available(batch_segments=2) == []
    assert p._manifest()["version"] == v


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
