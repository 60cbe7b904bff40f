"""Compaction and tombstone expiry preserve table state exactly."""

from pyspark.sql import functions as F

from kafka_connect_gcs_spark.config import EngineConfig
from kafka_connect_gcs_spark.icebox.maintenance import (
    compact,
    expire_tombstones,
    plan_compaction,
)
from kafka_connect_gcs_spark.operators.merge import read_state
from kafka_connect_gcs_spark.sources.binlog import BinlogSpec, write_feed
from kafka_connect_gcs_spark.streaming.pipeline import CdcPipeline

SPEC = BinlogSpec(
    num_events=4_000, num_docs=500, num_partitions=4, seed=21,
    delete_fraction=0.25, shuffle_window=100,
)


def _build(spark, tmp_path, name):
    feed = str(tmp_path / name / "feed")
    write_feed(spark, SPEC, feed, num_segments=6)
    cfg = EngineConfig(
        table_path=str(tmp_path / name / "table"),
        feed_path=feed,
        checkpoint_path=str(tmp_path / name / "ckpt"),
        max_files_per_batch=1,  # many batches → many small files
        shuffle_partitions=8,
    )
    pipe = CdcPipeline(spark, cfg)
    pipe.run_available()
    return pipe


def _state(table):
    return sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source, r.last_offset)
        for r in read_state(table).collect()
    )


def test_compaction_preserves_state_and_reduces_files(spark, tmp_path):
    pipe = _build(spark, tmp_path, "c")
    before_state = _state(pipe.table)
    before_files = len(pipe.table.snapshot().manifests)
    res = compact(pipe.table, target_bytes=512 * 1024 * 1024)
    assert not res.get("skipped")
    after_files = len(pipe.table.snapshot().manifests)
    assert after_files < before_files
    assert _state(pipe.table) == before_state
    # time travel to pre-compaction still works
    hist = pipe.table.history()
    assert hist[-1]["operation"] == "compact"
    pre = hist[-2]["version"]
    assert pipe.table.read(version=pre).count() >= len(before_state)
    # replaying the same compaction is a no-op
    v = pipe.table.current_version()
    assert compact(pipe.table, target_bytes=512 * 1024 * 1024).get("skipped") in (
        True,
        None,
    ) or pipe.table.current_version() == v + 1


def test_plan_compaction_groups_adjacent_small_files(spark, tmp_path):
    pipe = _build(spark, tmp_path, "p")
    entries = list(pipe.table.snapshot().manifests)
    groups = plan_compaction(entries, target_bytes=512 * 1024 * 1024)
    flat = [m.path for g in groups for m in g]
    assert len(flat) == len(set(flat))
    for g in groups:
        assert len(g) >= 2


def test_expire_tombstones_drops_only_safe_watermarks(spark, tmp_path):
    pipe = _build(spark, tmp_path, "e")
    table = pipe.table
    state_before = _state(table)
    all_rows = table.read()
    n_tomb = all_rows.where(F.coalesce(F.col("deleted"), F.lit(False))).count()
    assert n_tomb > 0
    # everything delivered; horizon = max offset + 1 → all tombstones safe
    safe = SPEC.num_events + 1
    res = expire_tombstones(table, safe_offset=safe)
    assert res["expired"] == n_tomb
    assert _state(table) == state_before  # live rows untouched
    assert (
        table.read().where(F.coalesce(F.col("deleted"), F.lit(False))).count() == 0
    )


def test_auto_compact_triggers_during_pipeline_run(spark, tmp_path):
    """With an aggressive small-file bound the pipeline compacts itself
    mid-run: fewer files at the end than batches wrote, state exact, and
    the maintenance commit appears in the lineage log."""
    feed = str(tmp_path / "ac" / "feed")
    write_feed(spark, SPEC, feed, num_segments=6)
    cfg = EngineConfig(
        table_path=str(tmp_path / "ac" / "table"),
        feed_path=feed,
        checkpoint_path=str(tmp_path / "ac" / "ckpt"),
        max_files_per_batch=1,
        shuffle_partitions=8,
        auto_compact_min_small_files=3,
    )
    pipe = CdcPipeline(spark, cfg)
    pipe.run_available()
    compacts = [ln for ln in pipe.ckpt.lineage() if ln.get("op") == "compact"]
    assert compacts and all(c["compacted_files"] >= 2 for c in compacts)
    assert len(pipe.table.snapshot().manifests) <= 4
    # state still exact vs an identical run without auto-compaction
    cfg2 = EngineConfig(
        table_path=str(tmp_path / "ac2" / "table"),
        feed_path=feed,
        checkpoint_path=str(tmp_path / "ac2" / "ckpt"),
        max_files_per_batch=1,
        shuffle_partitions=8,
        auto_compact_min_small_files=None,
    )
    pipe2 = CdcPipeline(spark, cfg2)
    pipe2.run_available()
    assert _state(pipe.table) == _state(pipe2.table)
    assert len(pipe2.table.snapshot().manifests) > len(
        pipe.table.snapshot().manifests
    )


def test_expire_snapshots_reclaims_storage_and_keeps_time_travel(spark, tmp_path):
    import os

    from kafka_connect_gcs_spark.icebox.maintenance import expire_snapshots

    pipe = _build(spark, tmp_path, "x")  # 6 COW batches → 7 versions
    table = pipe.table
    state_before = _state(table)
    current = table.current_version()
    assert current >= 4

    def all_files():
        out = []
        for base in ("data", "deletes"):
            d = os.path.join(table.root, base)
            for dp, _dd, fs in os.walk(d):
                out += [os.path.join(dp, f) for f in fs if not f.startswith("_")]
        return out

    # plant a crash orphan: data written, commit never happened
    orphan_df = spark.createDataFrame(
        [("zz-orphan", [1], 1, "web", 99, None)],
        table.schema().spark_schema(),
    )
    table.write_data_files(orphan_df, "never-committed")
    n_before = len(all_files())
    res = expire_snapshots(table, keep_last=2)
    assert res["versions_removed"] == current - 1  # v0..current-2 gone
    assert res["files_removed"] > 0 and res["bytes_removed"] > 0
    assert len(all_files()) < n_before
    # state intact, replay guard intact, kept time travel works
    assert _state(table) == state_before
    assert table.committed_batch_ids()
    assert table.read(version=current - 1).count() > 0
    # expired versions are gone
    try:
        table.read(version=0)
        raised = False
    except Exception:
        raised = True
    assert raised
    # idempotent: nothing left to remove
    res2 = expire_snapshots(table, keep_last=2)
    assert res2["files_removed"] == 0 and res2["versions_removed"] == 0
    # the orphan's rows never became visible
    assert not [s for s in _state(table) if s[0] == "zz-orphan"]


def test_expire_respects_unsafe_watermark(spark, tmp_path):
    pipe = _build(spark, tmp_path, "u")
    table = pipe.table
    tombs = table.read().where(F.coalesce(F.col("deleted"), F.lit(False)))
    mid = tombs.agg(F.expr("percentile(last_offset, 0.5)")).first()[0]
    n_recent = tombs.where(F.col("last_offset") >= mid).count()
    expire_tombstones(table, safe_offset=int(mid))
    left = table.read().where(F.coalesce(F.col("deleted"), F.lit(False)))
    assert left.count() == n_recent
    assert left.where(F.col("last_offset") < mid).count() == 0
