"""Partition filters (A4), source remap (A24), poll/backoff loop (A28)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.config import EngineConfig
from kafka_connect_gcs_spark.operators.merge import read_state
from kafka_connect_gcs_spark.sources.binlog import BinlogSpec, write_feed
from kafka_connect_gcs_spark.streaming.pipeline import CdcPipeline

SPEC = BinlogSpec(
    num_events=2_000, num_docs=300, num_partitions=4, seed=5, shuffle_window=100
)


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("route")
    feed_dir = str(root / "feed")
    write_feed(spark, SPEC, feed_dir, num_segments=4)
    return {"root": root, "feed": feed_dir}


def test_partition_allowlist_filters_feed(spark, feed):
    cfg = EngineConfig(
        table_path=str(feed["root"] / "pa" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "pa" / "ckpt"),
        parts_allow=(0, 2),
        shuffle_partitions=8,
    )
    pipe = CdcPipeline(spark, cfg)
    lineages = pipe.run_available()
    parts = set()
    for ln in lineages:
        parts |= set(ln["partitions"].keys())
    assert parts == {"0", "2"}


def test_partition_denylist_filters_feed(spark, feed):
    """topics.ignore analog (GCSSourceTask.java:88-93): deny-list composes
    with the allow-list."""
    cfg = EngineConfig(
        table_path=str(feed["root"] / "pd" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "pd" / "ckpt"),
        parts_ignore=(1,),
        shuffle_partitions=8,
    )
    pipe = CdcPipeline(spark, cfg)
    lineages = pipe.run_available()
    parts = set()
    for ln in lineages:
        parts |= set(ln["partitions"].keys())
    assert parts == {"0", "2", "3"}

    cfg2 = EngineConfig(
        table_path=str(feed["root"] / "pd2" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "pd2" / "ckpt"),
        parts_allow=(0, 1),
        parts_ignore=(1,),
        shuffle_partitions=8,
    )
    pipe2 = CdcPipeline(spark, cfg2)
    parts2 = set()
    for ln in pipe2.run_available():
        parts2 |= set(ln["partitions"].keys())
    assert parts2 == {"0"}


def test_start_marker_begins_mid_feed(spark, feed):
    """gcs.start.marker analog (GCSFilesReader.java:148-158): a cold start
    skips segments below the marker; a checkpoint beats the marker."""
    import os

    segs = sorted(
        s for s in os.listdir(feed["feed"]) if s.startswith("seg=")
    )
    marker = segs[2]
    cfg = EngineConfig(
        table_path=str(feed["root"] / "sm" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "sm" / "ckpt"),
        start_marker=marker,
        max_files_per_batch=1,
        shuffle_partitions=8,
    )
    pipe = CdcPipeline(spark, cfg)
    lineages = pipe.run_available()
    consumed = [s for ln in lineages for s in ln["segments"]]
    assert consumed == segs[2:]  # nothing below the marker
    # restart with an even later marker: the checkpoint wins (like stored
    # Connect offsets beating gcs.start.marker)
    import dataclasses

    cfg_later = dataclasses.replace(cfg, start_marker=segs[3])
    pipe2 = CdcPipeline(spark, cfg_later)
    assert pipe2.run_available() == []  # already past it; nothing replayed


def test_source_remap_applies_on_ingest(spark, feed):
    cfg = EngineConfig(
        table_path=str(feed["root"] / "rm" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "rm" / "ckpt"),
        source_remap={"web": "web-archive"},
        shuffle_partitions=8,
    )
    pipe = CdcPipeline(spark, cfg)
    pipe.run_available()
    srcs = {r.source for r in read_state(pipe.table).select("source").distinct().collect()}
    assert "web" not in srcs and "web-archive" in srcs
    assert {"books", "code", "wiki"} <= srcs


def test_poll_loop_picks_up_late_segments_and_retries(spark, feed, tmp_path):
    import os
    import shutil

    live_feed = str(tmp_path / "livefeed")
    os.makedirs(live_feed)
    segs = sorted(os.listdir(feed["feed"]))
    segs = [s for s in segs if s.startswith("seg=")]
    shutil.copytree(
        os.path.join(feed["feed"], segs[0]), os.path.join(live_feed, segs[0])
    )
    cfg = EngineConfig(
        table_path=str(tmp_path / "table"),
        feed_path=live_feed,
        checkpoint_path=str(tmp_path / "ckpt"),
        shuffle_partitions=8,
        poll_interval_s=0.01,
        error_backoff_s=0.01,
    )
    pipe = CdcPipeline(spark, cfg)
    sleeps = []

    def fake_sleep(s):
        sleeps.append(s)
        # new data arrives while we're "sleeping"
        for s2 in segs[1:]:
            dst = os.path.join(live_feed, s2)
            if not os.path.exists(dst):
                shutil.copytree(os.path.join(feed["feed"], s2), dst)
                break

    lineages = pipe.run_forever(stop_after_idle_polls=2, sleep_fn=fake_sleep)
    assert len(lineages) == len(segs) // cfg.max_files_per_batch or lineages
    st = pipe.ckpt.load()
    assert st["next_segment_idx"] == len(segs)  # everything eventually consumed
    assert sleeps  # it did idle-poll


def test_poll_loop_backs_off_then_raises(spark, tmp_path, monkeypatch, feed):
    cfg = EngineConfig(
        table_path=str(tmp_path / "t2"),
        feed_path=feed["feed"],
        checkpoint_path=str(tmp_path / "c2"),
        max_retries=2,
        error_backoff_s=0.01,
    )
    pipe = CdcPipeline(spark, cfg)
    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError("transient storage error")

    monkeypatch.setattr(pipe, "run_available", boom)
    sleeps = []
    with pytest.raises(RuntimeError, match="transient"):
        pipe.run_forever(sleep_fn=sleeps.append)
    assert len(calls) == cfg.max_retries + 1
    assert sleeps == [cfg.error_backoff_s] * cfg.max_retries

def test_config_from_reference_properties():
    from kafka_connect_gcs_spark.config import EngineConfig
    from kafka_connect_gcs_spark.sources.formats import create_format

    cfg = EngineConfig.from_properties(
        {
            "gcs.start.marker": "seg=00000100",
            "topics": "web,mail",
            "topics.ignore": "spam",
            "max.poll.records": "500",
            "gcs.new.record.poll.interval": "30",
            "gcs.error.backoff": "1",
            "compressed_block_size": "67108864",
            "targetTopic.web": "web-archive",
            "format": "binary",
            "format.include.keys": "true",
            "merge_mode": "mor",
            "vocab_size": "50257",
            "hot_key_fraction": "0.05",
        }
    )
    assert cfg.start_marker == "seg=00000100"
    # topics are SOURCE LABELS: they filter the source column, never the
    # int feed partition (filtering part with strings would crash/drop all)
    assert cfg.source_allow == ("web", "mail")
    assert cfg.source_ignore == ("spam",)
    assert cfg.parts_allow is None and cfg.parts_ignore is None
    assert cfg.max_files_per_batch == 500
    assert cfg.poll_interval_s == 30.0
    assert cfg.error_backoff_s == 1.0
    assert cfg.target_file_bytes == 64 * 1024 * 1024
    assert cfg.source_remap == {"web": "web-archive"}
    assert cfg.merge_mode == "mor"  # engine-native key passes through
    # .properties values are strings — engine-native keys coerce by type
    assert cfg.vocab_size == 50257 and isinstance(cfg.vocab_size, int)
    assert cfg.hot_key_fraction == 0.05
    # format.* keys remain available for create_format
    fmt = create_format(cfg.properties)
    assert fmt.include_keys is True


def test_top_level_exports_are_lazy():
    import kafka_connect_gcs_spark as pkg

    assert pkg.CdcPipeline.__name__ == "CdcPipeline"
    assert pkg.IceboxTable.__name__ == "IceboxTable"
    assert pkg.ArchiveTailer.__name__ == "ArchiveTailer"
    assert callable(pkg.read_archive) and callable(pkg.write_archive)
    assert callable(pkg.ingest_archive)
    assert callable(pkg.create_format) and callable(pkg.create_metrics)


def test_source_label_filters(spark, feed):
    """topics/topics.ignore filter the SOURCE LABEL column (the reference's
    topics are labels), composing with the numeric partition filters."""
    base = spark.read.parquet(feed["feed"])
    sources = {r.source for r in base.select("source").distinct().collect()}
    assert len(sources) >= 2
    keep = sorted(sources)[0]
    cfg = EngineConfig(
        table_path=str(feed["root"] / "sl" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "sl" / "ckpt"),
        source_allow=(keep,),
        shuffle_partitions=8,
    )
    pipe = CdcPipeline(spark, cfg)
    pipe.run_available()
    got = {r.source for r in read_state(pipe.table).select("source").collect()}
    assert got == {keep}
    # deny-list: everything except `keep`
    cfg2 = EngineConfig(
        table_path=str(feed["root"] / "sl2" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "sl2" / "ckpt"),
        source_ignore=(keep,),
        shuffle_partitions=8,
    )
    pipe2 = CdcPipeline(spark, cfg2)
    pipe2.run_available()
    got2 = {r.source for r in read_state(pipe2.table).select("source").collect()}
    assert got2 == sources - {keep}


def test_page_size_tasks_properties_map_distinctly():
    """gcs.page.size is a LISTING bound, not the poll-batch bound
    (GCSSourceTask.java:126-128 vs :164 treat them independently);
    tasks / tasks.splitTopics are preserved as typed intent rather than
    silently falling into leftover properties."""
    from kafka_connect_gcs_spark.config import EngineConfig

    cfg = EngineConfig.from_properties(
        {
            "max.poll.records": "500",
            "gcs.page.size": "120",
            "tasks": "8",
            "tasks.splitTopics": "true",
        }
    )
    assert cfg.max_files_per_batch == 500
    assert cfg.listing_page_size == 120
    assert cfg.num_tasks == 8
    assert cfg.split_topics_across_tasks is True
    for k in ("gcs.page.size", "tasks", "tasks.splitTopics"):
        assert k not in cfg.properties


def test_listing_page_bounds_batches_not_the_call(spark, tmp_path):
    """gcs.page.size bounds how much listing one poll iteration consumes —
    a micro-batch never spans a page — but a single run_available call
    walks page after page until its entry snapshot is drained, so
    "process what's available now" callers ingest everything visible
    (no silent under-ingest past page 1)."""
    from kafka_connect_gcs_spark.config import EngineConfig
    from kafka_connect_gcs_spark.sources.binlog import BinlogSpec, write_feed
    from kafka_connect_gcs_spark.streaming.pipeline import CdcPipeline

    feed = str(tmp_path / "feed")
    write_feed(spark, BinlogSpec(num_events=600, num_docs=80, seed=3), feed, 5)
    total = spark.read.parquet(feed).count()  # includes injected duplicates
    cfg = EngineConfig(
        table_path=str(tmp_path / "table"),
        feed_path=feed,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_batch=10,  # would take all 5 segments in one batch...
        listing_page_size=2,  # ...but a batch may not cross a page
        shuffle_partitions=4,
    )
    pipe = CdcPipeline(spark, cfg)
    lineages = pipe.run_available()
    # 5 segments at ≤2 per page ⇒ batches of 2,2,1 — one call, fully drained
    assert [len(ln["segments"]) for ln in lineages] == [2, 2, 1]
    assert sum(ln["events_in"] for ln in lineages) == total
    assert pipe.run_available() == []  # checkpoint advanced past everything
    pipe2 = CdcPipeline(spark, cfg)  # same checkpoint: nothing to replay
    assert pipe2.run_available() == []
    # max_batches still truncates mid-snapshot and the checkpoint resumes
    cfg_fresh = EngineConfig(
        table_path=str(tmp_path / "table2"),
        feed_path=feed,
        checkpoint_path=str(tmp_path / "ckpt2"),
        max_files_per_batch=1,
        listing_page_size=2,
        shuffle_partitions=4,
    )
    p3 = CdcPipeline(spark, cfg_fresh)
    assert len(p3.run_available(max_batches=2)) == 2  # 2 of 5 segments
    rest = p3.run_available()
    assert len(rest) == 3
    got = sum(ln["events_in"] for ln in rest) + sum(
        ln["events_in"] for ln in p3.ckpt.lineage()[:2]
    )
    assert got == total
