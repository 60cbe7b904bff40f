"""Metrics surface (A29): meter/hist/gauge/timer with tags, registry,
pluggable reporters, and per-batch pipeline emission — mirrors the
reference's Metrics.java:10-44 contract and Configure.java:93-113 wiring."""

import json

import pytest

from kafka_connect_gcs_spark.metrics import (
    ALIASES,
    CompositeMetrics,
    JsonlMetrics,
    NoOpMetrics,
    RecordingMetrics,
    create_metrics,
    get_by_name,
)


def test_recording_meter_hist_gauge_with_tags():
    m = RecordingMetrics()
    m.meter(3, "reads", {"part": "0"})
    m.meter(2, "reads", {"part": "0"})
    m.meter(5, "reads", {"part": "1"})
    m.hist(10, "lat")
    m.hist(30, "lat")
    state = {"rows": 42}
    m.gauge("live", None, lambda: state["rows"])
    snap = m.snapshot()
    assert snap["meters"]["reads[part=0]"] == 5
    assert snap["meters"]["reads[part=1]"] == 5
    assert snap["hists"]["lat"] == {
        "count": 2, "min": 10, "max": 30, "sum": 40, "mean": 20.0
    }
    assert snap["gauges"]["live"] == 42
    state["rows"] = 43  # gauges are suppliers, re-evaluated per snapshot
    assert m.snapshot()["gauges"]["live"] == 43


def test_timer_emits_time_hist_and_rate_meter():
    """Metrics.time default: hist '{name}.time' (ns) + meter '{name}.rate'
    (Metrics.java:26-33)."""
    m = RecordingMetrics()
    with m.time("poll", {"t": "x"}):
        pass
    t = m.time("poll", {"t": "x"})
    t.stop()
    t.stop()  # idempotent, like StopTimer.close → stop
    snap = m.snapshot()
    assert snap["meters"]["poll.rate[t=x]"] == 2
    assert snap["hists"]["poll.time[t=x]"]["count"] == 2
    assert snap["hists"]["poll.time[t=x]"]["min"] >= 0


def test_jsonl_reporter_appends_rows(tmp_path):
    path = str(tmp_path / "m.jsonl")
    m = JsonlMetrics({"path": path})
    m.meter(1, "a", {"x": "1"})
    m.hist(7, "b")
    m.gauge("c", None, lambda: "v")
    rows = [json.loads(line) for line in open(path)]
    assert [r["kind"] for r in rows] == ["meter", "hist", "gauge"]
    assert rows[0]["tags"] == {"x": "1"}
    assert rows[2]["value"] == "v"


def test_registry_returns_same_instance():
    a = get_by_name("t-reg", RecordingMetrics, {})
    b = get_by_name("t-reg", RecordingMetrics, {})
    assert a is b


def test_create_metrics_factory(tmp_path):
    assert isinstance(create_metrics({}), NoOpMetrics)
    assert isinstance(create_metrics(None), NoOpMetrics)
    m = create_metrics(
        {"metrics.reporter": "jsonl",
         "metrics.reporter.path": str(tmp_path / "x.jsonl"),
         "metrics.reporter.name": "t1"}
    )
    assert isinstance(m, JsonlMetrics)
    assert m.path.endswith("x.jsonl")
    # dotted-path reflective construction (Configure.clazz analog)
    m2 = create_metrics(
        {"metrics.reporter": "kafka_connect_gcs_spark.metrics:RecordingMetrics",
         "metrics.reporter.name": "t2"}
    )
    assert isinstance(m2, RecordingMetrics)
    assert set(ALIASES) == {"noop", "recording", "jsonl", "statsd", "datadog"}


def test_pipeline_emits_per_batch_metrics(spark, tmp_path):
    """The verdict's asked-for test: register a recording reporter and
    assert per-batch meters/timers after a real drain."""
    from kafka_connect_gcs_spark.config import EngineConfig
    from kafka_connect_gcs_spark.sources.binlog import BinlogSpec, write_feed
    from kafka_connect_gcs_spark.streaming.pipeline import CdcPipeline

    feed = str(tmp_path / "feed")
    write_feed(
        spark,
        BinlogSpec(num_events=800, num_docs=100, num_partitions=2, seed=3),
        feed,
        num_segments=2,
    )
    cfg = EngineConfig(
        table_path=str(tmp_path / "table"),
        feed_path=feed,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_batch=1,
        shuffle_partitions=4,
    )
    rec = RecordingMetrics()
    pipe = CdcPipeline(spark, cfg, metrics=rec)
    lineages = pipe.run_available()
    assert len(lineages) == 2
    snap = rec.snapshot()
    total_in = sum(
        v for k, v in snap["meters"].items() if k.startswith("events.in")
    )
    assert total_in == sum(ln["events_in"] for ln in lineages)
    # one timer pair per batch
    rates = [v for k, v in snap["meters"].items() if k.startswith("batch.rate")]
    assert sum(rates) == 2
    times = [v for k, v in snap["hists"].items() if k.startswith("batch.time")]
    assert sum(h["count"] for h in times) == 2
    assert all(h["min"] > 0 for h in times)  # nanosecond timer actually ran
    assert snap["gauges"]["table.live_rows"] == lineages[-1]["table_live_rows"]
    # merge counters rode through
    assert any(k.startswith("merge.inserted") for k in snap["meters"])


def test_pipeline_metrics_from_properties(spark, tmp_path):
    """Reporter chosen via config properties (Configure.metrics analog)."""
    from kafka_connect_gcs_spark.config import EngineConfig
    from kafka_connect_gcs_spark.sources.binlog import BinlogSpec, write_feed
    from kafka_connect_gcs_spark.streaming.pipeline import CdcPipeline

    feed = str(tmp_path / "feed")
    write_feed(
        spark,
        BinlogSpec(num_events=300, num_docs=50, num_partitions=2, seed=4),
        feed,
        num_segments=1,
    )
    mpath = str(tmp_path / "metrics.jsonl")
    cfg = EngineConfig(
        table_path=str(tmp_path / "table"),
        feed_path=feed,
        checkpoint_path=str(tmp_path / "ckpt"),
        shuffle_partitions=4,
        properties={
            "metrics.reporter": "jsonl",
            "metrics.reporter.path": mpath,
            "metrics.reporter.name": "pipe-test",
        },
    )
    pipe = CdcPipeline(spark, cfg)
    pipe.run_available()
    rows = [json.loads(line) for line in open(mpath)]
    kinds = {r["kind"] for r in rows}
    assert {"meter", "hist", "gauge"} <= kinds
    names = {r["name"] for r in rows}
    assert {"batch.time", "batch.rate", "events.in", "table.live_rows"} <= names


def test_statsd_line_golden_format():
    """Golden-format case mirroring DatadogMetricsTest.metricsAreTagged:
    same name + different tags are distinct lines, multi-tag maps sort by
    key regardless of insertion order, and the dogstatsd line shape is
    {prefix.}name:value|type|#tags."""
    from kafka_connect_gcs_spark.metrics import StatsdLineMetrics

    m = StatsdLineMetrics({"prefix": "connect"})
    m.hist(1, "foo", {"foo": "bar"})
    m.hist(2, "foo", {"foo": "baz"})
    m.meter(2, "fooMeter", {"foo": "baz", "bar": "qux"})
    m.meter(2, "fooMeter", {"bar": "qux", "foo": "baz"})  # same key order
    m.gauge("depth", None, lambda: 7)
    with m.time("poll", {"topic": "t"}):
        pass
    assert m.lines[:5] == [
        "connect.foo:1|h|#foo:bar",
        "connect.foo:2|h|#foo:baz",
        "connect.fooMeter:2|c|#bar:qux,foo:baz",
        "connect.fooMeter:2|c|#bar:qux,foo:baz",
        "connect.depth:7|g",
    ]
    # StopTimer emits {name}.time (ns hist) + {name}.rate (meter 1)
    assert m.lines[5].startswith("connect.poll.time:") and m.lines[5].endswith(
        "|h|#topic:t"
    )
    assert m.lines[6] == "connect.poll.rate:1|c|#topic:t"


def test_statsd_global_tags_and_parse_tags():
    from kafka_connect_gcs_spark.metrics import StatsdLineMetrics, parse_tags

    assert parse_tags({"tags": "a:b,c:d,longer_name:has-a-value"}) == [
        "a:b", "c:d", "longer_name:has-a-value"
    ]
    assert parse_tags({}) is None
    assert parse_tags({"tags": ""}) is None

    m = StatsdLineMetrics({"tags": "env:prod,dc:us"})
    m.meter(1, "x", {"k": "v"})
    assert m.lines == ["x:1|c|#k:v,env:prod,dc:us"]


def test_statsd_registry_dedupes_like_reference():
    """DatadogMetricsTest.configureMetricsDedupes: same reporter+name →
    same instance; different name → different instance."""
    from kafka_connect_gcs_spark.metrics import create_metrics

    a = create_metrics({"metrics.reporter": "statsd",
                        "metrics.reporter.name": "testA"})
    a2 = create_metrics({"metrics.reporter": "statsd",
                         "metrics.reporter.name": "testA"})
    b = create_metrics({"metrics.reporter": "statsd",
                        "metrics.reporter.name": "testB"})
    assert a is a2 and a is not b
    # the reference's own alias maps to the same implementation
    d = create_metrics({"metrics.reporter": "datadog",
                        "metrics.reporter.name": "testC"})
    from kafka_connect_gcs_spark.metrics import StatsdLineMetrics

    assert isinstance(d, StatsdLineMetrics)


def test_statsd_frequency_aggregates_then_flushes():
    """DatadogMetrics.java:66 starts a reporter on a `frequency` cadence;
    with frequency set, calls aggregate and only flush() emits: meters sum
    per (name, tags), gauges are polled AT flush time, histogram samples
    flush individually in arrival order — all in the golden line format."""
    from kafka_connect_gcs_spark.metrics import StatsdLineMetrics

    m = StatsdLineMetrics({"prefix": "connect", "frequency": 3600})
    try:
        m.meter(2, "gcs.put", {"topic": "t"})
        m.meter(3, "gcs.put", {"topic": "t"})
        m.meter(1, "gcs.put", {"topic": "u"})
        m.hist(7, "batch.size", {"topic": "t"})
        m.hist(9, "batch.size", {"topic": "t"})
        holder = {"v": 1}
        m.gauge("lag", {"topic": "t"}, lambda: holder["v"])
        holder["v"] = 42  # gauge must report the value at FLUSH, not at call
        assert m.lines == []  # nothing emitted before the cadence fires
        m.flush()
    finally:
        m.close()
    assert m.lines == [
        "connect.gcs.put:5|c|#topic:t",
        "connect.gcs.put:1|c|#topic:u",
        "connect.lag:42|g|#topic:t",
        "connect.batch.size:7|h|#topic:t",
        "connect.batch.size:9|h|#topic:t",
    ]
    # flush drained the aggregation: a second flush emits nothing new
    m.flush()
    assert len(m.lines) == 5


def test_statsd_reporter_thread_flushes_on_cadence():
    import time

    from kafka_connect_gcs_spark.metrics import StatsdLineMetrics

    m = StatsdLineMetrics({"frequency": 0.05})
    try:
        m.meter(1, "ticks")
        deadline = time.monotonic() + 5
        while not m.lines and time.monotonic() < deadline:
            time.sleep(0.01)
        assert m.lines == ["ticks:1|c"]
    finally:
        m.close()


def test_statsd_flush_packs_datagrams():
    """Flushed lines are newline-packed into ≤1432-byte datagrams (the
    dogstatsd batching convention) instead of one UDP send per line."""
    from kafka_connect_gcs_spark.metrics import StatsdLineMetrics

    m = StatsdLineMetrics({"host": "127.0.0.1", "port": 8125,
                           "frequency": 3600})
    sent = []

    class FakeSock:
        def sendto(self, data, addr):
            sent.append(data)

    m._sock = FakeSock()
    try:
        for i in range(200):
            m.hist(i, f"metric.with.a.reasonably.long.name.{i:04d}")
        m.flush()
    finally:
        m._sock = None  # close() flush must not touch the fake
        m.close()
    assert len(sent) > 1  # batched, but more than one packet for 200 lines
    for p in sent:
        assert len(p) <= 1432
    all_lines = b"\n".join(sent).decode().split("\n")
    assert len(all_lines) == 200
    assert all_lines[0] == "metric.with.a.reasonably.long.name.0000:0|h"
