"""Stateful Structured Streaming: watermarked windows + LWW state store."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.sources.binlog import BinlogSpec, write_feed
from kafka_connect_gcs_spark.streaming.stateful import (
    streaming_lww_state,
    streaming_windowed_counts,
)

SPEC = BinlogSpec(
    num_events=3_000, num_docs=300, num_partitions=4, seed=33,
    duplicate_fraction=0.15, shuffle_window=200,
)


def test_streaming_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = {
        (str(r.window_start), r.event_type): r.n
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect()
    }
    import shutil

    src_dir = tmp_path / "events"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part-0.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    out = streaming_windowed_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (str(r.window_start), r.event_type): r.n
        for r in spark.sql("select * from wincounts").collect()
    }
    assert got == want


def test_streaming_lww_state_matches_batch_dedup(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    write_feed(spark, SPEC, feed_dir, num_segments=5)
    batch = spark.read.parquet(feed_dir)
    want = {
        (r.doc_id): (r.offset, r.op)
        for r in batch.groupBy("doc_id")
        .agg(F.max_by(F.struct("offset", "op"), F.col("offset")).alias("w"))
        .select("doc_id", F.col("w.offset").alias("offset"), F.col("w.op").alias("op"))
        .collect()
    }
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches → real state
        .parquet(feed_dir + "/seg=*")
    )
    out = streaming_lww_state(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("lwwstate")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.sql("select * from lwwstate").collect()
    assert emitted  # state emitted updates
    # final winner per key across all emissions == batch LWW winner
    final = {}
    for r in emitted:
        cur = final.get(r.doc_id)
        if cur is None or r.offset >= cur[0]:
            final[r.doc_id] = (r.offset, r.op)
    assert final == want


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """Streaming sessionization (keyed state, gap=30 min) over time-ordered
    micro-batches converges to the batch sessionize result exactly."""
    from kafka_connect_gcs_spark.operators.asof import sessionize
    from kafka_connect_gcs_spark.streaming.stateful import streaming_sessionize

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .where(F.col("user_id") < 200)
    )
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800)
    want = {
        (r.user_id, float(r.start)): (float(r.end), r.n)
        for r in s.groupBy("user_id", "session_id")
        .agg(
            F.min(F.col("ts").cast("double")).alias("start"),
            F.max(F.col("ts").cast("double")).alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    # two time-ordered batches (in-order delivery per key across batches)
    cut = ev.agg(F.expr("percentile(cast(ts as double), 0.5)")).first()[0]
    b1 = ev.where(F.col("ts").cast("double") <= cut)
    b2 = ev.where(F.col("ts").cast("double") > cut)
    src = tmp_path / "sess-src"
    src.mkdir()
    b1.coalesce(1).write.parquet(str(src / "b1"))
    b2.coalesce(1).write.parquet(str(src / "b2"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/b*")
    )
    out = streaming_sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.sql("select * from sessions").collect()
    assert emitted
    # update-mode reduce, order-independent: a session only ever GROWS, so
    # the max (end, n) emission per (user, session_start) is the final one
    final = {}
    for r in emitted:
        k = (r.user_id, float(r.session_start))
        cand = (float(r.session_end), r.n_events)
        if k not in final or cand > final[k]:
            final[k] = cand
    assert final == want


def test_streaming_quality_gate_matches_batch(spark, sf_dir, tmp_path):
    """quality_gate is one stateless projection, so it composes into
    Structured Streaming unchanged — the streamed verdicts must equal the
    batch ones row-for-row (the curation funnel can run inside the ingest
    micro-batch instead of as a separate pass)."""
    import shutil

    from kafka_connect_gcs_spark.operators.curation import quality_gate

    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r["doc_id"]: (r["keep"], tuple(r["reasons"]))
        for r in quality_gate(batch, allowed_langs=("en",)).select(
            "doc_id", "keep", "reasons"
        ).collect()
    }
    src_dir = tmp_path / "docs"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", src_dir / "part-0.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    out = quality_gate(stream, allowed_langs=("en",)).select(
        "doc_id", "keep", "reasons"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("qgate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_qg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["doc_id"]: (r["keep"], tuple(r["reasons"]))
        for r in spark.sql("select * from qgate").collect()
    }
    assert got == want
