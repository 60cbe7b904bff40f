"""Structured Streaming variant parity + schema evolution mid-stream."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.config import EngineConfig
from kafka_connect_gcs_spark.icebox.table import Field
from kafka_connect_gcs_spark.operators.merge import read_state
from kafka_connect_gcs_spark.sources.binlog import BinlogSpec, write_feed
from kafka_connect_gcs_spark.streaming.pipeline import (
    CdcPipeline,
    run_structured_streaming,
)

SPEC = BinlogSpec(
    num_events=3_000,
    num_docs=400,
    num_partitions=4,
    seed=99,
    duplicate_fraction=0.1,
    shuffle_window=150,
)


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ss")
    feed_dir = str(root / "feed")
    write_feed(spark, SPEC, feed_dir, num_segments=6)
    return {"root": root, "feed": feed_dir}


def _oracle(feed_dir):
    rows = duckdb.sql(f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY "offset" DESC, delivery_seq DESC) rn
          FROM read_parquet('{feed_dir}/**/*.parquet'))
        SELECT doc_id, tokens, n_tok, source, "offset"
        FROM ranked WHERE rn=1 AND op<>'D' ORDER BY doc_id
    """).fetchall()
    return [(r[0], tuple(r[1]), r[2], r[3], r[4]) for r in rows]


def _state(table):
    return sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source, r.last_offset)
        for r in read_state(table).collect()
    )


def test_structured_streaming_matches_oracle_and_loop(spark, feed):
    cfg = EngineConfig(
        table_path=str(feed["root"] / "ss" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "ss" / "ckpt"),
        max_files_per_batch=8,
        shuffle_partitions=8,
    )
    lineages = run_structured_streaming(spark, cfg, timeout_sec=180.0)
    assert lineages
    from kafka_connect_gcs_spark.icebox.table import IceboxTable

    table = IceboxTable.load(spark, cfg.table_path)
    assert _state(table) == _oracle(feed["feed"])

    # re-running the stream with the same checkpoint is a no-op
    v = table.current_version()
    again = run_structured_streaming(spark, cfg, timeout_sec=120.0)
    assert all(ln.get("skipped") for ln in again) or not again
    assert IceboxTable.load(spark, cfg.table_path).current_version() == v


def test_schema_evolution_mid_stream(spark, feed):
    """Evolve the table (add column + widen n_tok) after the first batches;
    remaining batches and reads keep working; old rows null-fill."""
    cfg = EngineConfig(
        table_path=str(feed["root"] / "evo" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "evo" / "ckpt"),
        max_files_per_batch=2,
        shuffle_partitions=8,
    )
    pipe = CdcPipeline(spark, cfg)
    pipe.run_available(max_batches=1)

    new_fields = (
        Field("doc_id", "string"),
        Field("tokens", "array<int>"),
        Field("n_tok", "long"),  # widened int -> long
        Field("source", "string"),
        Field("last_offset", "long"),
        Field("deleted", "boolean"),
        Field("quality", "double"),  # added
    )
    pipe.table.evolve_schema(new_fields)

    pipe2 = CdcPipeline(spark, cfg)  # fresh handle, resumes + merges more
    pipe2.run_available()

    got = read_state(pipe2.table)
    assert got.schema["n_tok"].dataType.simpleString() == "bigint"
    assert "quality" in got.columns
    assert got.where(F.col("quality").isNotNull()).count() == 0  # null-filled
    state = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source, r.last_offset)
        for r in got.collect()
    )
    assert state == _oracle(feed["feed"])


def test_merge_preserves_populated_evolved_column(spark, feed):
    """Regression (round-1 advice): COW rewrites every row of a touched
    file, and apply_changes used to project only the six canonical CDC
    columns — an evolved column with VALUES was silently null-filled even
    for rows no change matched. Now: extras survive whenever a target row
    exists; only brand-new keys are null."""
    from kafka_connect_gcs_spark.operators.merge import merge_into

    cfg = EngineConfig(
        table_path=str(feed["root"] / "evo2" / "table"),
        feed_path=feed["feed"],
        checkpoint_path=str(feed["root"] / "evo2" / "ckpt"),
        max_files_per_batch=3,
        shuffle_partitions=8,
    )
    pipe = CdcPipeline(spark, cfg)
    pipe.run_available(max_batches=1)

    fields = tuple(
        list(pipe.table.schema().fields) + [Field("quality", "double")]
    )
    pipe.table.evolve_schema(fields)

    # backfill quality = doc-number via a full rewrite commit (the
    # maintenance path a real backfill job would take)
    full = pipe.table.read().withColumn(
        "quality", F.substring("doc_id", 4, 9).cast("double")
    )
    new_manifests = pipe.table.write_data_files(full, "backfill-quality")
    pipe.table.commit(
        batch_id="backfill-quality",
        operation="overwrite",
        keep_manifests=[],
        new_manifests=new_manifests,
        lineage={"note": "quality backfill"},
    )
    before = {
        r.doc_id: r.quality
        for r in read_state(pipe.table).select("doc_id", "quality").collect()
    }
    assert before and all(v is not None for v in before.values())
    # every row that exists at all (incl. tombstones — they also carry the
    # backfilled value and preserve it on revival)
    before_any_row = {
        r.doc_id for r in pipe.table.read().select("doc_id").collect()
    }

    # apply the REST of the feed — touches every file (COW rewrites)
    pipe2 = CdcPipeline(spark, cfg)
    pipe2.run_available()
    after = read_state(pipe2.table).select("doc_id", "quality").collect()
    after_map = {r.doc_id: r.quality for r in after}
    # every key that existed before keeps its quality value exactly
    for doc_id, q in before.items():
        if doc_id in after_map:  # not deleted by later changes
            assert after_map[doc_id] == q, doc_id
    # brand-new keys (no prior row, not even a tombstone) are null-filled
    new_keys = set(after_map) - before_any_row
    assert all(after_map[k] is None for k in new_keys)
    # and the canonical state still matches the oracle
    state = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source, r.last_offset)
        for r in read_state(pipe2.table).collect()
    )
    assert state == _oracle(feed["feed"])
