"""The curation micro-batch loop: feed segments → quality gate → exact
dedup → near-dup dedup against the stored minhash index → icebox append +
index append, exactly-once under kill/resume.

This composes the operators the engine already proves individually
(:func:`~kafka_connect_gcs_spark.operators.curation.quality_gate`,
:func:`~kafka_connect_gcs_spark.operators.dedup_index.dedup_against_index`,
:func:`~kafka_connect_gcs_spark.operators.dedup_index.minhash_index_append`,
:class:`~kafka_connect_gcs_spark.icebox.table.IceboxTable`) into the loop a
training-data ingest service actually runs — the CDC pipeline's shape
(streaming/pipeline.py) pointed at documents instead of change events.

Exactly-once with TWO stateful sinks (table + signature index) needs one
more trick than the CDC loop's single batch_id guard, because the index
append changes what a replayed batch's dedup probe would SEE:

    per batch (deterministic batch_id from the segment range):
      1. gate + exact dedup + index probe     (pure; excludes this
         batch_id's own marker ids, so replays probe the pre-append state)
      2. index append under an intent marker  (idempotent via the marker's
         done flag; a replay can at worst re-append identical rows, which
         changes no dedup decision)
      3. table append commit                  (idempotent via
         committed_batch_ids)
      4. checkpoint advance + lineage row

A crash at ANY point replays the batch; steps already taken degrade to
no-ops, so the table gets every survivor exactly once — including the
nasty window between index append and table commit, where two
near-duplicate docs in one batch would otherwise drop each other against
their own crash-orphaned index rows (tests/test_curation_pipeline.py
proves that exact scenario).

Scale notes: the heavy operators keep their individual 100 TB shapes (the
gate is one map-only projection; the index probe broadcasts the batch
side). The loop adds only batch-scale driver work: the marker's id list,
the lineage counters, and one manifest commit per batch.
"""

from __future__ import annotations

import os
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.icebox.table import Field, IceboxTable, spark_to_type
from kafka_connect_gcs_spark.operators.curation import quality_gate
from kafka_connect_gcs_spark.operators.dedup_index import (
    dedup_against_index,
    minhash_index_append,
)
from kafka_connect_gcs_spark.streaming.pipeline import Checkpoint, _list_segments

DEFAULT_INDEX_PARAMS = {
    "num_hashes": 16,
    "bands": 4,
    "shingle_n": 3,
    "portable": False,
    "bucket_parts": 16,
}


class FailPoint(RuntimeError):
    """Deterministic crash injection for the kill/resume tests."""


class CurationPipeline:
    def __init__(
        self,
        spark: SparkSession,
        feed_path: str,
        table_path: str,
        index_path: str,
        checkpoint_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        max_files_per_batch: int = 2,
        dedup_threshold: float = 0.5,
        index_params: "dict | None" = None,
        gate_kwargs: "dict | None" = None,
    ):
        self.spark = spark
        self.feed_path = feed_path
        self.table_path = table_path
        self.index_path = index_path
        self.id_col = id_col
        self.text_col = text_col
        self.max_files_per_batch = max_files_per_batch
        self.dedup_threshold = dedup_threshold
        self.index_params = dict(index_params or DEFAULT_INDEX_PARAMS)
        self.gate_kwargs = dict(gate_kwargs or {})
        self.ckpt = Checkpoint(checkpoint_path)
        #: test hook: names in this set raise FailPoint at that step
        self.failpoints: set[str] = set()

    # -- helpers ---------------------------------------------------------------

    def _maybe_fail(self, point: str) -> None:
        if point in self.failpoints:
            raise FailPoint(point)

    def _table(self, template: DataFrame) -> IceboxTable:
        if IceboxTable.exists(self.table_path):
            return IceboxTable.load(self.spark, self.table_path)
        fields = [
            Field(f.name, spark_to_type(f.dataType))
            for f in template.schema.fields
        ]
        return IceboxTable.create(self.spark, self.table_path, fields)

    # -- one micro-batch ---------------------------------------------------------

    def run_batch(self, segments: "list[str]") -> "dict | None":
        if not segments:
            return None
        batch_id = f"{segments[0]}..{segments[-1]}"
        paths = [os.path.join(self.feed_path, s) for s in segments]
        raw = self.spark.read.parquet(*paths)
        return self.run_batch_df(raw, batch_id, segments=segments)

    def run_batch_df(
        self,
        raw: DataFrame,
        batch_id: str,
        segments: "list[str] | None" = None,
    ) -> "dict | None":
        """One curation micro-batch over an already-loaded DataFrame — the
        shared plan behind :meth:`run_batch` (explicit loop) and
        :func:`run_structured_curation` (foreachBatch twin). Idempotent
        for a fixed ``(raw, batch_id)`` pair: every stateful step degrades
        to a no-op on replay (see module docstring), so both drivers get
        exactly-once as long as they re-present identical rows under the
        same batch_id — the loop derives batch_id from the segment range,
        Structured Streaming pins file→epoch assignment in its checkpoint.

        Per-batch counting is fused to TWO jobs: one union-aggregate
        materializes the gate AND probe caches while collecting every
        pre-survivor counter, then the survivor count materializes the
        survivor cache both sinks reuse.
        """
        t0 = time.time()
        doc_cols = raw.columns

        # 1. gate — one map-only projection; persisted because the kept set
        # feeds the exact-dedup winners, the index probe, and both sinks
        gated = quality_gate(
            raw, text_col=self.text_col, id_col=self.id_col, **self.gate_kwargs
        ).persist(StorageLevel.MEMORY_AND_DISK)
        kept = gated.where("keep").select(*doc_cols)

        # 2. exact within-batch dedup: smallest id per content hash wins
        # (deterministic under replay / retry / AQE)
        winners = (
            kept.groupBy(F.md5(F.col(self.text_col)).alias("_h"))
            .agg(F.min(self.id_col).alias(self.id_col))
            .select(self.id_col)
        )
        kept_exact = kept.join(F.broadcast(winners), self.id_col, "semi")

        # 3. near-dup probe against the stored index. exclude_batch_id makes
        # a REPLAYED batch see the pre-append index state even if the crash
        # left this batch's own rows behind (see module docstring).
        # Persisted: the probe feeds both the counter and the anti-join.
        dups = dedup_against_index(
            kept_exact,
            self.index_path,
            threshold=self.dedup_threshold,
            id_col=self.id_col,
            text_col=self.text_col,
            missing_ok=True,
            exclude_batch_id=batch_id,
        ).persist(StorageLevel.MEMORY_AND_DISK)

        # counting job 1 of 2: ONE union-aggregate collects every
        # pre-survivor counter and materializes the gate + probe caches
        counts = {
            r["_k"]: r
            for r in gated.agg(
                F.lit("gate").alias("_k"),
                F.count(F.lit(1)).cast("long").alias("a"),
                F.sum(
                    F.when(F.col("keep"), 0).otherwise(1)
                ).cast("long").alias("b"),
            )
            .unionByName(
                dups.agg(
                    F.lit("dups").alias("_k"),
                    F.count(F.lit(1)).cast("long").alias("a"),
                    F.lit(0).cast("long").alias("b"),
                )
            )
            .collect()
        }
        events_in = int(counts["gate"]["a"] or 0)
        gate_dropped = int(counts["gate"]["b"] or 0)
        neardup_dropped = int(counts["dups"]["a"] or 0)

        survivors = kept_exact.join(
            F.broadcast(dups.select(F.col("doc_id").alias(self.id_col))),
            self.id_col,
            "left_anti",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # counting job 2 of 2: materializes the survivor cache both sinks reuse
        appended = survivors.count()
        exact_dropped = events_in - gate_dropped - neardup_dropped - appended

        # 4. index append under the intent marker (idempotent)
        self._maybe_fail("before_index_append")
        minhash_index_append(
            survivors.select(self.id_col, self.text_col),
            self.index_path,
            id_col=self.id_col,
            text_col=self.text_col,
            batch_id=batch_id,
            params=self.index_params,
        )
        self._maybe_fail("after_index_append")

        # 5. table append commit (idempotent via committed_batch_ids)
        table = self._table(survivors)
        if batch_id not in table.committed_batch_ids():
            new_m = table.write_data_files(
                survivors, batch_id, range_partition_col=self.id_col
            )
            table.commit(
                batch_id,
                "append",
                keep_manifests=list(table.snapshot().manifests),
                new_manifests=new_m,
            )
        self._maybe_fail("after_table_commit")

        gated.unpersist()
        dups.unpersist()
        survivors.unpersist()
        seconds = time.time() - t0
        return {
            "batch_id": batch_id,
            "segments": segments or [],
            "events_in": int(events_in),
            "gate_dropped": int(gate_dropped),
            "exact_dup_dropped": int(exact_dropped),
            "neardup_dropped": int(neardup_dropped),
            "appended": int(appended),
            "seconds": round(seconds, 3),
        }

    # -- the loop ------------------------------------------------------------------

    def run_available(self, max_batches: "int | None" = None) -> "list[dict]":
        """Drain every feed segment visible at entry, checkpoint after each
        micro-batch (AFTER the table commit — a crash between the two
        replays the batch, which every step absorbs). Safe to kill at any
        point and re-run."""
        out: "list[dict]" = []
        state = self.ckpt.load()
        segs = _list_segments(self.feed_path)
        i = state["next_segment_idx"]
        batches = 0
        while i < len(segs):
            if max_batches is not None and batches >= max_batches:
                break
            batch = segs[i : i + self.max_files_per_batch]
            lineage = self.run_batch(batch)
            i += len(batch)
            batches += 1
            if lineage is not None:
                out.append(lineage)
                self.ckpt.append_lineage(lineage)
            state["next_segment_idx"] = i
            self.ckpt.save(state)
        return out

    def read_table(self) -> DataFrame:
        return IceboxTable.load(self.spark, self.table_path).read()


def run_structured_curation(
    pipeline: CurationPipeline, timeout_sec: float = 120.0
) -> "list[dict]":
    """Structured Streaming twin of :meth:`CurationPipeline.run_available`:
    a file-source tail of the feed directory feeding ``foreachBatch``
    into the SAME :meth:`~CurationPipeline.run_batch_df` plan.

    Spark's streaming checkpoint pins the file→batch assignment, so after
    a crash the restarted query re-presents IDENTICAL rows under the same
    epoch-derived batch_id — exactly the replay contract run_batch_df's
    marker + committed_batch_ids guards absorb. ``availableNow`` drains
    everything visible and stops, so repeated invocations are idempotent
    (a drained feed triggers zero epochs and appends nothing).

    The lineage list returned covers only THIS invocation's epochs; the
    durable record is the checkpoint's lineage log, same as the loop.
    """
    spark = pipeline.spark
    sample = spark.read.parquet(pipeline.feed_path)
    lineages: "list[dict]" = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        lineage = pipeline.run_batch_df(batch_df, f"ss-{epoch_id}")
        if lineage is not None:
            lineages.append(lineage)
            pipeline.ckpt.append_lineage(lineage)

    stream = (
        spark.readStream.schema(sample.schema)
        .option("maxFilesPerTrigger", pipeline.max_files_per_batch)
        .parquet(pipeline.feed_path + "/seg=*")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", pipeline.ckpt.dir + "/ss")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return lineages
