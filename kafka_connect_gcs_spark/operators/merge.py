"""MERGE upsert: apply a deduplicated change batch to an icebox table.

The reference has no joins (SURVEY §2 Part B) — its "merge" is implicit:
replayed files overwrite identical keys (BlockGZIPFileWriter.java:161-167)
and offsets only move forward (GCSSourceTask.java:261-270). The new engine
makes that explicit as the one join it needs: changes ⟗ target on doc_id
inside copy-on-write of only the affected files.

Scale properties (the reasons this survives 100 TB):

* Both join sides are unique on doc_id (changes are LWW-deduped first, the
  table is keyed), so the shuffle is |keys|-bounded, not |events|-bounded,
  and a hot key cannot skew the join — skew was already absorbed by the
  map-side-combining dedup.
* Copy-on-write touches only data files whose (min,max doc_id) manifest
  range intersects the batch's key set — computed as a broadcast range join
  in Spark (manifests are tiny), never by collecting keys to the driver.
* Monotone offsets: a change only wins if ``offset >= target.last_offset``
  — late replays of old events are ignored (A26 max-merge), making apply
  order-insensitive and replay-safe.
* The merged batch is persisted once and serves three consumers (counter
  aggregation, the range partitioner's sampling pass, the file write) — one
  materialization of the join instead of three (reference gets its stats
  from a CountingOutputStream in the single write pass,
  BlockGZIPFileWriter.java:63-91).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_gcs_spark.config import EngineConfig
from kafka_connect_gcs_spark.icebox.table import Field, IceboxTable, ManifestEntry
from kafka_connect_gcs_spark.operators.dedup import lww_dedup

#: canonical CDC target-table schema (input_hint payload + LWW bookkeeping).
#: ``deleted`` rows are TOMBSTONES: a delete must keep its (doc_id,
#: last_offset) watermark in the table, otherwise a stale pre-delete update
#: arriving in a later micro-batch would resurrect the row — the cross-batch
#: form of the reference's never-move-backwards rule (GCSSourceTask.java:261-270).
#: Readers filter tombstones via :func:`read_state`.
CDC_TABLE_FIELDS = (
    Field("doc_id", "string"),
    Field("tokens", "array<int>"),
    Field("n_tok", "int"),
    Field("source", "string"),
    Field("last_offset", "long"),
    Field("deleted", "boolean"),
)


def read_state(table: IceboxTable, version: int | None = None) -> DataFrame:
    """The user-facing final table state: live rows only (no tombstones)."""
    return table.read(version).where(~F.col("deleted")).drop("deleted")


def prune_affected_files(
    spark: SparkSession,
    manifests: list[ManifestEntry],
    change_keys: DataFrame,
) -> list[str]:
    """Return the subset of data-file paths whose doc_id range may contain a
    changed key. Broadcast the (small) manifest list and range-join it with
    the distinct changed keys — distributed, driver only receives file paths.
    Files without stats are conservatively affected."""
    if not manifests:
        return []
    no_stats = [m.path for m in manifests if m.min_doc_id is None]
    ranged = [m for m in manifests if m.min_doc_id is not None]
    if not ranged:
        return no_stats
    ranges = spark.createDataFrame(
        [(m.path, m.min_doc_id, m.max_doc_id) for m in ranged],
        T.StructType(
            [
                T.StructField("path", T.StringType()),
                T.StructField("lo", T.StringType()),
                T.StructField("hi", T.StringType()),
            ]
        ),
    )
    hit = (
        change_keys.select("doc_id")
        .distinct()
        .join(
            F.broadcast(ranges),
            (F.col("doc_id") >= F.col("lo")) & (F.col("doc_id") <= F.col("hi")),
            "inner",
        )
        .select("path")
        .distinct()
    )
    return no_stats + [r.path for r in hit.collect()]


def apply_changes(target: DataFrame, deduped: DataFrame) -> DataFrame:
    """changes ⟗ target on doc_id with LWW/monotone-offset resolution.

    deduped: one row per doc_id with (op, tokens, n_tok, source, offset).
    target:  CDC_TABLE_FIELDS rows.
    Returns the new state of the covered key space, with bookkeeping flags
    ``_ins/_upd/_del`` for observation (select them away before writing).
    """
    c = deduped.select(
        F.col("doc_id"),
        F.col("op").alias("_c_op"),
        F.col("tokens").alias("_c_tokens"),
        F.col("n_tok").alias("_c_n_tok"),
        F.col("source").alias("_c_source"),
        F.col("offset").alias("_c_offset"),
    )
    t = target.select(
        F.col("doc_id"),
        F.col("tokens").alias("_t_tokens"),
        F.col("n_tok").alias("_t_n_tok"),
        F.col("source").alias("_t_source"),
        F.col("last_offset").alias("_t_offset"),
        F.col("deleted").alias("_t_deleted"),
    )
    j = t.join(c, "doc_id", "full_outer")
    change_wins = F.col("_c_op").isNotNull() & (
        F.col("_t_offset").isNull() | (F.col("_c_offset") >= F.col("_t_offset"))
    )
    is_delete = change_wins & (F.col("_c_op") == "D")
    was_live = F.col("_t_offset").isNotNull() & ~F.coalesce(
        F.col("_t_deleted"), F.lit(False)
    )
    is_insert = change_wins & (F.col("_c_op") != "D") & ~was_live
    is_update = change_wins & (F.col("_c_op") != "D") & was_live
    merged = j.select(
        "doc_id",
        F.when(change_wins & ~is_delete, F.col("_c_tokens"))
        .when(~change_wins, F.col("_t_tokens"))
        .alias("tokens"),
        F.when(change_wins & ~is_delete, F.col("_c_n_tok"))
        .when(~change_wins, F.col("_t_n_tok"))
        .alias("n_tok"),
        F.when(change_wins & ~is_delete, F.col("_c_source"))
        .when(~change_wins, F.col("_t_source"))
        .alias("source"),
        F.when(change_wins, F.col("_c_offset")).otherwise(F.col("_t_offset")).alias("last_offset"),
        F.when(change_wins, is_delete)
        .otherwise(F.coalesce(F.col("_t_deleted"), F.lit(False)))
        .alias("deleted"),
        is_insert.alias("_ins"),
        is_update.alias("_upd"),
        (is_delete & was_live).alias("_del"),
        (F.col("_t_offset").isNotNull() & ~change_wins & F.col("_c_op").isNotNull()).alias("_stale"),
    )
    # tombstones stay in the output (they carry the LWW watermark across
    # batches); read_state() filters them for consumers.
    return merged


def merge_into(
    table: IceboxTable,
    changes: DataFrame,
    batch_id: str,
    config: EngineConfig | None = None,
) -> dict:
    """End-to-end exactly-once MERGE of a raw change batch.

    Returns the lineage/metrics dict that was committed with the snapshot
    (per-partition offsets, row counters, events/sec — A19/A29 analogs).
    Re-delivery of an already-committed batch_id is a committed no-op.
    """
    cfg = config or EngineConfig()
    spark = table.spark
    if batch_id in table.committed_batch_ids():
        return {"batch_id": batch_id, "skipped": True}

    t0 = time.time()
    # --- per-partition lineage over the raw (pre-dedup) batch --------------
    has_part = "part" in changes.columns
    lineage_rows = (
        changes.groupBy("part" if has_part else F.lit(0).alias("part"))
        .agg(
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
            F.count(F.lit(1)).alias("events"),
        )
        .collect()
    )
    events_in = sum(r.events for r in lineage_rows)

    # --- dedup (skew-absorbing) + affected-file pruning ----------------------
    deduped = lww_dedup(changes.drop("part", "seg") if has_part else changes)
    snap = table.snapshot()
    affected = set(
        prune_affected_files(spark, list(snap.manifests), deduped.select("doc_id"))
    )
    keep = [m for m in snap.manifests if m.path not in affected]
    touched = [m for m in snap.manifests if m.path in affected]

    target = table._read_entries(
        table.metadata(), touched, table.schema()
    )
    merged = apply_changes(target, deduped)

    # Persist the merged batch: the write path range-partitions by doc_id,
    # and RangePartitioner's boundary *sampling pass* executes the child plan
    # a second time — an Observation here would double-count (verified), and
    # without a cache the expensive join itself would run twice. One
    # materialization serves the counter agg, the sampling pass, and the
    # write. (The reference gets stats for free from its CountingOutputStream,
    # BlockGZIPFileWriter.java:63-91 — this cache is our single-pass analog.)
    from pyspark import StorageLevel

    merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
    crow = merged.agg(
        F.count(F.lit(1)).alias("rows_out"),
        F.sum(F.col("_ins").cast("long")).alias("inserted"),
        F.sum(F.col("_upd").cast("long")).alias("updated"),
        F.sum(F.col("_del").cast("long")).alias("deleted"),
        F.sum(F.col("_stale").cast("long")).alias("stale_ignored"),
        F.sum((~F.col("deleted")).cast("long")).alias("live_rows"),
    ).first()
    counters = crow.asDict()
    out = merged.drop("_ins", "_upd", "_del", "_stale")
    new_manifests = table.write_data_files(
        out, batch_id, num_partitions=cfg.shuffle_partitions
    )
    merged.unpersist()

    # exact per-file live counts for the new files: a column-pruned scan of
    # one boolean column over just-written data (batch-sized, not table-sized)
    import dataclasses

    if new_manifests:
        import os as _os

        paths = [_os.path.join(table.root, m.path) for m in new_manifests]
        live_by_file = {
            r.f: r.live
            for r in spark.read.parquet(*paths)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.sum((~F.col("deleted")).cast("long")).alias("live"))
            .collect()
        }

        def _live(m: ManifestEntry) -> int:
            for k, v in live_by_file.items():
                if k.endswith(m.path):
                    return int(v)
            return m.num_records

        new_manifests = [
            dataclasses.replace(m, num_live=_live(m)) for m in new_manifests
        ]
    table_live_rows = sum(
        (m.num_live if m.num_live is not None else m.num_records)
        for m in list(keep) + list(new_manifests)
    )
    secs = time.time() - t0
    lineage = {
        "batch_id": batch_id,
        "events_in": events_in,
        "partitions": {
            str(r.part): {
                "min_offset": r.min_offset,
                "max_offset": r.max_offset,
                "events": r.events,
            }
            for r in lineage_rows
        },
        "rows_out": counters.get("rows_out", 0),
        "live_rows": counters.get("live_rows") or 0,
        "table_live_rows": table_live_rows,
        "inserted": counters.get("inserted") or 0,
        "updated": counters.get("updated") or 0,
        "deleted": counters.get("deleted") or 0,
        "stale_ignored": counters.get("stale_ignored") or 0,
        "files_rewritten": len(touched),
        "files_kept": len(keep),
        "files_written": len(new_manifests),
        "seconds": round(secs, 3),
        "events_per_sec": round(events_in / secs, 1) if secs > 0 else None,
    }
    table.commit(
        batch_id=batch_id,
        operation="merge",
        keep_manifests=keep,
        new_manifests=new_manifests,
        lineage=lineage,
    )
    return lineage
