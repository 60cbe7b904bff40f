"""Table maintenance: small-file compaction and tombstone expiry.

The reference bounds file sizes at write time (chunk rotation,
BlockGZIPFileWriter.java:191-200) but never rewrites; a long-running CDC
table needs both of these or micro-batch COW slowly shreds it:

* :func:`compact` — bin-pack adjacent small data files (manifests are
  sorted by min_doc_id, so adjacency = contiguous key ranges) into
  target-size files. Commit is a normal snapshot (batch_id
  ``compact-{v}``), so time travel to pre-compaction versions still works
  and a replayed compaction is a no-op.
* :func:`expire_tombstones` — tombstones exist to carry the LWW watermark
  across batches (merge.py); once the feed's per-partition offsets have all
  advanced past a tombstone's last_offset + the out-of-order horizon, no
  stale pre-delete update can still arrive, and the tombstone can be
  physically dropped.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_connect_gcs_spark.icebox.table import IceboxTable, ManifestEntry


def plan_compaction(
    entries: list[ManifestEntry],
    target_bytes: int,
    min_group: int = 2,
) -> list[list[ManifestEntry]]:
    """Group adjacent (in key order) sub-target files into compaction bins."""
    ordered = sorted(entries, key=lambda m: (m.min_doc_id or "", m.path))
    groups: list[list[ManifestEntry]] = []
    cur: list[ManifestEntry] = []
    cur_bytes = 0
    for m in ordered:
        if m.num_bytes >= target_bytes:
            if len(cur) >= min_group:
                groups.append(cur)
            cur, cur_bytes = [], 0
            continue
        cur.append(m)
        cur_bytes += m.num_bytes
        if cur_bytes >= target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
    if len(cur) >= min_group:
        groups.append(cur)
    return groups


def compact(
    table: IceboxTable,
    target_bytes: int = 64 * 1024 * 1024,
    sort_col: str = "doc_id",
) -> dict:
    """Rewrite groups of small adjacent files into target-size files.
    Pure metadata + batch-sized rewrites; untouched files are kept as-is."""
    snap = table.snapshot()
    groups = plan_compaction(list(snap.manifests), target_bytes)
    if not groups:
        return {"compacted_files": 0, "groups": 0, "skipped": True}
    to_rewrite = [m for g in groups for m in g]
    rewrite_set = {m.path for m in to_rewrite}
    keep = [m for m in snap.manifests if m.path not in rewrite_set]
    # reconciled read: compaction also PURGES rows superseded by delete
    # vectors from the rewritten files (the DVs stay for the kept files)
    df = table.apply_deletes(
        table._read_entries(table.metadata(), to_rewrite, table.schema()),
        snap.deletes,
    )
    batch_id = f"compact-v{table.current_version()}"
    if batch_id in table.committed_batch_ids():
        return {"compacted_files": 0, "groups": 0, "skipped": True}
    rows_est = sum(m.num_records for m in to_rewrite)
    new_manifests = table.write_data_files(
        df,
        batch_id,
        sort_within=(sort_col,),
        range_partition_col=sort_col,
        num_partitions=max(len(groups), 1),
        bloom_ndv=min(2_000_000, max(1024, rows_est // max(len(groups), 1))),
    )
    # dead-row accounting from footers alone: the only rows a compaction
    # drops are DV-superseded ones, so live_before − live_after = purged dead
    mor_dead = table.mor_dead_rows()
    if snap.deletes and all(m.num_live is not None for m in to_rewrite):
        purged = sum(m.num_live for m in to_rewrite) - sum(
            (m.num_live or 0) for m in new_manifests
        )
        mor_dead = max(0, mor_dead - max(0, purged))
    lineage = {
        "compacted_files": len(to_rewrite),
        "groups": len(groups),
        "files_written": len(new_manifests),
        "bytes_in": sum(m.num_bytes for m in to_rewrite),
        "bytes_out": sum(m.num_bytes for m in new_manifests),
    }
    table.commit(
        batch_id=batch_id,
        operation="compact",
        keep_manifests=keep,
        new_manifests=new_manifests,
        lineage=lineage,
        mor_dead_rows=mor_dead,
    )
    return lineage


def fold_deletes(table: IceboxTable, sort_col: str = "doc_id") -> dict:
    """Fold ALL delete vectors into the data files: rewrite (reconciled)
    every data file whose key range overlaps a DV manifest's key range, then
    drop the DVs. Afterwards reads pay no reconciliation join and
    ``mor_dead_rows`` is zero.

    Correctness of the pruning: a DV-superseded row's doc_id lies inside
    some DV file's (min,max doc_id), so its data file's key range overlaps
    that DV manifest — rewriting exactly the overlapping files covers every
    dead row (files without stats rewrite conservatively)."""
    snap = table.snapshot()
    if not snap.deletes:
        return {"folded_dvs": 0, "files_rewritten": 0, "skipped": True}
    affected = [
        m
        for m in snap.manifests
        if any(
            d.min_doc_id is None
            or m.overlaps_keys(d.min_doc_id, d.max_doc_id)
            for d in snap.deletes
        )
    ]
    keep = [m for m in snap.manifests if m.path not in {a.path for a in affected}]
    batch_id = f"fold-dv-v{table.current_version()}"
    if batch_id in table.committed_batch_ids():
        return {"folded_dvs": 0, "files_rewritten": 0, "skipped": True}
    df = table.apply_deletes(
        table._read_entries(table.metadata(), affected, table.schema()),
        snap.deletes,
    )
    new_manifests = table.write_data_files(
        df, batch_id, sort_within=(sort_col,), range_partition_col=sort_col,
        bloom_ndv=min(
            2_000_000,
            max(1024, sum(m.num_records for m in affected) // 8 or 1024),
        ),
    )
    lineage = {
        "folded_dvs": len(snap.deletes),
        "dv_rows": sum(d.num_records for d in snap.deletes),
        "files_rewritten": len(affected),
        "files_written": len(new_manifests),
    }
    table.commit(
        batch_id=batch_id,
        operation="fold-deletes",
        keep_manifests=keep,
        new_manifests=new_manifests,
        lineage=lineage,
        keep_deletes=(),  # all folded
        new_deletes=(),
        mor_dead_rows=0,
    )
    return lineage


def expire_snapshots(table: IceboxTable, keep_last: int = 10) -> dict:
    """Metadata + storage reclamation: drop snapshot versions older than the
    newest ``keep_last`` and physically delete every data/DV file no kept
    version references. Also sweeps crash orphans (files written by a batch
    whose commit never happened — the pointer is truth, so they were never
    visible) and stray ``.inprogress`` temps.

    The analog of Iceberg's expireSnapshots + removeOrphanFiles; without it
    a long-running CDC table's COW rewrites retain every historical file
    forever. Time travel keeps working for the kept versions; the replay
    guard (committed_batch_ids) lives in current metadata and is unaffected.
    Single-writer assumption: run from the writer process, like the rest of
    the commit protocol."""
    import shutil

    current = table.current_version()
    cutoff = max(current - keep_last + 1, 0)
    kept_versions = [
        v
        for v in range(cutoff, current + 1)
        if os.path.exists(table._meta_path(v))
    ]
    referenced: set[str] = set()
    for v in kept_versions:
        snap = table.snapshot(v)
        referenced.update(m.path for m in snap.manifests)
        referenced.update(m.path for m in snap.deletes)

    versions_removed = 0
    for v in range(cutoff):
        p = table._meta_path(v)
        if os.path.exists(p):
            os.remove(p)
            versions_removed += 1

    files_removed = 0
    bytes_removed = 0
    for base in ("data", "deletes"):
        base_dir = os.path.join(table.root, base)
        if not os.path.isdir(base_dir):
            continue
        for dirpath, _dirs, files in os.walk(base_dir):
            for fn in files:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, table.root)
                if rel in referenced:
                    continue
                # parquet writer success markers etc. stay with their dir;
                # everything unreferenced (incl. crash orphans and
                # .inprogress temps) goes
                if fn.startswith("_") and any(
                    os.path.relpath(os.path.join(dirpath, f), table.root)
                    in referenced
                    for f in files
                ):
                    continue  # marker of a still-referenced directory
                bytes_removed += os.path.getsize(full)
                os.remove(full)
                files_removed += 1
        # prune now-empty batch dirs
        for dirpath, dirs, files in list(os.walk(base_dir, topdown=False)):
            if dirpath != base_dir and not dirs and not files:
                shutil.rmtree(dirpath, ignore_errors=True)
    return {
        "versions_removed": versions_removed,
        "files_removed": files_removed,
        "bytes_removed": bytes_removed,
        "kept_versions": kept_versions,
    }


def expire_tombstones(
    table: IceboxTable,
    safe_offset: int,
    sort_col: str = "doc_id",
) -> dict:
    """Drop tombstones with ``last_offset < safe_offset``.

    ``safe_offset`` must be ≤ min over feed partitions of (checkpointed
    offset) − out-of-order horizon: past it, no stale pre-delete update can
    still be delivered, so losing the watermark is safe. Only files that
    actually contain expirable tombstones are rewritten (manifest num_live
    vs num_records tells us without reading data)."""
    snap = table.snapshot()
    affected = [
        m
        for m in snap.manifests
        if (m.num_live is not None and m.num_live < m.num_records)
        and (m.min_offset is None or m.min_offset < safe_offset)
    ]
    if not affected:
        return {"expired": 0, "files_rewritten": 0, "skipped": True}
    keep = [m for m in snap.manifests if m.path not in {a.path for a in affected}]
    df = table._read_entries(table.metadata(), affected, table.schema())
    # tombstones at/after safe_offset stay; live rows always stay
    kept_rows = df.where(
        (~F.coalesce(F.col("deleted"), F.lit(False)))
        | (F.col("last_offset") >= F.lit(safe_offset))
    )
    batch_id = f"expire-v{table.current_version()}-{safe_offset}"
    if batch_id in table.committed_batch_ids():
        return {"expired": 0, "files_rewritten": 0, "skipped": True}
    new_manifests = table.write_data_files(
        kept_rows, batch_id, sort_within=(sort_col,), range_partition_col=sort_col
    )
    rows_before = sum(m.num_records for m in affected)
    rows_after = sum(m.num_records for m in new_manifests)
    lineage = {
        "expired": rows_before - rows_after,
        "files_rewritten": len(affected),
        "safe_offset": safe_offset,
    }
    table.commit(
        batch_id=batch_id,
        operation="expire-tombstones",
        keep_manifests=keep,
        new_manifests=new_manifests,
        lineage=lineage,
    )
    return lineage
