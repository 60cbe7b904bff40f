"""Incremental near-dup dedup against a STORED minhash signature index.

The batch-vs-lake pattern a 100 TB ingest pipeline actually needs: lake
signatures are computed ONCE at index-build time (cost ∝ corpus, amortized
like :func:`~kafka_connect_gcs_spark.operators.similarity.ivf_write`'s
centroid store), and each incoming micro-batch then dedups against the
index at cost ∝ batch:

* the batch's banded bucket keys are BROADCAST against the index scan, so
  the (huge) index side never shuffles — candidate generation is a
  map-side join over ``buckets/``;
* similarity is the minhash signature agreement (an unbiased Jaccard
  estimate, the same statistic ``minhash_lsh_pairs`` uses as its
  prefilter) — no shingle sets are stored or re-read, keeping the index
  at H longs per doc.

Index layout (self-describing — readers take parameters from the index,
never from call sites, so a drifting config can't silently mis-bucket):

    {path}/params.json      num_hashes / bands / shingle_n / portable
                            / bucket_parts
    {path}/sigs/            (doc_id, sig array<long>)         parquet
    {path}/buckets/         (doc_id, band, bucket)            parquet,
                            hash-partitioned by bucket_part =
                            xxhash64(bucket) % bucket_parts so probes
                            prune files (absent in legacy indexes →
                            full scan, still correct)

No reference analog (the connector stores byte records); part of the
training-data-pipeline surface built on top.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.dedup_text import (
    _minhash_of_shingles,
    staged_shingles,
)


def _band_bucket(sig_col, bidx: int, rows_per_band: int, portable: bool):
    """Same bucket derivation as minhash_lsh_pairs: portable → the band's
    sig values joined ':' (DuckDB-reproducible), else one xxhash64."""
    members = [
        F.element_at(sig_col, bidx * rows_per_band + r + 1)
        for r in range(rows_per_band)
    ]
    if portable:
        return F.concat_ws(":", *[m.cast("string") for m in members])
    return F.xxhash64(F.lit(bidx), *members).cast("string")


def banded_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    portable: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig, band, bucket) — ``bands`` rows per document."""
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("bands must divide num_hashes")
    # words → shingles → sig in STAGED projections: inlining the shingle
    # expression into the 16 minhash lanes re-tokenizes each doc per lane
    # (interpreted HOFs have no CSE) — measured 11× slower
    base = staged_shingles(df, id_col, text_col, shingle_n).select(
        F.col(id_col).alias("doc_id"),
        _minhash_of_shingles(F.col("sh"), num_hashes, portable).alias("sig"),
    )
    return base.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_bucket(F.col("sig"), b, rows_per_band, portable)
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))


def _params_path(path: str) -> str:
    return os.path.join(path, "params.json")


def minhash_index_write(
    df: DataFrame,
    path: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    portable: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_parts: int = 64,
) -> dict:
    """Build (overwrite) the signature index for a corpus. Returns the
    stored params.

    ``bucket_parts`` hash-partitions ``buckets/`` on disk by
    ``xxhash64(bucket) % bucket_parts`` so a probe can statically prune
    index files to the partitions its batch actually touches (the same
    write-time trick ``ivf_write`` uses with centroid partitions). Stored
    in params.json like every other layout parameter; 0 disables."""
    params = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "portable": portable,
        "bucket_parts": bucket_parts,
    }
    _write_index_rows(df, path, params, id_col, text_col, mode="overwrite")
    os.makedirs(path, exist_ok=True)
    tmp = _params_path(path) + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, _params_path(path))
    return params


def minhash_index_append(
    df: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Append a (deduplicated) batch to an existing index — incremental
    maintenance: after dedup keeps a batch's survivors, index them so the
    NEXT batch dedups against them too. Params come from the index."""
    params = read_index_params(path)
    _write_index_rows(df, path, params, id_col, text_col, mode="append")
    return params


def read_index_params(path: str) -> dict:
    with open(_params_path(path)) as f:
        return json.load(f)


def _bucket_part(bucket_parts: int):
    return F.pmod(F.xxhash64(F.col("bucket")), F.lit(bucket_parts))


def _write_index_rows(df, path, params, id_col, text_col, mode: str) -> None:
    bucket_parts = params.get("bucket_parts", 0)
    sig_params = {k: v for k, v in params.items() if k != "bucket_parts"}
    banded = banded_signatures(
        df, id_col=id_col, text_col=text_col, **sig_params
    )
    from pyspark import StorageLevel

    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    # sigs stored once per doc (band rows all carry the same sig)
    banded.where(F.col("band") == 0).select("doc_id", "sig").write.mode(
        mode
    ).parquet(os.path.join(path, "sigs"))
    buckets = banded.select("doc_id", "band", "bucket")
    writer = buckets.write.mode(mode)
    if bucket_parts:
        writer = buckets.withColumn(
            "bucket_part", _bucket_part(bucket_parts)
        ).write.mode(mode).partitionBy("bucket_part")
    writer.parquet(os.path.join(path, "buckets"))
    banded.unpersist()


def signature_agreement(a, b, num_hashes: int):
    """Fraction of agreeing minhash lanes — an unbiased Jaccard estimate."""
    return F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda v: v)) / float(
        num_hashes
    )


def dedup_against_index(
    new_docs: DataFrame,
    path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_broadcast_rows: int = 4_000_000,
    eager: bool = True,
) -> DataFrame:
    """(doc_id, dup_of, est_jaccard) — for each NEW doc whose best index
    match has signature agreement ≥ threshold: the matched corpus doc (ties
    → highest estimate, then smallest dup_of). New docs with no match are
    absent (callers keep them). A doc whose own id is already indexed
    (re-delivery) never matches itself.

    Scale shape: the (huge) index side is never shuffled when the batch is
    small — both joins broadcast the batch-derived side, and an index
    written with ``bucket_parts`` lets the probe statically prune
    ``buckets/`` files to the batch's bucket partitions before the join.
    Broadcast is SIZE-GATED: a batch whose banded relation exceeds
    ``max_broadcast_rows`` (counted, not guessed — the relation is cached
    for the probe anyway) falls back to a shuffle join instead of pushing
    an over-limit broadcast through the driver. The returned result is
    eagerly materialized (it is ≤ one row per batch doc) so the temporary
    caches are released before returning — per-micro-batch callers don't
    accumulate cached relations.

    Tie-break is type-agnostic: ``min_by`` over ``(-est, old_id)`` takes
    the highest estimate then the smallest ``old_id`` under the column's
    natural ordering (strings included — no numeric negation of the id).

    ``eager=False`` returns the lazy probe plan instead (for plan
    inspection / composition); the temporary caches are then left to the
    returned plan's lifetime and LRU eviction."""
    spark = new_docs.sparkSession
    params = read_index_params(path)
    bucket_parts = params.get("bucket_parts", 0)
    sig_params = {k: v for k, v in params.items() if k != "bucket_parts"}
    new_b = banded_signatures(
        new_docs, id_col=id_col, text_col=text_col, **sig_params
    )
    from pyspark import StorageLevel

    new_b = new_b.persist(StorageLevel.MEMORY_AND_DISK)
    # ONE batch-scale job: materialize the cache, count it for the broadcast
    # gate, and collect the distinct bucket partitions the batch touches
    # (≤ bucket_parts values) for static file pruning on the index scan
    part_expr = (
        _bucket_part(bucket_parts) if bucket_parts else F.lit(0)
    ).alias("_p")
    stats = new_b.groupBy(part_expr).agg(F.count(F.lit(1)).alias("c")).collect()
    n_banded = sum(r["c"] for r in stats)
    small = n_banded <= max_broadcast_rows

    idx_buckets = spark.read.parquet(os.path.join(path, "buckets"))
    if bucket_parts:
        touched = [r["_p"] for r in stats]
        idx_buckets = idx_buckets.where(F.col("bucket_part").isin(touched))
    probe = new_b.select("band", "bucket", F.col("doc_id").alias("_new_id"))
    cand = (
        idx_buckets.join(
            F.broadcast(probe) if small else probe, ["band", "bucket"]
        )
        .where(F.col("doc_id") != F.col("_new_id"))
        .select(F.col("_new_id").alias("new_id"), F.col("doc_id").alias("old_id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # candidate pairs are bounded by the batch's bucket collisions, not the
    # corpus — but a hot bucket can inflate them, so gate on the REAL count
    # (the count also materializes the cache; the index is scanned once)
    cand_small = cand.count() <= max_broadcast_rows
    idx_sigs = spark.read.parquet(os.path.join(path, "sigs"))
    new_sigs = new_b.where(F.col("band") == 0).select(
        F.col("doc_id").alias("new_id"), F.col("sig").alias("_new_sig")
    )
    est = (
        idx_sigs.withColumnRenamed("doc_id", "old_id")
        .join(F.broadcast(cand) if cand_small else cand, "old_id")
        .join(F.broadcast(new_sigs) if small else new_sigs, "new_id")
        .select(
            "new_id",
            "old_id",
            F.round(
                signature_agreement(
                    F.col("sig"), F.col("_new_sig"), params["num_hashes"]
                ),
                6,
            ).alias("est"),
        )
        .where(F.col("est") >= threshold)
    )
    best = est.groupBy("new_id").agg(
        F.min_by(
            F.struct(F.col("old_id"), F.col("est")),
            F.struct((-F.col("est")).alias("neg_est"), F.col("old_id")),
        ).alias("b")
    )
    out = best.select(
        F.col("new_id").alias("doc_id"),
        F.col("b.old_id").alias("dup_of"),
        F.col("b.est").alias("est_jaccard"),
    )
    if not eager:
        return out
    out = out.localCheckpoint(eager=True)
    new_b.unpersist()
    cand.unpersist()
    return out
