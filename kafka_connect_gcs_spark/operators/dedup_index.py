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
    {path}/sigs/            (doc_id, sig array<long>)         parquet
    {path}/buckets/         (doc_id, band, bucket)            parquet

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
    word_shingles,
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
    base = df.select(
        F.col(id_col).alias("doc_id"),
        _minhash_of_shingles(
            word_shingles(F.col(text_col), shingle_n), num_hashes, portable
        ).alias("sig"),
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
) -> dict:
    """Build (overwrite) the signature index for a corpus. Returns the
    stored params."""
    params = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "portable": portable,
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


def _write_index_rows(df, path, params, id_col, text_col, mode: str) -> None:
    banded = banded_signatures(
        df, id_col=id_col, text_col=text_col, **params
    )
    from pyspark import StorageLevel

    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    # sigs stored once per doc (band rows all carry the same sig)
    banded.where(F.col("band") == 0).select("doc_id", "sig").write.mode(
        mode
    ).parquet(os.path.join(path, "sigs"))
    banded.select("doc_id", "band", "bucket").write.mode(mode).parquet(
        os.path.join(path, "buckets")
    )
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
) -> DataFrame:
    """(doc_id, dup_of, est_jaccard) — for each NEW doc whose best index
    match has signature agreement ≥ threshold: the matched corpus doc (ties
    → highest estimate, then smallest dup_of). New docs with no match are
    absent (callers keep them). A doc whose own id is already indexed
    (re-delivery) never matches itself.

    Scale shape: both joins broadcast the BATCH side, so the index scan is
    map-only — per-poll cost ∝ batch size, never ∝ corpus size."""
    spark = new_docs.sparkSession
    params = read_index_params(path)
    new_b = banded_signatures(
        new_docs, id_col=id_col, text_col=text_col, **params
    )
    from pyspark import StorageLevel

    new_b = new_b.persist(StorageLevel.MEMORY_AND_DISK)
    idx_buckets = spark.read.parquet(os.path.join(path, "buckets"))
    cand = (
        idx_buckets.join(
            F.broadcast(
                new_b.select(
                    "band", "bucket", F.col("doc_id").alias("_new_id")
                )
            ),
            ["band", "bucket"],
        )
        .where(F.col("doc_id") != F.col("_new_id"))
        .select(F.col("_new_id").alias("new_id"), F.col("doc_id").alias("old_id"))
        .distinct()
    )
    idx_sigs = spark.read.parquet(os.path.join(path, "sigs"))
    new_sigs = new_b.where(F.col("band") == 0).select(
        F.col("doc_id").alias("new_id"), F.col("sig").alias("_new_sig")
    )
    est = (
        cand.join(idx_sigs.withColumnRenamed("doc_id", "old_id"), "old_id")
        .join(F.broadcast(new_sigs), "new_id")
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
        F.max_by(
            F.struct(F.col("old_id"), F.col("est")),
            F.struct(F.col("est"), (-F.col("old_id")).alias("neg")),
        ).alias("b")
    )
    return best.select(
        F.col("new_id").alias("doc_id"),
        F.col("b.old_id").alias("dup_of"),
        F.col("b.est").alias("est_jaccard"),
    )
