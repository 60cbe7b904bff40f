"""Training-shard export: the terminal sink of the curation pipeline.

After curate → dedup → mix → (optionally pack), a training corpus ships
as SIZE-BOUNDED SHARDS in a GLOBALLY SHUFFLED order — the layout data
loaders consume (each worker reads a disjoint shard subset sequentially;
global shuffle quality comes from the shard assignment, not loader RAM).

* :func:`assign_shards` — the pure, oracle-able part: every row gets
  ``(shard_id, pos_in_shard)`` from its global rank, either the row's own
  dense 0-based order column (packed sequences' ``seq_id``) or a
  reproducible hash shuffle (:func:`~kafka_connect_gcs_spark.operators
  .sampling.shuffle_corpus`) when ``seed`` is given.
* :func:`write_training_shards` — materializes one parquet file per
  shard, rows in ``pos_in_shard`` order, and returns the shard manifest.

Scale shape: rank assignment is packing's two-phase distributed scan
over a NARROW (key, hash) projection (one bucket-count collect, no
global window); ``shard_id``/``pos_in_shard`` are then pure row-local
arithmetic, and the write is ONE hash exchange on ``shard_id`` (each
shard lands wholly in one task, so ``partitionBy`` emits exactly one
file per shard regardless of how many shards share a task). Pick
``shard_size`` so a shard is a few hundred MB — at 10^10 rows that is
tens of thousands of shards, far past any driver-side bottleneck here
(the manifest is one row per shard, aggregated distributively).

No reference analog (the connector's chunked gzip writer is the BYTE
analog — sources/archive.py:185-238 implements that one); this is the
columnar training-data counterpart the engine adds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    shard_size: int,
    key_col: str = "doc_id",
    seed: "int | None" = None,
    portable: bool = False,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Adds ``shard_id`` (0-based) and ``pos_in_shard`` to every row:
    ``rank DIV shard_size`` / ``rank MOD shard_size`` over the row's
    global rank. With ``seed=None`` the rank IS ``key_col`` (caller
    promises a dense 0-based long — packed sequences' ``seq_id``); with a
    seed, the rank is :func:`~kafka_connect_gcs_spark.operators.sampling
    .shuffle_corpus`'s reproducible hash permutation of ``key_col``.

    Every shard is exactly ``shard_size`` rows except the last. The
    assignment is deterministic (retry/AQE/re-run stable) and, in
    portable mode, DuckDB-replayable:
    ``(row_number() OVER (ORDER BY hash, key) - 1)`` then DIV/MOD.
    """
    if shard_size <= 0:
        raise ValueError("shard_size must be positive")
    if seed is None:
        # the column IS the rank: require an integral type up front — a
        # silent cast of e.g. string keys would yield NULL ranks
        dtype = df.schema[key_col].dataType.simpleString()
        if dtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"seed=None uses {key_col!r} as the dense 0-based rank; "
                f"got type {dtype} — pass a seed to hash-shuffle instead"
            )
        ranked = df.withColumn("_rank", F.col(key_col).cast("long"))
    else:
        from kafka_connect_gcs_spark.operators.sampling import shuffle_corpus

        ranked = shuffle_corpus(
            df,
            key_col=key_col,
            seed=seed,
            portable=portable,
            out_col="_rank",
            num_partitions=num_partitions,
        )
    return ranked.select(
        *df.columns,
        (F.col("_rank") / shard_size).cast("long").alias("shard_id"),
        (F.col("_rank") % shard_size).cast("long").alias("pos_in_shard"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_size: int,
    key_col: str = "doc_id",
    seed: "int | None" = None,
    portable: bool = False,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Write ``df`` as ``path/shard_id=N/`` parquet shards of
    ``shard_size`` rows (last shard short), one file per shard, rows in
    ``pos_in_shard`` order within the file; returns the manifest
    ``(shard_id, n_rows)`` read back from what actually landed.

    ONE exchange: rows hash-partition on ``shard_id`` (a shard never
    splits across tasks, so the per-directory file count is exactly one)
    and sort within the task by (shard, pos). Re-running overwrites
    atomically per Spark's committer; the assignment is deterministic, so
    a re-run reproduces byte-identical shard membership.
    """
    shards = assign_shards(
        df,
        shard_size,
        key_col=key_col,
        seed=seed,
        portable=portable,
        num_partitions=num_partitions,
    )
    (
        shards.repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "pos_in_shard")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    spark = df.sparkSession
    return (
        spark.read.parquet(path)
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def read_training_shards(spark, path: str) -> DataFrame:
    """Read shards back in global order (shard_id, pos_in_shard) — the
    loader-side contract check used by tests."""
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    return spark.read.parquet(path).orderBy("shard_id", "pos_in_shard")
