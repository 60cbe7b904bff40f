"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin a few-partition input across the cluster's cores.

    Map-heavy per-document operators (gram hashing, signature computation,
    feature explosion) are embarrassingly parallel, but a small table often
    arrives as one or two parquet files — one task would do all the work.
    At real scale inputs already have many partitions and this is a no-op
    (the ``getNumPartitions`` probe is driver-side metadata, not a job).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
