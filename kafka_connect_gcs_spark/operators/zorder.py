"""Z-order (Morton-curve) data layout for multi-column scan pruning.

A 100 TB table is pruned by file-level min/max statistics (our icebox
manifests carry them — icebox/table.py — exactly like the reference's
chunk index carries per-chunk key ranges, GCSObjectIndex). Sorting files
by ONE column makes that column's ranges tight and every other column's
ranges useless; interleaving the bits of several columns (the Morton /
Z-order curve — the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``)
makes EVERY indexed column's per-file range narrow, so a predicate on any
of them skips most files.

Everything here is exact integer arithmetic (affine quantization with
integer division, explicit shift/mask bit interleave), so the curve is
bit-identical across engines — the driver oracle replays it in DuckDB —
and deterministic under retries/AQE.

Scale shape: one bounded min/max aggregate (broadcast back as a 1-row
join, never a driver constant), then the z-key is a pure map-side
projection; the layout write is ``repartitionByRange(z)`` +
``sortWithinPartitions(z)`` — one range exchange, the floor for any
global re-clustering. Nothing per-row ever runs in Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(qcols: list[Column], bits: int) -> Column:
    """Morton-interleave pre-quantized non-negative ints (< 2**bits):
    bit b of column i lands at position ``b*n + i``. Unrolled
    shift/mask/shift terms stay inside whole-stage codegen."""
    n = len(qcols)
    terms = []
    for b in range(bits):
        for i, q in enumerate(qcols):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + i))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "z",
) -> DataFrame:
    """Append the z-key for integral columns ``cols``.

    Quantization is ``(v - min) * (2**bits - 1) DIV max(max - min, 1)``
    — exact int64 math (inputs must leave headroom: |range| * 2**bits
    must fit in int64, true for any real key/date/epoch column at
    bits ≤ 16). Min/max are computed in-plan and broadcast.
    """
    mm = df.agg(
        *[F.min(c).cast("long").alias(f"_zmin_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"_zmax_{i}") for i, c in enumerate(cols)],
    )
    top = (1 << bits) - 1
    staged = df.join(F.broadcast(mm))
    for i, c in enumerate(cols):
        staged = staged.withColumn(
            f"_znum_{i}",
            (F.col(c).cast("long") - F.col(f"_zmin_{i}")) * F.lit(top),
        ).withColumn(
            f"_zrng_{i}",
            F.greatest(F.col(f"_zmax_{i}") - F.col(f"_zmin_{i}"), F.lit(1)),
        )
    qcols = [
        F.expr(f"_znum_{i} div _zrng_{i}") for i in range(len(cols))
    ]
    out = staged.withColumn(out_col, interleave_bits(qcols, bits))
    drop = [f"_z{p}_{i}" for i in range(len(cols)) for p in ("min", "max", "num", "rng")]
    return out.drop(*drop)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_files: int = 64,
) -> DataFrame:
    """Re-cluster ``df`` along the z-curve: range-partition on the z-key
    (one sampled range exchange → equal-sized output files) and sort
    within partitions, so every file's min/max stats are tight on ALL of
    ``cols``. Feed the result straight to the icebox/parquet writer."""
    keyed = with_zorder_key(df, cols, bits=bits)
    return keyed.repartitionByRange(num_files, F.col("z")).sortWithinPartitions("z")


def zorder_bucket_stats(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_buckets: int = 16,
) -> DataFrame:
    """Deterministic clustering audit: equal-WIDTH buckets of the z-space
    (``z * num_buckets DIV 2**(bits·n)`` — no sampling, so the oracle can
    replay it) with per-bucket row counts and per-column min/max. Narrow
    ranges on every column in every bucket ⇒ file skipping works on every
    column. ``pruning_cost(stats, col, lo, hi)`` over this output is the
    fraction of rows a range predicate must actually scan."""
    span = 1 << (bits * len(cols))
    width = max(span // num_buckets, 1)
    keyed = with_zorder_key(df, cols, bits=bits)
    keyed = keyed.withColumn("_zb", F.expr(f"z div {width}"))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).cast("long").alias(f"min_{c}"))
        aggs.append(F.max(c).cast("long").alias(f"max_{c}"))
    return keyed.groupBy(F.col("_zb").alias("bucket")).agg(*aggs)
