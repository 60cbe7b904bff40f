"""As-of join and gap sessionization — time-series operators Spark lacks
as built-ins, composed from existing DataFrame ops (SURVEY's "custom
operators" rule: composition first, Pandas UDF only if semantics demand).

* :func:`asof_join` — for each left row, the single right row with the
  largest ``right_ts <= left_ts`` within the same key (classic backward
  as-of). Two physical strategies:
    - "union" (default): tag both sides, union, per-key sort by ts, and a
      running last-right carry via window ``last(..., ignorenulls)`` — ONE
      shuffle on the key, no range join, no row explosion; robust to keys
      with many rows on both sides. This is the strategy kdb/DuckDB use
      conceptually (merge by time within key).
    - "range": inequality join + max_by — simple, but |left|×|right-per-key|
      intermediate; only sane when the right side is small/broadcastable.
* :func:`sessionize` — gap-based session ids per key: session starts where
  ``ts - lag(ts) > gap`` ; id = running sum of starts. One window, one
  shuffle; the batch analog of Structured Streaming session windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    strategy: str = "union",
) -> DataFrame:
    """Backward as-of join; output = left columns + right_values (null when
    no right row at or before left_ts exists for the key)."""
    if strategy == "range":
        r = right.select(
            F.col(on).alias("_k"),
            F.col(right_ts).alias("_rts"),
            *[F.col(c) for c in right_values],
        )
        j = left.join(
            r, (left[on] == F.col("_k")) & (F.col("_rts") <= left[left_ts]), "left"
        )
        win = F.max_by(
            F.struct(*[F.col(c) for c in right_values]), F.col("_rts")
        )
        grouped = j.groupBy(*[left[c] for c in left.columns]).agg(win.alias("_w"))
        return grouped.select(
            *left.columns, *[F.col(f"_w.{c}").alias(c) for c in right_values]
        )

    # union strategy: one shuffle, linear in |left|+|right|
    lcols = left.columns
    l_struct = F.struct(*[F.col(c) for c in lcols])
    r_struct = F.struct(*[F.col(c) for c in right_values])
    l_type = left.select(l_struct.alias("_l")).schema["_l"].dataType
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows (0) sort before left on ts ties
        l_struct.alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        r_struct.alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_last_r.{c}").alias(c) for c in right_values],
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign gap-based session ids: ``session_id`` is 0-based per key;
    a new session starts when the time since the previous event exceeds
    ``gap_seconds``. Adds ``session_id``; one shuffle on the key."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    # interval arithmetic works for both TIMESTAMP and TIMESTAMP_NTZ
    new_sess = (
        prev.isNull()
        | (F.col(ts) > prev + F.expr(f"INTERVAL {int(gap_seconds)} SECONDS"))
    ).cast("long")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(new_sess).over(w_run) - 1)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: "list[str] | None" = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
    point_key: "str | None" = None,
) -> DataFrame:
    """Point-in-interval join: each point row matched to every interval row
    with ``start_ts <= point_ts <= end_ts`` (and equal ``on`` keys, if
    given) — the time-containment join Spark has no built-in for.

    A naive ``points.join(intervals, pt BETWEEN ...)`` plans as a
    broadcast-nested-loop or cartesian product — dead at scale. Instead,
    time is banded into ``bucket_seconds`` chunks: a point carries its one
    bucket, an interval explodes into the buckets it touches, and the
    match becomes an EQUI-join on (keys…, bucket) + a containment filter.
    Each qualifying (point, interval) pair is produced exactly once (the
    point lives in exactly one bucket), so no dedup pass is needed.

    Pick ``bucket_seconds`` near the typical interval length: the explode
    emits ``⌈len/bucket⌉ + 1`` rows per interval, while too-coarse buckets
    inflate the join's false-positive band. Intervals with
    ``end < start`` match nothing. ``how`` is ``inner`` or ``left_points``
    (keep unmatched points with null interval columns); ``left_points``
    requires ``point_key``, a UNIQUE point id used for the unmatched
    anti-join — joining on all point columns instead would silently
    duplicate rows whose float columns hold NaN (NaN ≠ NaN in SQL).

    The three ts columns may be timestamp/date (bucketed on epoch
    seconds) or numeric (epoch seconds / any monotone numeric axis,
    used directly). Anything else — notably STRING timestamps, where an
    implicit ``unix_timestamp`` parse would silently yield NULL buckets
    and an empty join — is rejected up front.
    """
    if how not in ("inner", "left_points"):
        raise ValueError("how must be 'inner' or 'left_points'")
    if how == "left_points" and not point_key:
        raise ValueError("left_points requires point_key (a unique point id)")
    keys = list(on or [])
    w = int(bucket_seconds)
    if w <= 0:
        raise ValueError("bucket_seconds must be positive")

    def _axis(df: DataFrame, col_name: str) -> Column:
        from pyspark.sql.types import DateType, NumericType, TimestampType

        try:
            from pyspark.sql.types import TimestampNTZType

            ts_types = (TimestampType, TimestampNTZType, DateType)
        except ImportError:  # pragma: no cover - older Spark
            ts_types = (TimestampType, DateType)
        dtype = df.schema[col_name].dataType
        if isinstance(dtype, ts_types):
            return F.unix_timestamp(F.col(col_name))
        if isinstance(dtype, NumericType):
            return F.col(col_name)
        raise TypeError(
            f"interval_join: column {col_name!r} has type {dtype.simpleString()}; "
            "expected timestamp/date or a numeric epoch axis (cast string "
            "timestamps with to_timestamp first)"
        )

    p = points.withColumn("_bucket", F.floor(_axis(points, point_ts) / w))
    i = intervals.withColumn(
        "_buckets",
        F.when(
            F.col(end_ts) >= F.col(start_ts),
            F.sequence(
                F.floor(_axis(intervals, start_ts) / w),
                F.floor(_axis(intervals, end_ts) / w),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    ).withColumn("_bucket", F.explode("_buckets")).drop("_buckets")

    joined = p.join(i, keys + ["_bucket"], "inner").where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    if how == "inner":
        return joined.drop("_bucket")
    matched = joined.drop("_bucket")
    unmatched = points.join(
        matched.select(point_key).distinct(), [point_key], "left_anti"
    )
    return matched.unionByName(unmatched, allowMissingColumns=True)
