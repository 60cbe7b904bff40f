"""Structured Streaming stateful operators.

The reference's only state is the per-partition offsets map (A26/A27); the
new engine adds the two streaming-state shapes a training-data feed needs:

* :func:`streaming_windowed_counts` — event-time tumbling windows with a
  watermark for late data (the reference drops timestamps entirely,
  BytesRecordReader.java:101-102 — we keep event time first-class).
* :func:`streaming_lww_state` — a keyed LWW state store built on
  ``applyInPandasWithState``: per doc_id, state carries the current
  (max offset, op) winner across micro-batches and emits rows whose winner
  changed. This is the reference's ``updateOffsets`` max-merge
  (GCSSourceTask.java:261-270) as distributed streaming state, and inside
  the batch it's vectorized pandas (groupby().max() over the whole batch
  slice — no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts; append-mode-compatible.
    Parquet NTZ timestamps are cast to TIMESTAMP (watermarks require an
    instant type); run with session timeZone=UTC for stable window starts."""
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            group_col,
            "n",
        )
    )


LWW_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)

LWW_STATE_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)


def _lww_update(key, pdfs, state: GroupState):
    """Per-key state update: keep the max-offset event ever seen; emit when
    the winner advances. Whole-batch vectorized (idxmax over the pandas
    slice), state is two scalars per key."""
    import pandas as pd

    best_off = None
    best_op = None
    if state.exists:
        best_off, best_op = state.get
    changed = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        i = pdf["offset"].idxmax()
        off = int(pdf["offset"].loc[i])
        if best_off is None or off >= best_off:
            best_off = off
            best_op = str(pdf["op"].loc[i])
            changed = True
    if changed:
        state.update((best_off, best_op))
        yield pd.DataFrame(
            {"doc_id": [key[0]], "offset": [best_off], "op": [best_op]}
        )


def streaming_lww_state(stream: DataFrame) -> DataFrame:
    """Keyed streaming LWW winner tracking over a change stream with columns
    (doc_id, offset, op). Emits (doc_id, offset, op) whenever a key's winner
    advances; downstream (e.g. foreachBatch MERGE) applies them."""
    return (
        stream.select("doc_id", "offset", "op")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _lww_update,
            outputStructType=LWW_OUTPUT_SCHEMA,
            stateStructType=LWW_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
