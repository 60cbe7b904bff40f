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


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.DoubleType()),
        T.StructField("session_end", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.DoubleType()),
        T.StructField("last", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def streaming_sessionize(stream: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Gap-based sessionization as keyed streaming state — the streaming
    twin of ``operators.asof.sessionize``. Emits every session each time it
    changes: ``closed=True`` rows are final (a later event opened a new
    session past the gap); the trailing ``closed=False`` row is the key's
    still-open session (downstream keeps the latest per (user,
    session_start) — update-mode semantics).

    In-batch work is vectorized numpy (sort → diff > gap → cumsum gives
    session ids in three array ops); the carried state is three scalars per
    key. Sequential per-key logic is inherent to sessionization — this is
    the applyInPandasWithState shape from the SURVEY §2 streaming list.

    Late data: a cross-batch late event merges into (or opens a session
    before) the carried session via a sorted adjacent-merge — it is never
    silently absorbed into a later session. If a merge moves an
    already-emitted session's start, the session re-emits under the new
    start; downstream either compacts by overlap or bounds lateness with a
    watermark upstream."""
    gap = float(gap_seconds)

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        ts_parts = [pdf["_ts"].to_numpy(dtype="float64") for pdf in pdfs if len(pdf)]
        if not ts_parts:
            return
        ts = np.sort(np.concatenate(ts_parts))
        cur = state.get if state.exists else None  # (start, last, n)
        out = []
        boundaries = np.concatenate(([True], np.diff(ts) > gap))
        sid = np.cumsum(boundaries) - 1
        firsts = ts[boundaries]
        lasts = ts[np.concatenate((boundaries[1:], [True]))]  # sorted ⇒ max
        counts = np.bincount(sid)
        sessions = [(float(f), float(last), int(n)) for f, last, n in
                    zip(firsts, lasts, counts)]
        if cur is not None:
            # fold the carried session into the batch's (time-ordered)
            # session list and re-merge adjacent ones. A signed gap check
            # against only the FIRST batch session would absorb an event
            # arbitrarily EARLIER than the carried session into it; sorting
            # + adjacent-merge handles late-vs-carried in either direction.
            s0, l0, n0 = cur
            allses = sorted(sessions + [(float(s0), float(l0), int(n0))])
            sessions = [allses[0]]
            for f, last, n in allses[1:]:
                pf, pl, pn = sessions[-1]
                if f - pl <= gap:
                    sessions[-1] = (pf, max(pl, last), pn + n)
                else:
                    sessions.append((f, last, n))
        for f, last, n in sessions[:-1]:
            out.append((f, last, int(n), True))
        f, last, n = sessions[-1]
        out.append((f, last, int(n), False))
        state.update((float(f), float(last), int(n)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out),
                "session_start": [o[0] for o in out],
                "session_end": [o[1] for o in out],
                "n_events": [o[2] for o in out],
                "closed": [o[3] for o in out],
            }
        )

    return (
        stream.select("user_id", F.col("ts").cast("double").alias("_ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
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
