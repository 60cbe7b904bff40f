"""Last-writer-wins deduplication of change events by (doc_id, offset).

Re-expresses the reference's offset max-merge (A26): ``updateOffsets`` keeps
the larger of current vs incoming GCSOffset per partition
(GCSSourceTask.java:261-270), with total order = (file key, record offset)
(GCSOffset.java:46-49). Here the unit is a doc_id and the order key is the
event ``offset``; the merge must stay associative/commutative so replays,
duplicates, and out-of-order delivery all converge to the same winner.

Three physical strategies, all producing identical results:

* :func:`lww_dedup` — ``max_by(struct(payload), offset)`` groupBy. The
  default and the fast path: Spark plans it as a partial (map-side)
  aggregation, so a hot doc_id is collapsed to ≤1 row per map task *before*
  the shuffle — skew-resistant by construction, no sort, no window.
* :func:`lww_dedup_salted` — explicit two-phase salted aggregation
  (groupBy(doc_id, salt) → groupBy(doc_id)). Generalizes the reference's
  hash-split skew spreading (GCSSourceTask.java:181-193). Useful when the
  payload is too wide for hash-agg fallback heuristics; semantics proven
  equal because max_by is associative.
* :func:`lww_dedup_sortmerge` — ``repartitionByRange(doc_id) →
  sortWithinPartitions(doc_id, offset desc) → per-partition first-row-per-key``
  via Arrow-batched ``mapInPandas`` (no per-row Python: boundary detection is
  vectorized numpy). The north_rule's named strategy; wins when downstream
  wants range-clustered output anyway (our table files are doc_id-ranged).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ordering key: event offset, then delivery_seq as a deterministic tiebreak
#: for verbatim duplicate deliveries (same offset → same payload, but a
#: stable winner keeps the operator fully deterministic).


def _ord_struct(df: DataFrame) -> F.Column:
    cols = [F.col("offset")]
    if "delivery_seq" in df.columns:
        cols.append(F.col("delivery_seq"))
    return F.struct(*cols)


def _payload_cols(df: DataFrame, key: str) -> list[str]:
    return [c for c in df.columns if c != key]


def lww_dedup(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """One row per key: the payload of the max-(offset, delivery_seq) event.

    Plans as HashAggregate(partial) → shuffle(key) → HashAggregate(final):
    map-side combine makes duplicate/hot-key traffic collapse before the
    exchange — the property that lets a 30%-hot key not serialize the job.
    """
    payload = _payload_cols(df, key)
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), _ord_struct(df))
    out = df.groupBy(key).agg(winner.alias("_w"))
    return out.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])


def lww_dedup_salted(
    df: DataFrame, key: str = "doc_id", salt_buckets: int = 8
) -> DataFrame:
    """Two-phase salted LWW: phase 1 reduces each (key, salt) slice,
    phase 2 reduces the ≤salt_buckets survivors per key. Correct because
    max_by over a total order is associative and commutative (SURVEY §7.3:
    dedup within salt, then within doc_id)."""
    payload = _payload_cols(df, key)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("offset"), F.lit(0x5A17)), F.lit(salt_buckets))
    )
    w1 = F.max_by(F.struct(*[F.col(c) for c in payload]), _ord_struct(df))
    p1 = salted.groupBy(key, "_salt").agg(w1.alias("_w"))
    p1 = p1.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])
    w2 = F.max_by(F.struct(*[F.col(c) for c in payload]), _ord_struct(p1))
    p2 = p1.groupBy(key).agg(w2.alias("_w"))
    return p2.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])


def lww_dedup_sortmerge(
    df: DataFrame,
    key: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition by key, sort within partitions by (key, offset desc,
    delivery_seq desc), then keep the first row per key with a vectorized
    per-partition pass. Output is clustered by key range — exactly the
    layout our table files want, so the sort is not wasted work.

    The per-key "first" is computed with numpy boundary masks over whole
    Arrow batches (mapInPandas); a tiny cross-batch carry (one key string)
    handles keys spanning batch boundaries. No per-row Python.
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    out_schema = df.schema
    order = [F.col(key).asc(), F.col("offset").desc()]
    if "delivery_seq" in df.columns:
        order.append(F.col("delivery_seq").desc())

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = df.repartitionByRange(n, F.col(key)).sortWithinPartitions(*order)

    key_name = key

    def first_per_key(batches: Iterable["pd.DataFrame"]):
        import numpy as np

        prev_last_key = None  # carry: last key seen in the previous batch
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf[key_name].to_numpy()
            # row i is a winner iff its key differs from row i-1's key
            mask = np.empty(len(pdf), dtype=bool)
            mask[0] = keys[0] != prev_last_key
            if len(pdf) > 1:
                mask[1:] = keys[1:] != keys[:-1]
            prev_last_key = keys[-1]
            yield pdf.loc[mask]

    return arranged.mapInPandas(first_per_key, schema=out_schema)


def resolve_ops(deduped: DataFrame) -> DataFrame:
    """Drop tombstones: after LWW, a doc whose winning op is D is deleted."""
    return deduped.where(F.col("op") != F.lit("D"))
