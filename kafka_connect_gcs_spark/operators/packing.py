"""Training-sequence packing: concatenate pre-tokenized documents into
fixed-length sequences (the canonical pre-training data op on a table of
``(doc_id, tokens array<int>, n_tok, source)`` — GPT-style concat-and-chunk).

The hard part at 10^10 docs is the GLOBAL token offset of every document
(an order-by-all prefix sum; a bare ``Window.orderBy(doc_id)`` moves the
whole relation to ONE partition). :func:`exclusive_prefix_sum` does it
scale-correct in two phases, the classic distributed scan:

1. range-partition the NARROW (order key, count) relation and take ONE
   metadata-scale collect of per-partition totals (P rows, P = shuffle
   parallelism);
2. per-partition window cumsum + the driver-computed partition base —
   every heavy step stays partition-parallel, balanced by the range
   partitioner.

Packing itself is pure relational algebra after that: each doc overlaps
chunks ``floor(s/L) .. floor((s+n-1)/L)`` (explodes to ≤ n/L+1 rows),
contributes ``slice(tokens, ...)`` per chunk, and chunks reassemble with a
groupBy whose group payload is bounded by L tokens — no unbounded
collect anywhere. Shuffle volume ≈ token volume, which is the floor for an
op that permutes every token.

No reference analog (the connector stores byte records); this is part of
the training-data-pipeline surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tiebreaks(tiebreak_col: "str | list[str] | None") -> list:
    """Normalize the tiebreak spec: None → [], str → [str], list kept —
    the scan order is (order_col, *tiebreaks) and that tuple must be
    unique (the caller contract in :func:`exclusive_prefix_sum`)."""
    if not tiebreak_col:
        return []
    if isinstance(tiebreak_col, str):
        return [tiebreak_col]
    return list(tiebreak_col)


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    n_col: str,
    out_col: str = "start",
    num_partitions: "int | None" = None,
    tiebreak_col: "str | list[str] | None" = None,
    lo_hi: "tuple | None" = None,
) -> DataFrame:
    """(…, out_col) where out_col = sum of ``n_col`` over all rows strictly
    before this one in ``order_col`` order — a distributed exclusive scan.

    ``order_col`` MUST be unique (it defines the total order of the scan;
    with duplicates "strictly before" is ill-defined, and the cumsum window
    would treat ties as peers) — UNLESS ``tiebreak_col`` is given, in which
    case the scan order is the composite ``(order_col, tiebreak_col)`` and
    THAT pair must be unique. Bucketing still keys on ``order_col`` alone
    (ties land in one bucket, where the window's composite order resolves
    them), so :func:`~kafka_connect_gcs_spark.operators.sampling
    .shuffle_corpus` can order by a 60-bit hash and break collisions with
    the row key. The window below uses an explicit ROWS frame so each row
    still gets a distinct running total, but which duplicate gets which
    offset would be nondeterministic without a tiebreak — so uniqueness
    is the caller contract (packing uses doc_id, a primary key).

    Keep ``df`` NARROW (the order key and the count): the relation is
    bucket-shuffled once for the totals and once for the window scan. The
    only driver-side data is one row per bucket (its total), so this works
    at any row count the cluster can shuffle.

    Two plan shapes, picked by the order key's type:

    * **integral keys** (the normal case — doc ids): buckets are a pure
      equal-width function of the key (``(key - min) DIV width``), so the
      two passes agree by CONSTRUCTION under any re-execution, AQE
      re-plan, or task retry. Nothing is persisted or checkpointed —
      the result is a lazy, fully deterministic plan (callers that reuse
      it repeatedly can cache it themselves). Heavily CLUSTERED sparse
      ids can land in few buckets (window parallelism degrades, never
      correctness); dense or uniformly-spread ids bucket evenly.
    * **other orderable keys**: fall back to sampled range partitioning,
      which must be pinned with a persist (the sampling could differ on
      re-execution) and eagerly localCheckpoint-ed so the temporary cache
      is released before returning.
    """
    dtype = df.schema[order_col].dataType
    if dtype.simpleString() in ("tinyint", "smallint", "int", "bigint"):
        # lo_hi: caller-supplied key span (e.g. observed on a pass the
        # caller already pays, like pack_sequences' checkpoint job) —
        # skips the min/max job here. A span COVERING the keys is enough:
        # bounds only shape the equal-width bucketing, never the scan.
        if lo_hi is None:
            row = df.agg(
                F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
            ).collect()[0]
            lo, hi = row["lo"], row["hi"]
        else:
            lo, hi = lo_hi
        if lo is None:
            return df.withColumn(out_col, F.lit(0).cast("long"))
        span = int(hi) - int(lo) + 1
        if span < 2**62:  # int64-safe arithmetic; else sampled fallback
            return _prefix_sum_bucketed(
                df, order_col, n_col, out_col, int(lo), span, num_partitions,
                tiebreak_col,
            )
    return _prefix_sum_sampled_ranges(
        df, order_col, n_col, out_col, num_partitions, tiebreak_col
    )


def _prefix_sum_bucketed(
    df: DataFrame,
    order_col: str,
    n_col: str,
    out_col: str,
    lo: int,
    span: int,
    num_partitions: "int | None",
    tiebreak_col: "str | list[str] | None" = None,
) -> DataFrame:
    spark = df.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    width = -(-span // P)  # ceil; >= 1
    bucket = F.expr(
        f"CAST((CAST(`{order_col}` AS BIGINT) - {lo}) DIV {width} AS INT)"
    )
    src = df.withColumn("_pid", bucket)
    # ONE metadata-scale collect: per-bucket totals (<= P rows)
    totals = {
        r["_pid"]: r["t"]
        for r in src.groupBy("_pid").agg(F.sum(n_col).alias("t")).collect()
    }
    bases, acc = {}, 0
    for pid in sorted(totals):
        bases[pid] = acc
        acc += totals[pid] or 0
    base_map = F.create_map(
        *[F.lit(x) for pid in sorted(bases) for x in (pid, bases[pid])]
    )
    # explicit ROWS frame: the default RANGE frame makes duplicate order
    # values peers (all sharing one inclusive cumsum); ROWS keeps every row's
    # running total distinct even if the uniqueness contract is violated
    order_cols = [order_col] + _tiebreaks(tiebreak_col)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return src.withColumn(
        out_col,
        (
            F.coalesce(base_map[F.col("_pid")], F.lit(0))
            + F.sum(n_col).over(w)
            - F.col(n_col)
        ).cast("long"),
    ).drop("_pid")


def _prefix_sum_sampled_ranges(
    df: DataFrame,
    order_col: str,
    n_col: str,
    out_col: str,
    num_partitions: "int | None",
    tiebreak_col: "str | list[str] | None" = None,
) -> DataFrame:
    from pyspark import StorageLevel

    spark = df.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    order_cols = [order_col] + _tiebreaks(tiebreak_col)
    part = (
        df.repartitionByRange(P, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ONE metadata-scale collect: per-partition totals (P rows)
    totals = {
        r["_pid"]: r["t"]
        for r in part.groupBy("_pid").agg(F.sum(n_col).alias("t")).collect()
    }
    bases, acc = {}, 0
    for pid in sorted(totals):
        bases[pid] = acc
        acc += totals[pid] or 0
    base_map = F.create_map(
        *[F.lit(x) for pid in sorted(bases) for x in (pid, bases[pid])]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = part.withColumn(
        out_col,
        (
            F.coalesce(base_map[F.col("_pid")], F.lit(0))
            + F.sum(n_col).over(w)
            - F.col(n_col)
        ).cast("long"),
    ).drop("_pid")
    # materialize (narrow relation, one pass over the cache) so the persisted
    # input can be released now instead of leaking until LRU pressure
    out = out.localCheckpoint(eager=True)
    part.unpersist()
    return out


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    drop_remainder: bool = True,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Concatenate ``tokens`` of all docs in ``id_col`` order and emit
    consecutive ``seq_len``-token sequences:

    Returns (seq_id, tokens array, n_tok, n_docs) where ``seq_id`` is the
    0-based chunk index in the concatenated stream and ``n_docs`` counts
    the documents contributing at least one token to the chunk. The final
    partial chunk is dropped unless ``drop_remainder=False`` (train loaders
    want fixed shapes; keep it for lossless repacking).

    Deterministic: the stream order is the total order on ``id_col``.
    """
    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")
    base = df.select(
        F.col(id_col).alias("_id"), F.col(tokens_col).alias("_toks")
    )
    # global offsets on the NARROW projection, MATERIALIZED once: the
    # prefix sum drives 3-4 small jobs (key span, bucket totals, the
    # window, the re-attach join) and each would otherwise re-run the
    # caller's token projection — often the most expensive map in the
    # plan (measured 4× the narrow data's cost for md5-derived tokens).
    # The checkpointed relation is (id, n): two longs per document.
    # NOTE the filter comes AFTER the checkpoint: `where(_n > 0)` on the
    # lazy projection gets pushed below it as `size(tokens) > 0`, and the
    # pushed predicate + the projection then evaluate the caller's token
    # expression TWICE (filter/project codegen does not share it) —
    # measured 2.4 s vs 0.5 s at sf1.0 for md5-derived tokens. Filtering
    # the materialized (id, n) longs afterwards is free and identical.
    # the key span rides the checkpoint job as an Observation (over the
    # UNFILTERED rows — a covering span is all the bucketing needs), so
    # the prefix sum skips its min/max job
    from pyspark.sql import Observation

    obs = Observation()
    narrow = (
        base.select("_id", F.size("_toks").cast("long").alias("_n"))
        .observe(obs, F.min("_id").alias("lo"), F.max("_id").alias("hi"))
        .localCheckpoint(eager=True)
        .where(F.col("_n") > 0)
    )
    span = obs.get
    lo_hi = None
    if narrow.schema["_id"].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint",
    ):
        lo_hi = (span["lo"], span["hi"])
    starts = exclusive_prefix_sum(
        narrow, "_id", "_n", out_col="_s", num_partitions=num_partitions,
        lo_hi=lo_hi,
    )
    # inner join implies the _n > 0 filter, so the token payload is
    # evaluated exactly once, on this side
    placed = base.join(starts.select("_id", "_n", "_s"), "_id")
    # every chunk this doc overlaps: floor(s/L) .. floor((s+n-1)/L)
    c = F.explode(
        F.sequence(
            F.floor(F.col("_s") / L),
            F.floor((F.col("_s") + F.col("_n") - 1) / L),
        )
    ).alias("seq_id")
    pieces = placed.select("_id", "_s", "_n", "_toks", c).select(
        "seq_id",
        "_s",
        # token coords [max(cL, s), min((c+1)L, s+n)) → 1-based local slice
        F.slice(
            "_toks",
            (F.greatest(F.col("seq_id") * L, F.col("_s")) - F.col("_s") + 1).cast(
                "int"
            ),
            (
                F.least((F.col("seq_id") + 1) * L, F.col("_s") + F.col("_n"))
                - F.greatest(F.col("seq_id") * L, F.col("_s"))
            ).cast("int"),
        ).alias("_piece"),
    )
    # reassemble: group payload ≤ L tokens by construction (each member
    # contributes ≥1 token to this chunk), so collect_list is bounded
    out = (
        pieces.groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_s").alias("s"),
                                                F.col("_piece").alias("p")))
                    ),
                    lambda x: x["p"],
                )
            ).alias("tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn("n_tok", F.size("tokens").cast("long"))
    )
    if drop_remainder:
        out = out.where(F.col("n_tok") == L)
    return out.select("seq_id", "tokens", "n_tok", "n_docs")


def chunk_documents(
    df: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into ``chunk_size``-word windows advancing by
    ``chunk_size − overlap`` words — the context-length splitter that runs
    before packing when documents exceed the model's window (overlap
    preserves cross-boundary context, RoBERTa/T5 style).

    Returns ``(id, chunk_id, start, chunk_n, chunk_text)``: 0-based
    ``chunk_id``, 1-based word ``start``, the final chunk short unless the
    doc length lands on a stride boundary. Zero-word docs emit no rows.

    Map-only Catalyst (sequence → explode → slice): no shuffle at any
    scale; chunk count per doc is ``1 + ceil(max(0, n−chunk)/stride)``.
    """
    from kafka_connect_gcs_spark.operators.text import words

    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    ws = words(F.col(text_col))
    n = F.size(ws)
    # number of chunks: 1 + ceil((n - chunk_size)/stride) for n > chunk;
    # integer form: 1 + floor((n - chunk + stride - 1)/stride)
    extra = F.floor(
        (n - F.lit(chunk_size) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.greatest(extra, F.lit(0))
    )
    out = df.select(
        F.col(id_col),
        ws.alias("_ws"),
        F.explode(
            F.when(
                n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("chunk_id"),
    )
    start = (F.col("chunk_id") * stride + 1).cast("int")
    chunk = F.slice(F.col("_ws"), start, chunk_size)
    return out.select(
        id_col,
        "chunk_id",
        start.alias("start"),
        F.size(chunk).alias("chunk_n"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def length_bucket_batches(
    df: DataFrame,
    batch_size: int,
    boundaries: "list[int]",
    len_col: str = "n_tok",
    id_col: str = "doc_id",
    seed: int = 0,
    portable: bool = False,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Pad-efficient batch assembly (fairseq/T5-style length bucketing):
    group similar-length rows, shuffle deterministically WITHIN each
    bucket, and cut fixed-size batches so padding-to-batch-max is cheap.

    Adds ``(bucket, batch_idx, pos, padded_len)`` to ``df``:

    * ``bucket`` — count of ``boundaries`` strictly below ``len_col``
      (``len(boundaries)+1`` buckets; the last catches overflow);
    * ``(bucket, batch_idx)`` — the composite batch key; ``pos`` — the
      row's 0-based slot; the final batch of each bucket may be short;
    * ``padded_len`` — max ``len_col`` in the batch, i.e. the length every
      member pads to; ``Σ(padded_len − len)`` is the padding waste the
      bucketing minimizes.

    Scale shape: within-bucket order is a hash (reproducible, RNG-free,
    ties broken by ``id_col``), and ranks come from the two-phase
    distributed exclusive scan over the COMPOSITE integral key
    ``bucket·2^44 + (hash mod 2^44)`` — bucket-major, hash-minor — so the
    scan stays equal-width-bucketed and fully partition-parallel even
    though a ``Window.partitionBy(bucket)`` row_number would funnel each
    length bucket (there are only dozens) through ONE reducer at 10^10
    rows. Per-bucket start offsets are a ≤ ``n_buckets``-row aggregate
    joined back by broadcast; ``padded_len`` is a window over
    ``(bucket, batch_idx)`` groups bounded by ``batch_size``. Payload
    columns re-attach by ``id_col`` and never ride the rank shuffle.
    """
    from kafka_connect_gcs_spark.operators.sampling import shuffle_key

    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    bounds = sorted(int(b) for b in boundaries)
    if len(bounds) != len(set(bounds)):
        raise ValueError(f"boundaries must be distinct: {boundaries}")
    if len(bounds) >= 1 << 18:
        raise ValueError("too many boundaries for the composite key space")
    SHIFT = 1 << 44
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(len_col) > b).cast("int")
    keyed = (
        df.select(id_col, len_col)
        .withColumn("_bkt", bucket)
        .withColumn(
            "_ck",
            F.col("_bkt").cast("long") * SHIFT
            + F.pmod(shuffle_key(F.col(id_col), seed, portable), F.lit(SHIFT)),
        )
        .withColumn("_one", F.lit(1).cast("long"))
    )
    ranked = exclusive_prefix_sum(
        keyed,
        "_ck",
        "_one",
        out_col="_grank",
        num_partitions=num_partitions,
        tiebreak_col=id_col,
    )
    # bucket start offsets: tiny aggregate (≤ n_buckets rows) — the window
    # below runs on that aggregate, not the data
    counts = keyed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    off_w = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = counts.select(
        "_bkt", (F.sum("_c").over(off_w) - F.col("_c")).alias("_off")
    )
    assigned = (
        ranked.join(F.broadcast(offs), "_bkt")
        .withColumn("_rk", F.col("_grank") - F.col("_off"))
        .select(
            id_col,
            len_col,
            F.col("_bkt").alias("bucket"),
            # integral DIV — a double `/` would lose exactness past 2^53 rows
            F.expr(f"_rk DIV {int(batch_size)}").cast("long").alias("batch_idx"),
            F.pmod(F.col("_rk"), F.lit(batch_size)).cast("long").alias("pos"),
        )
    )
    pad_w = Window.partitionBy("bucket", "batch_idx")
    assigned = assigned.withColumn(
        "padded_len", F.max(len_col).over(pad_w).cast("long")
    ).drop(len_col)
    return df.join(assigned, id_col)
