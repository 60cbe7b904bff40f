"""Deterministic sampling, stratified mixing, and budgeted selection —
the corpus-composition operators a training-data pipeline runs after
dedup/quality and before packing.

All decisions derive from a HASH OF THE ROW KEY, never from an RNG:

* re-running the job reproduces the same corpus bit-for-bit (Spark's
  ``df.sample`` is seed-stable only for identical partitioning, which a
  100 TB pipeline can't promise across retries/AQE re-plans);
* the sample composes with incremental ingest — a doc's keep/drop verdict
  never changes as neighbors arrive, so yesterday's selection needn't be
  recomputed;
* DuckDB replays the portable (md5) form bit-exactly, making every
  operator oracle-checkable end to end.

Scale shape: everything here is a pure Catalyst expression on the row
(filter / map-only explode) — no shuffle, no UDF, no driver data path —
except :func:`take_token_budget`, which reuses packing's two-phase
distributed exclusive prefix sum (ONE partition-count-row collect).

No reference analog (the connector moves opaque bytes); part of the
training-pipeline surface, same tier as packing/dedup_index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^60 — the portable bucket keeps 15 md5 hex chars = 60 bits, exactly
#: representable in a double, so `hash/2^60 < fraction` compares the same
#: in Spark and DuckDB
_PORTABLE_SPAN = float(1 << 60)


def hash_bucket(key: Column, seed: int = 0, portable: bool = False) -> Column:
    """Uniform [0, 1) double derived from a key column.

    Production: one ``xxhash64(key, seed)`` (JVM, codegen) mapped from
    signed-64 range. Portable: 60 bits of ``md5('s{seed}:' || key)`` —
    DuckDB: ``('0x' || substr(md5('s{seed}:' || key), 1, 15))::BIGINT
    / 1152921504606846976.0`` reproduces it bit-exactly."""
    if portable:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"s{seed}:"), key.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        return h / F.lit(_PORTABLE_SPAN)
    return (F.xxhash64(key, F.lit(seed)) / F.lit(float(1 << 64))) + F.lit(0.5)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with
    ``hash_bucket(key) < fraction``. A pushed-down filter — at 100 TB the
    sample never materializes the rejected rows past the scan."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(hash_bucket(F.col(key_col), seed, portable) < fraction)


def split_corpus(
    df: DataFrame,
    splits: "dict[str, float]",
    key_col: str = "doc_id",
    seed: int = 0,
    portable: bool = False,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment: adds ``out_col``
    naming the split each row belongs to.

    ``splits`` maps name → fraction (must sum to 1); a row lands in the
    first split whose cumulative fraction exceeds its
    :func:`hash_bucket` draw. Pure map-side projection — no shuffle, no
    RNG state, stable under retries — and membership is a pushed-down
    filter when a single split is selected downstream (``WHERE split =
    'val'`` prunes at the scan at 100 TB). Splits are disjoint and
    exhaustive by construction.
    """
    names = list(splits)
    if not names:
        raise ValueError("splits must be non-empty")
    fracs = [float(splits[n]) for n in names]
    if any(f <= 0 for f in fracs):
        raise ValueError(f"split fractions must be positive: {splits}")
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1: {splits}")
    u = hash_bucket(F.col(key_col), seed, portable)
    expr, cum = F.lit(names[-1]), 0.0
    cases = []
    for name, frac in zip(names[:-1], fracs[:-1]):
        cum += frac
        cases.append((cum, name))
    for cum, name in reversed(cases):
        expr = F.when(u < cum, name).otherwise(expr)
    return df.withColumn(out_col, expr)


def _rate_for(strata_col: str, rates: "dict[str, float]", default: float):
    pairs = [
        x
        for k, v in sorted(rates.items())
        for x in (F.lit(k), F.lit(float(v)))
    ]
    m = F.create_map(*pairs) if pairs else F.create_map()
    return F.coalesce(m.getItem(F.col(strata_col)), F.lit(float(default)))


def stratified_sample(
    df: DataFrame,
    fractions: "dict[str, float]",
    strata_col: str = "source",
    key_col: str = "doc_id",
    default: float = 0.0,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling: each row keeps with its
    stratum's fraction (``default`` for unlisted strata). One map-lookup
    + filter; the strata table rides along as a literal ``create_map`` so
    there is no join at all."""
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    frac = _rate_for(strata_col, fractions, default)
    return df.where(hash_bucket(F.col(key_col), seed, portable) < frac)


def corpus_mix(
    df: DataFrame,
    weights: "dict[str, float]",
    strata_col: str = "source",
    key_col: str = "doc_id",
    default: float = 0.0,
    seed: int = 0,
    portable: bool = False,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Weighted corpus mixing with epoch upsampling: a row whose stratum
    has rate ``r`` appears in ``floor(r)`` full epochs (``epoch`` =
    0..floor(r)-1) plus one partial epoch kept with probability
    ``r - floor(r)`` — so a source weighted 2.5 contributes every doc
    twice and half the docs a third time, and a source weighted 0.3
    contributes 30% of its docs once. The standard way to hit a target
    source distribution for training without an RNG.

    Deterministic: the partial-epoch verdict hashes the key (seeded by
    the stratum so different sources sample independent subsets).
    Map-only ``explode(sequence(...))`` — no shuffle; downstream
    shuffles see only the already-mixed volume."""
    rate = _rate_for(strata_col, weights, default)
    return _mix_with_rate(df, rate, strata_col, key_col, seed, portable, epoch_col)


def _mix_with_rate(
    df: DataFrame,
    rate,
    strata_col: str,
    key_col: str,
    seed: int,
    portable: bool,
    epoch_col: str,
) -> DataFrame:
    """Epoch expansion for an arbitrary per-row rate expression: floor(r)
    full epochs plus one partial epoch kept with probability r − floor(r).
    Map-only explode + filter."""
    n_full = F.floor(rate).cast("int")
    part = rate - F.floor(rate)
    out = df.withColumn(
        epoch_col, F.explode(F.sequence(F.lit(0), n_full))
    )
    keep_partial = (
        hash_bucket(
            F.concat(F.col(strata_col), F.lit("|"), F.col(key_col)),
            seed,
            portable,
        )
        < part
    )
    return out.where((F.col(epoch_col) < n_full) | keep_partial)


def temperature_mix(
    df: DataFrame,
    temperature: float,
    strata_col: str = "source",
    key_col: str = "doc_id",
    total: "int | None" = None,
    seed: int = 0,
    portable: bool = False,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Temperature-balanced source mixing (the XLM-R / multilingual-LM
    recipe): source ``s`` with ``c_s`` docs is drawn with probability
    ``q_s ∝ (c_s/Σc)^(1/T)``, flattening the source distribution as
    ``T → ∞`` (T=1 keeps natural proportions). Each source's per-doc rate
    is ``r_s = total·q_s/c_s`` (``total`` defaults to Σc, i.e. rebalance
    at constant corpus size); rates > 1 upsample via full epochs exactly
    like :func:`corpus_mix`.

    The per-source rates are computed IN-PLAN from a metadata-scale
    aggregate (one row per source) broadcast back onto the corpus — no
    driver collect, so the operator composes into streaming/incremental
    plans. Adds ``rate`` and ``epoch`` columns.
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    alpha = 1.0 / float(temperature)
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_c"))
    # q_s = c^α / Σc^α and r_s = total·q_s/c  — all on the tiny counts
    # relation; the window has ONE partition but only |sources| rows
    tot = counts.agg(
        F.sum("_c").alias("_tot"),
        F.sum(F.pow(F.col("_c").cast("double"), F.lit(alpha))).alias("_z"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        strata_col,
        (
            (
                F.lit(float(total)) if total is not None
                else F.col("_tot").cast("double")
            )
            * (F.pow(F.col("_c").cast("double"), F.lit(alpha)) / F.col("_z"))
            / F.col("_c")
        ).alias("rate"),
    )
    joined = df.join(F.broadcast(rates), strata_col)
    return _mix_with_rate(
        joined, F.col("rate"), strata_col, key_col, seed, portable, epoch_col
    )


def take_token_budget(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    n_col: str = "n_tok",
    start_col: str = "budget_start",
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Budgeted selection: walk rows in ``order_col`` order (rank docs by
    quality first and order by (quality, id) for best-first selection)
    and keep every row that STARTS inside the token budget — the largest
    prefix whose preceding token mass is < ``budget``. Adds ``start_col``
    (the row's exclusive running token total). The last kept row may
    cross the boundary; trim it downstream when exact budgets matter.

    ``order_col`` must be unique (it defines the scan's total order).
    Scale shape: the exclusive prefix sum runs on the narrow
    (order, n) projection via packing's two-phase scan; rows re-attach by
    key, so wide payloads are never range-shuffled."""
    from kafka_connect_gcs_spark.operators.packing import exclusive_prefix_sum

    if budget < 0:
        raise ValueError("budget must be non-negative")
    starts = exclusive_prefix_sum(
        df.select(F.col(order_col), F.col(n_col).cast("long").alias("_n")),
        order_col,
        "_n",
        out_col=start_col,
        num_partitions=num_partitions,
    )
    kept = starts.where(F.col(start_col) < budget).select(
        order_col, start_col
    )
    return df.join(kept, order_col)


def shuffle_key(key: Column, seed: int = 0, portable: bool = False) -> Column:
    """The sortable long key behind :func:`shuffle_corpus`.

    Production: ``xxhash64(key, seed) >> 4`` — the arithmetic shift keeps
    the key span under 2^61, inside :func:`~kafka_connect_gcs_spark
    .operators.packing.exclusive_prefix_sum`'s PURE equal-width-bucket
    plan (int64-safe ``hi - lo + 1``), so the whole shuffle stays a lazy
    deterministic plan with nothing persisted. Portable: the 60-bit md5
    integer DuckDB reproduces as
    ``('0x' || substr(md5('s{seed}:' || key), 1, 15))::BIGINT``."""
    if portable:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"s{seed}:"), key.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    return F.shiftright(F.xxhash64(key, F.lit(seed)), 4)


def shuffle_corpus(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 0,
    portable: bool = False,
    out_col: str = "shuffle_rank",
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Reproducible global shuffle: adds ``out_col``, a dense permutation
    ``0..n-1`` of the rows in ``(shuffle_key(key, seed), key)`` order —
    the training-order shuffle a data loader consumes (write with
    ``repartitionByRange(out_col)`` + ``sortWithinPartitions(out_col)``
    for globally shuffled, locally sorted shards).

    RNG-free and total: the rank derives from a hash of the row key, so
    retries/AQE re-plans/re-runs reproduce the identical permutation, and
    the ``key``-column tiebreak keeps the order total even under 60-bit
    hash collisions (guaranteed at 10^10 rows by birthday bound).
    ``key_col`` must be unique — it is the tiebreak AND the re-attach key.

    NO global window: ranks come from packing's two-phase distributed
    exclusive scan (count 1 per row) over the narrow ``(key, hash)``
    projection — ONE bucket-count-row collect, every heavy step
    partition-parallel. Wide payload columns re-attach by key afterward,
    so they are never range-shuffled by the rank assignment itself.
    """
    keyed = df.select(
        F.col(key_col),
        shuffle_key(F.col(key_col), seed, portable).alias("_sk"),
    ).withColumn("_one", F.lit(1).cast("long"))
    from kafka_connect_gcs_spark.operators.packing import exclusive_prefix_sum

    ranked = exclusive_prefix_sum(
        keyed,
        "_sk",
        "_one",
        out_col=out_col,
        num_partitions=num_partitions,
        tiebreak_col=key_col,
    )
    if df.columns == [key_col]:
        # no payload to re-attach — the join would only shuffle both sides
        # by key to reproduce columns ranked already has
        return ranked.select(key_col, out_col)
    return df.join(ranked.select(key_col, out_col), key_col)


def score_percentile(
    df: DataFrame,
    score_col: str,
    key_col: str = "doc_id",
    out_col: str = "percentile",
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Exact percentile rank of every row by ``score_col``: ``rank /
    (n - 1)`` in [0, 1] over the total order ``(score, key)`` — the
    calibration step before quality-threshold selection ("keep the top
    20% by classifier score", DCLM-style), where absolute scores are
    meaningless but the corpus-relative quantile is the knob.

    EXACT and deterministic, not approximate: ranks come from the same
    two-phase distributed scan as :func:`shuffle_corpus` (count 1 per
    row; the ``key`` tiebreak totalizes duplicate scores), so the result
    is retry/AQE-stable and replayable by a plain ``row_number`` oracle —
    unlike ``percentile_approx``, whose error bound would make the
    selection boundary fuzzy. An integral score column keeps the scan in
    its pure lazy plan; doubles take the sampled-range path.

    Single-row corpora get percentile 0.0. ``key_col`` must be unique.
    """
    from kafka_connect_gcs_spark.operators.packing import exclusive_prefix_sum

    keyed = df.select(F.col(key_col), F.col(score_col)).withColumn(
        "_one", F.lit(1).cast("long")
    )
    ranked = exclusive_prefix_sum(
        keyed,
        score_col,
        "_one",
        out_col="_rank",
        num_partitions=num_partitions,
        tiebreak_col=key_col,
    )
    n = ranked.agg(F.count(F.lit(1)).alias("_n"))
    pct = ranked.crossJoin(F.broadcast(n)).select(
        key_col,
        (
            F.col("_rank").cast("double")
            / F.greatest(F.col("_n") - 1, F.lit(1)).cast("double")
        ).alias(out_col),
    )
    return df.join(pct, key_col)


def score_percentile_by(
    df: DataFrame,
    group_col: str,
    score_col: str,
    key_col: str = "doc_id",
    out_col: str = "percentile",
    num_partitions: "int | None" = None,
    max_broadcast_groups: int = 1_000_000,
) -> DataFrame:
    """Exact WITHIN-GROUP percentile rank: for every row, ``rank / (n_g -
    1)`` in [0, 1] over the total order ``(score, key)`` among rows
    sharing its ``group_col`` — the per-language/per-source calibration
    step (CCNet buckets perplexity PER LANGUAGE; one global threshold
    would gut low-resource languages whose absolute scores sit in a
    different range).

    The naive ``row_number() OVER (PARTITION BY group)`` funnels every
    row of a group through ONE reducer — at 10^10 rows a big language is
    a single-task stage. Here the within-group rank is decomposed as
    ``global_rank − group_base``: one group-major distributed scan
    (:func:`~kafka_connect_gcs_spark.operators.packing
    .exclusive_prefix_sum`'s sampled-range form over the composite
    ``(group, score, key)``, so a big group spreads over many range
    partitions) minus a per-group exclusive base from a ≤ G-row counts
    relation (checkpointed once, broadcast back when G fits — counted,
    not guessed). Exact and deterministic like :func:`score_percentile`;
    single-row groups get 0.0; ``(group, score, key)`` must be unique,
    which a unique ``key_col`` guarantees.

    The range scan is used even for integral groups: the equal-width
    bucketed scan keys buckets on the leading column alone, which would
    fold each group into one bucket — the hot-reducer shape this
    operator exists to avoid.
    """
    gr = _grouped_ranks(
        df, group_col, score_col, key_col, num_partitions, max_broadcast_groups
    )
    pct = gr.select(
        key_col,
        (
            F.col("_gr").cast("double")
            / F.greatest(F.col("_n") - 1, F.lit(1)).cast("double")
        ).alias(out_col),
    )
    return df.join(pct, key_col)


def _grouped_ranks(
    df: DataFrame,
    group_col: str,
    score_col: str,
    key_col: str,
    num_partitions: "int | None",
    max_broadcast_groups: int,
) -> DataFrame:
    """(key, group, _gr, _n): each row's 0-based within-group rank by
    ``(score, key)`` plus its group size — the shared scan behind
    :func:`score_percentile_by` and :func:`take_top_fraction_by`."""
    from kafka_connect_gcs_spark.operators.packing import (
        _prefix_sum_sampled_ranges,
    )
    from pyspark.sql import Window

    keyed = df.select(group_col, key_col, score_col).withColumn(
        "_one", F.lit(1).cast("long")
    )
    ranked = _prefix_sum_sampled_ranges(
        keyed,
        group_col,
        "_one",
        out_col="_rank",
        num_partitions=num_partitions,
        tiebreak_col=[score_col, key_col],
    )
    # ≤ G rows; checkpointed so the gate count and the join share one
    # computation of the aggregate
    counts = (
        keyed.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=True)
    )
    n_groups = counts.count()  # metadata-scale (reads the checkpoint)
    # exclusive running base over groups in scan order (group ASC NULLS
    # FIRST — the same order the range scan used). The unpartitioned
    # window moves only the G-row counts relation through one task.
    wbase = Window.orderBy(group_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = counts.select(
        group_col,
        "_n",
        F.coalesce(F.sum("_n").over(wbase), F.lit(0)).alias("_base"),
    )
    if n_groups <= max_broadcast_groups:
        bases = F.broadcast(bases)
    return ranked.join(bases, group_col).select(
        key_col,
        group_col,
        (F.col("_rank") - F.col("_base")).alias("_gr"),
        "_n",
    )


def take_top_fraction_by(
    df: DataFrame,
    fraction: float,
    group_col: str,
    score_col: str,
    key_col: str = "doc_id",
    num_partitions: "int | None" = None,
    max_broadcast_groups: int = 1_000_000,
) -> DataFrame:
    """Keep exactly ``floor(fraction · n_g)`` highest-scoring rows WITHIN
    each group (ties broken by key): the per-group form of
    :func:`take_top_fraction`, i.e. "the top 20% of each language", via
    the same scan-minus-base grouped rank — no per-group window, no hot
    reducer. Returns ``df``'s rows unchanged."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    gr = _grouped_ranks(
        df, group_col, score_col, key_col, num_partitions, max_broadcast_groups
    )
    kept = gr.where(
        F.col("_gr")
        >= F.col("_n") - F.floor(F.col("_n") * F.lit(float(fraction)))
    ).select(key_col)
    return df.join(kept, key_col)


def take_top_fraction(
    df: DataFrame,
    fraction: float,
    score_col: str,
    key_col: str = "doc_id",
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Keep exactly ``floor(fraction · n)`` highest-scoring rows (ties
    broken by key, so the kept set is deterministic): the rows whose
    ``(score, key)`` rank is ≥ ``n − k``. The exact-count form of the
    quality-threshold selection :func:`score_percentile` calibrates."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    from kafka_connect_gcs_spark.operators.packing import exclusive_prefix_sum

    keyed = df.select(F.col(key_col), F.col(score_col)).withColumn(
        "_one", F.lit(1).cast("long")
    )
    ranked = exclusive_prefix_sum(
        keyed,
        score_col,
        "_one",
        out_col="_rank",
        num_partitions=num_partitions,
        tiebreak_col=key_col,
    )
    n = ranked.agg(F.count(F.lit(1)).alias("_n"))
    kept = (
        ranked.crossJoin(F.broadcast(n))
        .where(
            F.col("_rank")
            >= F.col("_n") - F.floor(F.col("_n") * F.lit(float(fraction)))
        )
        .select(key_col)
    )
    return df.join(kept, key_col)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    max_rows: int,
    id_col: str = "doc_id",
    seed: int = 0,
    portable: bool = False,
    partial: bool = True,
) -> DataFrame:
    """Frequency cap: keep at most ``max_rows`` rows per ``key_col`` value
    (the CommonCrawl-style per-domain cap), chosen DETERMINISTICALLY — the
    survivors are the ``max_rows`` smallest ``(hash_bucket(id), id)`` per
    key, so reruns, retries, and incremental extensions agree on the kept
    set and the cap composes with every other hash-keyed decision here.

    Scale shape: the exact rank needs one shuffle on the key (a window),
    but with ``partial=True`` (default) an Arrow-batched per-batch pre-cap
    runs first: within each in-memory batch only the ``max_rows`` best
    rows per key survive, which is a superset of the global winners (a row
    outranked ``max_rows`` times within one batch is outranked globally),
    so a 100k-page domain ships ≤ max_rows per batch into the exchange
    instead of 100k — the hot-domain skew never reaches the shuffle. The
    pre-cap is vectorized pandas (groupby.rank), no per-row Python.
    """
    if max_rows < 1:
        raise ValueError(f"max_rows must be ≥ 1: {max_rows}")
    u = hash_bucket(F.col(id_col), seed, portable)
    work = df.withColumn("_u", u)
    if partial:
        import pandas as pd  # noqa: F401

        fields = work.schema.fieldNames()

        def precap(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf
                    continue
                rk = (
                    pdf.sort_values(["_u", id_col])
                    .groupby(key_col, sort=False)
                    .cumcount()
                )
                yield pdf.loc[rk[rk < max_rows].index, fields]

        work = work.mapInPandas(precap, schema=work.schema)
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col("_u"), F.col(id_col))
    return (
        work.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_rows)
        .drop("_u", "_rk")
    )
