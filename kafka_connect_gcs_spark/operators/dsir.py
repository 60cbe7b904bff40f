"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents that look like a small TARGET corpus: fit
smoothed bag-of-hashed-n-gram unigram models p (target) and q (raw), score
every raw document with the importance log-weight

    log w(x) = Σ_b c_b(x) · (ln p_b − ln q_b)

(c_b = count of hashed gram b in x), then sample k documents WITHOUT
replacement with probability ∝ w(x)^(1/T) via the Gumbel-top-k trick —
rank by ``log w / T + Gumbel(seeded per-doc hash)`` and take the top k.
The Gumbel noise is a pure function of (doc id, seed), so the draw is
deterministic and the DuckDB oracle replays fit, weighting, AND the draw.

Beyond the reference's scope (it never inspects payloads); this is the
standard pretraining-data targeting pass (DSIR / DoReMi-adjacent). Scale
shape at 100 TB:

* fitting is one explode + one partially-aggregated ``groupBy(bucket)``
  per corpus — the shuffle carries ``(bucket, count)`` pairs only, never
  text, and the result is bounded by ``n_buckets`` (2^18-2^21);
* corpus totals are 1-row aggregates joined by broadcast — no driver-side
  collect anywhere;
* scoring joins the exploded grams against the BROADCAST ratio relation —
  raw documents never shuffle to be scored;
* the draw is ``TakeOrderedAndProject`` (top-k heap per partition, k rows
  to the driver), not a global sort.

Reference scope note: the GCS connector (e.g. GCSSinkTask.java) moves
payloads byte-opaquely; content-aware selection is engine-added surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.classifier import hashed_features
from kafka_connect_gcs_spark.operators.util import spread_small_input

#: 60-bit md5-derived hash space (matches the portable bucket hash).
_H60 = float(1 << 60)


def _gram_counts(
    df: DataFrame,
    text_col: str,
    n_buckets: int,
    use_bigrams: bool,
    portable: bool,
) -> DataFrame:
    """``(bucket, c)`` gram-instance counts over a corpus (multiplicity
    kept — DSIR's models are multinomial, unlike the NB classifier's
    Bernoulli set features)."""
    return (
        spread_small_input(df)
        .select(
            F.explode(
                hashed_features(
                    F.col(text_col),
                    n_buckets=n_buckets,
                    use_bigrams=use_bigrams,
                    portable=portable,
                    distinct=False,
                )
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("double").alias("c"))
    )


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    use_bigrams: bool = True,
    smoothing: float = 1.0,
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Fit the two hashed-gram unigram models; return ``(ratios, model)``.

    * ``ratios``: ``(bucket, log_ratio)`` with
      ``log_ratio = ln((t_c+a)/(T+aB)) − ln((r_c+a)/(R+aB))`` (add-``a``
      smoothing over the ``B = n_buckets`` bucket space; ``T``/``R`` are
      total gram instances) for every bucket seen in EITHER corpus — at
      most ``n_buckets`` rows, broadcastable;
    * ``model``: ONE row ``(default_ratio, t_total, r_total, n_buckets,
      use_bigrams, portable)`` — ``default_ratio`` is the log-ratio of a
      bucket unseen in both corpora; the featurization config rides along
      so weighting defaults to the exact fit-time bucket space.
    """
    a = float(smoothing)
    b_sp = float(n_buckets)
    t = _gram_counts(target, text_col, n_buckets, use_bigrams, portable)
    r = _gram_counts(raw, text_col, n_buckets, use_bigrams, portable)
    totals = (
        t.agg(F.sum("c").alias("t_total"))
        .crossJoin(r.agg(F.sum("c")).toDF("r_total"))
        .select(
            F.coalesce("t_total", F.lit(0.0)).alias("t_total"),
            F.coalesce("r_total", F.lit(0.0)).alias("r_total"),
        )
    )
    joined = (
        t.withColumnsRenamed({"c": "t_c"})
        .join(r.withColumnsRenamed({"c": "r_c"}), "bucket", "full_outer")
        .crossJoin(F.broadcast(totals))
    )
    ratios = joined.select(
        "bucket",
        (
            F.log(
                (F.coalesce("t_c", F.lit(0.0)) + a)
                / (F.col("t_total") + a * b_sp)
            )
            - F.log(
                (F.coalesce("r_c", F.lit(0.0)) + a)
                / (F.col("r_total") + a * b_sp)
            )
        ).alias("log_ratio"),
    )
    model = totals.select(
        (
            F.log(F.lit(a) / (F.col("t_total") + a * b_sp))
            - F.log(F.lit(a) / (F.col("r_total") + a * b_sp))
        ).alias("default_ratio"),
        "t_total",
        "r_total",
        F.lit(n_buckets).alias("n_buckets"),
        F.lit(use_bigrams).alias("use_bigrams"),
        F.lit(portable).alias("portable"),
    )
    return ratios, model


def dsir_weights(
    df: DataFrame,
    ratios: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    use_bigrams: bool | None = None,
    portable: bool | None = None,
) -> DataFrame:
    """Per-document importance log-weights: ``(id, n_grams, log_w)``.

    ``log_w = Σ gram instances coalesce(log_ratio, default_ratio)`` — the
    multiplicity-weighted sum is exactly ``Σ_b c_b · log_ratio_b``, with a
    single explode and the ratio relation broadcast. Documents with no
    grams (empty text) get ``log_w = 0``. ``log_w`` is rounded to 6 —
    both for oracle hash parity and so :func:`dsir_resample`'s ranking key
    starts from the same value on both sides (last-ulp ``ln`` differences
    between engines are rounded away before they can flip a draw).

    Featurization params default to the fit-time values recorded on
    ``model`` (one metadata-scale ``first()``); overriding with different
    values puts documents in a different bucket space and silently
    mis-weights everything.
    """
    if n_buckets is None or use_bigrams is None or portable is None:
        cfg = model.select("n_buckets", "use_bigrams", "portable").first()
        n_buckets = cfg["n_buckets"] if n_buckets is None else n_buckets
        use_bigrams = cfg["use_bigrams"] if use_bigrams is None else use_bigrams
        portable = cfg["portable"] if portable is None else portable
    grams = spread_small_input(df).select(
        F.col(id_col),
        F.explode(
            hashed_features(
                F.col(text_col),
                n_buckets=n_buckets,
                use_bigrams=use_bigrams,
                portable=portable,
                distinct=False,
            )
        ).alias("bucket"),
    )
    summed = (
        grams.join(F.broadcast(ratios), "bucket", "left")
        .crossJoin(F.broadcast(model.select("default_ratio")))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("log_ratio", "default_ratio")).alias("_s"),
        )
    )
    return (
        df.select(id_col)
        .join(summed, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(F.coalesce("_s", F.lit(0.0)), 6).alias("log_w"),
        )
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    k: int,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 18,
    use_bigrams: bool = True,
    smoothing: float = 1.0,
    portable: bool = False,
    temperature: float = 1.0,
) -> DataFrame:
    """Composed fit → weight → Gumbel-top-k selection over one corpus,
    featurizing the raw corpus ONCE.

    Row-identical to ``dsir_fit`` + ``dsir_weights`` + ``dsir_resample``
    (same expressions over the same gram relation), composed so the whole
    selection is ONE eager job. The gram relation is deliberately NOT
    cached: persisting the exploded (id, bucket) rows costs more than
    recomputing the explode for its second consumer (measured at sf1.0
    warm: 4.1 s with the persist vs 2.1 s recomputing — cache
    serialization of the explode's output volume dominates; the same
    lesson as the verify-skill note about caching wide rows), so the
    bucket-count pass and the per-doc scoring pass each evaluate the
    explode once and nothing is retained afterwards.
    """
    a = float(smoothing)
    b_sp = float(n_buckets)
    grams = (
        spread_small_input(raw)
        .select(
            F.col(id_col),
            F.explode(
                hashed_features(
                    F.col(text_col),
                    n_buckets=n_buckets,
                    use_bigrams=use_bigrams,
                    portable=portable,
                    distinct=False,
                )
            ).alias("bucket"),
        )
    )
    t = _gram_counts(target, text_col, n_buckets, use_bigrams, portable)
    r = grams.groupBy("bucket").agg(F.count("*").cast("double").alias("c"))
    totals = (
        t.agg(F.sum("c").alias("t_total"))
        .crossJoin(r.agg(F.sum("c")).toDF("r_total"))
        .select(
            F.coalesce("t_total", F.lit(0.0)).alias("t_total"),
            F.coalesce("r_total", F.lit(0.0)).alias("r_total"),
        )
    )
    joined = (
        t.withColumnsRenamed({"c": "t_c"})
        .join(r.withColumnsRenamed({"c": "r_c"}), "bucket", "full_outer")
        .crossJoin(F.broadcast(totals))
    )
    ratios = joined.select(
        "bucket",
        (
            F.log(
                (F.coalesce("t_c", F.lit(0.0)) + a)
                / (F.col("t_total") + a * b_sp)
            )
            - F.log(
                (F.coalesce("r_c", F.lit(0.0)) + a)
                / (F.col("r_total") + a * b_sp)
            )
        ).alias("log_ratio"),
    )
    default_ratio = totals.select(
        (
            F.log(F.lit(a) / (F.col("t_total") + a * b_sp))
            - F.log(F.lit(a) / (F.col("r_total") + a * b_sp))
        ).alias("default_ratio")
    )
    summed = (
        grams.join(F.broadcast(ratios), "bucket", "left")
        .crossJoin(F.broadcast(default_ratio))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("log_ratio", "default_ratio")).alias("_s"),
        )
    )
    w = (
        raw.select(id_col)
        .join(summed, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(F.coalesce("_s", F.lit(0.0)), 6).alias("log_w"),
        )
    )
    return dsir_resample(
        w, k, seed=seed, temperature=temperature, id_col=id_col
    ).localCheckpoint(eager=True)


def gumbel_noise(id_col, seed: int = 0):
    """Deterministic standard-Gumbel draw per id: ``−ln(−ln(u))`` with
    ``u = (h + 0.5) / 2^60`` from the portable md5-derived 60-bit hash of
    ``"<id>:<seed>"`` — u ∈ (0,1) strictly, so both logs are finite. Pure
    Catalyst expressions, replayable bit-for-bit in the DuckDB oracle."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(_H60)
    return -F.log(-F.log(u))


def dsir_resample(
    weights: DataFrame,
    k: int,
    seed: int = 0,
    temperature: float = 1.0,
    id_col: str = "doc_id",
    weight_col: str = "log_w",
) -> DataFrame:
    """Gumbel-top-k draw of ``k`` documents without replacement with
    probability ∝ ``w^(1/temperature)``: ``(id, log_w, key, rank)``.

    ``key = log_w/T + Gumbel(id, seed)``; the global top-k is
    ``TakeOrderedAndProject`` (per-partition heaps, k rows to the driver),
    never a full sort — the one plan shape that survives 10^10 candidate
    documents. Ties (vanishingly rare for 6-dp keys, but cheap to pin)
    break by id so the draw is total-ordered and the oracle replay exact.
    All input columns ride through; ``key`` and ``rank`` are appended.
    """
    keyed = weights.select(
        "*",
        F.round(
            F.col(weight_col) / F.lit(float(temperature))
            + gumbel_noise(id_col, seed),
            6,
        ).alias("key"),
    )
    top = keyed.orderBy(F.desc("key"), F.col(id_col)).limit(int(k))
    w = Window.orderBy(F.desc("key"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))
