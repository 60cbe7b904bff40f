"""Hashed-n-gram linear text classifier: train + score, fastText-style.

The CCNet / FineWeb quality-filter shape: featurize a document as the SET
of hashed word uni/bi-grams (a fixed bucket space, so the model is a flat
weight vector), train a Bernoulli Naive-Bayes log-odds weight per bucket
from a labeled corpus, score = bias + Σ weights over the document's
distinct buckets, probability via the logistic. Linear-over-hashed-grams
is exactly fastText's model; NB log-odds gives closed-form "training" that
both Spark and the DuckDB oracle can replay bit-for-bit (counts + ln).

Beyond the reference's scope (it never inspects payloads). Scale shape:

* featurize + train are one explode and two partially-aggregated
  ``groupBy`` passes (bucket, then label counts) — shuffle carries
  ``(bucket, label)`` pairs only, never text;
* the model is bounded by ``n_buckets`` (choose 2^18-2^21 in production),
  so scoring joins the postings against a **broadcast** weight relation —
  the corpus never shuffles to be scored;
* unseen buckets still carry the smoothed default log-odds, kept as a
  1-row broadcast relation (no driver-side collect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.text import words


def hashed_features(
    col: Column, n_buckets: int = 1 << 18, use_bigrams: bool = True,
    portable: bool = False, distinct: bool = True,
) -> Column:
    """Hashed feature buckets (``array<bigint>``) of a text column: word
    unigrams plus adjacent-word bigrams, hashed into ``n_buckets``.

    ``distinct=True`` (Bernoulli/set features, the NB classifier's shape)
    dedups buckets per document; ``distinct=False`` keeps multiplicity
    (multinomial bag counts — what DSIR's importance weights need).
    ``portable=True`` hashes with the md5-derived 60-bit value (the DuckDB
    oracle recomputes every bucket); default is one ``xxhash64`` per gram.
    """
    ws = words(col)

    def bucket(g):
        if portable:
            h = F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        else:
            h = F.xxhash64(g)
        return F.pmod(h, F.lit(n_buckets))

    uni = F.transform(ws, bucket)
    if not use_bigrams:
        return F.array_distinct(uni) if distinct else uni
    n = F.size(ws)
    # pair adjacent words via zip_with(ws, shift(ws)) — an element_at(ws, i)
    # inside the lambda would re-tokenize the doc per bigram (interpreted
    # HOFs re-evaluate lambda-body expressions per element); zip_with's
    # array arguments are evaluated once per row. The zipped tail pair
    # (last word, null) is sliced off.
    zipped = F.zip_with(
        ws,
        F.slice(ws, 2, F.greatest(n - 1, F.lit(1))),
        lambda a, b: bucket(F.concat_ws(" ", a, b)),
    )
    bi = F.when(n >= 2, F.slice(zipped, 1, n - 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    both = F.concat(uni, bi)
    return F.array_distinct(both) if distinct else both


def nb_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 18,
    use_bigrams: bool = True,
    smoothing: float = 1.0,
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Train Bernoulli-NB log-odds weights over hashed features.

    ``label_col`` must be boolean. Returns ``(weights, model)``:

    * ``weights``: ``(bucket, weight)`` with
      ``weight = ln((pos_df+a)/(n_pos+2a)) − ln((neg_df+a)/(n_neg+2a))``
      (document frequencies, add-``a`` smoothing) — at most ``n_buckets``
      rows, broadcastable;
    * ``model``: ONE row ``(bias, default_w, n_pos, n_neg, n_buckets,
      use_bigrams, portable)`` where ``default_w`` is the weight of a
      bucket never seen in training and ``bias = ln((n_pos+a)/(n_neg+a))``
      — kept as a relation so scoring needs no driver collect. The
      featurization config rides along so :func:`classifier_score` can
      default to the EXACT train-time featurization (mismatched bucket
      spaces silently mis-score every document).
    """
    from kafka_connect_gcs_spark.operators.util import spread_small_input

    a = float(smoothing)
    # featurization (hash per gram) dominates — spread a few-file input
    feats = spread_small_input(df).select(
        F.col(id_col),
        F.col(label_col).cast("boolean").alias("_y"),
        F.explode(
            hashed_features(
                F.col(text_col), n_buckets=n_buckets, use_bigrams=use_bigrams,
                portable=portable,
            )
        ).alias("bucket"),
    )
    # document frequency per (bucket, label): features are distinct per doc
    per_bucket = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).cast("double").alias("pos_df"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).cast("double").alias("neg_df"),
    )
    totals = df.agg(
        F.sum(F.when(F.col(label_col).cast("boolean"), 1).otherwise(0))
        .cast("double")
        .alias("n_pos"),
        F.sum(F.when(F.col(label_col).cast("boolean"), 0).otherwise(1))
        .cast("double")
        .alias("n_neg"),
    )
    weights = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("pos_df") + a) / (F.col("n_pos") + 2 * a))
            - F.log((F.col("neg_df") + a) / (F.col("n_neg") + 2 * a))
        ).alias("weight"),
    )
    model = totals.select(
        F.log((F.col("n_pos") + a) / (F.col("n_neg") + a)).alias("bias"),
        (
            F.log(F.lit(a) / (F.col("n_pos") + 2 * a))
            - F.log(F.lit(a) / (F.col("n_neg") + 2 * a))
        ).alias("default_w"),
        "n_pos",
        "n_neg",
        F.lit(n_buckets).alias("n_buckets"),
        F.lit(use_bigrams).alias("use_bigrams"),
        F.lit(portable).alias("portable"),
    )
    return weights, model


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    use_bigrams: bool | None = None,
    portable: bool | None = None,
) -> DataFrame:
    """Score documents: ``(id, n_feats, score, prob)``.

    ``score = bias + Σ_buckets coalesce(weight, default_w)`` over the
    document's distinct buckets; ``prob = 1/(1+e^{−score})``. The weight
    relation is broadcast (bounded by ``n_buckets``); both floats are
    rounded to 6 for oracle hash parity.

    Featurization params default to the ones recorded on ``model`` at
    train time (one metadata-scale ``first()``); overriding them with
    values that differ from training puts documents in a different bucket
    space and silently mis-scores everything — only override with the
    train-time values (e.g. to skip the lookup in a hot loop).
    """
    if n_buckets is None or use_bigrams is None or portable is None:
        cfg = model.select("n_buckets", "use_bigrams", "portable").first()
        n_buckets = cfg["n_buckets"] if n_buckets is None else n_buckets
        use_bigrams = cfg["use_bigrams"] if use_bigrams is None else use_bigrams
        portable = cfg["portable"] if portable is None else portable
    from kafka_connect_gcs_spark.operators.util import spread_small_input

    feats = spread_small_input(df).select(
        F.col(id_col),
        F.explode(
            hashed_features(
                F.col(text_col), n_buckets=n_buckets, use_bigrams=use_bigrams,
                portable=portable,
            )
        ).alias("bucket"),
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .crossJoin(F.broadcast(model.select("default_w")))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum(F.coalesce("weight", "default_w")).alias("_sum_w"),
        )
    )
    base = df.select(id_col)
    return (
        base.join(scored, id_col, "left")
        .crossJoin(F.broadcast(model.select("bias")))
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.round(F.col("bias") + F.coalesce("_sum_w", F.lit(0.0)), 6).alias(
                "score"
            ),
            F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(-(F.col("bias") + F.coalesce("_sum_w", F.lit(0.0))))
                ),
                6,
            ).alias("prob"),
        )
    )
