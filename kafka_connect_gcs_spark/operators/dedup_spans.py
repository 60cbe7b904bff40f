"""Exact duplicated-span detection: cross-document repeated word k-grams.

The "exact substring dedup" pass of Lee et al., *Deduplicating Training
Data Makes Language Models Better* (2022), re-expressed for Spark: instead
of a distributed suffix array, roll a k-word-gram hash over every document
(positions kept), count each gram's document frequency corpus-wide, and
merge the positions of duplicated grams back into maximal spans per doc.

Beyond the reference's scope (byte-opaque payloads); part of the dedup
family next to exact/minhash/simhash (operators/dedup_text.py).

Scale shape:

* gram explosion is rows ∝ token volume — the floor for substring-level
  dedup — and the only corpus-sized shuffle is the ``groupBy(gram_hash)``
  document-frequency aggregate (partial/map-side combined; the shuffle
  carries ``(hash, id)`` pairs, never text);
* marking duplicated positions is a postings⨝dup-hashes join on the hash
  (dup hashes are usually a small fraction; the join output is bounded by
  the duplicated-gram postings);
* span merging is a per-document window (``partitionBy(doc)``) — millions
  of small groups, no single-key funnel.

Hashes default to ``xxhash64`` (one JVM hash per gram); ``portable=True``
uses the md5-derived 60-bit value DuckDB reproduces bit-for-bit (the
oracle replays the whole pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.text import words


def _gram_hash(gram, portable: bool):
    if portable:
        return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    return F.xxhash64(gram)


def gram_positions(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """``(id, n_words, pos, h)``: 1-based rolling word-k-gram hashes.

    Documents shorter than ``k`` words yield no rows (``sequence(1, n-k+1)``
    would count DOWN for n < k — Spark sequences are bidirectional — so the
    gram list is explicitly emptied there).
    """
    from kafka_connect_gcs_spark.operators.util import spread_small_input

    # STAGE the word array as a column before the gram lambda touches it:
    # interpreted HOFs re-evaluate expressions inside the lambda body per
    # element, so an inlined words(text) would re-tokenize the whole doc
    # once PER GRAM — O(words²) per doc (the winnow/minhash staging fix)
    staged = spread_small_input(df).select(
        F.col(id_col), words(F.col(text_col)).alias("_ws")
    )
    ws = F.col("_ws")
    n = F.size(ws)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # gramming+hashing is the dominant, embarrassingly-parallel cost —
    # spread_small_input above keeps a one-file input off a single core
    return (
        staged
        .select(F.col(id_col), n.alias("n_words"), F.posexplode(grams))
        .select(
            id_col,
            "n_words",
            (F.col("pos") + 1).alias("pos"),
            _gram_hash(F.col("col"), portable).alias("h"),
        )
    )


def duplicated_gram_hashes(
    gp: DataFrame, id_col: str = "doc_id", min_doc_freq: int = 2
) -> DataFrame:
    """Gram hashes appearing in ≥ ``min_doc_freq`` distinct documents.

    One corpus-wide aggregate on the hash; ``count(distinct id)`` runs as
    the standard two-level partial aggregation (expand + merge), so hot
    grams (boilerplate) are combined map-side before the exchange.
    """
    return (
        gp.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_doc_freq)
        .select("h", "n_docs")
    )


def _dup_hash_keys(gp, id_col: str, min_doc_freq: int):
    """Just the duplicated-hash KEYS (no ``n_docs``). At the Lee et al.
    default ``min_doc_freq=2`` the predicate "appears in ≥ 2 distinct
    documents" is exactly ``min(id) != max(id)`` — ONE exchange whose
    map-side combine collapses every same-hash row in a partition to a
    single (h, lo, hi) partial. ``countDistinct`` plans as TWO corpus
    exchanges (the distinct (h, id) pairs, then the per-h count), which
    at the replicated-corpus scaling bench was the op's worst stage.
    Thresholds above 2 need the true distinct count and fall back."""
    if min_doc_freq <= 2:
        return (
            gp.groupBy("h")
            .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
            .where(
                F.col("_lo") != F.col("_hi")
                if min_doc_freq == 2
                else F.lit(True)
            )
            .select("h")
        )
    return duplicated_gram_hashes(
        gp, id_col=id_col, min_doc_freq=min_doc_freq
    ).select("h")


def dup_span_stats(
    df: DataFrame,
    k: int = 5,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
    eager: bool = True,
    max_broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """Per-document duplicated-span statistics.

    A *span* is a maximal run of duplicated gram start positions whose
    gram windows overlap or touch (next start ≤ prev start + k); the span
    covers ``last_start − first_start + k`` words. Returns

    ``(id, n_words, n_dup_grams, n_spans, dup_words, dup_frac)``

    for EVERY input document (docs with no duplicated grams report zeros),
    ``dup_frac`` rounded to 6 so the DuckDB oracle hashes identically.

    With ``eager=True`` (default) the per-doc span aggregate — narrow rows,
    only for docs that HAVE duplicated grams — is materialized via
    ``localCheckpoint`` and the gram-postings cache released before
    returning; the final left join against the doc lengths stays lazy
    (never materialize document text twice). ``eager=False`` keeps the
    whole plan lazy and leaves the cache to LRU eviction.
    """
    from pyspark import StorageLevel

    # the gram explode + hash is the dominant cost and feeds BOTH the
    # document-frequency aggregate and the position join — persist the
    # narrow (id, pos, h) rows so it runs once (the minhash pipeline's
    # persisted-signature-pass pattern)
    gp = gram_positions(
        df, k=k, text_col=text_col, id_col=id_col, portable=portable
    ).select(id_col, "pos", "h").persist(StorageLevel.MEMORY_AND_DISK)
    # the duplicated-hash side is an aggregate output, so AQE broadcasts
    # it from its RUNTIME bytes when it is small and degrades to a
    # shuffle join when it is not — the separate persist+count() gate an
    # earlier revision paid was a whole extra job over the postings
    # (measured 1.7 -> 1.5 s warm, 7.9 -> 2.1 s cold at sf1.0 prod)
    dup_side = _dup_hash_keys(gp, id_col, min_doc_freq)
    marked = gp.join(dup_side, "h").select(id_col, "pos")

    # Span stats from ONE per-doc sorted position array instead of the
    # former lag/running-sum window + two chained groupBys: the exchange
    # (every marked (id, pos) to its doc) is identical, but the window's
    # per-partition sort machinery and the two downstream aggregation
    # stages collapse into integer array expressions. Equivalence to the
    # window form (span boundary where a[i] > a[i-1] + k) is exact
    # integer arithmetic:
    #   n_spans   = 1 + |{i ≥ 1 : a[i] > a[i-1] + k}|
    #   dup_words = Σ_span (last − first + k)
    #             = k·n_spans + (a[n-1] − a[0]) − Σ_boundary (a[i] − a[i-1])
    arr = marked.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("_ps")
    )
    a = F.col("_ps")
    n = F.size(a)
    tail = F.slice(a, 2, F.greatest(n - 1, F.lit(0)))
    head = F.slice(a, 1, F.greatest(n - 1, F.lit(0)))
    boundary_gap = F.aggregate(
        F.zip_with(
            tail,
            head,
            lambda x, y: F.when(x > y + F.lit(k), x - y).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, g: acc + g,
    )
    n_boundaries = F.aggregate(
        F.zip_with(
            tail,
            head,
            lambda x, y: (x > y + F.lit(k)).cast("int"),
        ),
        F.lit(0).cast("long"),
        lambda acc, g: acc + g,
    )
    n_spans = (F.lit(1) + n_boundaries).cast("long")
    spans = arr.select(
        F.col(id_col),
        n.cast("long").alias("n_dup_grams"),
        n_spans.alias("n_spans"),
        (
            F.lit(k) * n_spans
            + F.element_at(a, -1)
            - F.element_at(a, 1)
            - boundary_gap
        ).cast("long").alias("dup_words"),
    )
    if eager:
        spans = spans.localCheckpoint(eager=True)
        gp.unpersist()

    base = df.select(
        F.col(id_col), F.size(words(F.col(text_col))).alias("n_words")
    )
    return base.join(spans, id_col, "left").select(
        id_col,
        "n_words",
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_words", F.lit(0)).cast("long").alias("dup_words"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.coalesce("dup_words", F.lit(0)) / F.col("n_words"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_frac"),
    )


def remove_dup_spans(
    df: DataFrame,
    k: int = 5,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
    out_col: str = "clean_text",
    eager: bool = True,
    max_broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """Drop every word covered by a duplicated span and rebuild the text.

    Covered positions are expanded per duplicated gram (bounded: ≤ k rows
    per gram) and collected per document — per-doc state only, so the
    operator distributes; the rebuild keeps original word order via an
    index filter over the word array.

    ``eager=True`` (default) checkpoints the narrow per-doc covered-position
    sets and releases the gram-postings cache before returning; the text
    rebuild itself stays lazy (document text is never materialized twice).
    """
    from pyspark import StorageLevel

    gp = gram_positions(
        df, k=k, text_col=text_col, id_col=id_col, portable=portable
    ).select(id_col, "pos", "h").persist(StorageLevel.MEMORY_AND_DISK)
    # AQE-sized dup side, as in dup_span_stats (no persist+count gate)
    dup_side = _dup_hash_keys(gp, id_col, min_doc_freq)
    covered = (
        gp.join(dup_side, "h")
        .select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("cpos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("cpos").alias("_covered"))
    )
    if eager:
        covered = covered.localCheckpoint(eager=True)
        gp.unpersist()
    return rebuild_without_positions(df, covered, text_col, id_col, out_col)


def rebuild_without_positions(
    df: DataFrame,
    covered: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str,
) -> DataFrame:
    """Rebuild each doc's text dropping the 1-based word positions in
    ``covered`` (``(id_col, _covered array<int>)``; docs absent from
    ``covered`` pass through verbatim). The rebuild is an index filter
    over the word array — per-doc state only, map-side after the join."""
    ws = words(F.col(text_col))
    kept = F.filter(
        F.zip_with(
            ws,
            F.sequence(F.lit(1), F.size(ws)),
            lambda w_, i: F.struct(w_.alias("w"), i.alias("i")),
        ),
        lambda s: ~F.array_contains(F.col("_covered"), s["i"]),
    )
    return (
        df.join(covered, id_col, "left")
        .withColumn("_covered", F.coalesce("_covered", F.array().cast("array<int>")))
        .withColumn(out_col, F.concat_ws(" ", F.transform(kept, lambda s: s["w"])))
        .drop("_covered")
    )
