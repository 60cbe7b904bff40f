"""Full-text retrieval: BM25 scoring over an inverted-postings relation.

The reference never looks inside a payload (its formats are byte-opaque —
`common/.../BytesRecordReader.java`, `TrailingDelimiterFormat.java`), so
retrieval is an engine addition: a training-data pipeline needs lexical
search for eval-set mining, contamination probes, and quality spot-checks.

Scale shape (the 100 TB question):

* the corpus is tokenized ONCE (`doc_term_freqs`): one explode + one
  partial-aggregated ``groupBy(doc, word)`` — shuffle volume is the
  postings relation, which is the floor for any inverted index build;
* the query side is always broadcast (a query set is human-scale), so
  scoring is a map-side join against the postings — the corpus never
  re-shuffles for a new query batch;
* document frequencies are computed only for the query's words (a
  vocabulary-of-the-query-sized aggregate, broadcast back), never for the
  full corpus vocabulary;
* the final top-k uses the shared bounded two-phase finalization
  (:func:`..similarity.topk_per_query`) — no global window funnel.

Everything is Catalyst built-ins (whole-stage codegen); the scoring math
sticks to single-rounded double ops so the DuckDB oracle reproduces it
bit-for-bit after ``round(_, 6)``.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.similarity import topk_per_query
from kafka_connect_gcs_spark.operators.text import words


def doc_term_freqs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted-postings relation ``(id, word, tf, dl)``.

    One explode carrying the per-doc length alongside each word, then one
    partially-aggregated ``groupBy(doc, word)`` — ``dl`` is constant per
    doc so ``max`` folds it through the same aggregate (no second shuffle
    and no postings⨝lengths join).
    """
    from kafka_connect_gcs_spark.operators.util import spread_small_input

    ws = words(F.col(text_col))
    # tokenization is the dominant map cost — spread a few-file input
    exploded = spread_small_input(df).select(
        F.col(id_col), F.size(ws).alias("dl"), F.explode(ws).alias("word")
    )
    return exploded.groupBy(id_col, "word").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    eager: bool = True,
) -> DataFrame:
    """Top-k documents per query under Lucene-flavored BM25.

    ``idf = ln(1 + (N - df + .5)/(df + .5))``,
    ``score = Σ_terms idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))``
    summed over the query's DISTINCT words.

    Returns ``(query_id, id, score, rank)`` with ``rank`` 1..k per query,
    ordered by (rounded score desc, id asc) — rounding before ranking keeps
    tie-breaks identical in Spark and the DuckDB oracle.

    With ``eager=True`` (default) the bounded top-k result (≤ |queries|·k
    rows) is materialized via ``localCheckpoint`` and the temporary
    postings cache released before returning, so a long-lived service
    calling this per query batch never accumulates cached relations.
    ``eager=False`` keeps the plan lazy (the cache is then LRU-evicted).
    """
    ws = words(F.col(text_col))
    postings = doc_term_freqs(docs, text_col=text_col, id_col=id_col)

    # corpus-level constants as a 1-row relation (kept in-plan: no collect)
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(ws)).alias("avgdl"),
    )

    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(words(F.col(query_text_col)))).alias("word"),
    )
    qwords = qterms.select("word").distinct()

    # postings restricted to the query vocabulary — reused for both the
    # df aggregate and the scoring join, so keep the narrow rows around
    # for the two passes (released below under eager=True)
    hit = postings.join(F.broadcast(qwords), "word").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # document frequency over query words only: hit is unique per
    # (doc, word), so df is a plain count — a |query vocab|-row aggregate
    dfreq = hit.groupBy("word").agg(F.count("*").alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )

    scored = (
        hit.join(F.broadcast(dfreq), "word")
        .join(F.broadcast(qterms), "word")
        .crossJoin(F.broadcast(stats))
        .withColumn("_contrib", idf * tfn)
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("_contrib"), 6).alias("score"))
    )
    out = topk_per_query(
        scored, k, query_id_col=query_id_col, id_col=id_col, sim_col="score"
    )
    if not eager:
        return out
    out = out.localCheckpoint(eager=True)
    hit.unpersist()
    return out


def tfidf_topk_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: the top-``k`` terms by smoothed
    TF-IDF (``tf · (ln((N+1)/(df+1)) + 1)`` — the sklearn-flavored idf
    that never goes negative), ties broken by term so the ranking is
    total and engine-portable.

    Scale shape: the postings relation (one explode + partial-agg
    groupBy, shared with BM25's :func:`doc_term_freqs`) IS the shuffle
    floor; document frequency is one map-side-combined aggregate over
    the postings; N is a 1-row broadcast computed in-plan; the top-k
    window partitions BY DOCUMENT — millions of vocabulary-bounded
    groups, no global funnel. The score is rounded to 9 decimals before
    ranking so float ulp differences can never reorder engines.
    """
    from pyspark.sql import Window

    pairs = doc_term_freqs(df, text_col=text_col, id_col=id_col)
    dfreq = pairs.groupBy("word").agg(F.count("*").alias("doc_freq"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        pairs.join(dfreq, "word")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("doc_freq") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                9,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            F.col("word").alias("term"),
            "tf",
            "doc_freq",
            "tfidf",
            F.col("rank").cast("long").alias("rank"),
        )
    )
