"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from SURVEY.md §2
over the driver's testdata tables; ``oracle_sql()`` gives the DuckDB oracle
for each SQL-expressible one. Column names/aliases match pairwise; float
aggregations go through DECIMAL (exact) and back to DOUBLE so both engines
hash identically; array outputs are serialized with ``concat_ws`` to dodge
engine-specific array formatting; md5-derived hashes are bit-identical in
both engines by construction.

EVERY query has an oracle. The probabilistic/approximate families get one
of three treatments (round-2 upgrade — round 1 left five rows-only):

* portable hashing — simhash & minhash-LSH run with md5-derived hashes so
  DuckDB replays the ENTIRE pipeline (signatures, banding, candidate join,
  verify) bit-for-bit; the production xxhash64 paths are timed by bench.py
  and recall-asserted in pytest.
* order-matched float folds — ann_topk_float's oracle accumulates float32
  products in a sequential double left-fold exactly like F.aggregate, so
  even the float sums are bit-identical.
* measured-constant pinning — ann_topk_ivf reports recall@10 vs in-query
  brute force; the oracle pins the (deterministic) measured constants.
embedding_neardup plants near-duplicate vectors (clone + 1e-3 bump) so the
query returns verifiable rows; its oracle is the exact all-pairs join.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"

# per-language marker sets, duplicated into the SQL oracle strings below —
# keep in sync with kafka_connect_gcs_spark.operators.text.LANG_MARKERS
_LANGS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "es": ["el", "los", "las", "es", "y", "no", "con"],
    "fr": ["le", "la", "les", "et", "est", "pas", "avec"],
}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ts(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`_t` + round-robin spread for the per-document compute-heavy
    queries (md5 token/gram hashing, chunkers, HOF feature folds): the
    small corpus tables arrive as ONE parquet file (2 scan tasks at sf1.0
    under the bench's 8 MB split size), so without the spread a
    map-dominated query pins to 2 of 32 cores (guide §2: input skew).
    Purely a partitioning change — every consumer below is
    partition-order independent, so results are identical."""
    from kafka_connect_gcs_spark.operators.util import spread_small_input

    return spread_small_input(_t(spark, sf_dir, name))


# ---------------------------------------------------------------------------
# CDC / ingest family (events as the change feed: user_id = key,
# event_id = offset, event_type 'error' = tombstone)
# ---------------------------------------------------------------------------


def _latest_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = F.max_by(
        F.struct(
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        ),
        F.col("event_id"),
    )
    out = ev.groupBy("user_id").agg(w.alias("_w"))
    return out.select(
        "user_id",
        F.col("_w.last_event_id").alias("last_event_id"),
        F.col("_w.last_event_type").alias("last_event_type"),
        F.col("_w.last_value").alias("last_value"),
    )


def q_cdc_lww_latest(spark, sf_dir):
    """A26 LWW winner per key — operators.dedup.lww_dedup shape."""
    return _latest_events(spark, sf_dir)


def q_cdc_final_state(spark, sf_dir):
    """LWW + tombstone semantics: drop keys whose last op is a delete."""
    return _latest_events(spark, sf_dir).where(
        F.col("last_event_type") != F.lit("error")
    )


def q_cdc_merge_full_outer(spark, sf_dir):
    """MERGE shape (operators.merge.apply_changes): base ⟗ changes on key."""
    base = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("key"), F.col("source").alias("base_source")
    )
    ch = _latest_events(spark, sf_dir).select(
        F.col("user_id").alias("key"),
        F.col("last_event_type"),
        F.col("last_event_id"),
    )
    j = base.join(ch, "key", "full_outer")
    status = (
        F.when(F.col("base_source").isNull(), F.lit("insert"))
        .when(F.col("last_event_type").isNull(), F.lit("unchanged"))
        .when(F.col("last_event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return j.select(
        "key", "base_source", "last_event_type", "last_event_id", status.alias("status")
    )


def q_cdc_lineage_agg(spark, sf_dir):
    """Per-partition lineage (A19/A29): min/max offset + count per part."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("part", F.pmod(F.col("user_id"), F.lit(8)).cast("int"))
        .groupBy("part")
        .agg(
            F.min("event_id").alias("min_offset"),
            F.max("event_id").alias("max_offset"),
            F.count(F.lit(1)).alias("events"),
        )
    )


def q_cdc_offset_maxmerge(spark, sf_dir):
    """A26 offset max-merge: per-key high-water mark + delivered count."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max("event_id").alias("max_offset"), F.count(F.lit(1)).alias("events")
    )


def q_cdc_dedup_composite(spark, sf_dir):
    """Dedup on a composite key keeping first delivery (min offset)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id")
    )


# ---------------------------------------------------------------------------
# relational core (scan/filter/project, agg, join, window, sort/limit)
# ---------------------------------------------------------------------------


def q_scan_filter_project(spark, sf_dir):
    """TPC-H Q6 shape — predicate pushdown + column pruning to the scan."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )
    return out


def q_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — wide aggregate with exact decimal sums."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(
                dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).cast("double").alias("sum_disc_price"),
            F.sum(
                dec(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_revenue_by_nation(spark, sf_dir):
    """Multi-join with broadcast dims: lineitem ⋈ orders ⋈ customer ⋈ nation."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_window_topk_orders(spark, sf_dir):
    """Window top-k: 3 most expensive orders per customer."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_events_hourly_rollup(spark, sf_dir):
    """Tumbling-window rollup (streaming-style agg in batch form)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# text / training-data curation
# ---------------------------------------------------------------------------


def q_text_token_stats(spark, sf_dir):
    from kafka_connect_gcs_spark.operators.text import (
        fingerprint,
        punct_ratio,
        stopword_ratio,
        ws_token_count,
    )

    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        ws_token_count(c).alias("ws_tokens"),
        F.length(c).alias("chars"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        fingerprint(c).alias("fp"),
    )


def q_text_quality(spark, sf_dir):
    from kafka_connect_gcs_spark.operators.text import mean_word_len, quality_score

    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        F.round(mean_word_len(c), 6).alias("mean_word_len"),
        quality_score(c).alias("quality"),
    )


def q_text_langid(spark, sf_dir):
    from kafka_connect_gcs_spark.operators.text import lang_guess

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_guess(F.col("text")).alias("lang_guess"))


def q_text_minhash(spark, sf_dir):
    from kafka_connect_gcs_spark.operators.text import (
        minhash_signature_of_words,
        words,
    )

    d = _t(spark, sf_dir, "documents")
    # stage the word set; inlining it re-evaluates once per hash lane
    staged = d.select(
        "doc_id", F.array_distinct(words(F.col("text"))).alias("_ws")
    )
    sig = minhash_signature_of_words(F.col("_ws"), num_hashes=8)
    return staged.select("doc_id", F.concat_ws(",", sig).alias("sig"))


def q_dedup_exact_docs(spark, sf_dir):
    from kafka_connect_gcs_spark.operators.dedup_text import exact_dup_groups

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.where(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return exact_dup_groups(d.unionByName(clones))


def q_ngram_jaccard_pairs(spark, sf_dir):
    from kafka_connect_gcs_spark.operators.dedup_text import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 120
    )
    return ngram_jaccard_pairs(d, n=1, threshold=0.5)


def q_neardup_components(spark, sf_dir):
    """Pairs → dedup DECISION: connected components (hash-to-min label
    propagation, distributed fixpoint loop) over the exact-Jaccard near-dup
    graph; smallest id per cluster survives. Oracle = DuckDB recursive CTE
    transitive closure — a genuinely iterative algorithm, SQL-oracled."""
    from kafka_connect_gcs_spark.operators.dedup_text import (
        neardup_dedup_decision,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 120
    )
    pairs = ngram_jaccard_pairs(d, n=1, threshold=0.5)
    dec = neardup_dedup_decision(pairs)
    return dec.select(
        "doc_id", "keep_id", F.col("drop").alias("is_drop")
    )


def q_minhash_lsh_neardup(spark, sf_dir):
    """The FULL MinHash-LSH pipeline (signatures → banded buckets →
    candidate join → exact-Jaccard verify) in engine-portable form: md5
    signatures + concat band buckets, which DuckDB replays verbatim — the
    oracle checks candidate GENERATION, not just verification. 3-gram
    shingles (word-set signatures degenerate on tiny-vocab corpora).
    Bounded to doc_id < 1000 because the md5 signature path costs ~50× the
    production xxhash64 path (which bench.py times on the full corpus)."""
    from kafka_connect_gcs_spark.operators.dedup_text import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 1000
    )
    return minhash_lsh_pairs(
        d, num_hashes=16, bands=8, threshold=0.5, shingle_n=3,
        portable=True, prefilter_slack=None,
    )


def q_simhash_neardup(spark, sf_dir):
    """Blocked SimHash near-dup in engine-portable form (60 md5-derived
    bits): DuckDB recomputes every document's simhash bit-for-bit and takes
    ALL pairs at Hamming ≤ 3; the engine's pigeonhole block join (4 blocks >
    3 flips) must find exactly the same set — the oracle therefore proves
    both the hash and the blocking recall. Production path (63-bit xxhash64)
    is timed by bench.py and covered by pytest recall assertions.

    Signatures come from the numpy fast path (sig_impl='pandas'), proven
    bit-identical to the Catalyst expression in test_training_ops — the
    interpreted 60-lane HOF accumulator dominated this query's time."""
    from kafka_connect_gcs_spark.operators.dedup_text import simhash_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 120
    )
    return simhash_pairs(
        d, max_hamming=3, blocks=4, portable=True, sig_impl="pandas"
    )


def q_text_winnow(spark, sf_dir):
    """Winnowing k-gram fingerprints (rolling-hash document sketch) in
    engine-portable form: md5-derived 60-bit gram hashes, window minima,
    distinct + sort — DuckDB replays every step bit-for-bit. Production
    path uses xxhash64 grams (operators/text.winnow_fingerprint)."""
    from kafka_connect_gcs_spark.operators.text import (
        gram_hashes,
        winnow_from_gram_hashes,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 300
    )
    # stage gram hashing; the sliding chain re-reads the attribute
    return d.select(
        "doc_id", gram_hashes(F.col("text"), k=8, portable=True).alias("_hs")
    ).select(
        "doc_id",
        F.concat_ws(
            ",", winnow_from_gram_hashes(F.col("_hs"), w=4)
            .cast("array<string>")
        ).alias("winnow"),
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing end-to-end through a REAL Arrow-batched
    mapInPandas pass: binary payloads → per-item codec features (FakeCodec:
    sha256-derived uint16 lanes — deterministic stand-in for image/audio
    decode, multimodal.py docstring). Features re-quantized to their exact
    uint16 values so DuckDB can rebuild them from the hex digest."""
    from kafka_connect_gcs_spark.operators.multimodal import (
        FakeCodec,
        MediaPipeline,
        synthesize_media_portable,
    )

    media = synthesize_media_portable(spark, 240)
    # codec pinned: MediaPipeline() auto-upgrades to RealCodec where PIL
    # exists, but THIS query's oracle replays FakeCodec's sha256 features
    feats = MediaPipeline(codec=FakeCodec()).extract_features(media)
    q = F.transform(
        "feature",
        lambda x: F.round(x.cast("double") * 65535.0).cast("int").cast("string"),
    )
    return feats.select(
        "media_id", "kind", F.concat_ws(",", q).alias("feature_q")
    )


def q_multimodal_frame_plan(spark, sf_dir):
    """Video frame-sampling plan (metadata-only sequence/explode — pure
    Catalyst; the actual frame decode would be a second mapInPandas over
    (payload, frame_ts_ms))."""
    from kafka_connect_gcs_spark.operators.multimodal import (
        MediaPipeline,
        synthesize_media_portable,
    )

    media = synthesize_media_portable(spark, 240)
    return MediaPipeline().frame_sample_plan(media, every_ms=1000)


def q_asof_join(spark, sf_dir):
    """Backward as-of join (operators/asof.py, union strategy): for each
    purchase, the same user's most recent view at-or-before it."""
    from kafka_connect_gcs_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    out = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="view_ts",
        right_values=["view_event_id"],
    )
    return out.select("event_id", "user_id", "view_event_id")


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap) per user."""
    from kafka_connect_gcs_spark.operators.asof import sessionize

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event_id"),
        F.max("event_id").alias("last_event_id"),
    )


def q_rollup_pricing(spark, sf_dir):
    """ROLLUP aggregate (grouping-sets family)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
    )


def q_set_ops(spark, sf_dir):
    """Set operators: users with clicks EXCEPT purchasers, UNION ALL users
    with signups INTERSECT error-reporters (tagged so one result set)."""
    ev = _t(spark, sf_dir, "events")

    def users(t):
        return ev.where(F.col("event_type") == t).select("user_id").distinct()

    a = users("click").exceptAll(users("purchase")).withColumn("tag", F.lit("click_not_buy"))
    b = users("signup").intersect(users("error")).withColumn("tag", F.lit("signup_and_error"))
    return a.unionByName(b)


def q_cube_status_priority(spark, sf_dir):
    """CUBE over (status, priority) — all 4 grouping combinations in one
    pass (rollup_pricing covers the hierarchical variant)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"),
                2,
            ).alias("total"),
        )
    )


def q_semi_anti_join(spark, sf_dir):
    """Semi/anti joins as first-class queries (the reference only uses an
    anti-join implicitly inside MERGE deletes): BUILDING-segment customers
    split by whether they have a finished order."""
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_acctbal")
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_custkey"
    )
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").withColumn(
        "tag", F.lit("has_f_order")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").withColumn(
        "tag", F.lit("no_f_order")
    )
    return semi.unionByName(anti).select(
        "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "tag"
    )


def q_quantiles_by_priority(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: both rank at p·(n−1) and lerp in double)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------


def _quantized(df):
    """floor(x*1000+0.5) per component: integer-exact in both engines."""
    return df.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000.0 + 0.5).cast("long"),
        ).alias("q"),
    )


def q_ann_topk_quantized(spark, sf_dir):
    """Exact top-k cosine over integer-quantized embeddings — every
    arithmetic op is exact or single-rounded, so DuckDB reproduces the sims
    bit-for-bit (unlike raw float32 accumulation). Finalized via the
    bounded two-phase top-k (no full-relation window on query_id)."""
    from kafka_connect_gcs_spark.operators.similarity import topk_per_query

    # spread the one-file scan: the interpreted dot/norm folds below are
    # the whole cost and otherwise run on the scan's 2 tasks (~2× measured)
    e = _quantized(_ts(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    dotq = F.aggregate(
        F.zip_with(F.col("q"), F.col("qv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0).cast("long"), lambda acc, v: acc + v * v).cast(
            "double"
        )
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(dotq.cast("double") / (nrm(F.col("q")) * nrm(F.col("qv"))), 6).alias(
            "sim"
        ),
    )
    return topk_per_query(scored, 10)


def q_ann_topk_float(spark, sf_dir):
    """True float cosine top-k. Oracle-exact: both engines compute float32
    products then a SEQUENTIAL double left-fold in element order (Spark
    F.aggregate ≙ DuckDB list_reduce), so the sums are bit-identical —
    unlike DuckDB's list_dot_product, whose accumulation order differs at
    ~1e-6."""
    from kafka_connect_gcs_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(e, q, k=10)


def q_ann_topk_ivf(spark, sf_dir):
    """IVF approximate top-k, reported as recall@10 against the exact
    brute-force top-10 (both computed in-query): one row per query with
    (hits, recall). IVF is approximate by design, so the oracle pins the
    MEASURED deterministic recall at sf0.01 as constants — a quantitative
    regression gate rather than a rows-only smoke check. The raw top-k list
    path is timed by bench.py on the full corpus."""
    from kafka_connect_gcs_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = ivf_topk(
        e, q, k=10, num_centroids=16, nprobe=4, iterations=10, cache_key=sf_dir
    ).select("query_id", "vec_id")
    truth = brute_force_topk(e, q, k=10).select("query_id", "vec_id")
    hits = ivf.join(truth, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits")
    )
    # left join from the full query set so a zero-recall query still shows up
    base = q.select("query_id").distinct()
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        F.round(F.coalesce(F.col("hits"), F.lit(0)) / 10.0, 2).alias("recall"),
    )


def q_ann_topk_pq(spark, sf_dir):
    """Product-quantization ADC top-k (operators/pq.py), reported as
    recall@10 vs in-query brute force — same quantitative-gate pattern as
    ann_topk_ivf: PQ is lossy by design, so the oracle pins the MEASURED
    deterministic recall at sf0.01. The corpus is scanned as 8-int codes
    (encode-once-at-write in production), scores are LUT sums in the JVM,
    and the only exchange is the bounded top-k finalization."""
    from kafka_connect_gcs_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from kafka_connect_gcs_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq_train(e, num_subspaces=8, codes_per_subspace=16, iterations=3)
    codes = pq_encode(e, books)
    approx = pq_adc_topk(codes, books, q, k=10).select("query_id", "vec_id")
    truth = brute_force_topk(e, q, k=10).select("query_id", "vec_id")
    hits = approx.join(truth, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits")
    )
    base = q.select("query_id").distinct()
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        F.round(F.coalesce(F.col("hits"), F.lit(0)) / 10.0, 2).alias("recall"),
    )


def q_ann_topk_pq_refined(spark, sf_dir):
    """ADC + exact-refine two-stage PQ search (operators/pq.py,
    pq_refine_topk — FAISS IndexRefineFlat): the ADC top-40 candidate set
    is re-scored against full-precision vectors and re-ranked to top-10.
    Reported as recall@10 vs in-query brute force; the oracle pins the
    MEASURED deterministic recall at sf0.01 — materially above raw ADC's
    (ann_topk_pq) because quantization error now only costs recall when a
    true neighbor misses the expanded candidate set."""
    from kafka_connect_gcs_spark.operators.pq import (
        pq_encode,
        pq_refine_topk,
        pq_train,
    )
    from kafka_connect_gcs_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq_train(e, num_subspaces=8, codes_per_subspace=16, iterations=3)
    codes = pq_encode(e, books)
    approx = pq_refine_topk(e, codes, books, q, k=10, expand=4).select(
        "query_id", "vec_id"
    )
    truth = brute_force_topk(e, q, k=10).select("query_id", "vec_id")
    hits = approx.join(truth, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits")
    )
    base = q.select("query_id").distinct()
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        F.round(F.coalesce(F.col("hits"), F.lit(0)) / 10.0, 2).alias("recall"),
    )


def q_embedding_neardup(spark, sf_dir):
    """RP-LSH cosine near-dup over quantized embeddings with PLANTED
    near-duplicates (vec_id < 20 cloned at +1e-3 on one dimension, ids
    offset by 1e6) — the natural corpus has no pairs ≥ 0.8, so round 1's
    version returned 0 rows and proved nothing. Quantized integer
    arithmetic makes the cosine bit-reproducible in DuckDB; the oracle is
    the exact all-pairs join, so a hash match also proves the
    random-hyperplane bucketing recalled every qualifying pair."""
    from kafka_connect_gcs_spark.operators.similarity import rp_bucket

    e = _quantized(_t(spark, sf_dir, "embeddings"))
    clones = e.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "q",
            lambda x, i: x
            + F.when(
                i == F.pmod(F.col("vec_id"), F.lit(64)), F.lit(1)
            ).otherwise(F.lit(0)),
        ).alias("q"),
    )
    u = e.unionByName(clones)
    qd = F.col("q").cast("array<double>")
    dotq = F.aggregate(
        F.zip_with(F.col("q_a"), F.col("q_b"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0).cast("long"), lambda acc, v: acc + v * v).cast(
            "double"
        )
    )
    a = u.select(
        F.col("vec_id").alias("id_a"),
        F.col("q").alias("q_a"),
        rp_bucket(qd, 4, dim=64).alias("bkt"),
    )
    b = u.select(
        F.col("vec_id").alias("id_b"),
        F.col("q").alias("q_b"),
        rp_bucket(qd, 4, dim=64).alias("bkt"),
    )
    return (
        a.join(b, "bkt")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dotq.cast("double") / (nrm(F.col("q_a")) * nrm(F.col("q_b"))), 6
            ).alias("sim"),
        )
        .where(F.col("sim") >= 0.8)
        .dropDuplicates(["id_a", "id_b"])
    )


def q_take_top_fraction(spark, sf_dir):
    """Exact-count quality-threshold selection (operators/sampling.py,
    take_top_fraction): keep exactly floor(0.25·n) highest-n_chars docs,
    ties broken by doc_id — the selector score_percentile calibrates.
    Oracle = row_number over the same (score, key) total order."""
    from kafka_connect_gcs_spark.operators.sampling import take_top_fraction

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return take_top_fraction(d, 0.25, "n_chars").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style embedding dedup DECISION (operators/similarity.py,
    semantic_dedup): the planted-clone corpus of q_embedding_neardup
    (vec_id < 20 cloned at +1 on one quantized dim, ids offset 1e6) run
    through the full composition — RP-LSH bucketed cosine pairs ≥ 0.8 →
    connected components → keep the smallest id per cluster — and joined
    back so EVERY doc gets (keep_id, is_drop). The oracle computes pairs
    by the exact all-pairs join and the closure by a recursive CTE, so a
    hash match proves LSH recall, the distributed CC fixpoint, and the
    decision join in one go."""
    from kafka_connect_gcs_spark.operators.similarity import semantic_dedup

    e = _quantized(_t(spark, sf_dir, "embeddings"))
    clones = e.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "q",
            lambda x, i: x
            + F.when(
                i == F.pmod(F.col("vec_id"), F.lit(64)), F.lit(1)
            ).otherwise(F.lit(0)),
        ).alias("q"),
    )
    u = e.unionByName(clones)
    return semantic_dedup(
        u, threshold=0.8, num_planes=4, id_col="vec_id", vec_col="q", dim=64
    ).select("vec_id", "keep_id", "is_drop")


def q_bigram_logprob(spark, sf_dir):
    """Corpus-bigram LM quality score (operators/curation.py,
    bigram_logprob): mean ln P(w_i | w_{i-1}) per doc under the corpus's
    own bigram distribution — the order-1 CCNet perplexity filter; flags
    scrambled word order the unigram model can't see."""
    from kafka_connect_gcs_spark.operators.curation import bigram_logprob

    d = _ts(spark, sf_dir, "documents")
    return bigram_logprob(d).select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        "avg_logprob",
    )


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (operators/dsir.py): fit hashed uni+bi-
    gram unigram models over the German docs (target) vs the whole corpus
    (raw), weight every doc by the smoothed log-ratio sum, and draw the
    top-200 by Gumbel-top-k (seed 7) — sampling without replacement with
    probability ∝ w. The oracle replays fit, weighting, noise, and the
    draw (portable md5 buckets, deterministic per-doc Gumbel hash)."""
    from kafka_connect_gcs_spark.operators.dsir import dsir_select

    d = _t(spark, sf_dir, "documents")
    target = d.where(F.col("lang") == "de")
    # composed fit→weight→draw: featurizes the corpus once (the separate
    # fit/weights calls paid the hashed-gram explode twice); identical
    # expressions, oracle-identical rows
    return dsir_select(target, d, k=200, seed=7, n_buckets=1 << 18,
                       portable=True)


def q_corpus_split(spark, sf_dir):
    """Deterministic train/val/test assignment (operators/sampling.py,
    split_corpus): disjoint-and-exhaustive hash split, 90/5/5, seed 11.
    Map-only — the oracle replays the portable hash draw and the
    cumulative-fraction CASE per doc."""
    from kafka_connect_gcs_spark.operators.sampling import split_corpus

    d = _t(spark, sf_dir, "documents")
    out = split_corpus(
        d, {"train": 0.9, "val": 0.05, "test": 0.05}, seed=11, portable=True
    )
    return out.select("doc_id", "split")


def q_length_batches(spark, sf_dir):
    """Pad-efficient length-bucketed batching (operators/packing.py,
    length_bucket_batches): bucket docs by word count (boundaries
    24/48/72), shuffle within buckets by the portable hash, cut batches
    of 8, pad each to its batch max. The oracle replays bucketing, the
    within-bucket hash order, rank arithmetic, and the batch-max window."""
    from kafka_connect_gcs_spark.operators.packing import length_bucket_batches
    from kafka_connect_gcs_spark.operators.text import ws_token_count

    d = _ts(spark, sf_dir, "documents").select(
        "doc_id", ws_token_count(F.col("text")).alias("n_tok")
    )
    out = length_bucket_batches(
        d, batch_size=8, boundaries=[24, 48, 72], seed=5, portable=True
    )
    return out.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("bucket").cast("long").alias("bucket"),
        "batch_idx",
        "pos",
        "padded_len",
    )


def q_dedup_incremental(spark, sf_dir):
    """Batch-vs-lake dedup against a STORED minhash index: docs < 300 are
    the indexed corpus; the incoming batch is docs ≥ 300 plus planted
    near-clones of docs < 20 (text + ' zzclone', ids offset 100000) so
    qualifying matches exist by construction. Matching is the portable
    md5 signature agreement (unbiased Jaccard estimate), best match per
    new doc. The oracle replays signatures, banded buckets, the
    cross-side candidate join, and the argmax — proving the whole
    index-probe pipeline, not just the verify step."""
    import hashlib
    import tempfile

    from kafka_connect_gcs_spark.operators.dedup_index import (
        dedup_against_index,
        minhash_index_write,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") < 300).select("doc_id", "text")
    clones = d.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzclone")).alias("text"),
    )
    batch = (
        d.where(F.col("doc_id") >= 300).select("doc_id", "text")
        .unionByName(clones)
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "sgmi-" + hashlib.md5(sf_dir.encode()).hexdigest()[:10],
    )
    minhash_index_write(
        corpus, path, num_hashes=16, bands=8, shingle_n=3, portable=True
    )
    return dedup_against_index(batch, path, threshold=0.5)


def q_pack_sequences(spark, sf_dir):
    """Training-sequence packing (GPT-style concat-and-chunk) over portable
    md5-derived tokens: docs in doc_id order are tokenized (lower +
    whitespace split, 7-hex-char md5 % 32000 — bit-identical in DuckDB),
    concatenated, and emitted as exact 128-token sequences. Exercises the
    distributed exclusive prefix sum (operators/packing.py) end-to-end;
    the oracle replays the identical arithmetic with window cumsum +
    list slicing."""
    from kafka_connect_gcs_spark.operators.packing import pack_sequences
    from kafka_connect_gcs_spark.operators.text import words

    d = _ts(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.transform(
            words(F.col("text")),
            lambda w: F.pmod(
                F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("long"),
                F.lit(32000),
            ).cast("int"),
        ).alias("tokens"),
    )
    return pack_sequences(toks, 128).select(
        "seq_id",
        F.concat_ws(",", "tokens").alias("tokens"),
        "n_tok",
        "n_docs",
    )


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-source sampling (operators/sampling.py,
    stratified_sample): keep fractions {src0: 0.8, src1: 0.25, src2: 0.5},
    default 0.1 — the verdict is a pure md5 hash of the doc key, so DuckDB
    replays membership bit-exactly (no RNG anywhere)."""
    from kafka_connect_gcs_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    return stratified_sample(
        d.select("doc_id", "source"),
        {"src0": 0.8, "src1": 0.25, "src2": 0.5},
        default=0.1,
        portable=True,
    )


def q_corpus_mix_epochs(spark, sf_dir):
    """Weighted corpus mixing with epoch upsampling (operators/sampling.py,
    corpus_mix): src0 at rate 2.5 (2 full epochs + half-sampled third),
    src1 at 0.4 (downsample), everything else 1.0. The partial-epoch
    verdict hashes (source|doc_id) with md5, so the oracle replays the
    full explode + keep arithmetic."""
    from kafka_connect_gcs_spark.operators.sampling import corpus_mix

    d = _t(spark, sf_dir, "documents")
    return corpus_mix(
        d.select("doc_id", "source"),
        {"src0": 2.5, "src1": 0.4},
        default=1.0,
        portable=True,
    ).select("doc_id", "source", F.col("epoch").cast("long").alias("epoch"))


def q_token_budget_head(spark, sf_dir):
    """Budgeted corpus selection (operators/sampling.py,
    take_token_budget): walk docs in doc_id order and keep every doc whose
    preceding token mass is < 12000 — the distributed exclusive prefix
    sum (packing.py) reused for corpus curation. Oracle: window cumsum."""
    from kafka_connect_gcs_spark.operators.sampling import take_token_budget
    from kafka_connect_gcs_spark.operators.text import ws_token_count

    d = _ts(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", ws_token_count(F.col("text")).cast("long").alias("n_tok")
    )
    return take_token_budget(toks, 12_000, order_col="doc_id")


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/curation.py, decontaminate):
    the held-out "eval suite" is every 13th document; flag corpus docs
    whose distinct word-5-gram sets overlap it ≥ 5%. The benchmark gram
    set is broadcast, so the corpus side never shuffles for the probe."""
    from kafka_connect_gcs_spark.operators.curation import decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 13 == 0)
    out = decontaminate(d, bench, n=5, threshold=0.05)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hit").cast("long").alias("n_hit"),
        "contamination",
        "contaminated",
    )


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals (operators/curation.py,
    repetition_stats): duplicate-word fraction + top-2/3-gram mass per
    doc, flagged at (0.6, 0.2, 0.18). Pure map — one corpus scan."""
    from kafka_connect_gcs_spark.operators.curation import repetition_stats

    d = _t(spark, sf_dir, "documents")
    out = repetition_stats(d)
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "dup_word_frac",
        "top2gram_frac",
        "top3gram_frac",
        "repetitive",
    )


def q_pii_scrub(spark, sf_dir):
    """PII scan + redaction (operators/curation.py): PII-shaped spans are
    injected deterministically (every 7th doc an email, every 11th an
    IPv4 + long account number — no external data), then counted and
    redacted; red_fp is the md5 of the redacted text so the oracle
    verifies the rewrite byte-for-byte."""
    from kafka_connect_gcs_spark.operators.curation import pii_redact, pii_stats

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    did = F.col("doc_id")
    injected = d.select(
        "doc_id",
        F.when(
            did % 7 == 0,
            F.concat(t, F.lit(" contact user"), did.cast("string"),
                     F.lit("@example.org")),
        )
        .when(
            did % 11 == 0,
            F.concat(t, F.lit(" from 10.2."), (did % 256).cast("string"),
                     F.lit(".7 acct 9003456789")),
        )
        .otherwise(t)
        .alias("text"),
    )
    st = pii_stats(injected).select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_long_digits").cast("long").alias("n_long_digits"),
        F.col("n_pii").cast("long").alias("n_pii"),
    )
    red = pii_redact(injected).select(
        "doc_id", F.md5("text").alias("red_fp")
    )
    return st.join(red, "doc_id")


def q_unigram_logprob(spark, sf_dir):
    """Corpus-unigram LM quality score (operators/curation.py,
    unigram_logprob): mean ln p(word) per doc under the corpus's own
    unigram distribution — the order-0 CCNet/KenLM perplexity filter."""
    from kafka_connect_gcs_spark.operators.curation import unigram_logprob

    d = _ts(spark, sf_dir, "documents")
    out = unigram_logprob(d)
    return out.select(
        "doc_id", F.col("n_words").cast("long").alias("n_words"), "avg_logprob"
    )


def q_bm25_search(spark, sf_dir):
    """Lexical retrieval (operators/search.py, bm25_topk): Lucene-flavored
    BM25 top-5 per query. Queries are the 4-word prefixes of every 29th
    document, so each query has a known best answer (its own doc) and the
    oracle replays idf/tf normalization/rank end-to-end."""
    from kafka_connect_gcs_spark.operators.search import bm25_topk
    from kafka_connect_gcs_spark.operators.text import words

    docs = _t(spark, sf_dir, "documents")
    queries = docs.where(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("query_id"),
        # slice the FILTERED word list — the oracle slices ws, so a doc
        # with leading/doubled whitespace must yield the same 4 words
        F.concat_ws(" ", F.slice(words(F.col("text")), 1, 4)).alias("qtext"),
    )
    # eager=False: one-shot analytics — skips the service default's
    # postings cache materialization and output checkpoint (in-context
    # A/B at the 10x scale: 8.47 s eager vs 8.17 s lazy, best-of-2);
    # the lazy plan computes identical rows (oracle-gated)
    out = bm25_topk(docs, queries, k=5, eager=False)
    return out.select(
        "query_id", "doc_id", "score", F.col("rank").cast("long").alias("rank")
    )


#: boilerplate prepended to every 17th doc in q_dup_spans — duplicated into
#: the oracle SQL below, keep in sync (11 words → with k=8 the stamped docs
#: share 4+ grams spanning into each doc's own first words only if those
#: match, so the guaranteed common span is the banner itself)
_DUP_BANNER = (
    "subscribe to our newsletter for updates terms of service apply today"
)


def q_dup_spans(spark, sf_dir):
    """Exact duplicated-span detection (operators/dedup_spans.py) — the
    Lee-et-al substring-dedup pass. Cross-doc duplication is PLANTED: every
    17th doc gets the same 11-word boilerplate banner prepended (ids offset
    200000), so known spans exist; the portable gram hash lets DuckDB
    replay gramming, document frequency, and span merging exactly."""
    from kafka_connect_gcs_spark.operators.dedup_spans import dup_span_stats

    d = _t(spark, sf_dir, "documents")
    stamped = d.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit(_DUP_BANNER + " "), F.col("text")).alias("text"),
    )
    u = d.select("doc_id", "text").unionByName(stamped)
    # eager=False: this is the one-shot analytics path — the service-mode
    # default's broadcast-gate count + checkpoint materialization are
    # fixed costs a single-action caller shouldn't pay (r5 bench showed
    # them 4.8× on this query); the lazy plan computes identical rows
    out = dup_span_stats(u, k=8, portable=True, eager=False)
    return out.withColumn("n_words", F.col("n_words").cast("long"))


def q_quality_classifier(spark, sf_dir):
    """Hashed-n-gram NB quality classifier (operators/classifier.py):
    train log-odds weights with label = (lang = 'en'), score the whole
    corpus. The oracle recomputes buckets (portable md5 mod 2^18),
    document frequencies, smoothed weights, and the logistic score."""
    from kafka_connect_gcs_spark.operators.classifier import (
        classifier_score,
        nb_train,
    )

    d = _t(spark, sf_dir, "documents")
    labeled = d.withColumn("label", F.col("lang") == "en")
    weights, model = nb_train(
        labeled, "label", n_buckets=1 << 18, portable=True
    )
    return classifier_score(
        d, weights, model, n_buckets=1 << 18, use_bigrams=True, portable=True
    )


def q_chunk_documents(spark, sf_dir):
    """Context-window splitting (operators/packing.py, chunk_documents):
    32-word windows with 8-word overlap; the oracle replays the stride
    arithmetic and slicing. chunk_text is fingerprinted (md5) so the hash
    check proves content, not just shape."""
    from kafka_connect_gcs_spark.operators.packing import chunk_documents

    d = _t(spark, sf_dir, "documents")
    out = chunk_documents(d, chunk_size=32, overlap=8)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.col("chunk_n").cast("long").alias("chunk_n"),
        F.md5("chunk_text").alias("chunk_fp"),
    )


def q_temperature_mix(spark, sf_dir):
    """Temperature-balanced source mixing (operators/sampling.py,
    temperature_mix, T=3): per-source rates from the in-plan count
    aggregate, epoch upsampling, portable hash verdicts — the oracle
    recomputes counts, the q_s distribution, rates, and every keep/drop
    decision. The corpus's sources are UNIFORM (rate would be exactly 1
    everywhere), so sources are first folded into skewed tiers
    (head/mid/tail by numeric suffix) to exercise down- AND up-sampling:
    the tail tier's rate > 2 proves multi-epoch replication."""
    from kafka_connect_gcs_spark.operators.sampling import temperature_mix

    k = F.substring("source", 4, 10).cast("int")
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(k < 12, F.lit("head"))
        .when(k < 18, F.lit("mid"))
        .otherwise(F.lit("tail"))
        .alias("tier"),
    )
    out = temperature_mix(
        d, temperature=3.0, strata_col="tier", seed=5, portable=True
    )
    return out.select(
        "doc_id",
        "tier",
        F.round("rate", 6).alias("rate"),
        F.col("epoch").cast("long").alias("epoch"),
    )


def q_interval_join(spark, sf_dir):
    """Point-in-interval join (operators/asof.py, interval_join): 'error'
    events matched into the day-gap view-session of the same user that
    contains them. The engine's banded equi-join (bucket explode + filter)
    must produce EXACTLY the rows of the oracle's naive BETWEEN join —
    a hash match proves the banding loses nothing and duplicates nothing."""
    from kafka_connect_gcs_spark.operators.asof import interval_join, sessionize

    ev = _t(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    s = sessionize(views, key="user_id", ts="ts", gap_seconds=86400)
    sess = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("start"), F.max("ts").alias("end")
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    j = interval_join(
        errors, sess, point_ts="ts", start_ts="start", end_ts="end",
        on=["user_id"], bucket_seconds=86400,
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        F.unix_timestamp("start").alias("start_s"),
        F.unix_timestamp("end").alias("end_s"),
    )


def q_tokenize_encode(spark, sf_dir):
    """Closed-vocab tokenizer (operators/tokenizer.py): build a vocabulary
    from the corpus (char block + top-500 pieces by frequency), encode
    every document to token ids with char fallback. The oracle replays
    pretokenization, vocab construction (including id assignment order),
    and the full encode — token arrays compare value-exact via the
    concat_ws convention."""
    from kafka_connect_gcs_spark.operators.tokenizer import (
        build_vocab,
        encode_tokens,
    )

    d = _t(spark, sf_dir, "documents")
    vocab = build_vocab(d, size=500, min_count=2)
    out = encode_tokens(d, vocab)
    return out.select(
        "doc_id",
        "n_tok",
        F.concat_ws(",", F.col("tokens").cast("array<string>")).alias(
            "tokens_str"
        ),
    )


def q_bpe_encode(spark, sf_dir):
    """Real BPE (operators/bpe.py): train 8 merge rounds on the corpus
    (distributed pair-count argmax per round, deterministic tie-break),
    then encode every document by applying the merges in rank order. The
    oracle replays the WHOLE thing in DuckDB — all 8 training rounds
    (pair counts, argmax, greedy fold rewrite), id assignment, and the
    positional encode — so a hash match proves training and encoding
    end-to-end."""
    from kafka_connect_gcs_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        bpe_vocab,
    )

    d = _ts(spark, sf_dir, "documents")
    merges = bpe_train(d, num_merges=8, min_pair_count=2)
    vocab = bpe_vocab(d, merges)
    out = bpe_encode(d, merges, vocab, impl="expr")
    return out.select(
        "doc_id",
        "n_tok",
        F.concat_ws(",", F.col("tokens").cast("array<string>")).alias(
            "tokens_str"
        ),
    )


def q_quality_gate(spark, sf_dir):
    """The whole curation funnel as ONE map-only projection
    (operators/curation.py, quality_gate): length bounds + Gopher
    repetition + PII + heuristic quality + language allow-list, emitting
    keep/reasons per doc. The oracle recomputes every rule and the sorted
    reason list."""
    from kafka_connect_gcs_spark.operators.curation import quality_gate

    d = _t(spark, sf_dir, "documents")
    out = quality_gate(
        d,
        min_words=20,
        max_words=5000,
        max_pii=0,
        min_quality=0.5,
        allowed_langs=("en",),
    )
    return out.select(
        "doc_id", "keep", F.concat_ws(",", "reasons").alias("reasons")
    )


def q_line_dedup_boilerplate(spark, sf_dir):
    """Cross-document line dedup (operators/dedup_lines.py): boilerplate
    lines are injected deterministically (every 3rd doc a newsletter
    footer, every 5th a legal line, every 4th a structural blank — no
    external data), then removed under BOTH policies; the fingerprints are
    md5 of each rewritten doc so the oracle verifies every rebuild
    byte-for-byte (injection → line explode → dup table → rebuild)."""
    from kafka_connect_gcs_spark.operators.dedup_lines import (
        dedup_lines_both,
    )

    d = _ts(spark, sf_dir, "documents")
    did, t = F.col("doc_id"), F.col("text")
    inj = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring(t, 1, 30),
            F.when(did % 3 == 0, F.lit("subscribe to our newsletter")),
            F.when(did % 4 == 0, F.lit("")),
            F.when(did % 5 == 0, F.lit("all rights reserved")),
            F.substring(t, 31, 1000000),
        ).alias("text"),
    )
    # both policies share ONE explosion + ONE line aggregate (the two
    # separate dedup_lines calls each paid the corpus explode and its
    # frequency table: 2.17× at sf0.1, see OPTIMIZATION_r06.md);
    # rows identical, oracle unchanged
    both = dedup_lines_both(inj, min_docs=2)
    return both.select(
        "doc_id",
        F.md5("text_drop_all").alias("fp_drop_all"),
        F.md5("text_keep_first").alias("fp_keep_first"),
    )


def q_shuffle_deterministic(spark, sf_dir):
    """Reproducible global corpus shuffle (operators/sampling.py,
    shuffle_corpus): dense rank 0..n-1 in (hash(id, seed), id) order with
    NO global window — packing's two-phase distributed exclusive scan
    assigns ranks; the oracle is a plain row_number over the same
    portable 60-bit key, so a hash match proves the distributed scan
    reproduces the single-node total order exactly."""
    from kafka_connect_gcs_spark.operators.sampling import shuffle_corpus

    d = _t(spark, sf_dir, "documents")
    return shuffle_corpus(
        d.select("doc_id"), seed=7, portable=True
    ).select("doc_id", F.col("shuffle_rank").cast("long").alias("shuffle_rank"))


def q_shard_assignment(spark, sf_dir):
    """Training-shard export assignment (operators/shards.py,
    assign_shards): every doc gets (shard_id, pos_in_shard) from its rank
    in a reproducible hash shuffle — the size-bounded globally-shuffled
    layout a data loader consumes. The oracle replays rank DIV/MOD over
    the same portable key, proving shard membership byte-for-byte."""
    from kafka_connect_gcs_spark.operators.shards import assign_shards

    d = _t(spark, sf_dir, "documents")
    return assign_shards(
        d.select("doc_id"), 64, key_col="doc_id", seed=3, portable=True
    ).select("doc_id", "shard_id", "pos_in_shard")


def q_score_percentile(spark, sf_dir):
    """Exact corpus-relative score calibration (operators/sampling.py,
    score_percentile): every doc's percentile rank by n_chars — the
    distributed two-phase scan again, here totalized by (score, doc_id)
    so heavy score ties still yield one deterministic rank each. The
    quality-threshold selector (take_top_fraction) keys off this."""
    from kafka_connect_gcs_spark.operators.sampling import score_percentile

    d = _t(spark, sf_dir, "documents")
    return score_percentile(
        d.select("doc_id", "n_chars"), "n_chars"
    ).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        "percentile",
    )


def q_hll_distinct_grams(spark, sf_dir):
    """Mergeable HyperLogLog distinct count (operators/sketches.py) over
    the corpus's word 3-grams: 256 registers, exact-integer indicator sum,
    comparison-ladder leading-zero rank — the groupBy shuffles ≤256 rows
    per partition no matter the corpus. The oracle replays registers AND
    the estimate formula; exact_distinct pins the accuracy."""
    from kafka_connect_gcs_spark.operators.curation import word_ngrams
    from kafka_connect_gcs_spark.operators.sketches import hll_distinct
    from kafka_connect_gcs_spark.operators.text import words

    d = _ts(spark, sf_dir, "documents")
    g = d.select(words(F.col("text")).alias("_ws")).select(
        F.explode(word_ngrams(F.col("_ws"), 3)).alias("gram")
    )
    est = hll_distinct(g, "gram", num_registers=256, portable=True)
    exact = g.agg(F.count_distinct(F.col("gram")).alias("exact_distinct"))
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.lit(256).cast("long").alias("num_registers"),
            "zero_registers",
            "sum_scaled",
            "estimate",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round(
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_error"),
        )
    )


def q_heavy_hitters_cms(spark, sf_dir):
    """Count-Min heavy hitters (operators/sketches.py): a 4×1024-cell
    frequency sketch of word occurrences (fixed-size exchange), probed for
    the top-20 exact words — the one-sided guarantee cm_est ≥ exact_cnt is
    visible in the output. Sketches merge across shards by cell sum."""
    from kafka_connect_gcs_spark.operators.sketches import (
        countmin_lookup,
        countmin_sketch,
    )
    from kafka_connect_gcs_spark.operators.text import words

    d = _ts(spark, sf_dir, "documents")
    w = d.select(F.explode(words(F.col("text"))).alias("word"))
    sk = countmin_sketch(w, "word", depth=4, width=1024, portable=True)
    top = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "word")
        .limit(20)
    )
    est = countmin_lookup(
        sk, top.select("word"), "word", depth=4, width=1024, portable=True
    )
    return top.join(est, "word").select(
        "word",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cm_est").cast("long").alias("cm_est"),
    )


def q_neardup_keep_best(spark, sf_dir):
    """Quality-aware dedup decision (operators/dedup_text.py,
    neardup_keep_best): same near-dup graph as neardup_components, but the
    LONGEST doc per cluster survives (tie → min id) — the production keep
    rule. Oracle = recursive-CTE closure + per-component argmax window."""
    from kafka_connect_gcs_spark.operators.dedup_text import (
        neardup_keep_best,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    pairs = ngram_jaccard_pairs(d.select("doc_id", "text"), n=1, threshold=0.5)
    dec = neardup_keep_best(
        pairs, d.select("doc_id", F.col("n_chars").cast("double").alias("score"))
    )
    return dec.select("doc_id", "keep_id", "is_drop")


def q_domain_cap(spark, sf_dir):
    """Per-domain frequency cap (operators/sampling.py, cap_per_key): at
    most 12 docs per source, survivors = the 12 smallest (hash, id) per
    key — deterministic under retries and incremental extension. The
    Arrow-batched pre-cap bounds what a hot domain ships into the window
    exchange; the oracle is the plain ranked window."""
    from kafka_connect_gcs_spark.operators.sampling import cap_per_key

    d = _t(spark, sf_dir, "documents")
    return cap_per_key(d, "source", 12, id_col="doc_id", portable=True).select(
        "doc_id", "source"
    )


def q_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter decontamination probe (operators/sketches.py): the
    benchmark side (doc_id % 7 == 0) builds a 2^17-bit / 5-hash Bloom set
    of its distinct word 3-grams — a FIXED-size bit table no matter the
    benchmark, packed into one broadcast row — and every remaining doc
    counts its grams map-side against the bitmap inside a HOF lambda
    (zero exchange on the 100 TB probe side). ``n_member`` is the exact
    overlap: the no-false-negative guarantee ``n_flagged >= n_member`` is
    visible per row, and the slack is the fp rate. Oracle replays the
    md5 bit positions, the packed set, and the probe."""
    from kafka_connect_gcs_spark.operators.curation import word_ngrams
    from kafka_connect_gcs_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
        bloom_pack,
    )
    from kafka_connect_gcs_spark.operators.text import words

    m, k = 1 << 17, 5
    d = _ts(spark, sf_dir, "documents")
    ws = d.select("doc_id", words(F.col("text")).alias("_ws"))
    bench_grams = (
        ws.where(F.col("doc_id") % 7 == 0)
        .select(F.explode(word_ngrams(F.col("_ws"), 3)).alias("gram"))
        .distinct()
    )
    packed = bloom_pack(
        spark, bloom_build(bench_grams, "gram", m, k, portable=True), m
    )
    pg = ws.where(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.array_distinct(word_ngrams(F.col("_ws"), 3)).alias("_gs")
    )
    flagged = pg.crossJoin(F.broadcast(packed)).select(
        "doc_id",
        F.size("_gs").cast("long").alias("n_grams"),
        F.size(
            F.filter(
                "_gs",
                lambda g: bloom_maybe_contains(
                    g, F.col("bloom"), m, k, portable=True
                ),
            )
        )
        .cast("long")
        .alias("n_flagged"),
    )
    exact = (
        pg.select("doc_id", F.explode("_gs").alias("gram"))
        .join(bench_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_nm"))
    )
    return flagged.join(exact, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        "n_flagged",
        F.coalesce(F.col("_nm"), F.lit(0)).cast("long").alias("n_member"),
    )


def q_normalize_text(spark, sf_dir):
    """Text normalization (operators/normalize.py): Unicode NFC +
    control-char strip + whitespace collapse as ONE map-only projection.
    Mess is injected deterministically (decomposed combining accents,
    compatibility chars, C0 controls, whitespace runs — no external
    data); norm_fp is the md5 of the normalized text so the oracle
    (DuckDB ``nfc_normalize`` + the same RE2∩Java regexes) verifies the
    rewrite byte-for-byte."""
    from kafka_connect_gcs_spark.operators.normalize import normalize_text

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    dirty = d.select(
        "doc_id",
        F.concat(
            F.when(did % 3 == 0, F.lit("Café  du  parc\t"))
            .otherwise(F.lit("")),
            F.col("text"),
            F.when(
                did % 5 == 0,
                F.lit(" \x01Ångström Å\x1f  unit "),
            ).otherwise(F.lit("")),
            # \x02, not \x00: DuckDB's nfc_normalize truncates at an
            # embedded NUL when composition actually rewrites the string
            # (utf8proc C-string), so NUL stripping is covered by the
            # unit tests instead of this oracle
            F.when(did % 7 == 0, F.lit("\x02\ttail\x7f  case"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    out = normalize_text(dirty, "text", "norm_text", form="NFC")
    return out.select(
        "doc_id",
        F.md5(F.col("norm_text")).alias("norm_fp"),
        F.length("norm_text").cast("long").alias("norm_len"),
    )


def q_kmeans_clusters(spark, sf_dir):
    """Distributed Lloyd's k-means (operators/clustering.py): k=4 seeds by
    portable id-hash, 2 full-corpus iterations (map-only literal-matrix
    assignment + one partial-aggregated exchange per round), final
    assignment with squared L2. The oracle UNROLLS every iteration —
    seeds, the argmax(v·c − ||c||²/2) assignment with its smallest-cid
    tie-break, the round-9 per-dimension means, the empty-cluster
    keep-previous rule — in generated DuckDB SQL, sequential-fold dot
    products matching F.aggregate's accumulation order bit-for-bit."""
    from kafka_connect_gcs_spark.operators.clustering import kmeans

    e = _t(spark, sf_dir, "embeddings")
    # method="fused": the fit's per-iteration sufficient statistics run as
    # one numpy mapInPandas pass (bit-exact assignment twin; means still
    # rounded to 9) instead of the k·dim-column aggregate whose codegen
    # dominated the query; the FINAL labeled assignment below stays the
    # expression form, so rows are identical (oracle-gated)
    labeled, _cents = kmeans(
        e, k=4, max_iter=2, seed=13, portable=True, dist_col="_sq",
        method="fused",
    )
    return labeled.select(
        "vec_id",
        F.col("cid").cast("int").alias("cid"),
        F.round("_sq", 6).alias("sq_dist"),
    )


def q_url_filter(spark, sf_dir):
    """URL/domain curation (operators/urls.py): URLs injected
    deterministically over documents (five authority shapes: scheme,
    scheme+port suffix-domain, scheme-relative with port, schemeless with
    userinfo, opaque mailto), host extracted by the shared RE2∩Java
    regex, registrable domain under the pinned two-level-suffix set, and
    a UT1-style blocklist mark — the whole query is ONE map-only
    projection over the corpus."""
    from kafka_connect_gcs_spark.operators.urls import filter_blocked_domains

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    with_url = d.select(
        "doc_id",
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit("https://ads.tracker"),
                (did % 7).cast("string"),
                F.lit(".com/banner?id="),
                did.cast("string"),
            ),
        )
        .when(
            did % 5 == 1,
            F.concat(
                F.lit("http://sub"),
                (did % 3).cast("string"),
                F.lit(".news.co.uk/article/"),
                did.cast("string"),
            ),
        )
        .when(
            did % 5 == 2,
            F.concat(
                F.lit("//cdn.media-host.net:8080/v/"), did.cast("string")
            ),
        )
        .when(
            did % 5 == 3,
            F.concat(
                F.lit("user:pw@shop"),
                (did % 4).cast("string"),
                F.lit(".example.com/item"),
            ),
        )
        .otherwise(F.lit("mailto:someone@nothost"))
        .alias("url"),
    )
    return filter_blocked_domains(
        with_url,
        ["tracker3.com", "example.com", "news.co.uk"],
        mode="mark",
    ).select("doc_id", "domain", "blocked")


def q_jaccard_prefix_join(spark, sf_dir):
    """EXACT set-similarity self-join (operators/setsim.py): prefix
    filtering (SSJoin/PPJoin; Vernica et al. SIGMOD 2010) generates a
    provably-lossless candidate set via equi-joins on each set's
    rarest-token prefix, then exact Jaccard verifies. The oracle is the
    naive quadratic all-pairs join, so a hash match PROVES no pair with
    Jaccard ≥ t was missed — the same losslessness argument as
    interval_join. Unlike the LSH families, zero false negatives by
    construction."""
    from kafka_connect_gcs_spark.operators.setsim import jaccard_prefix_join

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 400
    )
    return jaccard_prefix_join(d, threshold=0.4)


def q_topk_per_domain(spark, sf_dir):
    """Exact per-key top-k (operators/topk.py): the salted two-phase
    reduction — per-(key, hash-salt) window top-k, then true top-k over
    the ≤ k·num_salts survivors per key — so no group ever funnels
    through one reducer. The oracle is the naive single window; a hash
    match proves the two-phase plan returns exactly the same rows and
    ranks."""
    from kafka_connect_gcs_spark.operators.topk import topk_per_key

    d = _t(spark, sf_dir, "documents")
    return topk_per_key(
        d, key_col="source", score_col="n_chars", k=3, id_col="doc_id"
    ).select("source", "doc_id", "n_chars", "rank")


def q_score_percentile_by_lang(spark, sf_dir):
    """PER-GROUP exact score calibration (operators/sampling.py,
    score_percentile_by): each doc's percentile by n_chars WITHIN its
    language — the CCNet-style per-language threshold input. The
    within-group rank is global_rank(group, score, key) − group_base, so
    no group funnels through one reducer; the oracle is the naive
    per-group window, and the hash match proves the decomposition
    exact."""
    from kafka_connect_gcs_spark.operators.sampling import score_percentile_by

    d = _t(spark, sf_dir, "documents")
    return score_percentile_by(
        d.select("doc_id", "lang", "n_chars"), "lang", "n_chars"
    ).select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        "percentile",
    )


def q_top_fraction_by_lang(spark, sf_dir):
    """Per-group exact-count selection (operators/sampling.py,
    take_top_fraction_by): keep exactly floor(0.25*n_g) highest-n_chars
    docs WITHIN each language via the same scan-minus-base grouped rank
    as score_percentile_by. Oracle = the naive per-group window rank
    filter."""
    from kafka_connect_gcs_spark.operators.sampling import take_top_fraction_by

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return take_top_fraction_by(d, 0.25, "lang", "n_chars").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


def q_content_chunks(spark, sf_dir):
    """Content-defined chunking (operators/cdc_chunking.py): Rabin
    rolling-hash boundaries over the word stream (window 4, boundary
    prob 1/32), greedy min-8 spacing, max-40 forced splits — the
    LBFS/backup-dedup chunker re-expressed as ONE map-only projection
    (no shuffle; plan-asserted in tests). The oracle replays the whole
    pipeline — per-word md5 hash mod P, the 4-term window polynomial,
    the greedy keep fold (string-state list_reduce), stride splitting,
    and the chunk md5 — in DuckDB."""
    from kafka_connect_gcs_spark.operators.cdc_chunking import (
        content_defined_chunks,
    )

    d = _ts(spark, sf_dir, "documents")
    return content_defined_chunks(d, portable=True).select(
        "doc_id", "chunk_id", "start_word", "n_words", "chunk_hash"
    )


def q_chunk_dedup_cdc(spark, sf_dir):
    """Chunk-store dedup ratio under the CDC property: every doc gets a
    shared 96-word footer (two variants by doc_id parity) appended AFTER
    its unique body, so the footer sits at a DIFFERENT word offset in
    every doc — a fixed-size chunker would share nothing, but content-
    defined boundaries realign inside the footer and the trailing footer
    chunks dedup corpus-wide. Stats per footer variant: the exchange
    carries (variant, 32-byte hash, count) rows, never text."""
    from kafka_connect_gcs_spark.operators.cdc_chunking import (
        chunk_dedup_stats,
        content_defined_chunks,
    )

    d = _ts(spark, sf_dir, "documents")
    fv = (F.col("doc_id") % 2).cast("string")
    footer = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(96)),
            lambda j: F.concat(
                F.lit("f"), F.col("fv"), F.lit("_"), j.cast("string")
            ),
        ),
    )
    docs = d.select("doc_id", fv.alias("fv"), "text").select(
        "doc_id",
        "fv",
        F.concat(F.col("text"), F.lit(" "), footer).alias("text"),
    )
    ch = content_defined_chunks(docs, carry_cols=["fv"], portable=True)
    return chunk_dedup_stats(ch, by_col="fv").select(
        "fv",
        "total_chunks",
        "distinct_chunks",
        "dup_chunks",
        "words_total",
        "words_saved",
        "dup_ratio",
    )


def q_html_extract(spark, sf_dir):
    """HTML text extraction (operators/html.py): every document wrapped
    in a deterministic page shell — title with an entity, a style block,
    a commented-out link (must NOT be extracted), two real links (one
    uppercase HREF with an entity), a script containing a naked '<'
    (would corrupt tag-stripping if scripts weren't removed first) —
    then title/links/text extracted by the shared RE2∩Java regex chain.
    One map-only projection; the oracle runs the byte-identical patterns
    (imported from the operator) under DuckDB's RE2."""
    from kafka_connect_gcs_spark.operators.html import parse_html

    d = _ts(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        did,
        F.lit(" &amp; co</title><style>h1 {x:1}</style></head><body>"),
        F.lit('<!-- hidden <a href="http://no.test/x">n</a> --><h1>Doc '),
        did,
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><a href="https://site'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".test/p/"),
        did,
        F.lit('">next</a> <a HREF="/rel?a=1&amp;b=2">rel</a>'),
        F.lit("<script>var a = 1 < 2;</script></body></html>"),
    )
    parsed = parse_html(d.select("doc_id", html.alias("html")))
    return parsed.select(
        "doc_id",
        "title",
        F.size("links").cast("long").alias("n_links"),
        F.concat_ws("|", "links").alias("links_joined"),
        F.md5("text").alias("text_hash"),
    )


def q_decontaminate_spans(spark, sf_dir):
    """Span-level decontamination (operators/curation.py,
    decontaminate_spans): every 7th doc is the held-out benchmark (the
    bloom_decontaminate convention); the rest of the corpus has every
    word covered by a benchmark-colliding 4-gram surgically removed —
    heal, don't drop. Benchmark gram hashes broadcast; the only exchange
    carries (doc_id, position) pairs for HITTING grams. The oracle
    replays gramming, the hash join, covered-position expansion, and the
    index-filter text rebuild."""
    from kafka_connect_gcs_spark.operators.curation import decontaminate_spans
    from kafka_connect_gcs_spark.operators.text import words

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 7 == 0)
    corpus = d.where(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    out = decontaminate_spans(corpus, bench, k=4, portable=True)
    n = F.size(words(F.col("text")))
    return out.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        (n - F.size(words(F.col("clean_text"))))
        .cast("long")
        .alias("words_removed"),
        F.md5("clean_text").alias("clean_hash"),
    )


def q_pagerank_domains(spark, sf_dir):
    """Link-graph authority ranking (operators/graph.py): damped PageRank
    in 2^-30 fixed-point BIGINT arithmetic over a deterministic link
    graph injected from documents — 251 nodes, two link shapes per doc
    (a quadratic edge that varies in-degree, plus a hub projection onto
    the low-89 residues that the quadratic edge cannot express, so the
    distinct edge set is corpus-dependent, not just residue-dependent).
    Integer sums commute exactly, so the oracle replays ALL 5 damped
    iterations in unrolled DuckDB SQL and the ranks hash-match — the same
    bit-determinism argument as HLL's exact indicator sum."""
    from kafka_connect_gcs_spark.operators.graph import pagerank

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    src = (did % 251).alias("src")
    edges = d.select(src, ((did * did + 1) % 251).alias("dst")).union(
        d.select(src, (did % 89).alias("dst"))
    )
    return pagerank(edges, iterations=5).select("node", "rank_fp")


def q_cdc_incremental_rollup(spark, sf_dir):
    """Incremental view maintenance (operators/ivm.py): the events feed is
    split into 4 micro-batches by a hash of the offset (so cross-batch
    delivery order is wildly out of order vs the offset order), batch 3
    additionally REPLAYS every batch-0 event verbatim, and a per-group
    (n_keys, sum_value) rollup over the live LWW state is maintained
    purely from batch deltas — retractions included — with a
    localCheckpoint per batch standing in for the icebox commit. The
    oracle computes the rollup DIRECTLY from the full feed's LWW final
    state with no batching, so a hash match proves the delta algebra
    (strict-greater apply rule, retract-then-insert contributions,
    exact DECIMAL carry, zero-key group drop) is exact under
    out-of-order AND duplicated delivery."""
    from kafka_connect_gcs_spark.operators.ivm import incremental_rollup

    ev = _t(spark, sf_dir, "events")
    feed = ev.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("offset"),
        F.col("event_type").alias("grp"),
        F.col("value"),
        (F.col("event_type") == "error").alias("is_delete"),
    )
    bid = F.pmod(F.xxhash64(F.col("offset"), F.lit(41)), F.lit(4))
    batches = [feed.where(bid == i) for i in range(4)]
    batches[3] = batches[3].unionByName(batches[0])  # exactly-once replay
    out = incremental_rollup(batches, materialize=True)
    return out.select(
        "grp", "n_keys", F.round("sum_value", 6).alias("sum_value")
    )


def q_zorder_layout(spark, sf_dir):
    """Z-order layout audit (operators/zorder.py): orders re-clustered
    along the Morton curve over (o_custkey, order day) — exact integer
    quantization (in-plan min/max broadcast back, never a driver
    constant) + unrolled bit interleave — then the deterministic
    equal-width bucket audit: per z-bucket row count and BOTH columns'
    min/max, the numbers a manifest would carry and a scan would prune
    with. The oracle replays quantization, interleave, and bucketing
    bit-for-bit in DuckDB."""
    from kafka_connect_gcs_spark.operators.zorder import zorder_bucket_stats

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    o = _t(spark, sf_dir, "orders")
    days = F.expr("unix_timestamp(o_orderdate) div 86400").alias("order_day")
    df = o.select("o_custkey", days)
    return zorder_bucket_stats(
        df, ["o_custkey", "order_day"], bits=8, num_buckets=16
    )


def q_tfidf_keywords(spark, sf_dir):
    """Per-document keyword extraction (operators/search.py,
    tfidf_topk_terms): top-5 terms per doc by smoothed TF-IDF over the
    corpus's own statistics — postings built once (the shared BM25
    doc_term_freqs relation), document frequency one map-side-combined
    aggregate, N broadcast in-plan, and a per-document (vocab-bounded)
    top-k window. Scores are rounded to 9 decimals BEFORE ranking so the
    oracle's ln() can never reorder ties differently."""
    from kafka_connect_gcs_spark.operators.search import tfidf_topk_terms

    d = _t(spark, sf_dir, "documents")
    return tfidf_topk_terms(d, k=5)


def q_line_quality(spark, sf_dir):
    """Line-granular quality signals (operators/curation.py,
    line_quality_stats — the C4/FineWeb filter family): docs are given a
    deterministic multi-line shape (a bullet line every 3rd doc, a short
    nav-chrome line every 4th, a whitespace-only line every 5th that the
    blank filter must drop, and a terminal-punctuation line), then
    n_lines / frac_end_punct / frac_bullet / frac_short /
    mean_line_words are computed in ONE map-only projection of nested
    HOFs over the staged line array. The oracle replays the injection
    and every list fold."""
    from kafka_connect_gcs_spark.operators.curation import line_quality_stats

    d = _t(spark, sf_dir, "documents")
    did, t = F.col("doc_id"), F.col("text")
    inj = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring(t, 1, 50),
            F.when(did % 3 == 0, F.lit("- first bullet item")),
            F.when(did % 4 == 0, F.lit("ok then")),
            F.when(did % 5 == 0, F.lit("   ")),
            F.concat(F.substring(t, 51, 60), F.lit(".")),
        ).alias("text"),
    )
    return line_quality_stats(inj)


def q_url_dedup(spark, sf_dir):
    """URL canonicalization dedup (operators/urls.py, dedup_by_url): four
    URL variants of the same page injected per id-quad — www + plain,
    uppercase scheme + shuffled params + fragment, explicit default port
    + a utm tracking param — plus an https/trailing-slash variant that
    must NOT collapse (different scheme and path are different
    resources). Canonicalization (lowercase scheme/host, default-port
    drop, tracking-param strip, SORTED query params) is one map-only
    projection; the groups are one map-side-combined groupBy on the
    canonical string. The oracle replays every regex and the list sort."""
    from kafka_connect_gcs_spark.operators.urls import dedup_by_url

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    p = F.expr("doc_id div 4").cast("string")
    v = did % 4
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("http://www.page"), p, F.lit(".example.com/a/"), p,
                F.lit("?x=1&y=2"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("HTTP://page"), p, F.lit(".example.com/a/"), p,
                F.lit("?y=2&x=1#frag"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("http://page"), p, F.lit(".example.com:80/a/"), p,
                F.lit("?utm_source=news&x=1&y=2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://page"), p, F.lit(".example.com/a/"), p,
                F.lit("/?x=1&y=2"),
            ),
        )
    )
    return dedup_by_url(d.select("doc_id", url.alias("url")))


def q_anchor_text_agg(spark, sf_dir):
    """Anchor-text aggregation (operators/html.py, anchor_text_agg —
    composing the HTML extractor with the URL domain chain): every doc
    becomes a page with four anchors — a varying-target news link whose
    anchor text carries an entity, a CDN link whose anchor holds an
    inner <b> tag (must strip), a commented-out link (must NOT count),
    and a relative link (no authority — excluded by contract). Per
    target registrable domain: inbound links, distinct linking docs,
    distinct anchors, and the deterministic first anchor. The oracle
    replays the anchor regex, the entity/tag scrub, the host/domain
    rules, and the aggregate."""
    from kafka_connect_gcs_spark.operators.html import anchor_text_agg

    d = _ts(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    html = F.concat(
        F.lit("<html><body><p>intro</p><a href=\"https://www.news"),
        s(did % 7),
        F.lit(".com/a/"),
        s(did),
        F.lit("\">Breaking &amp; exclusive "),
        s(did % 11),
        F.lit("</a><!-- <a href=\"http://skip.me/x\">no</a> -->"),
        F.lit("<a HREF=\"//cdn"),
        s(did % 3),
        F.lit(".media-host.net/x\">see <b>photos</b> now</a>"),
        F.lit("<a href=\"/rel/"),
        s(did),
        F.lit("\">local nav</a></body></html>"),
    )
    return anchor_text_agg(d.select("doc_id", html.alias("html")))


def q_table_changes(spark, sf_dir):
    """Incremental changelog read (icebox/changes.py, table_changes — the
    Iceberg-incremental-scan / Delta-table_changes analog): the events
    feed becomes a CDC feed (user_id → doc_id, 'error' → tombstone),
    committed through the REAL merge path in two batches split by
    offset%4 (so cross-batch delivery is interleaved/out-of-order), and
    the changelog between the two snapshots is read back via the
    metadata-diff candidate scan. The oracle derives the same I/U/D rows
    from the raw feed alone — LWW at the batch boundary vs LWW over all
    events — so a hash match proves the manifest/DV symmetric-difference
    candidate set misses nothing and the pre/post-image rule is exact."""
    import tempfile

    from kafka_connect_gcs_spark.icebox.changes import table_changes
    from kafka_connect_gcs_spark.icebox.table import IceboxTable
    from kafka_connect_gcs_spark.operators.merge import (
        CDC_TABLE_FIELDS,
        merge_into,
    )

    ev = _t(spark, sf_dir, "events")
    feed = ev.select(
        F.col("user_id").cast("string").alias("doc_id"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_id").alias("offset"),
        F.array((F.col("event_id") % 97).cast("int")).alias("tokens"),
        F.lit(1).cast("int").alias("n_tok"),
        F.col("event_type").alias("source"),
    )
    # deterministic per-sf_dir path, wiped before rebuild: repeated
    # correctness/bench invocations reuse ONE directory instead of
    # leaking a full table copy per call (the q_dedup_incremental
    # convention); the table files must outlive this function for the
    # returned lazy changelog read, so an in-call rmtree cannot work
    import hashlib
    import shutil

    root = os.path.join(
        tempfile.gettempdir(),
        "sgtc-" + hashlib.md5(sf_dir.encode()).hexdigest()[:10],
    )
    shutil.rmtree(root, ignore_errors=True)
    table = IceboxTable.create(spark, root, CDC_TABLE_FIELDS)
    r0 = merge_into(table, feed.where(F.col("offset") % 4 < 2), "b0")
    v1 = table.current_version()
    # reuse batch-0's range bounds (the keyspace is identical): skips
    # merge-1's boundary-sampling job; bounds only shape the file layout,
    # the changelog rows are unchanged (oracle-gated)
    merge_into(
        table,
        feed.where(F.col("offset") % 4 >= 2),
        "b1",
        bounds_hint=r0.get("_bounds"),
    )
    v2 = table.current_version()
    ch = table_changes(table, v1, v2)
    return ch.select("change", "doc_id", "source", "old_offset", "new_offset")


def q_span_corruption(spark, sf_dir):
    """T5/UL2 span corruption (operators/masking.py): docs tokenized with
    the portable 7-hex-md5 ids (the pack_sequences convention), then ONE
    map-only projection selects non-adjacent mask spans via a greedy fold
    over per-position md5 draws and assembles (inputs, targets) with
    sentinel ids — deterministic under retries/AQE by construction. The
    oracle replays the draw AND the greedy scan (a string-state
    list_reduce, the BPE-oracle technique) and the slice assembly, so the
    md5'd input/target sequences are hash-exact."""
    from kafka_connect_gcs_spark.operators.masking import span_corruption
    from kafka_connect_gcs_spark.operators.text import words

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.transform(
            words(F.col("text")),
            lambda w: F.pmod(
                F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("long"),
                F.lit(32000),
            ).cast("int"),
        ).alias("tokens"),
    )
    out = span_corruption(toks, p_start=0.08, span_len=3, seed=5)
    return out.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tok"),
        "n_spans",
        F.md5(F.concat_ws(" ", F.col("inputs"))).alias("inputs_hash"),
        F.md5(F.concat_ws(" ", F.col("targets"))).alias("targets_hash"),
    )


def q_user_features(spark, sf_dir):
    """Event-stream feature engineering (the classic per-entity
    lag/moving-window shape a training pipeline derives from behavioral
    logs): per user in (ts, event_id) order — 3-event moving average of
    value, delta vs the previous event, cumulative event count, seconds
    since the previous event. One window exchange partitioned by user
    (bounded per-user groups at any corpus scale — never a global
    funnel); total frame order (ts, event_id) so both engines fold the
    same 3 doubles."""
    from pyspark.sql import Window

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ma = w.rowsBetween(-2, 0)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(ma), 6).alias("ma3"),
        F.round(F.col("value") - F.lag("value", 1).over(w), 6).alias("dv"),
        F.count(F.lit(1)).over(cum).alias("cum_n"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
        ).alias("gap_s"),
    )


def q_embedding_decontaminate(spark, sf_dir):
    """Semantic decontamination (operators/similarity.py,
    decontaminate_embeddings): the reference set plants one PARAPHRASE
    per 17th corpus vector (+1e-3 bump on one dimension — the
    embedding_neardup convention, float32-exact in both engines) and one
    VERBATIM copy per 11th, so both contamination modalities have known
    ground truth; every corpus vector then computes max-cosine + hit
    count against the ONE-row broadcast reference — a map-only plan, the
    corpus never shuffles. The oracle is the exact cross join with the
    order-matched float fold."""
    from kafka_connect_gcs_spark.operators.similarity import (
        decontaminate_embeddings,
    )

    e = _t(spark, sf_dir, "embeddings")
    bumped = e.where(F.col("vec_id") % 17 == 3).select(
        F.transform(
            "embedding",
            lambda x, i: F.when(
                i == F.pmod(F.col("vec_id"), F.lit(64)),
                (x + F.lit(0.001)).cast("float"),
            ).otherwise(x),
        ).alias("embedding")
    )
    verbatim = e.where(F.col("vec_id") % 11 == 0).select("embedding")
    refs = bumped.unionByName(verbatim)
    out = decontaminate_embeddings(e, refs, threshold=0.99)
    return out.select("vec_id", "max_sim", "n_hits", "contaminated")


def q_jsonl_ingest(spark, sf_dir):
    """JSONL corpus ingestion (sources/jsonl.py): documents serialized to
    JSONL through the writer path, every 13th line truncated mid-object
    (malformed JSON), then parsed back against the PINNED schema with
    corrupt-line quarantine — the file-format twin of the A16 type-gate.
    Good rows round-trip byte-exact (md5 of the text field); quarantined
    lines are absent, so the oracle is simply the surviving documents'
    fields recomputed directly."""
    from pyspark.sql import types as T

    from kafka_connect_gcs_spark.sources.jsonl import parse_jsonl

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("text"), "lang"
    )
    js = d.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "text", "lang")).alias("_j"),
    )
    lines = js.select(
        F.when(
            F.col("doc_id") % 13 == 0, F.substring("_j", 1, 20)
        )
        .otherwise(F.col("_j"))
        .alias("value")
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    good, _bad = parse_jsonl(lines, schema)
    return good.select("doc_id", F.md5("text").alias("text_hash"), "lang")


def q_robots_gate(spark, sf_dir):
    """robots.txt URL governance (operators/robots.py): ten domains get
    three deterministic robots shapes — a */Disallow+longer-Allow pair,
    a foreign-bot group followed by a * group (scoping must skip the
    foreign rules), and a file with NO * group (everything allowed) —
    and every document becomes a URL with one of four path shapes.
    parse → broadcast → RFC 9309 longest-match verdict, URL side
    map-only. The oracle states the expected verdict in closed form from
    the same variant arithmetic, so any parser/scoping/tie-break drift
    on these shapes hash-mismatches (parser edge cases live in
    tests/test_robots.py)."""
    from kafka_connect_gcs_spark.operators.robots import govern_urls

    k = F.col("k")
    robots = spark.range(10).select(
        F.concat(F.lit("site"), F.col("id"), F.lit(".com")).alias("domain"),
        (F.col("id") % 3).alias("k"),
    ).select(
        "domain",
        F.when(
            k == 0,
            F.lit(
                "# policy\nUser-agent: *\nDisallow: /private\n"
                "Allow: /private/ok\n"
            ),
        )
        .when(
            k == 1,
            F.lit(
                "User-agent: specialbot\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /tmp\n"
            ),
        )
        .otherwise(F.lit("User-agent: otherbot\nDisallow: /\n"))
        .alias("robots_txt"),
    )
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    urls = d.select(
        "doc_id",
        F.concat(F.lit("site"), (did % 10).cast("string"), F.lit(".com"))
        .alias("domain"),
        F.when(did % 4 == 0, F.concat(F.lit("/private/doc"), did.cast("string")))
        .when(did % 4 == 1, F.concat(F.lit("/private/ok/"), did.cast("string")))
        .when(did % 4 == 2, F.concat(F.lit("/tmp/"), did.cast("string")))
        .otherwise(F.concat(F.lit("/page/"), did.cast("string")))
        .alias("path"),
    )
    return govern_urls(urls, robots).select("doc_id", "domain", "path", "allowed")


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC LWW final state on sf0.001 through the engine's dedup
    operator (the same max_by plan the ingest pipeline runs per batch)."""
    return q_cdc_final_state(spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_lww_latest": q_cdc_lww_latest,
        "cdc_final_state": q_cdc_final_state,
        "cdc_merge_full_outer": q_cdc_merge_full_outer,
        "cdc_lineage_agg": q_cdc_lineage_agg,
        "cdc_offset_maxmerge": q_cdc_offset_maxmerge,
        "cdc_dedup_composite": q_cdc_dedup_composite,
        "scan_filter_project": q_scan_filter_project,
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_revenue_by_nation": q_join_revenue_by_nation,
        "window_topk_orders": q_window_topk_orders,
        "events_hourly_rollup": q_events_hourly_rollup,
        "asof_join": q_asof_join,
        "sessionize": q_sessionize,
        "rollup_pricing": q_rollup_pricing,
        "set_ops": q_set_ops,
        "semi_anti_join": q_semi_anti_join,
        "cube_status_priority": q_cube_status_priority,
        "quantiles_by_priority": q_quantiles_by_priority,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_minhash": q_text_minhash,
        "text_winnow": q_text_winnow,
        "multimodal_features": q_multimodal_features,
        "multimodal_frame_plan": q_multimodal_frame_plan,
        "dedup_exact_docs": q_dedup_exact_docs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "neardup_components": q_neardup_components,
        "minhash_lsh_neardup": q_minhash_lsh_neardup,
        "simhash_neardup": q_simhash_neardup,
        "ann_topk_quantized": q_ann_topk_quantized,
        "ann_topk_float": q_ann_topk_float,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_pq": q_ann_topk_pq,
        "embedding_neardup": q_embedding_neardup,
        "pack_sequences": q_pack_sequences,
        "dedup_incremental": q_dedup_incremental,
        "sample_stratified": q_sample_stratified,
        "corpus_mix_epochs": q_corpus_mix_epochs,
        "token_budget_head": q_token_budget_head,
        "decontaminate_bench": q_decontaminate,
        "repetition_stats": q_repetition_stats,
        "pii_scrub": q_pii_scrub,
        "unigram_logprob": q_unigram_logprob,
        "bm25_search": q_bm25_search,
        "dup_spans": q_dup_spans,
        "quality_classifier": q_quality_classifier,
        "chunk_documents": q_chunk_documents,
        "temperature_mix": q_temperature_mix,
        "interval_join": q_interval_join,
        "tokenize_encode": q_tokenize_encode,
        "quality_gate": q_quality_gate,
        "bpe_encode": q_bpe_encode,
        "line_dedup_boilerplate": q_line_dedup_boilerplate,
        "shuffle_deterministic": q_shuffle_deterministic,
        "shard_assignment": q_shard_assignment,
        "score_percentile": q_score_percentile,
        "take_top_fraction": q_take_top_fraction,
        "ann_topk_pq_refined": q_ann_topk_pq_refined,
        "semantic_dedup": q_semantic_dedup,
        "bigram_logprob": q_bigram_logprob,
        "dsir_select": q_dsir_select,
        "corpus_split": q_corpus_split,
        "length_batches": q_length_batches,
        "hll_distinct_grams": q_hll_distinct_grams,
        "heavy_hitters_cms": q_heavy_hitters_cms,
        "neardup_keep_best": q_neardup_keep_best,
        "domain_cap": q_domain_cap,
        "bloom_decontaminate": q_bloom_decontaminate,
        "normalize_text": q_normalize_text,
        "kmeans_clusters": q_kmeans_clusters,
        "url_filter": q_url_filter,
        "jaccard_prefix_join": q_jaccard_prefix_join,
        "topk_per_domain": q_topk_per_domain,
        "score_percentile_by_lang": q_score_percentile_by_lang,
        "top_fraction_by_lang": q_top_fraction_by_lang,
        "pagerank_domains": q_pagerank_domains,
        "content_chunks": q_content_chunks,
        "chunk_dedup_cdc": q_chunk_dedup_cdc,
        "decontaminate_spans": q_decontaminate_spans,
        "html_extract": q_html_extract,
        "cdc_incremental_rollup": q_cdc_incremental_rollup,
        "zorder_layout": q_zorder_layout,
        "tfidf_keywords": q_tfidf_keywords,
        "line_quality": q_line_quality,
        "url_dedup": q_url_dedup,
        "anchor_text_agg": q_anchor_text_agg,
        "table_changes": q_table_changes,
        "span_corruption": q_span_corruption,
        "user_features": q_user_features,
        "embedding_decontaminate": q_embedding_decontaminate,
        "jsonl_ingest": q_jsonl_ingest,
        "robots_gate": q_robots_gate,
    }


def _words_sql(col: str = "text") -> str:
    return f"list_filter(string_split_regex(lower({col}), '\\s+'), w -> w <> '')"


def _hll_sql(m: int = 256, width: int = 52, cap: int = 40) -> str:
    """DuckDB replay of the ENTIRE portable HLL pipeline over word 3-grams
    (operators/sketches.py): md5-60bit hash → register/leading-zero-rank
    (exact comparison ladder, no float log2) → exact-integer indicator sum
    → the estimate formula with the SAME inlined alpha·m²·2^R literal, so
    the one float division agrees bit-for-bit; both the small-range
    linear-counting branch and the raw branch round to 4 decimals."""
    p = m.bit_length() - 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    lit = alpha * m * m * float(1 << cap)
    ladder = " ".join(
        f"WHEN rest >= {1 << (width - rho)} THEN {rho}"
        for rho in range(1, min(width, cap - 1) + 1)
    )
    return f"""
          WITH ws AS (
            SELECT {_words_sql()} AS ws FROM documents
          ), g AS (
            SELECT unnest(list_transform(range(1, greatest(len(ws)-2, 0)+1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
            FROM ws
          ), h AS (
            SELECT ('0x' || substr(md5('hll0:' || gram), 1, 15))::BIGINT AS h
            FROM g
          ), reg AS (
            SELECT register, max(CASE {ladder} ELSE {min(width + 1, cap)} END) AS rho
            FROM (SELECT (h & {m - 1}) AS register, (h >> {p}) AS rest FROM h)
            GROUP BY register
          ), agg AS (
            SELECT count(*)::BIGINT AS nz,
                   CAST(sum(1::BIGINT << ({cap} - rho)) AS BIGINT) AS s_obs
            FROM reg
          ), fin AS (
            SELECT ({m} - nz)::BIGINT AS zeros,
                   (coalesce(s_obs, 0) + ({m} - nz) * (1::BIGINT << {cap}))::BIGINT
                     AS sum_scaled
            FROM agg
          ), est AS (
            SELECT zeros, sum_scaled,
                   round(CASE WHEN ({lit!r} / sum_scaled::DOUBLE) <= {2.5 * m!r}
                              AND zeros > 0
                         THEN {float(m)!r} * ln({float(m)!r} / zeros::DOUBLE)
                         ELSE {lit!r} / sum_scaled::DOUBLE END, 4) AS estimate
            FROM fin
          ), ex AS (
            SELECT count(DISTINCT gram)::BIGINT AS exact_distinct FROM g
          )
          SELECT {m}::BIGINT AS num_registers, zeros AS zero_registers,
                 sum_scaled, estimate, exact_distinct,
                 round(abs(estimate - exact_distinct) / exact_distinct::DOUBLE,
                       4) AS rel_error
          FROM est CROSS JOIN ex
        """


def _minhash_lsh_sql(num_hashes=16, bands=8, threshold=0.5, max_doc_id=1000) -> str:
    """DuckDB replay of the ENTIRE portable LSH pipeline: md5 minhash
    signatures → concat band buckets → candidate self-join → exact-Jaccard
    verify (mirrors operators/dedup_text.minhash_lsh_pairs(portable=True))."""
    rpb = num_hashes // bands
    sh_sql = (
        "list_distinct(list_transform(range(1, greatest(len(ws)-2, 0)+1), "
        "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))"
    )
    minhash = ", ".join(
        "list_aggregate(list_transform(sh, "
        f"w -> ('0x' || substr(md5('s{i}:' || w), 1, 15))::BIGINT), 'min')"
        for i in range(num_hashes)
    )
    buckets = ", ".join(
        "(" + " || ':' || ".join(f"sig[{b * rpb + r + 1}]::VARCHAR" for r in range(rpb)) + ")"
        for b in range(bands)
    )
    jac = (
        "round(len(list_intersect(ga.sh, gb.sh))::DOUBLE / "
        "(len(ga.sh) + len(gb.sh) - len(list_intersect(ga.sh, gb.sh))), 6)"
    )
    return f"""
      WITH w AS (SELECT doc_id, {_words_sql()} AS ws FROM documents
                 WHERE doc_id < {max_doc_id}),
      s AS (SELECT doc_id, {sh_sql} AS sh FROM w),
      g AS (SELECT doc_id, sh, [{minhash}] AS sig FROM s),
      banded AS (
        SELECT doc_id, t.b AS band, ([{buckets}])[t.b+1] AS bucket
        FROM g, (SELECT unnest(range({bands})) AS b) t
      ),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      )
      SELECT id_a, id_b, {jac} AS jaccard
      FROM cand JOIN g ga ON ga.doc_id = id_a JOIN g gb ON gb.doc_id = id_b
      WHERE {jac} >= {threshold}
    """


def _dedup_incremental_sql(num_hashes=16, bands=8, threshold=0.5) -> str:
    """DuckDB replay of the ENTIRE index-probe pipeline of
    q_dedup_incremental: portable signatures for corpus (< 300) and batch
    (≥ 300 plus planted ' zzclone' copies of < 20), banded buckets, the
    cross-side candidate join, lane-agreement estimate, threshold, and the
    per-new-doc argmax (est desc, dup_of asc)."""
    rpb = num_hashes // bands
    sh_sql = (
        "list_distinct(list_transform(range(1, greatest(len(ws)-2, 0)+1), "
        "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))"
    )
    minhash = ", ".join(
        "list_aggregate(list_transform(sh, "
        f"w -> ('0x' || substr(md5('s{i}:' || w), 1, 15))::BIGINT), 'min')"
        for i in range(num_hashes)
    )
    buckets = ", ".join(
        "(" + " || ':' || ".join(
            f"sig[{b * rpb + r + 1}]::VARCHAR" for r in range(rpb)
        ) + ")"
        for b in range(bands)
    )
    return f"""
      WITH allr AS (
        SELECT doc_id, text, 'old' AS side FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT doc_id, text, 'new' FROM documents WHERE doc_id >= 300
        UNION ALL
        SELECT doc_id + 100000, text || ' zzclone', 'new'
        FROM documents WHERE doc_id < 20
      ),
      w AS (SELECT doc_id, side, {_words_sql()} AS ws FROM allr),
      s AS (SELECT doc_id, side, {sh_sql} AS sh FROM w),
      g AS (SELECT doc_id, side, [{minhash}] AS sig FROM s),
      banded AS (
        SELECT doc_id, side, t.b AS band, ([{buckets}])[t.b+1] AS bucket
        FROM g, (SELECT unnest(range({bands})) AS b) t
      ),
      cand AS (
        SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        FROM banded n JOIN banded o
          ON n.band = o.band AND n.bucket = o.bucket
        WHERE n.side = 'new' AND o.side = 'old' AND n.doc_id <> o.doc_id
      ),
      est AS (
        SELECT c.new_id, c.old_id,
               round(len(list_filter(range(1, {num_hashes + 1}),
                                     i -> gn.sig[i] = go.sig[i]))::DOUBLE
                     / {num_hashes}.0, 6) AS est_jaccard
        FROM cand c
        JOIN g gn ON gn.doc_id = c.new_id AND gn.side = 'new'
        JOIN g go ON go.doc_id = c.old_id AND go.side = 'old'
      )
      SELECT new_id AS doc_id, old_id AS dup_of, est_jaccard
      FROM (SELECT *, row_number() OVER (PARTITION BY new_id
                      ORDER BY est_jaccard DESC, old_id ASC) AS rn
            FROM est WHERE est_jaccard >= {threshold})
      WHERE rn = 1
    """


def _simhash_sql(max_hamming=3, max_doc_id=120) -> str:
    """DuckDB replay of the portable 60-bit simhash + ALL-pairs Hamming
    join. The engine's blocked join must find the identical pair set
    (pigeonhole completeness) — so this oracle is strictly stronger than
    verifying reported pairs."""
    lanes = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1"
        f" THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b in range(60)
    )
    return f"""
      WITH w AS (SELECT doc_id, list_distinct({_words_sql()}) AS ws
                 FROM documents WHERE doc_id < {max_doc_id}),
      h AS (SELECT doc_id,
                   list_transform(ws, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
            FROM w),
      s AS (SELECT doc_id, {lanes} AS sh FROM h)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.sh, b.sh)) AS hamming
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


def _url_filter_sql() -> str:
    """DuckDB replay of q_url_filter: same injected URLs, the SAME host
    regex (RE2∩Java — verified char-for-char), the same two-level-suffix
    set imported from the operator so the two can never drift."""
    from kafka_connect_gcs_spark.operators.urls import (
        _HOST_RE,
        DEFAULT_TWO_LEVEL_SUFFIXES,
    )

    sufs = ", ".join(f"'{s}'" for s in DEFAULT_TWO_LEVEL_SUFFIXES)
    return f"""
      WITH inj AS (
        SELECT doc_id,
          CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN 'https://ads.tracker' || CAST(doc_id % 7 AS VARCHAR)
                 || '.com/banner?id=' || CAST(doc_id AS VARCHAR)
            WHEN 1 THEN 'http://sub' || CAST(doc_id % 3 AS VARCHAR)
                 || '.news.co.uk/article/' || CAST(doc_id AS VARCHAR)
            WHEN 2 THEN '//cdn.media-host.net:8080/v/'
                 || CAST(doc_id AS VARCHAR)
            WHEN 3 THEN 'user:pw@shop' || CAST(doc_id % 4 AS VARCHAR)
                 || '.example.com/item'
            ELSE 'mailto:someone@nothost' END AS url
        FROM documents),
      lab AS (
        SELECT doc_id,
               lower(regexp_extract(url, '{_HOST_RE}', 1)) AS host,
               string_split(lower(regexp_extract(url, '{_HOST_RE}', 1)), '.')
                 AS ls
        FROM inj),
      dom AS (
        SELECT doc_id,
          CASE WHEN len(ls) <= 2 THEN host
               WHEN array_to_string(list_slice(ls, len(ls) - 1, len(ls)), '.')
                    IN ({sufs})
               THEN array_to_string(list_slice(ls, len(ls) - 2, len(ls)), '.')
               ELSE array_to_string(list_slice(ls, len(ls) - 1, len(ls)), '.')
          END AS domain
        FROM lab)
      SELECT doc_id, domain,
             domain IN ('tracker3.com', 'example.com', 'news.co.uk')
               AS blocked
      FROM dom
    """


def _kmeans_sql(k: int = 4, iters: int = 2, seed: int = 13, dim: int = 64) -> str:
    """DuckDB replay of the ENTIRE distributed k-means driver query
    (operators/clustering.py): portable-hash seed selection, then each
    Lloyd iteration unrolled as an assignment CTE (argmax of the same
    v·c − ||c||²/2 objective, sequential-fold products so doubles agree
    bit-for-bit, smallest-cid tie-break) and an update CTE (round-9
    per-dimension means, empty clusters keep the previous centroid via
    the LEFT JOIN coalesce), finishing with the labeled corpus + the
    squared-L2 fold of the winning pair."""
    rng = f"range(1, {dim + 1})"

    def dot(v: str, c: str) -> str:
        return (
            f"list_reduce(list_transform({rng}, i -> {v}[i] * {c}[i]), "
            "(x, y) -> x + y)"
        )

    def half(c: str) -> str:
        return (
            f"list_reduce(list_transform({rng}, i -> {c}[i] * {c}[i]), "
            "(x, y) -> x + y) / 2.0"
        )

    def assign_cte(name: str, prev: str, extra: str = "") -> str:
        return f"""
          {name} AS (
            SELECT vec_id, v, cid{extra} FROM (
              SELECT e.vec_id, e.v, c.cid,
                     {dot('e.v', 'c.c')} - {half('c.c')} AS score,
                     list_reduce(list_transform({rng},
                       i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])),
                       (x, y) -> x + y) AS sq,
                     row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {dot('e.v', 'c.c')} - {half('c.c')} DESC,
                                c.cid) AS rn
              FROM emb e CROSS JOIN {prev} c
            ) WHERE rn = 1)"""

    def update_cte(a: str, prev: str, name: str) -> str:
        return f"""
          {name} AS (
            SELECT p.cid, coalesce(m.c, p.c) AS c
            FROM {prev} p LEFT JOIN (
              SELECT cid, list(mval ORDER BY d) AS c FROM (
                SELECT cid, d, round(sum(v[d]) / count(*), 9) AS mval
                FROM {a} CROSS JOIN (SELECT unnest({rng}) AS d) dd
                GROUP BY cid, d)
              GROUP BY cid) m USING (cid))"""

    parts = [
        f"""
          WITH emb AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
          ),
          c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT)
                     AS cid,
                   v AS c
            FROM (
              SELECT vec_id, v,
                     ('0x' || substr(md5('km{seed}:'
                        || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM emb ORDER BY h, vec_id LIMIT {k})
          )"""
    ]
    for t in range(1, iters + 1):
        parts.append("," + assign_cte(f"a{t}", f"c{t - 1}"))
        parts.append("," + update_cte(f"a{t}", f"c{t - 1}", f"c{t}"))
    parts.append("," + assign_cte("afinal", f"c{iters}", ", sq"))
    parts.append(
        """
          SELECT vec_id, cid, round(sq, 6) AS sq_dist FROM afinal"""
    )
    return "".join(parts)


def _seqfold_dot_sql(a: str, b: str, dim: int = 64) -> str:
    """Sequential double left-fold of float32 products — the exact
    accumulation order Spark's F.aggregate uses, so sums are bit-identical
    (list_dot_product's order differs at ~1e-6)."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> ({a}[i] * {b}[i])::DOUBLE), (x, y) -> x + y)"
    )


def _lang_scores_sql() -> str:
    parts = []
    for lang, markers in _LANGS.items():
        arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        parts.append(
            f"len(list_intersect(list_distinct(ws), {arr})) AS s_{lang}"
        )
    return ", ".join(parts)


def _cdc_chunk_rows_sql(doc_src: str, carry: str = "") -> str:
    """DuckDB replay of the ENTIRE content-defined chunker
    (operators/cdc_chunking.py, portable path) over ``doc_src`` (a SQL
    relation providing doc_id[, carry], text): per-word md5-60bit hash
    mod P, the 4-term Rabin window polynomial with boundary mask 2^5,
    the greedy min-8 keep fold (string-state list_reduce, the BPE-oracle
    trick), max-40 stride splitting, and the final chunk md5."""
    from kafka_connect_gcs_spark.operators.cdc_chunking import (
        DEFAULT_BOUNDARY_BITS as BITS,
        DEFAULT_MAX_WORDS as MX,
        DEFAULT_MIN_WORDS as MN,
        DEFAULT_WINDOW as W,
        RABIN_A as A,
        RABIN_P as P,
    )

    c = f", {carry}" if carry else ""
    poly = " + ".join(
        f"gs[i-{d}]*{pow(A, d)}" if d else "gs[i]" for d in range(W)
    )
    return f"""
      WITH src AS ({doc_src}),
      w1 AS (SELECT doc_id{c}, {_words_sql('text')} AS ws FROM src),
      w2 AS (SELECT doc_id{c}, ws, CAST(len(ws) AS INT) AS n,
             list_transform(ws, w ->
               ('0x' || substr(md5('cdc:' || w), 1, 15))::BIGINT % {P}) AS gs
             FROM w1),
      w3 AS (SELECT doc_id{c}, ws, n,
             list_filter(list_transform(range({W}, n + 1), i ->
               CASE WHEN (({poly}) % {P}) % {1 << BITS} = 0
                    THEN CAST(i AS INT) ELSE 0 END), x -> x > 0) AS cand
             FROM w2),
      w4 AS (SELECT doc_id{c}, ws, n,
             list_reduce(
               list_prepend('0|', list_transform(cand, q -> CAST(q AS VARCHAR))),
               (acc, x) -> CASE
                 WHEN CAST(x AS INT) - CAST(split_part(acc, '|', 1) AS INT)
                      >= {MN}
                 THEN x || '|' || CASE WHEN split_part(acc, '|', 2) = ''
                                  THEN x
                                  ELSE split_part(acc, '|', 2) || ';' || x END
                 ELSE acc END) AS st FROM w3),
      w5 AS (SELECT doc_id{c}, ws,
             ([0] || CASE WHEN split_part(st, '|', 2) = ''
                     THEN CAST([] AS INT[])
                     ELSE list_transform(string_split(
                            split_part(st, '|', 2), ';'),
                          s -> CAST(s AS INT)) END
                  || CASE WHEN n > CAST(split_part(st, '|', 1) AS INT)
                     THEN [n] ELSE CAST([] AS INT[]) END) AS bounds
             FROM w4),
      w6 AS (SELECT doc_id{c}, ws,
             flatten(list_transform(range(1, len(bounds)), j ->
               list_transform(
                 range(0, (bounds[j+1] - bounds[j] - 1) // {MX} + 1),
                 k -> struct_pack(
                   st := bounds[j] + 1 + k*{MX},
                   nw := least({MX},
                               bounds[j+1] - (bounds[j] + 1 + k*{MX}) + 1))
               ))) AS pieces FROM w5),
      w7 AS (SELECT doc_id{c}, ws,
             unnest(list_transform(range(1, len(pieces) + 1), j ->
               struct_pack(cid := j - 1, st := pieces[j].st,
                           nw := pieces[j].nw))) AS u FROM w6)
      SELECT doc_id{c}, CAST(u.cid AS INT) AS chunk_id,
             CAST(u.st AS INT) AS start_word, CAST(u.nw AS INT) AS n_words,
             md5(array_to_string(
               list_slice(ws, u.st, u.st + u.nw - 1), ' ')) AS chunk_hash
      FROM w7
    """


def _html_extract_sql() -> str:
    """DuckDB replay of q_html_extract with the BYTE-IDENTICAL patterns
    imported from operators/html.py (RE2 ∩ Java dialect; DuckDB
    regexp_replace needs the explicit 'g' option — Spark's is global by
    default). Entity decode chain generated from the same ENTITIES tuple
    (amp last)."""
    from kafka_connect_gcs_spark.operators.html import (
        COMMENT_RE,
        ENTITIES,
        HEAD_RE,
        HREF_RE,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
        TITLE_RE,
    )

    def ent(expr: str) -> str:
        for e, r in ENTITIES:
            rr = r.replace("'", "''")
            expr = f"replace({expr}, '{e}', '{rr}')"
        return expr

    text = (
        f"trim(regexp_replace({ent(f'''regexp_replace(regexp_replace(sv, '{HEAD_RE}', ' ', 'g'), '{TAG_RE}', ' ', 'g')''')}"
        ", '\\s+', ' ', 'g'))"
    )
    title = f"trim({ent(f'''regexp_extract(sv, '{TITLE_RE}', 1)''')})"
    return f"""
      WITH inj AS (
        SELECT doc_id,
          '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
          || ' &amp; co</title><style>h1 {{x:1}}</style></head><body>'
          || '<!-- hidden <a href="http://no.test/x">n</a> --><h1>Doc '
          || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
          || '</p><a href="https://site' || CAST(doc_id % 5 AS VARCHAR)
          || '.test/p/' || CAST(doc_id AS VARCHAR)
          || '">next</a> <a HREF="/rel?a=1&amp;b=2">rel</a>'
          || '<script>var a = 1 < 2;</script></body></html>' AS html
        FROM documents),
      s AS (SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(html,
                '{COMMENT_RE}', ' ', 'g'),
                '{SCRIPT_RE}', ' ', 'g'),
                '{STYLE_RE}', ' ', 'g') AS sv
            FROM inj)
      SELECT doc_id,
             {title} AS title,
             CAST(len(regexp_extract_all(sv, '{HREF_RE}', 1)) AS BIGINT)
               AS n_links,
             array_to_string(regexp_extract_all(sv, '{HREF_RE}', 1), '|')
               AS links_joined,
             md5({text}) AS text_hash
      FROM s
    """


def _decontaminate_spans_sql(k: int = 4) -> str:
    """DuckDB replay of q_decontaminate_spans: benchmark gram-hash set
    (every 7th doc), corpus rolling {k}-gram positions with the SAME
    portable md5-60bit gram hash as dedup_spans, covered-position
    expansion (pos..pos+k-1, distinct), and the index-filter rebuild."""
    gh = (
        "('0x' || substr(md5(array_to_string("
        f"list_slice(ws, pos, pos + {k - 1}), ' ')), 1, 15))::BIGINT"
    )
    return f"""
      WITH w AS (SELECT doc_id, {_words_sql()} AS ws FROM documents),
      b AS (SELECT DISTINCT {gh} AS h
            FROM (SELECT ws, unnest(range(1, len(ws) - {k} + 2)) AS pos
                  FROM w WHERE doc_id % 7 = 0 AND len(ws) >= {k})),
      gp AS (SELECT doc_id, pos, {gh} AS h
             FROM (SELECT doc_id, ws,
                          unnest(range(1, len(ws) - {k} + 2)) AS pos
                   FROM w WHERE doc_id % 7 <> 0 AND len(ws) >= {k})),
      hit AS (SELECT DISTINCT gp.doc_id, gp.pos FROM gp JOIN b USING (h)),
      cov AS (SELECT doc_id, list(DISTINCT CAST(pos + j AS INT)) AS cv
              FROM hit CROSS JOIN range({k}) t(j) GROUP BY doc_id),
      fin AS (SELECT w.doc_id, len(w.ws) AS n,
                     -- DuckDB 1.0 array_to_string(empty) is NULL, Spark
                     -- concat_ws(empty) is '' — coalesce to match
                     coalesce(array_to_string(list_transform(
                       list_filter(range(1, CAST(len(w.ws) AS INT) + 1),
                         i -> NOT list_contains(
                                coalesce(cv, CAST([] AS INT[])),
                                CAST(i AS INT))),
                       i -> w.ws[i]), ' '), '') AS clean
              FROM w LEFT JOIN cov USING (doc_id)
              WHERE w.doc_id % 7 <> 0)
      SELECT doc_id, CAST(n AS BIGINT) AS n_words,
             CAST(n - CASE WHEN clean = '' THEN 0
                      ELSE len(string_split(clean, ' ')) END AS BIGINT)
               AS words_removed,
             md5(clean) AS clean_hash
      FROM fin
    """


def _chunk_dedup_sql() -> str:
    """Replay of q_chunk_dedup_cdc: the same injected two-variant 96-word
    footer, the full chunk replay, then the two-level dedup aggregation."""
    footer = (
        "array_to_string(list_transform(range(1, 97), j -> "
        "'f' || CAST(doc_id % 2 AS VARCHAR) || '_' || CAST(j AS VARCHAR)),"
        " ' ')"
    )
    rows = _cdc_chunk_rows_sql(
        f"SELECT doc_id, CAST(doc_id % 2 AS VARCHAR) AS fv, "
        f"text || ' ' || {footer} AS text FROM documents",
        carry="fv",
    )
    return f"""
      WITH ch AS ({rows}),
      per AS (SELECT fv, chunk_hash, CAST(count(*) AS BIGINT) AS cnt,
                     CAST(min(n_words) AS BIGINT) AS nw
              FROM ch GROUP BY fv, chunk_hash)
      SELECT fv, CAST(sum(cnt) AS BIGINT) AS total_chunks,
             CAST(count(*) AS BIGINT) AS distinct_chunks,
             CAST(sum(cnt) - count(*) AS BIGINT) AS dup_chunks,
             CAST(sum(cnt*nw) AS BIGINT) AS words_total,
             CAST(sum(cnt*nw) - sum(nw) AS BIGINT) AS words_saved,
             round((sum(cnt*nw) - sum(nw)) / CAST(sum(cnt*nw) AS DOUBLE), 6)
               AS dup_ratio
      FROM per GROUP BY fv
    """


def _pagerank_sql(iterations: int = 5, num: int = 85, den: int = 100) -> str:
    """DuckDB replay of the ENTIRE fixed-point PageRank driver query
    (operators/graph.py): the same injected edge set, DISTINCT collapse,
    out-degrees, then every damped iteration unrolled as one CTE — the
    per-edge floor (r // deg), the damped-sum floor, and the teleport
    constant are all BIGINT operations on non-negative values, so Spark's
    DIV and DuckDB's // agree exactly and the final ranks hash-match."""
    from kafka_connect_gcs_spark.operators.graph import SCALE_BITS

    base = 1 << SCALE_BITS
    tel = ((den - num) << SCALE_BITS) // den
    rounds = []
    for k in range(1, iterations + 1):
        rounds.append(f"""
      r{k} AS (
        SELECT n.node,
               CAST({tel} + ({num} * coalesce(s.s, 0)) // {den} AS BIGINT) AS r
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node, CAST(sum(p.r // d.deg) AS BIGINT) AS s
          FROM e JOIN deg d ON e.src = d.src
                 JOIN r{k - 1} p ON p.node = e.src
          GROUP BY e.dst) s ON n.node = s.node)""")
    return f"""
      WITH inj AS (
        SELECT doc_id % 251 AS src, (doc_id * doc_id + 1) % 251 AS dst
        FROM documents
        UNION ALL
        SELECT doc_id % 251 AS src, doc_id % 89 AS dst FROM documents),
      e AS (SELECT DISTINCT src, dst FROM inj),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
      nodes AS (SELECT DISTINCT src AS node FROM e
                UNION SELECT DISTINCT dst FROM e),
      r0 AS (SELECT node, CAST({base} AS BIGINT) AS r FROM nodes),{','.join(rounds)}
      SELECT node, r AS rank_fp FROM r{iterations}
    """


def oracle_sql() -> dict[str, str]:
    latest = """
      SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
             value AS last_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY event_id DESC) rn FROM events)
      WHERE rn = 1
    """
    minhash8 = ", ".join(
        "list_aggregate(list_transform(list_distinct(ws), "
        f"w -> ('0x' || substr(md5('s{i}:' || w), 1, 15))::BIGINT), 'min')"
        for i in range(8)
    )
    return {
        "cdc_lww_latest": latest,
        "cdc_final_state": f"SELECT * FROM ({latest}) WHERE last_event_type <> 'error'",
        "cdc_merge_full_outer": f"""
          WITH ch AS ({latest})
          SELECT coalesce(d.doc_id, ch.user_id) AS key,
                 d.source AS base_source,
                 ch.last_event_type, ch.last_event_id,
                 CASE WHEN d.source IS NULL THEN 'insert'
                      WHEN ch.last_event_type IS NULL THEN 'unchanged'
                      WHEN ch.last_event_type = 'error' THEN 'delete'
                      ELSE 'update' END AS status
          FROM documents d FULL OUTER JOIN ch ON ch.user_id = d.doc_id
        """,
        "cdc_lineage_agg": """
          SELECT CAST(user_id % 8 AS INTEGER) AS part,
                 min(event_id) AS min_offset, max(event_id) AS max_offset,
                 count(*) AS events
          FROM events GROUP BY 1
        """,
        "cdc_offset_maxmerge": """
          SELECT user_id, max(event_id) AS max_offset, count(*) AS events
          FROM events GROUP BY user_id
        """,
        "cdc_dedup_composite": """
          SELECT user_id, event_type, min(event_id) AS first_event_id
          FROM events GROUP BY user_id, event_type
        """,
        "scan_filter_project": """
          SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                      AS DOUBLE) AS revenue,
                 count(*) AS n
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
            AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
        "agg_pricing_summary": """
          SELECT l_returnflag, l_linestatus,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
                 count(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          GROUP BY l_returnflag, l_linestatus
        """,
        "join_revenue_by_nation": """
          SELECT n_name,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                 count(*) AS n_items
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          GROUP BY n_name
        """,
        "window_topk_orders": """
          SELECT o_custkey, o_orderkey, o_totalprice, rn
          FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) rn
                FROM orders)
          WHERE rn <= 3
        """,
        "events_hourly_rollup": """
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                 event_type, count(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          FROM events GROUP BY 1, 2
        """,
        "asof_join": """
          WITH p AS (SELECT event_id, user_id, ts FROM events
                     WHERE event_type = 'purchase'),
               v AS (SELECT user_id, ts AS view_ts, event_id AS view_event_id
                     FROM events WHERE event_type = 'view')
          SELECT p.event_id, p.user_id, v.view_event_id
          FROM p ASOF LEFT JOIN v
            ON p.user_id = v.user_id AND p.ts >= v.view_ts
        """,
        "sessionize": """
          WITH o AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts > lag(ts) OVER w + INTERVAL 1800 SECONDS
                        THEN 1 ELSE 0 END AS ns
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
          ), s AS (
            SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) - 1
                           AS BIGINT) AS session_id
            FROM o
          )
          SELECT user_id, session_id, count(*) AS n_events,
                 min(event_id) AS first_event_id,
                 max(event_id) AS last_event_id
          FROM s GROUP BY 1, 2
        """,
        "rollup_pricing": """
          SELECT l_returnflag, l_linestatus, count(*) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "set_ops": """
          SELECT user_id, 'click_not_buy' AS tag FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
          UNION ALL
          SELECT user_id, 'signup_and_error' AS tag FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        """,
        "cube_status_priority": """
          SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                 round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                       AS DOUBLE), 2) AS total
          FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "semi_anti_join": """
          SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
                 'has_f_order' AS tag
          FROM customer c WHERE c_mktsegment = 'BUILDING'
            AND EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'F')
          UNION ALL
          SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
                 'no_f_order' AS tag
          FROM customer c WHERE c_mktsegment = 'BUILDING'
            AND NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderstatus = 'F')
        """,
        "quantiles_by_priority": """
          SELECT o_orderpriority,
                 round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
                 round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
                 count(*) AS n
          FROM orders GROUP BY o_orderpriority
        """,
        "text_token_stats": f"""
          SELECT doc_id,
                 len({_words_sql()}) AS ws_tokens,
                 length(text) AS chars,
                 round(CASE WHEN length(text) > 0
                       THEN len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                            / CAST(length(text) AS DOUBLE) ELSE 0.0 END, 6) AS punct_ratio,
                 round(CASE WHEN len({_words_sql()}) > 0
                       THEN len(list_filter({_words_sql()},
                            w -> list_contains(['and','avec','con','das','der','die','el','es','est','et','is','ist','la','las','le','les','los','mit','nicht','no','of','pas','that','the','to','und','with','y'], w)))
                            / CAST(len({_words_sql()}) AS DOUBLE) ELSE 0.0 END, 6) AS stopword_ratio,
                 md5(text) AS fp
          FROM documents
        """,
        "text_quality": f"""
          WITH base AS (
            SELECT doc_id, text, {_words_sql()} AS ws,
                   length(text) AS n,
                   len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS punct
            FROM documents
          ), m AS (
            SELECT doc_id,
                   CASE WHEN len(ws) > 0
                        THEN list_aggregate(list_transform(ws, w -> length(w)), 'sum')
                             / CAST(len(ws) AS DOUBLE) ELSE 0.0 END AS mwl,
                   least(n / 200.0, 1.0) AS len_ok,
                   1.0 - least(CASE WHEN n > 0 THEN punct / CAST(n AS DOUBLE)
                                    ELSE 0.0 END * 4.0, 1.0) AS punct_pen
            FROM base
          )
          SELECT doc_id, round(mwl, 6) AS mean_word_len,
                 round((len_ok + punct_pen +
                        CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.5 END
                       ) / 3.0, 6) AS quality
          FROM m
        """,
        "text_langid": f"""
          WITH w AS (SELECT doc_id, lang, {_words_sql()} AS ws FROM documents),
          s AS (SELECT doc_id, lang, {_lang_scores_sql()} FROM w),
          b AS (SELECT *, greatest(s_de, s_en, s_es, s_fr) AS best FROM s)
          SELECT doc_id, lang,
                 CASE WHEN best = 0 THEN 'und'
                      WHEN s_de = best THEN 'de'
                      WHEN s_en = best THEN 'en'
                      WHEN s_es = best THEN 'es'
                      WHEN s_fr = best THEN 'fr'
                      ELSE 'und' END AS lang_guess
          FROM b
        """,
        "text_minhash": f"""
          WITH w AS (SELECT doc_id, {_words_sql()} AS ws FROM documents)
          SELECT doc_id, array_to_string([{minhash8}], ',') AS sig FROM w
        """,
        "text_winnow": """
          WITH g AS (
            SELECT doc_id, text, length(text) AS n
            FROM documents WHERE doc_id < 300
          ),
          h AS (
            SELECT doc_id,
              CASE WHEN n >= 8 THEN list_transform(range(1, n - 6),
                i -> ('0x' || substr(md5(substr(text, i::INT, 8)), 1, 15))::BIGINT)
              ELSE []::BIGINT[] END AS hs
            FROM g
          ),
          w AS (
            SELECT doc_id,
              CASE WHEN len(hs) >= 4 THEN list_transform(range(1, len(hs) - 2),
                     j -> list_aggregate(hs[j:j+3], 'min'))
                   WHEN len(hs) > 0 THEN [list_aggregate(hs, 'min')]
                   ELSE []::BIGINT[] END AS wins
            FROM h
          )
          SELECT doc_id,
                 array_to_string(list_sort(list_distinct(wins)), ',') AS winnow
          FROM w
        """,
        "multimodal_features": f"""
          WITH m AS (
            SELECT i AS media_id,
                   ['image','audio','video'][(i % 3)::INT + 1] AS kind,
                   sha256(sha256('m' || CAST(i AS VARCHAR))
                          || sha256('n' || CAST(i AS VARCHAR))) AS h
            FROM (SELECT unnest(range(240)) AS i)
          )
          SELECT media_id, kind,
                 array_to_string([{", ".join(
                     f"('0x' || substr(h, {4 * i + 1}, 2))::INT"
                     f" + 256 * ('0x' || substr(h, {4 * i + 3}, 2))::INT"
                     for i in range(16)
                 )}], ',') AS feature_q
          FROM m
        """,
        "multimodal_frame_plan": """
          SELECT i AS media_id,
                 unnest(range(0, (i * 97) % 60000 + 1000, 1000))::INT AS frame_ts_ms
          FROM (SELECT unnest(range(240)) AS i)
          WHERE (i % 3) = 2
        """,
        "dedup_exact_docs": """
          WITH u AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
          )
          SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS copies
          FROM u GROUP BY md5(text)
        """,
        "ngram_jaccard_pairs": f"""
          WITH w AS (
            SELECT doc_id, list_distinct({_words_sql()}) AS sh
            FROM documents WHERE doc_id < 120
          )
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CASE WHEN len(list_distinct(a.sh || b.sh)) > 0
                       THEN len(list_intersect(a.sh, b.sh))
                            / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE)
                       ELSE 0.0 END, 6) AS jaccard
          FROM w a JOIN w b ON a.doc_id < b.doc_id
          WHERE CASE WHEN len(list_distinct(a.sh || b.sh)) > 0
                     THEN len(list_intersect(a.sh, b.sh))
                          / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE)
                     ELSE 0.0 END >= 0.5
        """,
        "ann_topk_quantized": """
          WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS qv
            FROM embeddings
          ),
          scored AS (
            SELECT qq.vec_id AS query_id, c.vec_id,
                   round(
                     list_dot_product(c.qv::DOUBLE[], qq.qv::DOUBLE[])
                     / (sqrt(list_dot_product(c.qv::DOUBLE[], c.qv::DOUBLE[]))
                        * sqrt(list_dot_product(qq.qv::DOUBLE[], qq.qv::DOUBLE[]))),
                   6) AS sim
            FROM q c CROSS JOIN (SELECT * FROM q WHERE vec_id < 5) qq
          )
          SELECT query_id, vec_id, sim, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, vec_id) AS rank
            FROM scored)
          WHERE rank <= 10
        """,
        "neardup_components": f"""
          WITH RECURSIVE w AS (
            SELECT doc_id, list_distinct({_words_sql()}) AS sh
            FROM documents WHERE doc_id < 120
          ), pr AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM w a JOIN w b ON a.doc_id < b.doc_id
            WHERE CASE WHEN len(list_distinct(a.sh || b.sh)) > 0
                  THEN len(list_intersect(a.sh, b.sh))
                       / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE)
                  ELSE 0.0 END >= 0.5
          ), edges AS (
            SELECT id_a AS s, id_b AS d FROM pr
            UNION
            SELECT id_b AS s, id_a AS d FROM pr
          ), reach(node, lbl) AS (
            SELECT s, s FROM edges
            UNION
            SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.node = e.d
          )
          SELECT node AS doc_id, min(lbl) AS keep_id,
                 (node <> min(lbl)) AS is_drop
          FROM reach GROUP BY node
        """,
        "minhash_lsh_neardup": _minhash_lsh_sql(),
        "simhash_neardup": _simhash_sql(),
        "ann_topk_float": f"""
          WITH scored AS (
            SELECT b.vec_id AS query_id, a.vec_id,
                   round({_seqfold_dot_sql('a.embedding', 'b.embedding')}
                         / (sqrt({_seqfold_dot_sql('a.embedding', 'a.embedding')})
                            * sqrt({_seqfold_dot_sql('b.embedding', 'b.embedding')})),
                         6) AS sim
            FROM embeddings a CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) b
          )
          SELECT query_id, vec_id, sim, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, vec_id) AS rank
            FROM scored)
          WHERE rank <= 10
        """,
        # IVF is approximate by design: the oracle pins the MEASURED
        # deterministic recall@10 at sf0.01 (k-means on a hash-ordered
        # sample + nprobe=4/16 probing; every input to the number is a pure
        # function of the data and seeds). Regenerate by running
        # q_ann_topk_ivf at sf0.01 if parameters change.
        # recall constants are a function of the corpus, so the pins are
        # keyed by corpus size: 500 = sf0.001/sf0.01, 2000 = sf0.1 —
        # the whole surface replays at BOTH gate scales
        "ann_topk_ivf": """
          SELECT t.query_id, t.hits, t.recall FROM (VALUES
            (500, 0::BIGINT, 4::BIGINT, 0.4::DOUBLE),
            (500, 1::BIGINT, 6::BIGINT, 0.6::DOUBLE),
            (500, 2::BIGINT, 4::BIGINT, 0.4::DOUBLE),
            (500, 3::BIGINT, 5::BIGINT, 0.5::DOUBLE),
            (500, 4::BIGINT, 6::BIGINT, 0.6::DOUBLE),
            (2000, 0::BIGINT, 8::BIGINT, 0.8::DOUBLE),
            (2000, 1::BIGINT, 6::BIGINT, 0.6::DOUBLE),
            (2000, 2::BIGINT, 5::BIGINT, 0.5::DOUBLE),
            (2000, 3::BIGINT, 2::BIGINT, 0.2::DOUBLE),
            (2000, 4::BIGINT, 7::BIGINT, 0.7::DOUBLE)
          ) AS t(corpus, query_id, hits, recall)
          WHERE t.corpus = (SELECT count(*) FROM embeddings)
        """,
        # measured deterministic PQ ADC recall@10 at sf0.01 (hash-ordered
        # sample + fixed k-means init + literal-expr encode => bit-stable)
        "ann_topk_pq": """
          SELECT t.query_id, t.hits, t.recall FROM (VALUES
            (500, 0::BIGINT, 4::BIGINT, 0.4::DOUBLE),
            (500, 1::BIGINT, 2::BIGINT, 0.2::DOUBLE),
            (500, 2::BIGINT, 2::BIGINT, 0.2::DOUBLE),
            (500, 3::BIGINT, 2::BIGINT, 0.2::DOUBLE),
            (500, 4::BIGINT, 3::BIGINT, 0.3::DOUBLE),
            (2000, 0::BIGINT, 1::BIGINT, 0.1::DOUBLE),
            (2000, 1::BIGINT, 2::BIGINT, 0.2::DOUBLE),
            (2000, 2::BIGINT, 2::BIGINT, 0.2::DOUBLE),
            (2000, 3::BIGINT, 3::BIGINT, 0.3::DOUBLE),
            (2000, 4::BIGINT, 2::BIGINT, 0.2::DOUBLE)
          ) AS t(corpus, query_id, hits, recall)
          WHERE t.corpus = (SELECT count(*) FROM embeddings)
        """,
        "embedding_neardup": """
          WITH base AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(floor(CAST(x AS DOUBLE)*1000.0+0.5) AS BIGINT)) AS q
            FROM embeddings
          ),
          u AS (
            SELECT vec_id, q FROM base
            UNION ALL
            SELECT vec_id + 1000000,
                   list_transform(range(1, 65),
                                  i -> q[i] + CASE WHEN i-1 = vec_id % 64 THEN 1 ELSE 0 END)
            FROM base WHERE vec_id < 20
          )
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_dot_product(a.q::DOUBLE[], b.q::DOUBLE[])
                       / (sqrt(list_dot_product(a.q::DOUBLE[], a.q::DOUBLE[]))
                          * sqrt(list_dot_product(b.q::DOUBLE[], b.q::DOUBLE[]))), 6) AS sim
          FROM u a JOIN u b ON a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.q::DOUBLE[], b.q::DOUBLE[])
                      / (sqrt(list_dot_product(a.q::DOUBLE[], a.q::DOUBLE[]))
                         * sqrt(list_dot_product(b.q::DOUBLE[], b.q::DOUBLE[]))), 6) >= 0.8
        """,
        "pack_sequences": f"""
          WITH toks AS (
            SELECT doc_id,
                   list_transform({_words_sql()},
                     w -> CAST(('0x' || substr(md5(w), 1, 7))::BIGINT % 32000
                               AS INTEGER)) AS tokens
            FROM documents
          ),
          base AS (
            SELECT doc_id, tokens, CAST(len(tokens) AS BIGINT) AS n
            FROM toks WHERE len(tokens) > 0
          ),
          off AS (
            SELECT doc_id, tokens, n,
                   CAST(sum(n) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
                        AS BIGINT) AS s
            FROM base
          ),
          pieces AS (
            SELECT u.c AS seq_id, o.s,
                   o.tokens[(GREATEST(u.c*128, o.s) - o.s + 1)
                            :(LEAST((u.c+1)*128, o.s + o.n) - o.s)] AS piece
            FROM off o,
                 UNNEST(generate_series(o.s // 128, (o.s + o.n - 1) // 128)) AS u(c)
          ),
          packed AS (
            SELECT seq_id, flatten(list(piece ORDER BY s)) AS tokens,
                   count(*) AS n_docs
            FROM pieces GROUP BY seq_id
          )
          SELECT seq_id, array_to_string(tokens, ',') AS tokens,
                 CAST(len(tokens) AS BIGINT) AS n_tok, n_docs
          FROM packed WHERE len(tokens) = 128
        """,
        "dedup_incremental": _dedup_incremental_sql(),
        "sample_stratified": """
          SELECT doc_id, source FROM documents
          WHERE ('0x' || substr(md5('s0:' || doc_id), 1, 15))::BIGINT
                / 1152921504606846976.0
                < CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.25
                              WHEN 'src2' THEN 0.5 ELSE 0.1 END
        """,
        "corpus_mix_epochs": """
          WITH r AS (
            SELECT doc_id, source,
                   CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.4
                               ELSE 1.0 END AS rate
            FROM documents
          ),
          e AS (
            SELECT doc_id, source, rate, u.epoch
            FROM r, UNNEST(generate_series(0, CAST(floor(rate) AS BIGINT)))
                    AS u(epoch)
          )
          SELECT doc_id, source, epoch FROM e
          WHERE epoch < floor(rate)
             OR ('0x' || substr(md5('s0:' || source || '|' || doc_id), 1, 15))
                ::BIGINT / 1152921504606846976.0 < rate - floor(rate)
        """,
        "token_budget_head": f"""
          WITH t AS (
            SELECT doc_id,
                   CAST(len({_words_sql()}) AS BIGINT) AS n_tok
            FROM documents
          ),
          o AS (
            SELECT doc_id, n_tok,
                   CAST(sum(n_tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_tok AS BIGINT) AS budget_start
            FROM t
          )
          SELECT doc_id, n_tok, budget_start FROM o
          WHERE budget_start < 12000
        """,
        "decontaminate_bench": f"""
          WITH w AS (SELECT doc_id, {_words_sql()} AS ws FROM documents),
          g AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len(ws)-4, 0)+1),
                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                          || ' ' || ws[i+3] || ' ' || ws[i+4])) AS grams
            FROM w
          ),
          bg AS (
            SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 13 = 0
          ),
          ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
          hits AS (
            SELECT doc_id, count(*) AS n_hit
            FROM ex JOIN bg USING (gram) GROUP BY doc_id
          )
          SELECT g.doc_id,
                 CAST(len(g.grams) AS BIGINT) AS n_grams,
                 CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
                 round(CASE WHEN len(g.grams) > 0
                       THEN coalesce(h.n_hit, 0) / CAST(len(g.grams) AS DOUBLE)
                       ELSE 0.0 END, 6) AS contamination,
                 round(CASE WHEN len(g.grams) > 0
                       THEN coalesce(h.n_hit, 0) / CAST(len(g.grams) AS DOUBLE)
                       ELSE 0.0 END, 6) >= 0.05 AS contaminated
          FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id
        """,
        "repetition_stats": f"""
          WITH w AS (SELECT doc_id, {_words_sql()} AS ws FROM documents),
          g AS (
            SELECT doc_id, ws,
                   list_transform(range(1, greatest(len(ws)-1, 0)+1),
                     i -> ws[i] || ' ' || ws[i+1]) AS g2,
                   list_transform(range(1, greatest(len(ws)-2, 0)+1),
                     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
            FROM w
          ),
          t2 AS (
            SELECT doc_id, max(c) AS mx, sum(c) AS tot
            FROM (SELECT doc_id, gram, count(*) AS c
                  FROM (SELECT doc_id, unnest(g2) AS gram FROM g)
                  GROUP BY doc_id, gram)
            GROUP BY doc_id
          ),
          t3 AS (
            SELECT doc_id, max(c) AS mx, sum(c) AS tot
            FROM (SELECT doc_id, gram, count(*) AS c
                  FROM (SELECT doc_id, unnest(g3) AS gram FROM g)
                  GROUP BY doc_id, gram)
            GROUP BY doc_id
          ),
          s AS (
            SELECT g.doc_id,
                   CAST(len(g.ws) AS BIGINT) AS n_words,
                   round(CASE WHEN len(g.ws) > 0
                         THEN 1.0 - len(list_distinct(g.ws))
                              / CAST(len(g.ws) AS DOUBLE)
                         ELSE 0.0 END, 6) AS dup_word_frac,
                   round(coalesce(t2.mx / CAST(t2.tot AS DOUBLE), 0.0), 6)
                     AS top2gram_frac,
                   round(coalesce(t3.mx / CAST(t3.tot AS DOUBLE), 0.0), 6)
                     AS top3gram_frac
            FROM g LEFT JOIN t2 ON g.doc_id = t2.doc_id
                   LEFT JOIN t3 ON g.doc_id = t3.doc_id
          )
          SELECT *, (dup_word_frac > 0.6 OR top2gram_frac > 0.2
                     OR top3gram_frac > 0.18) AS repetitive
          FROM s
        """,
        "pii_scrub": r"""
          WITH inj AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.org'
                        WHEN doc_id % 11 = 0
                        THEN text || ' from 10.2.' || CAST(doc_id % 256 AS VARCHAR)
                             || '.7 acct 9003456789'
                        ELSE text END AS text
            FROM documents
          ),
          pats AS (
            SELECT '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}' AS email,
                   '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b' AS ipv4,
                   '\b[0-9]{9,}\b' AS longd
          )
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, email)) AS BIGINT) AS n_email,
                 CAST(len(regexp_extract_all(text, ipv4)) AS BIGINT) AS n_ipv4,
                 CAST(len(regexp_extract_all(text, longd)) AS BIGINT)
                   AS n_long_digits,
                 CAST(len(regexp_extract_all(text, email))
                      + len(regexp_extract_all(text, ipv4))
                      + len(regexp_extract_all(text, longd)) AS BIGINT) AS n_pii,
                 md5(regexp_replace(regexp_replace(regexp_replace(
                       text, email, '[PII]', 'g'), ipv4, '[PII]', 'g'),
                       longd, '[PII]', 'g')) AS red_fp
          FROM inj, pats
        """,
        "unigram_logprob": f"""
          WITH w AS (
            SELECT doc_id, unnest({_words_sql()}) AS word FROM documents
          ),
          pairs AS (
            SELECT doc_id, word, count(*) AS k FROM w GROUP BY doc_id, word
          ),
          vocab AS (SELECT word, sum(k) AS c FROM pairs GROUP BY word),
          tot AS (SELECT sum(c) AS tot FROM vocab)
          SELECT doc_id,
                 CAST(sum(k) AS BIGINT) AS n_words,
                 round(sum(k * ln(c / CAST(tot AS DOUBLE))) / sum(k), 6)
                   AS avg_logprob
          FROM pairs JOIN vocab USING (word) CROSS JOIN tot
          GROUP BY doc_id
        """,
        "bm25_search": _bm25_sql(),
        "dup_spans": _dup_spans_sql(),
        "quality_classifier": _classifier_sql(),
        "chunk_documents": _chunk_sql(),
        "temperature_mix": _temperature_mix_sql(),
        "interval_join": """
          WITH v AS (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'view'
          ),
          o AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts > lag(ts) OVER w + INTERVAL 86400 SECONDS
                        THEN 1 ELSE 0 END AS ns
            FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts)
          ),
          s AS (
            SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) - 1
                           AS BIGINT) AS session_id
            FROM o
          ),
          sess AS (
            SELECT user_id, session_id,
                   min(ts) AS s_start, max(ts) AS s_end
            FROM s GROUP BY 1, 2
          ),
          e AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'error'
          )
          SELECT e.event_id, e.user_id, sess.session_id,
                 CAST(floor(epoch(sess.s_start)) AS BIGINT) AS start_s,
                 CAST(floor(epoch(sess.s_end)) AS BIGINT) AS end_s
          FROM e JOIN sess
            ON e.user_id = sess.user_id
           AND e.ts >= sess.s_start AND e.ts <= sess.s_end
        """,
        "tokenize_encode": _tokenize_sql(),
        "quality_gate": _quality_gate_sql(),
        "bpe_encode": _bpe_sql(),
        "line_dedup_boilerplate": """
          WITH inj AS (
            SELECT doc_id,
                   concat_ws(chr(10),
                     substr(text, 1, 30),
                     CASE WHEN doc_id % 3 = 0
                          THEN 'subscribe to our newsletter' END,
                     CASE WHEN doc_id % 4 = 0 THEN '' END,
                     CASE WHEN doc_id % 5 = 0 THEN 'all rights reserved' END,
                     substr(text, 31, 1000000)) AS text
            FROM documents
          ),
          lines AS (
            SELECT doc_id, i - 1 AS pos, l[i] AS line
            FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM inj),
                 UNNEST(generate_series(1, len(l))) AS u(i)
          ),
          nonblank AS (SELECT * FROM lines WHERE trim(line) <> ''),
          dup AS (
            SELECT line FROM nonblank
            GROUP BY line HAVING count(DISTINCT doc_id) >= 2
          ),
          off_a AS (SELECT doc_id, pos FROM nonblank JOIN dup USING (line)),
          off_f AS (
            SELECT doc_id, pos FROM (
              SELECT doc_id, pos, count(*) OVER (PARTITION BY line) AS c,
                     row_number() OVER (PARTITION BY line
                                        ORDER BY doc_id, pos) AS rn
              FROM nonblank
            ) WHERE c >= 2 AND rn > 1
          ),
          keep_a AS (
            SELECT l.* FROM lines l LEFT JOIN off_a o
              ON l.doc_id = o.doc_id AND l.pos = o.pos
            WHERE o.doc_id IS NULL
          ),
          keep_f AS (
            SELECT l.* FROM lines l LEFT JOIN off_f o
              ON l.doc_id = o.doc_id AND l.pos = o.pos
            WHERE o.doc_id IS NULL
          )
          SELECT p.doc_id,
                 md5(coalesce(a.t, '')) AS fp_drop_all,
                 md5(coalesce(f.t, '')) AS fp_keep_first
          FROM inj p
          LEFT JOIN (SELECT doc_id,
                            string_agg(line, chr(10) ORDER BY pos) AS t
                     FROM keep_a GROUP BY doc_id) a USING (doc_id)
          LEFT JOIN (SELECT doc_id,
                            string_agg(line, chr(10) ORDER BY pos) AS t
                     FROM keep_f GROUP BY doc_id) f USING (doc_id)
        """,
        "shuffle_deterministic": """
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY
                   ('0x' || substr(md5('s7:' || doc_id), 1, 15))::BIGINT,
                   doc_id) - 1 AS BIGINT) AS shuffle_rank
          FROM documents
        """,
        "shard_assignment": """
          WITH r AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY
                     ('0x' || substr(md5('s3:' || doc_id), 1, 15))::BIGINT,
                     doc_id) - 1 AS rk
            FROM documents
          )
          SELECT doc_id,
                 CAST(rk // 64 AS BIGINT) AS shard_id,
                 CAST(rk % 64 AS BIGINT) AS pos_in_shard
          FROM r
        """,
        "score_percentile": """
          SELECT doc_id,
                 CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1
                      AS DOUBLE)
                 / greatest(count(*) OVER () - 1, 1) AS percentile
          FROM documents
        """,
        # measured deterministic two-stage (ADC top-40 -> exact refine)
        # recall@10 at sf0.01 — vs raw ADC's 0.4/0.2/0.2/0.2/0.3
        # (ann_topk_pq); every input is a pure function of data + seeds
        "ann_topk_pq_refined": """
          SELECT t.query_id, t.hits, t.recall FROM (VALUES
            (500, 0::BIGINT, 7::BIGINT, 0.7::DOUBLE),
            (500, 1::BIGINT, 3::BIGINT, 0.3::DOUBLE),
            (500, 2::BIGINT, 8::BIGINT, 0.8::DOUBLE),
            (500, 3::BIGINT, 6::BIGINT, 0.6::DOUBLE),
            (500, 4::BIGINT, 6::BIGINT, 0.6::DOUBLE),
            (2000, 0::BIGINT, 4::BIGINT, 0.4::DOUBLE),
            (2000, 1::BIGINT, 3::BIGINT, 0.3::DOUBLE),
            (2000, 2::BIGINT, 6::BIGINT, 0.6::DOUBLE),
            (2000, 3::BIGINT, 6::BIGINT, 0.6::DOUBLE),
            (2000, 4::BIGINT, 4::BIGINT, 0.4::DOUBLE)
          ) AS t(corpus, query_id, hits, recall)
          WHERE t.corpus = (SELECT count(*) FROM embeddings)
        """,
        "take_top_fraction": """
          WITH r AS (
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id DESC)
                     AS rk,
                   count(*) OVER () AS n
            FROM documents
          )
          SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
          FROM r WHERE rk <= CAST(floor(n * 0.25) AS BIGINT)
        """,
        "semantic_dedup": """
          WITH RECURSIVE base AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(floor(CAST(x AS DOUBLE)*1000.0+0.5) AS BIGINT)) AS q
            FROM embeddings
          ),
          u AS (
            SELECT vec_id, q FROM base
            UNION ALL
            SELECT vec_id + 1000000,
                   list_transform(range(1, 65),
                                  i -> q[i] + CASE WHEN i-1 = vec_id % 64 THEN 1 ELSE 0 END)
            FROM base WHERE vec_id < 20
          ),
          pr AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM u a JOIN u b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.q::DOUBLE[], b.q::DOUBLE[])
                        / (sqrt(list_dot_product(a.q::DOUBLE[], a.q::DOUBLE[]))
                           * sqrt(list_dot_product(b.q::DOUBLE[], b.q::DOUBLE[]))), 6)
                  >= 0.8
          ),
          edges AS (
            SELECT id_a AS s, id_b AS d FROM pr
            UNION
            SELECT id_b AS s, id_a AS d FROM pr
          ),
          reach(node, lbl) AS (
            SELECT s, s FROM edges
            UNION
            SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.node = e.d
          ),
          dec AS (
            SELECT node, min(lbl) AS keep_id FROM reach GROUP BY node
          )
          SELECT u.vec_id,
                 coalesce(dec.keep_id, u.vec_id) AS keep_id,
                 coalesce(u.vec_id <> dec.keep_id, FALSE) AS is_drop
          FROM u LEFT JOIN dec ON u.vec_id = dec.node
        """,
        "bigram_logprob": f"""
          WITH w AS (
            SELECT doc_id, {_words_sql()} AS ws FROM documents
          ),
          bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ws)),
                                         i -> ws[i] || ' ' || ws[i+1])) AS bigram
            FROM w
          ),
          pairs AS (
            SELECT doc_id, bigram, count(*) AS k FROM bg GROUP BY doc_id, bigram
          ),
          counts AS (SELECT bigram, sum(k) AS c FROM pairs GROUP BY bigram),
          prefix AS (
            SELECT string_split(bigram, ' ')[1] AS w1, sum(c) AS cp
            FROM counts GROUP BY 1
          )
          SELECT doc_id,
                 CAST(sum(k) AS BIGINT) AS n_bigrams,
                 round(sum(k * ln(c / CAST(cp AS DOUBLE))) / sum(k), 6)
                   AS avg_logprob
          FROM pairs
          JOIN counts USING (bigram)
          JOIN prefix ON string_split(bigram, ' ')[1] = prefix.w1
          GROUP BY doc_id
        """,
        "dsir_select": _dsir_sql(),
        "corpus_split": f"""
          SELECT doc_id,
                 CASE WHEN u < {0.9!r} THEN 'train'
                      WHEN u < {0.9 + 0.05!r} THEN 'val'
                      ELSE 'test' END AS split
          FROM (SELECT doc_id,
                       ('0x' || substr(md5('s11:' || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT
                         / 1152921504606846976.0 AS u
                FROM documents)
        """,
        "length_batches": f"""
          WITH w AS (SELECT doc_id, len({_words_sql()}) AS n_tok
                     FROM documents),
          b AS (SELECT doc_id, n_tok,
                       (n_tok > 24)::INT + (n_tok > 48)::INT
                         + (n_tok > 72)::INT AS bucket,
                       ('0x' || substr(md5('s5:' || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT
                         % {1 << 44} AS h
                FROM w),
          r AS (SELECT doc_id, n_tok, bucket,
                       row_number() OVER (PARTITION BY bucket
                                          ORDER BY h, doc_id) - 1 AS rk
                FROM b)
          SELECT doc_id,
                 CAST(n_tok AS BIGINT) AS n_tok,
                 CAST(bucket AS BIGINT) AS bucket,
                 CAST(rk // 8 AS BIGINT) AS batch_idx,
                 CAST(rk % 8 AS BIGINT) AS pos,
                 CAST(max(n_tok) OVER (PARTITION BY bucket, rk // 8)
                      AS BIGINT) AS padded_len
          FROM r
        """,
        "hll_distinct_grams": _hll_sql(),
        "heavy_hitters_cms": f"""
          WITH w AS (
            SELECT unnest({_words_sql()}) AS word FROM documents
          ),
          top AS (
            SELECT word, c FROM (
              SELECT word, count(*)::BIGINT AS c,
                     row_number() OVER (ORDER BY count(*) DESC, word) AS rn
              FROM w GROUP BY word) WHERE rn <= 20
          ),
          cells AS (
            SELECT w.word, t.j,
                   ('0x' || substr(md5('cm0:' || t.j || ':' || w.word), 1, 15))::BIGINT
                     % 1024 AS idx
            FROM w CROSS JOIN range(4) t(j)
          ),
          sk AS (
            SELECT j, idx, count(*)::BIGINT AS cnt FROM cells GROUP BY j, idx
          ),
          probe AS (
            SELECT top.word, t.j,
                   ('0x' || substr(md5('cm0:' || t.j || ':' || top.word), 1, 15))::BIGINT
                     % 1024 AS idx
            FROM top CROSS JOIN range(4) t(j)
          ),
          est AS (
            SELECT probe.word,
                   CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS cm_est
            FROM probe LEFT JOIN sk USING (j, idx) GROUP BY probe.word
          )
          SELECT top.word, top.c AS exact_cnt, est.cm_est
          FROM top JOIN est USING (word)
        """,
        "neardup_keep_best": f"""
          WITH RECURSIVE w AS (
            SELECT doc_id, list_distinct({_words_sql()}) AS sh, n_chars
            FROM documents WHERE doc_id < 120
          ), pr AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM w a JOIN w b ON a.doc_id < b.doc_id
            WHERE CASE WHEN len(list_distinct(a.sh || b.sh)) > 0
                  THEN len(list_intersect(a.sh, b.sh))
                       / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE)
                  ELSE 0.0 END >= 0.5
          ), edges AS (
            SELECT id_a AS s, id_b AS d FROM pr
            UNION
            SELECT id_b AS s, id_a AS d FROM pr
          ), reach(node, lbl) AS (
            SELECT s, s FROM edges
            UNION
            SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.node = e.d
          ), comp AS (
            SELECT node, min(lbl) AS comp FROM reach GROUP BY node
          ), scored AS (
            SELECT c.node, c.comp, w.n_chars
            FROM comp c JOIN w ON w.doc_id = c.node
          ), best AS (
            SELECT comp, node AS keep_id FROM (
              SELECT comp, node, row_number() OVER (
                PARTITION BY comp ORDER BY n_chars DESC, node) AS rn
              FROM scored) WHERE rn = 1
          )
          SELECT s.node AS doc_id, b.keep_id, (s.node <> b.keep_id) AS is_drop
          FROM scored s JOIN best b USING (comp)
        """,
        "domain_cap": """
          SELECT doc_id, source FROM (
            SELECT doc_id, source, row_number() OVER (
              PARTITION BY source
              ORDER BY ('0x' || substr(md5('s0:' || doc_id), 1, 15))::BIGINT
                       / 1152921504606846976.0, doc_id) AS rk
            FROM documents) WHERE rk <= 12
        """,
        "bloom_decontaminate": _bloom_sql(),
        "normalize_text": r"""
          WITH dirty AS (
            SELECT doc_id,
                   (CASE WHEN doc_id % 3 = 0
                         THEN 'Cafe' || chr(769) || '  du  parc' || chr(9)
                         ELSE '' END)
                   || text
                   || (CASE WHEN doc_id % 5 = 0
                            THEN ' ' || chr(1) || 'A' || chr(778)
                                 || 'ngstro' || chr(776) || 'm '
                                 || chr(8491) || chr(31) || '  unit '
                            ELSE '' END)
                   || (CASE WHEN doc_id % 7 = 0
                            THEN chr(2) || chr(9) || 'tail' || chr(127)
                                 || '  case'
                            ELSE '' END) AS text
            FROM documents
          ),
          norm AS (
            SELECT doc_id,
                   trim(regexp_replace(
                     regexp_replace(
                       nfc_normalize(text),
                       '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                     '\s+', ' ', 'g')) AS norm_text
            FROM dirty
          )
          SELECT doc_id,
                 md5(norm_text) AS norm_fp,
                 CAST(length(norm_text) AS BIGINT) AS norm_len
          FROM norm
        """,
        "kmeans_clusters": _kmeans_sql(),
        "url_filter": _url_filter_sql(),
        # the naive quadratic join — hash match proves the distributed
        # prefix-filter plan (equi-joins only) is lossless
        "jaccard_prefix_join": f"""
          WITH w AS (
            SELECT doc_id, list_distinct({_words_sql()}) AS sh
            FROM documents WHERE doc_id < 400
          )
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CASE WHEN len(list_distinct(a.sh || b.sh)) > 0
                       THEN len(list_intersect(a.sh, b.sh))
                            / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE)
                       ELSE 0.0 END, 6) AS jaccard
          FROM w a JOIN w b ON a.doc_id < b.doc_id
          WHERE CASE WHEN len(list_distinct(a.sh || b.sh)) > 0
                     THEN len(list_intersect(a.sh, b.sh))
                          / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE)
                     ELSE 0.0 END >= 0.4
        """,
        # naive single-window top-k per group — hash match proves the
        # salted two-phase reduction returns identical rows and ranks
        "topk_per_domain": """
          SELECT source, doc_id, n_chars, rank FROM (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rank
            FROM documents)
          WHERE rank <= 3
        """,
        # naive per-group window — hash match proves the scan-minus-base
        # decomposition computes the identical within-group rank
        "score_percentile_by_lang": """
          SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(row_number() OVER (PARTITION BY lang
                                         ORDER BY n_chars, doc_id) - 1
                      AS DOUBLE)
                 / greatest(count(*) OVER (PARTITION BY lang) - 1, 1)
                   AS percentile
          FROM documents
        """,
        "top_fraction_by_lang": """
          SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM (
            SELECT doc_id, lang, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_chars, doc_id) - 1 AS rk,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM documents)
          WHERE rk >= n - floor(n * 0.25)
        """,
        "pagerank_domains": _pagerank_sql(),
        "content_chunks": _cdc_chunk_rows_sql(
            "SELECT doc_id, text FROM documents"
        ),
        "chunk_dedup_cdc": _chunk_dedup_sql(),
        "decontaminate_spans": _decontaminate_spans_sql(),
        "html_extract": _html_extract_sql(),
        # IVM: the oracle IGNORES batching entirely — direct rollup over
        # the LWW final state; the incremental path must land exactly here
        "cdc_incremental_rollup": f"""
          SELECT last_event_type AS grp,
                 count(*) AS n_keys,
                 round(CAST(SUM(CAST(last_value AS DECIMAL(18,6)))
                            AS DOUBLE), 6) AS sum_value
          FROM ({latest})
          WHERE last_event_type <> 'error'
          GROUP BY last_event_type
        """,
        "zorder_layout": _zorder_sql(),
        "tfidf_keywords": f"""
          WITH w AS (
            SELECT doc_id, unnest({_words_sql()}) AS word FROM documents
          ), pairs AS (
            SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2
          ), dfreq AS (
            SELECT word, count(*) AS doc_freq FROM pairs GROUP BY 1
          ), n AS (SELECT count(*) AS n_docs FROM documents),
          s AS (
            SELECT doc_id, word, tf, doc_freq,
                   round(tf * (ln((n_docs + 1.0) / (doc_freq + 1.0)) + 1.0), 9)
                     AS tfidf
            FROM pairs JOIN dfreq USING (word) CROSS JOIN n
          ), r AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, word) AS rank
            FROM s
          )
          SELECT doc_id, word AS term, tf, doc_freq, tfidf,
                 CAST(rank AS BIGINT) AS rank
          FROM r WHERE rank <= 5
        """,
        "line_quality": """
          WITH inj AS (
            SELECT doc_id, concat_ws(chr(10),
                     substr(text, 1, 50),
                     CASE WHEN doc_id % 3 = 0 THEN '- first bullet item' END,
                     CASE WHEN doc_id % 4 = 0 THEN 'ok then' END,
                     CASE WHEN doc_id % 5 = 0 THEN '   ' END,
                     substr(text, 51, 60) || '.') AS text
            FROM documents
          ), l AS (
            SELECT doc_id,
                   list_filter(string_split(text, chr(10)),
                               x -> trim(x) <> '') AS ls
            FROM inj
          ), m AS (
            SELECT doc_id, ls, len(ls) AS nl,
                   list_transform(ls, x -> len(list_filter(
                     string_split_regex(lower(trim(x)), '\\s+'),
                     w -> w <> ''))) AS wc
            FROM l
          )
          SELECT doc_id,
                 CAST(nl AS BIGINT) AS n_lines,
                 CASE WHEN nl > 0 THEN round(
                   len(list_filter(ls, x -> regexp_matches(trim(x), '[.!?"]$')))
                   / CAST(nl AS DOUBLE), 6) ELSE 0.0 END AS frac_end_punct,
                 CASE WHEN nl > 0 THEN round(
                   len(list_filter(ls, x -> regexp_matches(trim(x), '^[-*•]')))
                   / CAST(nl AS DOUBLE), 6) ELSE 0.0 END AS frac_bullet,
                 CASE WHEN nl > 0 THEN round(
                   len(list_filter(wc, c -> c < 4))
                   / CAST(nl AS DOUBLE), 6) ELSE 0.0 END AS frac_short,
                 CASE WHEN nl > 0 THEN round(
                   list_aggregate(wc, 'sum') / CAST(nl AS DOUBLE), 6)
                 ELSE 0.0 END AS mean_line_words
          FROM m
        """,
        "url_dedup": _url_dedup_sql(),
        "anchor_text_agg": _anchor_agg_sql(),
        # the oracle never sees the table: it derives the changelog from
        # the raw feed — LWW at the batch boundary vs LWW over everything
        "table_changes": """
          WITH f AS (
            SELECT CAST(user_id AS VARCHAR) AS doc_id,
                   event_id AS off,
                   CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                   event_type AS source
            FROM events
          ), a AS (
            SELECT doc_id, off, op, source FROM (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY off DESC) rn
              FROM f WHERE off % 4 < 2) WHERE rn = 1
          ), b AS (
            SELECT doc_id, off, op, source FROM (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY off DESC) rn
              FROM f) WHERE rn = 1
          ), j AS (
            SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                   a.off AS ao, a.op AS aop, a.source AS asrc,
                   b.off AS bo, b.op AS bop, b.source AS bsrc,
                   (a.doc_id IS NOT NULL AND a.op <> 'D') AS old_live,
                   (b.doc_id IS NOT NULL AND b.op <> 'D') AS new_live
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
          )
          SELECT CASE WHEN NOT old_live AND new_live THEN 'I'
                      WHEN old_live AND NOT new_live THEN 'D'
                      ELSE 'U' END AS change,
                 doc_id,
                 CASE WHEN old_live AND NOT new_live THEN asrc
                      ELSE bsrc END AS source,
                 ao AS old_offset, bo AS new_offset
          FROM j
          WHERE (old_live <> new_live)
             OR (old_live AND new_live AND ao <> bo)
        """,
        "span_corruption": _span_corruption_sql(),
        # good rows are a byte-exact round-trip; corrupt (every 13th)
        # lines are quarantined, so the oracle recomputes the survivors
        "jsonl_ingest": """
          SELECT doc_id, md5(substr(text, 1, 80)) AS text_hash, lang
          FROM documents WHERE doc_id % 13 <> 0
        """,
        # closed-form verdicts from the injected variant arithmetic:
        # k=0 rules (/private deny, /private/ok allow), k=1 (/tmp deny
        # under the * group only), k=2 (no * group -> all allowed)
        "robots_gate": """
          SELECT doc_id,
                 'site' || CAST(doc_id % 10 AS VARCHAR) || '.com' AS domain,
                 CASE CAST(doc_id % 4 AS INT)
                   WHEN 0 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
                   WHEN 1 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
                   WHEN 2 THEN '/tmp/' || CAST(doc_id AS VARCHAR)
                   ELSE '/page/' || CAST(doc_id AS VARCHAR)
                 END AS path,
                 CASE
                   WHEN (doc_id % 10) % 3 = 0 AND doc_id % 4 = 0 THEN FALSE
                   WHEN (doc_id % 10) % 3 = 1 AND doc_id % 4 = 2 THEN FALSE
                   ELSE TRUE
                 END AS allowed
          FROM documents
        """,
        "embedding_decontaminate": f"""
          WITH ref AS (
            SELECT list_transform(range(1, 65), i ->
                     CASE WHEN i - 1 = vec_id % 64
                          THEN CAST(embedding[i] + 0.001 AS FLOAT)
                          ELSE embedding[i] END) AS rvec
            FROM embeddings WHERE vec_id % 17 = 3
            UNION ALL
            SELECT embedding AS rvec FROM embeddings WHERE vec_id % 11 = 0
          ), scored AS (
            SELECT c.vec_id,
                   CASE WHEN sqrt({_seqfold_dot_sql('c.embedding', 'c.embedding')})
                             * sqrt({_seqfold_dot_sql('r.rvec', 'r.rvec')}) > 0
                        THEN round({_seqfold_dot_sql('c.embedding', 'r.rvec')}
                             / (sqrt({_seqfold_dot_sql('c.embedding', 'c.embedding')})
                                * sqrt({_seqfold_dot_sql('r.rvec', 'r.rvec')})), 6)
                        ELSE 0.0 END AS sim
            FROM embeddings c CROSS JOIN ref r
          )
          SELECT vec_id, max(sim) AS max_sim,
                 CAST(sum(CASE WHEN sim >= 0.99 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hits,
                 max(sim) >= 0.99 AS contaminated
          FROM scored GROUP BY vec_id
        """,
        "user_features": """
          SELECT user_id, event_id,
                 round(avg(value) OVER w3, 6) AS ma3,
                 round(value - lag(value, 1) OVER w, 6) AS dv,
                 count(*) OVER wc AS cum_n,
                 date_diff('second',
                           lag(ts, 1) OVER w, ts) AS gap_s
          FROM events
          WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
                 w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 wc AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING)
        """,
    }


def _anchor_agg_sql() -> str:
    """DuckDB replay of q_anchor_text_agg with the BYTE-IDENTICAL
    patterns imported from operators/html.py and operators/urls.py:
    injection, invisible-region strip, whole-anchor extraction, per-
    element href/anchor scrub (tags → entities → ws collapse), host +
    registrable domain, and the per-domain aggregate."""
    from kafka_connect_gcs_spark.operators.html import (
        ANCHOR_RE,
        COMMENT_RE,
        ENTITIES,
        HREF_RE,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
    )
    from kafka_connect_gcs_spark.operators.urls import (
        _HOST_RE,
        DEFAULT_TWO_LEVEL_SUFFIXES,
    )

    def ent(expr: str) -> str:
        for e, r in ENTITIES:
            rr = r.replace("'", "''")
            expr = f"replace({expr}, '{e}', '{rr}')"
        return expr

    anchor = (
        f"trim(regexp_replace({ent(f'''regexp_replace(e, '{TAG_RE}', ' ', 'g')''')}"
        ", '\\s+', ' ', 'g'))"
    )
    sufs = ", ".join(f"'{s}'" for s in DEFAULT_TWO_LEVEL_SUFFIXES)
    return f"""
      WITH inj AS (
        SELECT doc_id,
          '<html><body><p>intro</p><a href="https://www.news'
          || CAST(doc_id % 7 AS VARCHAR) || '.com/a/'
          || CAST(doc_id AS VARCHAR) || '">Breaking &amp; exclusive '
          || CAST(doc_id % 11 AS VARCHAR)
          || '</a><!-- <a href="http://skip.me/x">no</a> -->'
          || '<a HREF="//cdn' || CAST(doc_id % 3 AS VARCHAR)
          || '.media-host.net/x">see <b>photos</b> now</a>'
          || '<a href="/rel/' || CAST(doc_id AS VARCHAR)
          || '">local nav</a></body></html>' AS html
        FROM documents),
      s AS (SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(html,
                '{COMMENT_RE}', ' ', 'g'),
                '{SCRIPT_RE}', ' ', 'g'),
                '{STYLE_RE}', ' ', 'g') AS sv
            FROM inj),
      el AS (SELECT doc_id, unnest(regexp_extract_all(sv, '{ANCHOR_RE}', 0)) AS e
             FROM s),
      fa AS (SELECT doc_id,
                    regexp_extract(e, '{HREF_RE}', 1) AS href,
                    {anchor} AS anchor
             FROM el),
      lab AS (SELECT doc_id, anchor,
                     lower(regexp_extract(href, '{_HOST_RE}', 1)) AS host,
                     string_split(lower(regexp_extract(href, '{_HOST_RE}', 1)),
                                  '.') AS ls
              FROM fa),
      dom AS (SELECT doc_id, anchor,
                CASE WHEN len(ls) <= 2 THEN host
                     WHEN array_to_string(list_slice(ls, len(ls) - 1, len(ls)),
                                          '.') IN ({sufs})
                     THEN array_to_string(list_slice(ls, len(ls) - 2, len(ls)),
                                          '.')
                     ELSE array_to_string(list_slice(ls, len(ls) - 1, len(ls)),
                                          '.')
                END AS domain
              FROM lab)
      SELECT domain, count(*) AS n_links,
             count(DISTINCT doc_id) AS n_src_docs,
             count(DISTINCT anchor) AS n_anchors,
             min(anchor) AS first_anchor
      FROM dom WHERE domain <> '' GROUP BY 1
    """


def _url_dedup_sql() -> str:
    """DuckDB replay of q_url_dedup: the injected variants, then the full
    canonicalization chain (fragment strip, scheme default+lowercase,
    authority/port/path/query extraction with the BYTE-IDENTICAL regexes
    imported from operators/urls.py, tracking-param filter, sorted
    params) and the group-by. array_to_string of an empty list is NULL in
    DuckDB where Spark's concat_ws gives '' — coalesced."""
    from kafka_connect_gcs_spark.operators.urls import TRACKING_PARAM_RE

    return f"""
      WITH inj AS (
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'http://www.page' || (doc_id // 4) ||
                             '.example.com/a/' || (doc_id // 4) || '?x=1&y=2'
                 WHEN 1 THEN 'HTTP://page' || (doc_id // 4) ||
                             '.example.com/a/' || (doc_id // 4) || '?y=2&x=1#frag'
                 WHEN 2 THEN 'http://page' || (doc_id // 4) ||
                             '.example.com:80/a/' || (doc_id // 4) ||
                             '?utm_source=news&x=1&y=2'
                 ELSE 'https://page' || (doc_id // 4) ||
                      '.example.com/a/' || (doc_id // 4) || '/?x=1&y=2'
               END AS url
        FROM documents
      ), c AS (
        SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM inj
      ), parts AS (
        SELECT doc_id, u,
               lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                 AS sch0,
               regexp_extract(u,
                 '^(?:[A-Za-z][A-Za-z0-9+.-]*:)?(?://)?(?:[^/@?#]*@)?([^/?#]*)',
                 1) AS authority,
               regexp_extract(u,
                 '^(?:[A-Za-z][A-Za-z0-9+.-]*:)?(?://)?[^/?#]*(/[^?#]*)?',
                 1) AS path0,
               regexp_extract(u, '\\?(.*)$', 1) AS qraw
        FROM c
      ), norm AS (
        SELECT doc_id,
               CASE WHEN sch0 = '' THEN 'http' ELSE sch0 END AS scheme,
               regexp_replace(regexp_replace(
                 lower(regexp_replace(authority, ':[0-9]+$', '')),
                 '\\.$', ''), '^www\\.', '') AS host,
               regexp_extract(authority, ':([0-9]+)$', 1) AS port,
               CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
               coalesce(array_to_string(list_sort(list_filter(
                 string_split(qraw, '&'),
                 p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')
               )), '&'), '') AS query
        FROM parts
      ), canon AS (
        SELECT doc_id,
               scheme || '://' || host ||
               CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                         OR (scheme = 'https' AND port = '443')
                    THEN '' ELSE ':' || port END ||
               path ||
               CASE WHEN query = '' THEN '' ELSE '?' || query END AS canon_url
        FROM norm
      )
      SELECT canon_url, min(doc_id) AS keep_id, count(*) AS n_variants
      FROM canon GROUP BY 1
    """


def _span_corruption_sql(
    p: float = 0.08, L: int = 3, sentinel: int = 100_000, seed: int = 5
) -> str:
    """DuckDB replay of q_span_corruption: portable token ids, the
    per-position md5 draw, the greedy next-free scan as a STRING-state
    list_reduce ('nf|s1,s2,…' — the BPE-oracle fold technique; DuckDB's
    list_reduce seeds from the first element, so an 'I' marker row
    initializes the state), then slice assembly with 1-based indexed
    list_transform (DuckDB's lambda index is 1-based where Spark's is
    0-based — the k-1 below is that conversion)."""
    h60 = float(1 << 60)
    # The greedy scan is replayed WITHOUT list_reduce: DuckDB 1.0's
    # list_reduce MISALIGNS results across rows when a vector batch
    # carries several rows with long variable-length lists — row k can
    # receive row k-1's (correct) fold output (repro: 500 rows × ~100
    # elements → 9 shifted rows; single-row runs always agree with
    # Spark). No correlated lambda reference is needed to trigger it.
    # Equivalent formulation: greedy fixed-length selection is a pointer
    # chase (each hit's successor = the first hit past its exclusion
    # zone), so a recursive CTE from each doc's first hit through the
    # precomputed successor table yields exactly the selected starts —
    # the neardup_components oracle technique. list_transform correlation
    # (the draw below) is sound; every green oracle relies on it.
    draw = (
        "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
        "CAST(i AS VARCHAR) || "
        f"':{seed}'), 1, 15))::BIGINT + 0.5) / {h60}"
    )
    return f"""
      WITH RECURSIVE w AS (
        SELECT doc_id,
               list_transform({_words_sql()},
                 t -> CAST(('0x' || substr(md5(t), 1, 7))::BIGINT % 32000
                           AS INT)) AS toks
        FROM documents
      ), sized AS (
        SELECT doc_id, toks, len(toks) AS n FROM w
      ), hitrows AS (
        SELECT doc_id, CAST(i AS INT) AS i
        FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM sized)
        WHERE i + {L} <= n AND {draw} < {p}
      ), first_hit AS (
        SELECT doc_id, min(i) AS s FROM hitrows GROUP BY doc_id
      ), nxt AS (
        SELECT a.doc_id, a.i AS cur, min(b.i) AS nxt
        FROM hitrows a LEFT JOIN hitrows b
          ON b.doc_id = a.doc_id AND b.i > a.i + {L}
        GROUP BY a.doc_id, a.i
      ), sel(doc_id, s) AS (
        SELECT doc_id, s FROM first_hit
        UNION
        SELECT x.doc_id, x.nxt FROM sel JOIN nxt x
          ON x.doc_id = sel.doc_id AND x.cur = sel.s
        WHERE x.nxt IS NOT NULL
      ), selagg AS (
        SELECT doc_id, list_sort(list(s)) AS starts FROM sel GROUP BY doc_id
      ), sp AS (
        SELECT z.doc_id, z.toks, z.n,
               coalesce(sa.starts, CAST([] AS INT[])) AS starts
        FROM sized z LEFT JOIN selagg sa USING (doc_id)
      ), built AS (
        SELECT doc_id, n, len(starts) AS n_spans,
               flatten(list_transform(starts, (s, k) ->
                 list_slice(toks,
                   CASE WHEN k = 1 THEN 1
                        ELSE starts[k - 1] + {L} + 1 END, s)
                 || [{sentinel} + k - 1]))
               || list_slice(toks,
                    CASE WHEN len(starts) > 0
                         THEN starts[len(starts)] + {L} + 1
                         ELSE 1 END, n) AS inputs,
               flatten(list_transform(starts, (s, k) ->
                 [{sentinel} + k - 1] || list_slice(toks, s + 1, s + {L})))
                 AS targets
        FROM sp
      )
      SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
             CAST(n_spans AS BIGINT) AS n_spans,
             md5(coalesce(array_to_string(inputs, ' '), '')) AS inputs_hash,
             md5(coalesce(array_to_string(targets, ' '), '')) AS targets_hash
      FROM built
    """


def _zorder_sql(bits: int = 8, num_buckets: int = 16) -> str:
    """DuckDB replay of the Morton curve over (o_custkey, order day)
    (q_zorder_layout / operators/zorder.py): in-plan min/max, exact
    integer affine quantization, the unrolled shift/mask interleave, and
    the equal-width z-bucket audit — all int64 arithmetic, so the two
    engines agree bit-for-bit."""
    top = (1 << bits) - 1
    width = max((1 << (bits * 2)) // num_buckets, 1)
    terms = " + ".join(
        f"(((q{i} >> {b}) & 1) << {2 * b + i})"
        for b in range(bits)
        for i in (0, 1)
    )
    return f"""
      WITH src AS (
        SELECT o_custkey,
               date_diff('second', TIMESTAMP '1970-01-01', o_orderdate)
                 // 86400 AS order_day
        FROM orders
      ), mm AS (
        SELECT min(o_custkey) AS mn0, max(o_custkey) AS mx0,
               min(order_day) AS mn1, max(order_day) AS mx1
        FROM src
      ), q AS (
        SELECT o_custkey, order_day,
               ((o_custkey - mn0) * {top}) // greatest(mx0 - mn0, 1) AS q0,
               ((order_day - mn1) * {top}) // greatest(mx1 - mn1, 1) AS q1
        FROM src CROSS JOIN mm
      ), z AS (
        SELECT o_custkey, order_day, ({terms}) AS z FROM q
      )
      SELECT z // {width} AS bucket, count(*) AS n_rows,
             min(o_custkey) AS min_o_custkey, max(o_custkey) AS max_o_custkey,
             min(order_day) AS min_order_day, max(order_day) AS max_order_day
      FROM z GROUP BY 1
    """


def _bloom_sql(m: int = 1 << 17, k: int = 5) -> str:
    """DuckDB replay of the ENTIRE Bloom decontamination pipeline
    (q_bloom_decontaminate): benchmark distinct 3-grams → md5-60bit
    positions mod m for 5 slots → the distinct set-bit table → probe each
    remaining doc's distinct grams (all k positions present = flagged) →
    per-doc flagged / exact-member counts."""
    gram = (
        "list_transform(range(1, greatest(len(ws)-2, 0)+1), "
        "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])"
    )
    pos = (
        f"(('0x' || substr(md5('bloom0:' || t.j || ':' || gram), 1, 15))::BIGINT"
        f" % {m})::INT"
    )
    return f"""
      WITH ws AS (SELECT doc_id, {_words_sql()} AS ws FROM documents),
      mem AS (
        SELECT DISTINCT unnest({gram}) AS gram FROM ws WHERE doc_id % 7 = 0
      ),
      bits AS (
        SELECT DISTINCT {pos} AS bit_idx FROM mem CROSS JOIN range({k}) t(j)
      ),
      pg AS (
        SELECT doc_id, list_distinct({gram}) AS gs FROM ws WHERE doc_id % 7 <> 0
      ),
      pgx AS (SELECT doc_id, unnest(gs) AS gram FROM pg),
      pb AS (
        SELECT doc_id, gram, {pos} AS bit_idx
        FROM pgx CROSS JOIN range({k}) t(j)
      ),
      gh AS (
        SELECT p.doc_id, p.gram, (count(b.bit_idx) = {k}) AS hit
        FROM pb p LEFT JOIN bits b USING (bit_idx)
        GROUP BY p.doc_id, p.gram
      ),
      fl AS (
        SELECT doc_id,
               count(*) FILTER (WHERE hit)::BIGINT AS n_flagged,
               count(*) FILTER (WHERE gram IN (SELECT gram FROM mem))::BIGINT
                 AS n_member
        FROM gh GROUP BY doc_id
      )
      SELECT pg.doc_id, len(pg.gs)::BIGINT AS n_grams,
             coalesce(fl.n_flagged, 0)::BIGINT AS n_flagged,
             coalesce(fl.n_member, 0)::BIGINT AS n_member
      FROM pg LEFT JOIN fl USING (doc_id)
    """


def _quality_gate_sql() -> str:
    """DuckDB replay of the one-scan curation funnel: every rule column
    (length / Gopher repetition / PII / quality / lang allow-list) and the
    sorted failed-rule list. Thresholds mirror q_quality_gate."""
    from kafka_connect_gcs_spark.operators.curation import PII_PATTERNS

    pii_sum = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))"
        for pat in PII_PATTERNS.values()
    )
    return f"""
      WITH w AS (SELECT doc_id, text, lang, {_words_sql()} AS ws
                 FROM documents),
      g AS (
        SELECT doc_id, ws,
               list_transform(range(1, greatest(len(ws)-1, 0)+1),
                 i -> ws[i] || ' ' || ws[i+1]) AS g2,
               list_transform(range(1, greatest(len(ws)-2, 0)+1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
        FROM w
      ),
      t2 AS (
        SELECT doc_id, max(c) AS mx, sum(c) AS tot
        FROM (SELECT doc_id, gram, count(*) AS c
              FROM (SELECT doc_id, unnest(g2) AS gram FROM g)
              GROUP BY doc_id, gram)
        GROUP BY doc_id
      ),
      t3 AS (
        SELECT doc_id, max(c) AS mx, sum(c) AS tot
        FROM (SELECT doc_id, gram, count(*) AS c
              FROM (SELECT doc_id, unnest(g3) AS gram FROM g)
              GROUP BY doc_id, gram)
        GROUP BY doc_id
      ),
      rep AS (
        SELECT g.doc_id,
               round(CASE WHEN len(g.ws) > 0
                     THEN 1.0 - len(list_distinct(g.ws))
                          / CAST(len(g.ws) AS DOUBLE)
                     ELSE 0.0 END, 6) AS dup_word_frac,
               round(coalesce(t2.mx / CAST(t2.tot AS DOUBLE), 0.0), 6)
                 AS top2,
               round(coalesce(t3.mx / CAST(t3.tot AS DOUBLE), 0.0), 6)
                 AS top3
        FROM g LEFT JOIN t2 ON g.doc_id = t2.doc_id
               LEFT JOIN t3 ON g.doc_id = t3.doc_id
      ),
      q AS (
        SELECT w.doc_id,
               round((least(length(text) / 200.0, 1.0)
                 + (1.0 - least(
                     CASE WHEN length(text) > 0
                          THEN len(regexp_extract_all(text,
                               '[^A-Za-z0-9\\s]'))
                               / CAST(length(text) AS DOUBLE)
                          ELSE 0.0 END * 4.0, 1.0))
                 + CASE WHEN (CASE WHEN len(ws) > 0
                       THEN list_aggregate(
                              list_transform(ws, x -> length(x)), 'sum')
                            / CAST(len(ws) AS DOUBLE) ELSE 0.0 END)
                       BETWEEN 3.0 AND 10.0
                       THEN 1.0 ELSE 0.5 END
               ) / 3.0, 6) AS quality
        FROM w
      ),
      lid AS (
        SELECT doc_id, {_lang_scores_sql()} FROM w
      ),
      lg AS (
        SELECT doc_id,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_guess
        FROM lid
      ),
      pii AS (SELECT doc_id, {pii_sum} AS n_pii FROM documents),
      r AS (
        SELECT w.doc_id,
               list_filter([
                 CASE WHEN len(w.ws) < 20 THEN 'too_short' END,
                 CASE WHEN len(w.ws) > 5000 THEN 'too_long' END,
                 CASE WHEN rep.dup_word_frac > 0.6 OR rep.top2 > 0.2
                           OR rep.top3 > 0.18 THEN 'repetitive' END,
                 CASE WHEN pii.n_pii > 0 THEN 'pii' END,
                 CASE WHEN q.quality < 0.5 THEN 'low_quality' END,
                 CASE WHEN lg.lang_guess NOT IN ('en') THEN 'lang' END
               ], x -> x IS NOT NULL) AS rs
        FROM w JOIN rep USING (doc_id) JOIN q USING (doc_id)
               JOIN lg USING (doc_id) JOIN pii USING (doc_id)
      )
      SELECT doc_id, len(rs) = 0 AS keep,
             coalesce(array_to_string(list_sort(rs), ','), '') AS reasons
      FROM r
    """


def _tokenize_sql(size: int = 500, min_count: int = 2) -> str:
    """DuckDB replay of the closed-vocab tokenizer end-to-end: GPT-2-style
    pretokenization, char-block + top-K vocabulary with deterministic id
    assignment, broadcast-shape encode with char fallback, ordered
    per-doc reassembly."""
    from kafka_connect_gcs_spark.operators.text import BPE_PIECE_RE

    re_sql = BPE_PIECE_RE.replace("'", "''")
    return f"""
      WITH raw AS (
        SELECT doc_id, regexp_extract_all(text, '{re_sql}') AS pieces
        FROM documents
      ),
      p AS (
        SELECT doc_id, unnest(range(1, len(pieces) + 1)) AS pos, pieces
        FROM raw
      ),
      pp AS (SELECT doc_id, pos, pieces[pos] AS piece FROM p),
      counts AS (SELECT piece, count(*) AS cnt FROM pp GROUP BY piece),
      chars AS (
        SELECT DISTINCT unnest(list_transform(
          range(1, length(piece) + 1), i -> substr(piece, i, 1))) AS piece
        FROM pp
      ),
      char_vocab AS (
        SELECT piece,
               CAST(row_number() OVER (ORDER BY piece) - 1 AS INTEGER) AS id
        FROM chars
      ),
      top AS (
        SELECT piece FROM counts
        WHERE cnt >= {min_count} AND length(piece) > 1
        ORDER BY cnt DESC, piece ASC LIMIT {size}
      ),
      nch AS (SELECT count(*) AS n FROM char_vocab),
      piece_vocab AS (
        SELECT t.piece,
               CAST(row_number() OVER (
                 ORDER BY c.cnt DESC, t.piece ASC) - 1 + nch.n AS INTEGER)
                 AS id
        FROM top t JOIN counts c USING (piece) CROSS JOIN nch
      ),
      vocab AS (
        SELECT piece, id FROM char_vocab
        UNION ALL SELECT piece, id FROM piece_vocab
      ),
      hit AS (
        SELECT pp.doc_id, pp.pos, pp.piece, v.id
        FROM pp LEFT JOIN vocab v USING (piece)
      ),
      known AS (
        SELECT doc_id, pos, 0 AS sub, id AS tok FROM hit
        WHERE id IS NOT NULL
      ),
      oov AS (
        SELECT h.doc_id, h.pos, u.sub, v.id AS tok
        FROM (SELECT doc_id, pos, piece FROM hit WHERE id IS NULL) h,
             LATERAL (
               SELECT unnest(range(1, length(h.piece) + 1)) AS sub,
                      unnest(list_transform(
                        range(1, length(h.piece) + 1),
                        i -> substr(h.piece, i, 1))) AS u
             ) u
             JOIN vocab v ON v.piece = u.u
      ),
      units AS (SELECT * FROM known UNION ALL SELECT * FROM oov),
      assembled AS (
        SELECT doc_id,
               list(tok ORDER BY pos, sub, tok) AS toks
        FROM units GROUP BY doc_id
      )
      SELECT d.doc_id,
             CAST(coalesce(len(a.toks), 0) AS BIGINT) AS n_tok,
             coalesce(array_to_string(a.toks, ','), '') AS tokens_str
      FROM documents d LEFT JOIN assembled a USING (doc_id)
    """


def _bpe_sql(num_merges: int = 8, min_pair_count: int = 2) -> str:
    """DuckDB replay of BPE end-to-end: the distinct-piece frequency
    table, then ``num_merges`` UNROLLED training rounds — adjacent-pair
    counts, the (count desc, l, r) argmax, and the greedy left-to-right
    merge fold (symbol lists ride a chr(31)-delimited string through
    ``list_reduce``, whose accumulator must be element-typed) — then id
    assignment (char block + merges by rank) and the positional encode.
    Because the encode corpus IS the training corpus, the final round's
    symbol table is exactly the encoded symbolization (merges in rank
    order ≡ the trainer's progressive rewrites)."""
    from kafka_connect_gcs_spark.operators.text import BPE_PIECE_RE

    re_sql = BPE_PIECE_RE.replace("'", "''")
    last = r"regexp_extract(acc, '[^\x1f]*$')"
    rounds = []
    for k in range(num_merges):
        rounds.append(
            f"""
      pairs{k} AS (
        SELECT p[1] AS l, p[2] AS r, CAST(sum(cnt) AS BIGINT) AS c
        FROM words{k}, unnest(list_zip(syms[1:-2], syms[2:])) AS t(p)
        WHERE len(syms) >= 2
        GROUP BY 1, 2
      ),
      best{k} AS (
        SELECT l, r FROM pairs{k} WHERE c >= {min_pair_count}
        ORDER BY c DESC, l ASC, r ASC LIMIT 1
      ),
      words{k + 1} AS (
        SELECT w.piece, w.cnt,
          CASE WHEN b.l IS NULL OR len(w.syms) < 2 THEN w.syms
          ELSE str_split(list_reduce(w.syms, (acc, x) -> CASE
               WHEN {last} = b.l AND x = b.r
               THEN substr(acc, 1, length(acc) - length({last})) || b.l || b.r
               ELSE acc || chr(31) || x END), chr(31)) END AS syms
        FROM words{k} w LEFT JOIN best{k} b ON TRUE
      )"""
        )
    merge_rows = "\n        UNION ALL ".join(
        f"SELECT {k} AS rank, l, r FROM best{k}" for k in range(num_merges)
    )
    return f"""
      WITH raw AS (
        SELECT doc_id, regexp_extract_all(text, '{re_sql}') AS pieces
        FROM documents
      ),
      p AS (
        SELECT doc_id, unnest(range(1, len(pieces) + 1)) AS pos, pieces
        FROM raw
      ),
      pp AS (SELECT doc_id, pos, pieces[pos] AS piece FROM p),
      words0 AS (
        SELECT piece, CAST(count(*) AS BIGINT) AS cnt,
               list_transform(range(1, length(piece) + 1),
                              i -> substr(piece, i, 1)) AS syms
        FROM pp GROUP BY piece
      ),{",".join(rounds)},
      chars AS (
        SELECT DISTINCT unnest(list_transform(
          range(1, length(piece) + 1), i -> substr(piece, i, 1))) AS token
        FROM words0
      ),
      char_ids AS (
        SELECT token,
               CAST(row_number() OVER (ORDER BY token) - 1 AS INTEGER) AS id
        FROM chars
      ),
      nch AS (SELECT count(*) AS n FROM char_ids),
      merges AS (
        {merge_rows}
      ),
      merge_ids AS (
        SELECT token, CAST(rk + nch.n AS INTEGER) AS id
        FROM (SELECT l || r AS token, min(rank) AS rk FROM merges GROUP BY 1)
        CROSS JOIN nch
      ),
      vocab AS (
        SELECT token, id FROM char_ids
        UNION ALL SELECT token, id FROM merge_ids
      ),
      sym_tok AS (
        SELECT piece, unnest(range(1, len(syms) + 1)) AS sub, syms
        FROM words{num_merges}
      ),
      st AS (SELECT piece, sub, syms[sub] AS token FROM sym_tok),
      placed AS (
        SELECT pp.doc_id, pp.pos, st.sub, v.id AS tok
        FROM pp JOIN st USING (piece) JOIN vocab v ON v.token = st.token
      ),
      assembled AS (
        SELECT doc_id, list(tok ORDER BY pos, sub) AS toks
        FROM placed GROUP BY doc_id
      )
      SELECT d.doc_id,
             CAST(coalesce(len(a.toks), 0) AS BIGINT) AS n_tok,
             coalesce(array_to_string(a.toks, ','), '') AS tokens_str
      FROM documents d LEFT JOIN assembled a USING (doc_id)
    """


def _chunk_sql(chunk: int = 32, overlap: int = 8) -> str:
    """DuckDB replay of sliding-window chunking: stride arithmetic, chunk
    counts (windows stop once the doc is covered), 1-based slicing, and
    the md5 content fingerprint."""
    stride = chunk - overlap
    return f"""
      WITH w AS (SELECT doc_id, {_words_sql()} AS ws FROM documents),
      c AS (SELECT doc_id, ws,
                   CASE WHEN len(ws) <= 0 THEN 0
                        ELSE 1 + greatest(CAST(floor(
                          (len(ws) - {chunk} + {stride - 1}) / {stride}
                        ) AS INTEGER), 0)
                   END AS n_chunks
            FROM w),
      x AS (SELECT doc_id, ws, unnest(range(0, n_chunks)) AS chunk_id
            FROM c WHERE n_chunks > 0)
      SELECT doc_id,
             chunk_id::BIGINT AS chunk_id,
             (chunk_id * {stride} + 1)::BIGINT AS start,
             len(list_slice(ws, chunk_id * {stride} + 1,
                            chunk_id * {stride} + {chunk}))::BIGINT
               AS chunk_n,
             md5(array_to_string(
               list_slice(ws, chunk_id * {stride} + 1,
                          chunk_id * {stride} + {chunk}), ' ')) AS chunk_fp
      FROM x
    """


def _temperature_mix_sql(temperature: float = 3.0, seed: int = 5) -> str:
    """DuckDB replay of temperature mixing end-to-end: tier fold, counts,
    the q_s ∝ c^(1/T) distribution, per-tier rates (association matched to
    Spark's ((tot·(pow/z))/c)), epoch expansion, and every portable-hash
    keep/drop verdict."""
    alpha = 1.0 / temperature
    return f"""
      WITH d AS (
        SELECT doc_id,
               CASE WHEN CAST(substr(source, 4) AS INTEGER) < 12 THEN 'head'
                    WHEN CAST(substr(source, 4) AS INTEGER) < 18 THEN 'mid'
                    ELSE 'tail' END AS tier
        FROM documents),
      c AS (SELECT tier, count(*)::BIGINT AS c FROM d GROUP BY tier),
      t AS (SELECT sum(c)::DOUBLE AS tot,
                   sum(pow(c::DOUBLE, {alpha!r})) AS z
            FROM c),
      r AS (SELECT tier,
                   ((tot * (pow(c::DOUBLE, {alpha!r}) / z)) / c) AS rate
            FROM c CROSS JOIN t),
      j AS (SELECT d.doc_id, d.tier, r.rate,
                   CAST(floor(r.rate) AS INTEGER) AS n_full,
                   r.rate - floor(r.rate) AS part,
                   ('0x' || substr(md5('s{seed}:' || d.tier || '|'
                      || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                     / 1152921504606846976.0 AS hb
            FROM d JOIN r USING (tier)),
      x AS (SELECT doc_id, tier, rate, n_full, part, hb,
                   unnest(range(0, n_full + 1)) AS epoch FROM j)
      SELECT doc_id, tier, round(rate, 6) AS rate, epoch::BIGINT AS epoch
      FROM x WHERE epoch < n_full OR hb < part
    """


def _bm25_sql(k1: float = 1.2, b: float = 0.75, k: int = 5) -> str:
    """DuckDB replay of the whole BM25 pipeline: postings, query-restricted
    document frequencies, Lucene idf, length normalization, rounded-score
    ranking. Float constants are interpolated as Python reprs so both
    engines parse the IDENTICAL doubles (k1+1 computed driver-side in
    Spark), and every multiply/divide is parenthesized to match Spark's
    association order — double ops are single-rounded, so the scores agree
    bit-for-bit before the shared round(_, 6)."""
    return f"""
      WITH w AS (SELECT doc_id, {_words_sql()} AS ws FROM documents),
      t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS word FROM w),
      tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf, max(dl) AS dl
             FROM t GROUP BY doc_id, word),
      st AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(ws)) AS avgdl FROM w),
      qt AS (SELECT doc_id AS query_id,
                    unnest(list_distinct(list_slice(ws, 1, 4))) AS word
             FROM w WHERE doc_id % 29 = 0),
      dfreq AS (SELECT word, count(*)::BIGINT AS df FROM tf
                WHERE word IN (SELECT word FROM qt) GROUP BY word),
      sc AS (SELECT qt.query_id, tf.doc_id,
                    round(sum(
                      ln(1.0 + ((st.n_docs - dfreq.df + 0.5)
                                / (dfreq.df + 0.5)))
                      * ((tf.tf * {k1 + 1.0!r})
                         / (tf.tf + {k1!r} * ({1.0 - b!r}
                            + (({b!r} * tf.dl) / st.avgdl))))
                    ), 6) AS score
             FROM qt JOIN tf USING (word) JOIN dfreq USING (word)
                  CROSS JOIN st
             GROUP BY qt.query_id, tf.doc_id)
      SELECT query_id, doc_id, score, rank FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM sc)
      WHERE rank <= {k}
    """


def _dup_spans_sql(k: int = 8) -> str:
    """DuckDB replay of duplicated-span detection: the planted-banner
    union, rolling word-{k}-gram portable hashes with positions,
    cross-document frequency, and the lag-based span merge (touching
    windows merge: next start ≤ prev start + k)."""
    return f"""
      WITH u AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 200000 AS doc_id,
               '{_DUP_BANNER} ' || text AS text
        FROM documents WHERE doc_id % 17 = 0
      ),
      w AS (SELECT doc_id, {_words_sql()} AS ws FROM u),
      gp AS (
        SELECT doc_id, pos,
               ('0x' || substr(md5(array_to_string(
                  list_slice(ws, pos, pos + {k - 1}), ' ')), 1, 15))::BIGINT
                 AS h
        FROM (SELECT doc_id, ws,
                     unnest(range(1, len(ws) - {k} + 2)) AS pos
              FROM w WHERE len(ws) >= {k})
      ),
      dup AS (SELECT h FROM gp GROUP BY h
              HAVING count(DISTINCT doc_id) >= 2),
      m AS (SELECT gp.doc_id, gp.pos FROM gp JOIN dup USING (h)),
      sp AS (SELECT doc_id, pos,
                    CASE WHEN lag(pos) OVER win IS NULL
                           OR pos > lag(pos) OVER win + {k}
                         THEN 1 ELSE 0 END AS new_span
             FROM m WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
      sp2 AS (SELECT doc_id, pos,
                     sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                         ROWS UNBOUNDED PRECEDING) AS span_id
              FROM sp),
      per_span AS (SELECT doc_id, span_id, count(*) AS grams,
                          max(pos) - min(pos) + {k} AS covered
                   FROM sp2 GROUP BY doc_id, span_id),
      per_doc AS (SELECT doc_id, sum(grams) AS n_dup_grams,
                         count(*) AS n_spans, sum(covered) AS dup_words
                  FROM per_span GROUP BY doc_id)
      SELECT w.doc_id,
             CAST(len(w.ws) AS BIGINT) AS n_words,
             CAST(coalesce(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
             CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
             CAST(coalesce(p.dup_words, 0) AS BIGINT) AS dup_words,
             round(CASE WHEN len(w.ws) > 0
                        THEN CAST(coalesce(p.dup_words, 0) AS BIGINT)
                             / CAST(len(w.ws) AS INTEGER)
                        ELSE 0.0 END, 6) AS dup_frac
      FROM w LEFT JOIN per_doc p USING (doc_id)
    """


def _dsir_sql(
    n_buckets: int = 1 << 18, a: float = 1.0, k: int = 200, seed: int = 7
) -> str:
    """DuckDB replay of the whole DSIR pass (operators/dsir.py): portable
    uni+bi-gram bucket COUNTS (multiplicity kept — multinomial models,
    unlike the classifier's distinct set features), smoothed target/raw
    log-ratios, per-doc importance log-weights, the deterministic per-doc
    Gumbel noise, and the top-k draw. Raw = the full corpus, so every
    scored bucket exists in the raw model and the unseen-bucket default
    never fires here (it is unit-tested in tests/test_dsir.py)."""
    bucket = "('0x' || substr(md5({g}), 1, 15))::BIGINT % " + str(n_buckets)
    uni = bucket.format(g="g")
    bi = bucket.format(g="ws[i] || ' ' || ws[i + 1]")
    b = float(n_buckets)
    h60 = float(1 << 60)
    gumbel = (
        "(-ln(-ln((('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) "
        f"|| ':{seed}'), 1, 15))::BIGINT::DOUBLE + 0.5) / {h60!r})))"
    )
    return f"""
      WITH w AS (SELECT doc_id, lang, {_words_sql()} AS ws FROM documents),
      g AS (SELECT doc_id, lang,
                   list_transform(ws, g -> {uni})
                   || list_transform(range(1, len(ws)), i -> {bi}) AS buckets
            FROM w),
      fx AS (SELECT doc_id, lang, unnest(buckets) AS bucket FROM g),
      t AS (SELECT bucket, count(*)::DOUBLE AS t_c FROM fx
            WHERE lang = 'de' GROUP BY bucket),
      r AS (SELECT bucket, count(*)::DOUBLE AS r_c FROM fx GROUP BY bucket),
      tot AS (SELECT (SELECT coalesce(sum(t_c), 0) FROM t) AS tt,
                     (SELECT coalesce(sum(r_c), 0) FROM r) AS rt),
      ratio AS (SELECT bucket,
                       ln((coalesce(t_c, 0) + {a!r}) / (tt + {a * b!r}))
                       - ln((coalesce(r_c, 0) + {a!r}) / (rt + {a * b!r}))
                         AS log_ratio
                FROM t FULL OUTER JOIN r USING (bucket) CROSS JOIN tot),
      lw AS (SELECT fx.doc_id, count(*)::BIGINT AS n_grams,
                    round(sum(ratio.log_ratio), 6) AS log_w
             FROM fx JOIN ratio USING (bucket) GROUP BY fx.doc_id),
      keyed AS (SELECT d.doc_id,
                       CAST(coalesce(lw.n_grams, 0) AS BIGINT) AS n_grams,
                       coalesce(lw.log_w, 0.0) AS log_w,
                       round(coalesce(lw.log_w, 0.0) + {gumbel}, 6) AS key
                FROM documents d LEFT JOIN lw ON lw.doc_id = d.doc_id)
      SELECT doc_id, n_grams, log_w, key,
             CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
               AS rank
      FROM keyed ORDER BY key DESC, doc_id LIMIT {k}
    """


def _classifier_sql(n_buckets: int = 1 << 18, a: float = 1.0) -> str:
    """DuckDB replay of the hashed-NB classifier: portable uni+bi-gram
    buckets, per-bucket label document frequencies, smoothed log-odds
    weights, bias, and the logistic score — training AND scoring."""
    bucket = (
        "('0x' || substr(md5({g}), 1, 15))::BIGINT % " + str(n_buckets)
    )
    uni = bucket.format(g="g")
    bi = bucket.format(g="ws[i] || ' ' || ws[i + 1]")
    return f"""
      WITH w AS (SELECT doc_id, lang, {_words_sql()} AS ws FROM documents),
      f AS (SELECT doc_id, lang,
                   list_distinct(
                     list_transform(ws, g -> {uni})
                     || list_transform(range(1, len(ws)), i -> {bi})
                   ) AS buckets
            FROM w),
      fx AS (SELECT doc_id, (lang = 'en') AS y, unnest(buckets) AS bucket
             FROM f),
      tot AS (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
                       AS n_pos,
                     sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::DOUBLE
                       AS n_neg
              FROM documents),
      pb AS (SELECT bucket,
                    sum(CASE WHEN y THEN 1 ELSE 0 END)::DOUBLE AS pos_df,
                    sum(CASE WHEN y THEN 0 ELSE 1 END)::DOUBLE AS neg_df
             FROM fx GROUP BY bucket),
      wt AS (SELECT bucket,
                    ln((pos_df + {a!r}) / (n_pos + {2 * a!r}))
                    - ln((neg_df + {a!r}) / (n_neg + {2 * a!r})) AS weight
             FROM pb CROSS JOIN tot),
      md AS (SELECT ln((n_pos + {a!r}) / (n_neg + {a!r})) AS bias,
                    ln({a!r} / (n_pos + {2 * a!r}))
                    - ln({a!r} / (n_neg + {2 * a!r})) AS default_w
             FROM tot),
      sc AS (SELECT fx.doc_id, count(*)::BIGINT AS n_feats,
                    sum(coalesce(wt.weight, md.default_w)) AS s
             FROM fx LEFT JOIN wt USING (bucket) CROSS JOIN md
             GROUP BY fx.doc_id)
      SELECT d.doc_id,
             CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
             round(md.bias + coalesce(sc.s, 0.0), 6) AS score,
             round(1.0 / (1.0 + exp(-(md.bias + coalesce(sc.s, 0.0)))), 6)
               AS prob
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
           CROSS JOIN md
    """
