"""Duplicated-span detection: hand-computed spans, removal, portability."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.dedup_spans import (
    dup_span_stats,
    duplicated_gram_hashes,
    gram_positions,
    remove_dup_spans,
)

# docs 1 and 2 share the 6-word run "alpha beta gamma delta epsilon zeta"
# (positions 3..8 in doc 1, 1..6 in doc 2); doc 3 is clean; doc 4 is short.
CORPUS = [
    (1, "intro words alpha beta gamma delta epsilon zeta outro"),
    (2, "alpha beta gamma delta epsilon zeta and unrelated tail words here"),
    (3, "completely unique content with no duplication at all present"),
    (4, "tiny doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_gram_positions_short_doc_empty(docs):
    gp = gram_positions(docs, k=5)
    assert gp.where(F.col("doc_id") == 4).count() == 0
    # doc 1 has 9 words → 5 grams at positions 1..5
    p1 = sorted(r["pos"] for r in gp.where(F.col("doc_id") == 1).collect())
    assert p1 == [1, 2, 3, 4, 5]


def test_duplicated_hashes_cross_doc_only(docs):
    gp = gram_positions(docs, k=5)
    dup = duplicated_gram_hashes(gp)
    # shared run of 6 words → two shared 5-grams
    assert dup.count() == 2
    assert all(r["n_docs"] == 2 for r in dup.collect())


@pytest.mark.parametrize("portable", [False, True])
def test_dup_span_stats_hand_computed(docs, portable):
    out = {
        r["doc_id"]: r
        for r in dup_span_stats(docs, k=5, portable=portable).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # doc 1: dup gram starts at 3 and 4 → one span covering words 3..8 (6)
    assert out[1]["n_dup_grams"] == 2
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_words"] == 6
    assert out[1]["dup_frac"] == pytest.approx(6 / 9, abs=1e-6)
    # doc 2: starts 1 and 2 → one span covering words 1..6
    assert out[2]["n_dup_grams"] == 2 and out[2]["dup_words"] == 6
    # clean + short docs report zeros but ARE present
    for d in (3, 4):
        assert out[d]["n_dup_grams"] == 0 and out[d]["dup_frac"] == 0.0


def test_two_separate_spans(spark):
    # dup grams at positions 1 and 10 with k=3 → two spans, 3 words each
    docs = spark.createDataFrame(
        [
            (1, "a b c x1 x2 x3 x4 x5 x6 d e f"),
            (2, "a b c unrelated1 unrelated2 d e f"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dup_span_stats(docs, k=3).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["dup_words"] == 6
    assert out[2]["n_spans"] == 2 and out[2]["dup_words"] == 6


def test_remove_dup_spans(docs):
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_dup_spans(docs, k=5).collect()
    }
    assert out[1] == "intro words outro"
    assert out[2] == "and unrelated tail words here"
    assert out[3] == CORPUS[2][1]
    assert out[4] == CORPUS[3][1]


def test_stats_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dup_span_stats(docs, k=8)
    assert out.count() == docs.count()
    bad = out.where(
        (F.col("dup_frac") < 0) | (F.col("dup_frac") > 1) |
        (F.col("dup_words") > F.col("n_words"))
    )
    assert bad.count() == 0


def test_dup_span_eager_releases_gram_cache(docs):
    """Default eager mode checkpoints only the narrow span aggregate and
    releases the gram-postings cache; eager=False must agree row-for-row."""
    spark = docs.sparkSession
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = dup_span_stats(docs, k=3)
    rows_eager = sorted(map(tuple, out.collect()))
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before + 1
    rows_lazy = sorted(map(tuple, dup_span_stats(docs, k=3, eager=False).collect()))
    assert rows_eager == rows_lazy

    r_eager = sorted(
        (r.doc_id, r.clean_text) for r in remove_dup_spans(docs, k=3).collect()
    )
    r_lazy = sorted(
        (r.doc_id, r.clean_text)
        for r in remove_dup_spans(docs, k=3, eager=False).collect()
    )
    assert r_eager == r_lazy


def test_dup_hash_keys_fast_path_equals_count_distinct(spark):
    """min_doc_freq=2 plans as min(id)!=max(id) — ONE exchange — and must
    agree with the countDistinct path exactly, including the within-doc
    repeat case (same gram twice in ONE doc is NOT cross-doc duplicated)."""
    from kafka_connect_gcs_spark.operators.dedup_spans import _dup_hash_keys

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e x y a b c d e"),   # within-doc repeat only
            (2, "p q r s t u v w"),
            (3, "p q r s t z z z z"),          # shares "p q r s t" with 2
        ],
        ["doc_id", "text"],
    )
    gp = gram_positions(corpus, k=5).select("doc_id", "pos", "h")
    fast = _dup_hash_keys(gp, "doc_id", 2)
    slow = duplicated_gram_hashes(gp, min_doc_freq=2).select("h")
    assert sorted(r.h for r in fast.collect()) == sorted(
        r.h for r in slow.collect()
    )
    # the within-doc repeated gram hashes must appear in NEITHER
    within = gp.groupBy("h").count().where("count > 1")
    cross = {r.h for r in fast.collect()}
    dup_within_only = {
        r.h
        for r in gp.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("nd"),
        )
        .where("n > 1 and nd = 1")
        .collect()
    }
    assert dup_within_only and not (dup_within_only & cross), within.count()
    # plan: exactly one shuffle for the fast path (final AQE plan only —
    # the toString includes the Initial Plan section too)
    def final_plan(df):
        s = df._jdf.queryExecution().executedPlan().toString()
        return s.split("== Initial Plan ==")[0]

    assert final_plan(fast).count("Exchange hashpartitioning") == 1
    assert final_plan(slow).count("Exchange hashpartitioning") >= 2
