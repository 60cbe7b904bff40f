"""Prefix-filtering exact Jaccard join: losslessness vs the all-pairs
oracle, boundary arithmetic, degenerate inputs, plan shape."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.dedup_text import ngram_jaccard_pairs
from kafka_connect_gcs_spark.operators.setsim import (
    jaccard_prefix_candidates,
    jaccard_prefix_join,
)
from kafka_connect_gcs_spark.plans.inspect import explain_str


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a lazy dog"),
        (3, "pack my box with five dozen liquor jugs"),
        (4, "pack my box with five dozen liquor jugs today"),
        (5, "entirely unrelated text about spark shuffles"),
        (6, ""),  # zero shingles
        (7, "solo"),
        (8, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    # plus a deterministic synthetic tail so bucket sizes vary
    rows += [
        (100 + i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(5 + i % 9)))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_lossless_vs_all_pairs(spark, threshold):
    d = _corpus(spark)
    got = _rows(jaccard_prefix_join(d, threshold))
    want = _rows(ngram_jaccard_pairs(d, n=1, threshold=threshold))
    assert got == want
    assert len(want) > 0  # the corpus really has pairs at every threshold


def test_lossless_on_bigram_shingles(spark):
    d = _corpus(spark)
    got = _rows(jaccard_prefix_join(d, 0.5, n=2))
    want = _rows(ngram_jaccard_pairs(d, n=2, threshold=0.5))
    assert got == want


def test_boundary_jaccard_exactly_threshold(spark):
    # |a|=|b|=5, overlap 4 → J = 4/6 ≈ 0.667; t = 2/3 keeps it, and the
    # float-robust ceil must not shrink the prefix past the shared token
    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    got = jaccard_prefix_join(d, 4 / 6).collect()
    assert len(got) == 1 and got[0]["id_a"] == 1 and got[0]["id_b"] == 2


def test_exact_integer_prefix_arithmetic(spark):
    # t=0.8, sz=5 → ceil(4.0) must be 4 (not 5): prefix keeps 2 tokens.
    # Identical 5-token sets have J=1.0 ≥ 0.8 and MUST be found.
    d = spark.createDataFrame(
        [(1, "p q r s t"), (2, "p q r s t")], "doc_id long, text string"
    )
    assert jaccard_prefix_join(d, 0.8).count() == 1


def test_empty_and_tiny_docs_no_pairs_no_crash(spark):
    d = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "one")], "doc_id long, text string"
    )
    assert jaccard_prefix_join(d, 0.5).count() == 0


def test_threshold_validation(spark):
    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            jaccard_prefix_candidates(d, bad)


def test_candidates_are_superset_and_equijoin_only(spark):
    d = _corpus(spark)
    cands = jaccard_prefix_candidates(d, 0.5)
    cand_set = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(d, n=1, threshold=0.5).collect()
    }
    assert true_pairs <= cand_set
    plan = explain_str(cands)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
