"""Hashed-NB classifier: closed-form weights, separation, scoring edge cases."""

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.classifier import (
    classifier_score,
    hashed_features,
    nb_train,
)

TRAIN = [
    # positives: "good" vocabulary
    (1, "clear helpful prose with structure", True),
    (2, "clear concise helpful writing", True),
    (3, "structure and clear argument", True),
    # negatives: "spam" vocabulary
    (4, "buy cheap pills now now now", False),
    (5, "cheap cheap buy click here", False),
]


@pytest.fixture(scope="module")
def train_df(spark):
    return spark.createDataFrame(TRAIN, ["doc_id", "text", "label"])


def test_hashed_features_distinct_and_bounded(spark):
    df = spark.createDataFrame([(1, "a b a b c")], ["doc_id", "text"])
    feats = df.select(
        hashed_features(F.col("text"), n_buckets=64).alias("f")
    ).first()["f"]
    # 3 distinct unigrams + 4 bigram slots ("a b","b a","a b","b c") → ≤ 6
    assert len(feats) == len(set(feats)) <= 6
    assert all(0 <= b < 64 for b in feats)


def test_nb_weights_closed_form(spark, train_df):
    weights, model = nb_train(
        train_df, "label", n_buckets=1 << 16, use_bigrams=False
    )
    m = model.first()
    assert m["n_pos"] == 3.0 and m["n_neg"] == 2.0
    assert m["bias"] == pytest.approx(math.log(4 / 3))
    # "clear" appears in all 3 positives, 0 negatives
    feat = spark.createDataFrame([(0, "clear")], ["doc_id", "text"]).select(
        F.explode(hashed_features(F.col("text"), 1 << 16, use_bigrams=False)).alias(
            "bucket"
        )
    )
    w = weights.join(feat, "bucket").first()["weight"]
    assert w == pytest.approx(math.log((3 + 1) / (3 + 2)) - math.log(1 / 4))


def test_classifier_separates(spark, train_df):
    # unigram-only: on a 5-doc training set, bigrams are mostly unseen and
    # their default weights drown the signal — unigrams carry it cleanly
    weights, model = nb_train(train_df, "label", n_buckets=1 << 16,
                              use_bigrams=False)
    test = spark.createDataFrame(
        [
            (10, "a clear helpful argument with structure"),
            (11, "buy cheap pills click now"),
            (12, ""),  # empty doc → bias only
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in classifier_score(
            test, weights, model, use_bigrams=False
        ).collect()
    }
    assert out[10]["prob"] > 0.9 > 0.1 > out[11]["prob"]
    assert out[12]["n_feats"] == 0
    assert out[12]["score"] == pytest.approx(math.log(4 / 3), abs=1e-6)
    for r in out.values():
        assert 0.0 <= r["prob"] <= 1.0


def test_unseen_bucket_gets_default_weight(spark, train_df):
    weights, model = nb_train(
        train_df, "label", n_buckets=1 << 16, use_bigrams=False
    )
    test = spark.createDataFrame([(20, "zzzunseenword")], ["doc_id", "text"])
    out = classifier_score(
        test, weights, model, use_bigrams=False
    ).first()
    m = model.first()
    assert out["score"] == pytest.approx(
        round(m["bias"] + m["default_w"], 6), abs=1e-6
    )


def test_portable_matches_default_shape(spark, train_df):
    """Portable hashing changes bucket ids, not the model's behavior."""
    weights, model = nb_train(train_df, "label", n_buckets=1 << 16, portable=True)
    test = spark.createDataFrame(
        [(10, "clear helpful structure"), (11, "buy cheap now")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["prob"]
        for r in classifier_score(
            test, weights, model, portable=True
        ).collect()
    }
    assert out[10] > 0.5 > out[11]
