"""DSIR importance resampling: closed-form fit, weighting, Gumbel draw."""

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.classifier import hashed_features
from kafka_connect_gcs_spark.operators.dsir import (
    dsir_fit,
    dsir_resample,
    dsir_weights,
    gumbel_noise,
)

TARGET = [
    (1, "neural network training converges"),
    (2, "training neural models at scale"),
    (3, "scale neural network training"),
]
RAW = [
    (10, "neural network training converges"),
    (11, "buy cheap pills now"),
    (12, "cheap pills click here"),
    (13, "training neural models"),
    (14, "weather report sunny tomorrow"),
]


@pytest.fixture(scope="module")
def corpora(spark):
    t = spark.createDataFrame(TARGET, ["doc_id", "text"])
    r = spark.createDataFrame(RAW, ["doc_id", "text"])
    return t, r


def test_hashed_features_keeps_multiplicity(spark):
    df = spark.createDataFrame([(1, "a b a b a")], ["doc_id", "text"])
    feats = df.select(
        hashed_features(
            F.col("text"), n_buckets=1 << 16, distinct=False
        ).alias("f")
    ).first()["f"]
    # 5 unigrams + 4 bigrams, duplicates preserved
    assert len(feats) == 9
    assert len(set(feats)) < 9  # "a" repeats, "a b" repeats


def test_fit_closed_form(spark, corpora):
    t, r = corpora
    B = 1 << 16
    ratios, model = dsir_fit(t, r, n_buckets=B, use_bigrams=False)
    m = model.first()
    # target: 4+5+4 = 13 gram instances; raw: 4+4+4+3+4 = 19
    assert m["t_total"] == 13.0 and m["r_total"] == 19.0
    # "neural" appears 3× in target, 2× in raw
    feat = spark.createDataFrame([(0, "neural")], ["doc_id", "text"]).select(
        F.explode(
            hashed_features(F.col("text"), B, use_bigrams=False, distinct=False)
        ).alias("bucket")
    )
    got = ratios.join(feat, "bucket").first()["log_ratio"]
    want = math.log((3 + 1) / (13 + B)) - math.log((2 + 1) / (19 + B))
    assert got == pytest.approx(want)
    # default = bucket unseen in both
    assert m["default_ratio"] == pytest.approx(
        math.log(1 / (13 + B)) - math.log(1 / (19 + B))
    )


def test_weights_prefer_target_like_docs(spark, corpora):
    t, r = corpora
    ratios, model = dsir_fit(t, r, n_buckets=1 << 16)
    w = {
        row["doc_id"]: row["log_w"]
        for row in dsir_weights(r, ratios, model).collect()
    }
    assert len(w) == len(RAW)
    # target-vocabulary docs outweigh spam/weather docs
    assert min(w[10], w[13]) > max(w[11], w[12], w[14])


def test_weights_empty_text_zero(spark, corpora):
    t, r = corpora
    ratios, model = dsir_fit(t, r, n_buckets=1 << 16)
    df = spark.createDataFrame([(100, ""), (101, "neural")], ["doc_id", "text"])
    rows = {
        row["doc_id"]: row for row in dsir_weights(df, ratios, model).collect()
    }
    assert rows[100]["n_grams"] == 0 and rows[100]["log_w"] == 0.0
    assert rows[101]["n_grams"] == 1


def test_resample_deterministic_top_k(spark, corpora):
    t, r = corpora
    ratios, model = dsir_fit(t, r, n_buckets=1 << 16)
    w = dsir_weights(r, ratios, model)
    a = dsir_resample(w, k=3, seed=7).collect()
    b = dsir_resample(w, k=3, seed=7).collect()
    assert a == b
    assert [row["rank"] for row in a] == [1, 2, 3]
    assert len({row["doc_id"] for row in a}) == 3  # without replacement
    # a different seed is a different draw of the noise
    g1 = dsir_resample(w, k=3, seed=7).select("key").collect()
    g2 = dsir_resample(w, k=3, seed=8).select("key").collect()
    assert g1 != g2


def test_resample_biased_toward_weight(spark, corpora):
    t, r = corpora
    ratios, model = dsir_fit(t, r, n_buckets=1 << 16)
    # Gumbel noise is O(1); a +1000 log-weight doc always wins rank 1
    w = dsir_weights(r, ratios, model).withColumn(
        "log_w",
        F.when(F.col("doc_id") == 14, F.col("log_w") + 1000.0).otherwise(
            F.col("log_w")
        ),
    )
    for seed in range(5):
        top = dsir_resample(w, k=1, seed=seed).first()
        assert top["doc_id"] == 14


def test_gumbel_noise_in_range(spark):
    df = spark.range(0, 2000).toDF("doc_id")
    stats = df.select(gumbel_noise("doc_id", seed=3).alias("g")).agg(
        F.mean("g").alias("m"), F.min("g").alias("lo"), F.max("g").alias("hi")
    ).first()
    # standard Gumbel: mean = Euler-Mascheroni ≈ 0.5772
    assert stats["m"] == pytest.approx(0.5772, abs=0.1)
    assert stats["lo"] > -3 and stats["hi"] < 12


def test_scoring_plan_broadcasts_ratios(spark, corpora):
    from kafka_connect_gcs_spark.plans.inspect import explain_str

    t, r = corpora
    ratios, model = dsir_fit(t, r, n_buckets=1 << 16)
    plan = explain_str(dsir_weights(r, ratios, model), mode="simple")
    assert "BroadcastHashJoin" in plan
    top_plan = explain_str(
        dsir_resample(dsir_weights(r, ratios, model), k=2, seed=1),
        mode="simple",
    )
    assert "TakeOrderedAndProject" in top_plan
