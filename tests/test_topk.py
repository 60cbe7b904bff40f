"""Salted two-phase per-key top-k: equality with the naive window,
boundary cases, determinism across salt counts."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.topk import topk_per_key


def _corpus(spark):
    # skewed: one hot key with 200 rows, several small keys, score ties
    rows = [("hot", i, float((i * 13) % 50)) for i in range(200)]
    rows += [("mid", 1000 + i, float(i % 7)) for i in range(30)]
    rows += [("tiny", 2000, 5.0), ("tiny", 2001, 5.0), ("one", 3000, 1.0)]
    return spark.createDataFrame(rows, "key string, doc_id long, score double")


def _naive(df, k, ascending=False):
    score = F.col("score").asc() if ascending else F.col("score").desc()
    w = Window.partitionBy("key").orderBy(score, F.col("doc_id").asc())
    return (
        df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("key", "doc_id", "score", "rank").collect())


@pytest.mark.parametrize("k,num_salts", [(1, 4), (3, 32), (10, 2), (500, 8)])
def test_matches_naive_window(spark, k, num_salts):
    d = _corpus(spark)
    got = _rows(topk_per_key(d, "key", "score", k, id_col="doc_id", num_salts=num_salts))
    assert got == _rows(_naive(d, k))


def test_ascending_and_tie_break(spark):
    d = _corpus(spark)
    got = _rows(topk_per_key(d, "key", "score", 2, ascending=True))
    assert got == _rows(_naive(d, 2, ascending=True))
    # the tiny-key tie at score 5.0 resolves by doc_id: 2000 ranks first
    by_key = {(r[0], r[3]): r[1] for r in got}
    assert by_key[("tiny", 1)] == 2000 and by_key[("tiny", 2)] == 2001


def test_k_larger_than_group_keeps_all(spark):
    d = _corpus(spark)
    out = topk_per_key(d, "key", "score", 500)
    assert out.where(F.col("key") == "one").count() == 1
    assert out.where(F.col("key") == "tiny").count() == 2


def test_salt_count_does_not_change_result(spark):
    d = _corpus(spark)
    a = _rows(topk_per_key(d, "key", "score", 5, num_salts=1))
    b = _rows(topk_per_key(d, "key", "score", 5, num_salts=64))
    assert a == b


def test_validation(spark):
    d = _corpus(spark)
    with pytest.raises(ValueError):
        topk_per_key(d, "key", "score", 0)
    with pytest.raises(ValueError):
        topk_per_key(d, "key", "score", 3, num_salts=0)


def test_extra_columns_survive(spark):
    d = _corpus(spark).withColumn("payload", F.concat(F.lit("p"), F.col("doc_id")))
    out = topk_per_key(d, "key", "score", 2)
    assert set(out.columns) == {"key", "doc_id", "score", "payload", "rank"}
