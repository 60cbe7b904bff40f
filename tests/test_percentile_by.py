"""Per-group exact percentile calibration: equality with the naive
per-group window, skew/degenerate shapes, group-type coverage."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.sampling import score_percentile_by


def _corpus(spark):
    rows = [("en", i, float((i * 13) % 40)) for i in range(300)]  # hot group
    rows += [("de", 1000 + i, float(i % 9)) for i in range(25)]
    rows += [("fr", 2000, 3.0)]  # single-row group
    rows += [("xx", 3000, 1.0), ("xx", 3001, 1.0)]  # full score tie
    return spark.createDataFrame(rows, "lang string, doc_id long, score double")


def _naive(df, group_col="lang", score_col="score", key_col="doc_id"):
    w = Window.partitionBy(group_col).orderBy(score_col, key_col)
    n = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    return df.withColumn(
        "percentile",
        (F.row_number().over(w) - 1).cast("double")
        / F.greatest(n - 1, F.lit(1)).cast("double"),
    )


def _rows(df):
    return sorted(
        (r["lang"], r["doc_id"], round(r["percentile"], 12))
        for r in df.collect()
    )


def test_matches_naive_window(spark):
    d = _corpus(spark)
    got = _rows(score_percentile_by(d, "lang", "score"))
    assert got == _rows(_naive(d))


def test_single_row_group_is_zero_and_ties_resolve_by_key(spark):
    d = _corpus(spark)
    out = {r["doc_id"]: r["percentile"] for r in score_percentile_by(d, "lang", "score").collect()}
    assert out[2000] == 0.0
    assert out[3000] == 0.0 and out[3001] == 1.0


def test_small_broadcast_gate_off(spark):
    d = _corpus(spark)
    got = _rows(score_percentile_by(d, "lang", "score", max_broadcast_groups=0))
    assert got == _rows(_naive(d))


def test_integral_group_and_score(spark):
    d = spark.createDataFrame(
        [(g, 10 * g + i, (i * 7) % 5) for g in range(4) for i in range(9)],
        "grp long, doc_id long, score long",
    )
    got = sorted(
        (r["grp"], r["doc_id"], round(r["percentile"], 12))
        for r in score_percentile_by(d, "grp", "score").collect()
    )
    w = Window.partitionBy("grp").orderBy("score", "doc_id")
    n = F.count(F.lit(1)).over(Window.partitionBy("grp"))
    want = sorted(
        (r["grp"], r["doc_id"], round(r["percentile"], 12))
        for r in d.withColumn(
            "percentile",
            (F.row_number().over(w) - 1).cast("double")
            / F.greatest(n - 1, F.lit(1)).cast("double"),
        ).collect()
    )
    assert got == want


def test_original_columns_survive(spark):
    d = _corpus(spark).withColumn("extra", F.lit("x"))
    out = score_percentile_by(d, "lang", "score")
    assert set(out.columns) == {"lang", "doc_id", "score", "extra", "percentile"}
    assert out.count() == d.count()


def test_take_top_fraction_by(spark):
    from kafka_connect_gcs_spark.operators.sampling import take_top_fraction_by

    d = _corpus(spark)
    out = take_top_fraction_by(d, 0.2, "lang", "score")
    sizes = {r["lang"]: r["c"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    # floor(0.2 * n_g) per group: en 300→60, de 25→5, fr 1→0, xx 2→0
    assert sizes == {"en": 60, "de": 5}
    # the kept set is exactly the naive window's top floor(f*n) per group
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    n = F.count(F.lit(1)).over(Window.partitionBy("lang"))
    w_keep = (
        d.withColumn("_rk", F.row_number().over(w) - 1)
        .withColumn("_n", n)
        .where(F.col("_rk") >= F.col("_n") - F.floor(F.col("_n") * 0.2))
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in w_keep.collect()
    )


def test_take_top_fraction_by_bounds(spark):
    from kafka_connect_gcs_spark.operators.sampling import take_top_fraction_by

    d = _corpus(spark)
    assert take_top_fraction_by(d, 1.0, "lang", "score").count() == d.count()
    assert take_top_fraction_by(d, 0.0, "lang", "score").count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        take_top_fraction_by(d, 1.5, "lang", "score")
