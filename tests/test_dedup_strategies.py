"""All three LWW dedup strategies produce identical results (the
associativity/commutativity property SURVEY §7.3 demands), including under
hot-key skew and duplicate delivery; plus validation UDF parity."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.dedup import (
    lww_dedup,
    lww_dedup_salted,
    lww_dedup_sortmerge,
)
from kafka_connect_gcs_spark.operators.validate import (
    make_tokens_valid_udf,
    split_valid,
    valid_expr,
)
from kafka_connect_gcs_spark.sources.binlog import BinlogSpec, generate_changes

SPEC = BinlogSpec(
    num_events=4_000,
    num_docs=300,
    num_partitions=4,
    seed=11,
    hot_fraction=0.4,
    hot_keys=2,
    duplicate_fraction=0.2,
    shuffle_window=300,
)


@pytest.fixture(scope="module")
def changes(spark):
    df = generate_changes(spark, SPEC).cache()
    df.count()
    return df


def _norm(df):
    rows = df.collect()
    return sorted(
        (
            r.doc_id,
            r.op,
            tuple(r.tokens) if r.tokens is not None else None,
            r.n_tok,
            r.source,
            r.offset,
        )
        for r in rows
    )


def test_three_strategies_agree(spark, changes):
    base = _norm(lww_dedup(changes).select(
        "doc_id", "op", "tokens", "n_tok", "source", "offset"))
    salted = _norm(lww_dedup_salted(changes, salt_buckets=5).select(
        "doc_id", "op", "tokens", "n_tok", "source", "offset"))
    sortmerge = _norm(lww_dedup_sortmerge(changes, num_partitions=6).select(
        "doc_id", "op", "tokens", "n_tok", "source", "offset"))
    assert base == salted
    assert base == sortmerge
    assert len(base) == changes.select("doc_id").distinct().count()


def test_winner_is_max_offset(spark, changes):
    got = lww_dedup(changes)
    oracle = (
        changes.groupBy("doc_id").agg(F.max("offset").alias("mx"))
    )
    j = got.join(oracle, "doc_id")
    assert j.where(F.col("offset") != F.col("mx")).count() == 0


def test_dedup_is_deterministic_across_runs(spark, changes):
    a = _norm(lww_dedup(changes).select("doc_id", "op", "tokens", "n_tok", "source", "offset"))
    b = _norm(lww_dedup(changes.repartition(13)).select(
        "doc_id", "op", "tokens", "n_tok", "source", "offset"))
    assert a == b


def test_validator_udf_matches_expression(spark, changes):
    """The Arrow/pandas validator and the Catalyst expression agree row-wise,
    on clean data and on corrupted slices."""
    udf = make_tokens_valid_udf(SPEC.vocab_size)
    upserts = changes.where(F.col("op") != "D").limit(1000)
    corrupted = upserts.withColumn(
        "n_tok",
        F.when(F.pmod(F.col("offset"), F.lit(7)) == 0, F.col("n_tok") + 3).otherwise(
            F.col("n_tok")
        ),
    ).withColumn(
        "tokens",
        F.when(
            F.pmod(F.col("offset"), F.lit(11)) == 0,
            F.array_append(F.col("tokens"), F.lit(SPEC.vocab_size + 5)),
        ).otherwise(F.col("tokens")),
    )
    cmp = corrupted.select(
        valid_expr(SPEC.vocab_size).alias("expr_ok"),
        udf(F.col("tokens"), F.col("n_tok")).alias("udf_ok"),
    )
    assert cmp.where(F.col("expr_ok") != F.col("udf_ok")).count() == 0
    assert cmp.where(~F.col("expr_ok")).count() > 0  # corruption detected


def test_split_valid_keeps_deletes(spark, changes):
    valid, bad = split_valid(changes)
    assert bad.count() == 0
    assert valid.count() == changes.count()
