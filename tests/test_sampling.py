"""Deterministic sampling / corpus mixing / token-budget selection
(operators/sampling.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.sampling import (
    corpus_mix,
    hash_bucket,
    hash_sample,
    stratified_sample,
    take_token_budget,
)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.range(2000)
        .select(
            F.concat(F.lit("d"), F.format_string("%05d", "id")).alias("doc_id"),
            F.element_at(
                F.array(F.lit("web"), F.lit("books"), F.lit("code")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("source"),
            (F.col("id") % 97 + 1).cast("long").alias("n_tok"),
        )
        .persist()
    )


def test_hash_sample_fraction_and_determinism(spark, docs):
    for portable in (False, True):
        kept = hash_sample(docs, 0.5, portable=portable)
        n = kept.count()
        assert abs(n - 1000) < 120  # binomial 3σ ≈ 67
        ids = {r.doc_id for r in kept.select("doc_id").collect()}
        # membership is a pure key function: partitioning can't change it
        again = {
            r.doc_id
            for r in hash_sample(docs.repartition(13), 0.5, portable=portable)
            .select("doc_id")
            .collect()
        }
        assert ids == again
    # seeds decorrelate: overlap of two 50% samples ≈ 25%
    a = {r.doc_id for r in hash_sample(docs, 0.5, seed=1).collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.5, seed=2).collect()}
    assert abs(len(a & b) - 500) < 120
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_portable_bucket_matches_duckdb(spark, docs):
    got = (
        docs.select(
            "doc_id", hash_bucket(F.col("doc_id"), seed=7, portable=True).alias("b")
        )
        .orderBy("doc_id")
        .collect()
    )
    pdf = docs.select("doc_id").orderBy("doc_id").toPandas()
    want = duckdb.sql(
        "SELECT doc_id, ('0x' || substr(md5('s7:' || doc_id), 1, 15))::BIGINT"
        " / 1152921504606846976.0 AS b FROM pdf ORDER BY doc_id"
    ).fetchall()
    assert [(r.doc_id, r.b) for r in got] == want  # bit-exact doubles


def test_stratified_sample_per_stratum(spark, docs):
    kept = stratified_sample(
        docs, {"web": 0.2, "books": 1.0}, default=0.0, portable=True
    )
    by = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by.get("books") == docs.where("source='books'").count()  # all
    assert "code" not in by  # default 0
    web_total = docs.where("source='web'").count()
    assert abs(by.get("web", 0) - 0.2 * web_total) < 60


def test_corpus_mix_epochs(spark, docs):
    mixed = corpus_mix(
        docs, {"web": 2.5, "books": 0.4, "code": 1.0}, portable=True
    ).persist()
    per_doc = (
        mixed.groupBy("doc_id", "source")
        .agg(F.count("*").alias("n"), F.max("epoch").alias("mx"))
        .persist()
    )
    # code: exactly one epoch each (integer rate, no partials)
    code = per_doc.where("source='code'")
    assert code.where("n != 1 OR mx != 0").count() == 0
    assert code.count() == docs.where("source='code'").count()
    # web: every doc twice, about half three times, epochs are 0..n-1 dense
    web = per_doc.where("source='web'").collect()
    assert all(r.n in (2, 3) and r.mx == r.n - 1 for r in web)
    n_web = docs.where("source='web'").count()
    assert abs(sum(1 for r in web if r.n == 3) - 0.5 * n_web) < 80
    # books: ~40% appear once, none twice
    books = per_doc.where("source='books'").collect()
    assert all(r.n == 1 and r.mx == 0 for r in books)
    n_books = docs.where("source='books'").count()
    assert abs(len(books) - 0.4 * n_books) < 80
    # deterministic under repartition
    again = corpus_mix(
        docs.repartition(11), {"web": 2.5, "books": 0.4, "code": 1.0},
        portable=True,
    )
    assert sorted(map(tuple, mixed.collect())) == sorted(
        map(tuple, again.collect())
    )
    # map-only: the mix itself introduces no shuffle
    plan = (
        corpus_mix(docs, {"web": 2.5}, portable=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    mixed.unpersist()
    per_doc.unpersist()


def test_take_token_budget_exact_prefix(spark):
    rows = [("a", 10), ("b", 20), ("c", 30), ("d", 40)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok long")
    kept = take_token_budget(df, 35, order_col="doc_id")
    got = {(r.doc_id, r.budget_start) for r in kept.collect()}
    # a starts at 0, b at 10, c at 30 (crosses but starts inside), d at 60
    assert got == {("a", 0), ("b", 10), ("c", 30)}
    assert take_token_budget(df, 0).count() == 0
    assert take_token_budget(df, 10**9).count() == 4
    with pytest.raises(ValueError):
        take_token_budget(df, -1)


def test_take_token_budget_matches_window_oracle(spark, docs):
    budget = 40_000
    kept = take_token_budget(docs, budget).select("doc_id", "budget_start")
    from pyspark.sql import Window

    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    oracle = (
        docs.withColumn("cum", F.sum("n_tok").over(w) - F.col("n_tok"))
        .where(F.col("cum") < budget)
        .select("doc_id", F.col("cum").alias("budget_start"))
    )
    assert sorted(map(tuple, kept.collect())) == sorted(
        map(tuple, oracle.collect())
    )


def test_shuffle_corpus_permutation_and_determinism(spark, docs):
    from kafka_connect_gcs_spark.operators.sampling import shuffle_corpus

    n = docs.count()
    for portable in (False, True):
        out = shuffle_corpus(docs, seed=3, portable=portable)
        ranks = [r.shuffle_rank for r in out.select("shuffle_rank").collect()]
        assert sorted(ranks) == list(range(n))  # dense 0..n-1 permutation
        # deterministic under repartition (no RNG, no partition coupling)
        again = {
            (r.doc_id, r.shuffle_rank)
            for r in shuffle_corpus(
                docs.repartition(17), seed=3, portable=portable
            ).collect()
        }
        assert {(r.doc_id, r.shuffle_rank) for r in out.collect()} == again
        # payload columns survive the re-attach
        assert set(out.columns) == set(docs.columns) | {"shuffle_rank"}


def test_shuffle_corpus_seed_independence(spark, docs):
    from kafka_connect_gcs_spark.operators.sampling import shuffle_corpus

    a = {r.doc_id: r.shuffle_rank for r in shuffle_corpus(docs, seed=1).collect()}
    b = {r.doc_id: r.shuffle_rank for r in shuffle_corpus(docs, seed=2).collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 0.9 * len(a)  # different seeds ≈ unrelated permutations


def test_shuffle_corpus_matches_duckdb_row_number(spark, docs):
    from kafka_connect_gcs_spark.operators.sampling import shuffle_corpus

    got = sorted(
        (r.doc_id, r.shuffle_rank)
        for r in shuffle_corpus(docs, seed=7, portable=True).collect()
    )
    pdf = docs.select("doc_id").toPandas()
    want = sorted(
        duckdb.sql(
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY"
            " ('0x' || substr(md5('s7:' || doc_id), 1, 15))::BIGINT, doc_id)"
            " - 1 AS BIGINT) AS r FROM pdf"
        ).fetchall()
    )
    assert got == want


def test_prefix_sum_tiebreak_resolves_duplicate_order_keys(spark):
    """Duplicate order values with a tiebreak column produce the total
    (order, tiebreak) scan order — the contract shuffle_corpus relies on
    under hash collisions."""
    from kafka_connect_gcs_spark.operators.packing import exclusive_prefix_sum

    rows = [(10, "b", 1), (10, "a", 1), (20, "z", 1), (10, "c", 1), (20, "y", 1)]
    df = spark.createDataFrame(rows, "k long, tb string, n long")
    got = {
        (r.k, r.tb): r.start
        for r in exclusive_prefix_sum(
            df, "k", "n", tiebreak_col="tb"
        ).collect()
    }
    assert got == {
        (10, "a"): 0,
        (10, "b"): 1,
        (10, "c"): 2,
        (20, "y"): 3,
        (20, "z"): 4,
    }


def test_score_percentile_matches_duckdb(spark, docs):
    from kafka_connect_gcs_spark.operators.sampling import score_percentile

    got = sorted(
        (r.doc_id, round(r.percentile, 9))
        for r in score_percentile(docs, "n_tok").collect()
    )
    pdf = docs.select("doc_id", "n_tok").toPandas()
    want = sorted(
        (d, round(p, 9))
        for d, p in duckdb.sql(
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY n_tok, doc_id)"
            " - 1 AS DOUBLE) / greatest(count(*) OVER () - 1, 1) FROM pdf"
        ).fetchall()
    )
    assert got == want


def test_take_top_fraction_exact_count(spark, docs):
    from kafka_connect_gcs_spark.operators.sampling import take_top_fraction

    n = docs.count()
    kept = take_top_fraction(docs, 0.25, "n_tok")
    ids = {r.doc_id for r in kept.collect()}
    assert len(ids) == n // 4
    # the kept set IS the top-(n/4) by (score, key)
    ordered = sorted(
        ((r.n_tok, r.doc_id) for r in docs.collect()), reverse=True
    )
    want = {d for _, d in ordered[: n // 4]}
    assert ids == want
    assert take_top_fraction(docs, 0.0, "n_tok").count() == 0
    assert take_top_fraction(docs, 1.0, "n_tok").count() == n
    with pytest.raises(ValueError):
        take_top_fraction(docs, 1.5, "n_tok")


def test_cap_per_key_exact_cap_and_partial_equivalence(spark, docs):
    from kafka_connect_gcs_spark.operators.sampling import cap_per_key

    capped = cap_per_key(docs, "source", 50, id_col="doc_id", partial=True)
    exact = cap_per_key(docs, "source", 50, id_col="doc_id", partial=False)
    got = {r.source: r.c for r in capped.groupBy("source").count()
           .withColumnRenamed("count", "c").collect()}
    assert got == {"web": 50, "books": 50, "code": 50}
    # the per-batch pre-cap must not change the kept set
    assert sorted(r.doc_id for r in capped.collect()) == sorted(
        r.doc_id for r in exact.collect()
    )
    # deterministic across reruns
    again = cap_per_key(docs, "source", 50, id_col="doc_id")
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in capped.collect()
    )


def test_cap_per_key_matches_duckdb_portable(spark, docs):
    from kafka_connect_gcs_spark.operators.sampling import cap_per_key

    kept = sorted(
        r.doc_id
        for r in cap_per_key(
            docs, "source", 7, id_col="doc_id", portable=True
        ).collect()
    )
    pdf = docs.toPandas()
    want = sorted(
        duckdb.sql(
            """
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY source
                ORDER BY ('0x' || substr(md5('s0:' || doc_id), 1, 15))::BIGINT
                         / 1152921504606846976.0, doc_id) AS rk
              FROM pdf) WHERE rk <= 7
            """
        ).df()["doc_id"]
    )
    assert kept == want


def test_cap_per_key_under_cap_keys_untouched(spark):
    from kafka_connect_gcs_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "source string, doc_id long"
    )
    assert cap_per_key(df, "source", 10, id_col="doc_id").count() == 3
