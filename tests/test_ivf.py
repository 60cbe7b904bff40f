"""IVF approximate nearest neighbors: recall vs exact brute force."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_ivf_assignment_is_total_and_stable(spark, emb):
    assigned, cents = ivf_assign(emb, num_centroids=8, iterations=2)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.where(F.col("centroid").isNull()).count() == 0
    again, cents2 = ivf_assign(emb, num_centroids=8, iterations=2)
    assert [c for c, _ in cents] == [c for c, _ in cents2]
    a1 = {r.vec_id: r.centroid for r in assigned.collect()}
    a2 = {r.vec_id: r.centroid for r in again.collect()}
    assert a1 == a2  # deterministic


def test_ivf_topk_recall(spark, emb):
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=5)
    truth = {
        (r.query_id, r.vec_id) for r in exact.collect()
    }
    approx = ivf_topk(emb, queries, k=5, num_centroids=8, nprobe=4)
    got = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.6, recall  # nprobe=half the buckets

    # nprobe == num_centroids degenerates to exact brute force
    full = ivf_topk(emb, queries, k=5, num_centroids=8, nprobe=8)
    got_full = {(r.query_id, r.vec_id) for r in full.collect()}
    assert got_full == truth


def test_ivf_prepartitioned_store_matches_and_prunes(spark, emb, tmp_path):
    """Write-time IVF partitioning: same results as the join-time ivf_topk
    (same centroids by determinism), and the probe filter reaches the scan
    as PartitionFilters — unprobed bucket directories are never read."""
    from kafka_connect_gcs_spark.operators.similarity import (
        ivf_topk_prepartitioned,
        ivf_write,
    )
    from kafka_connect_gcs_spark.plans.inspect import explain_str

    path = str(tmp_path / "ivf_store")
    centroids = ivf_write(emb, path, num_centroids=8, iterations=2)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_topk_prepartitioned(
        spark, path, centroids, queries, k=5, nprobe=4
    )
    want = ivf_topk(emb, queries, k=5, num_centroids=8, nprobe=4, iterations=2)
    assert sorted(
        (r.query_id, r.vec_id, r.sim, r.rank) for r in got.collect()
    ) == sorted((r.query_id, r.vec_id, r.sim, r.rank) for r in want.collect())
    plan = explain_str(
        spark.read.parquet(path).where(F.col("centroid").isin([1, 3]))
    )
    assert "PartitionFilters" in plan and "centroid" in plan


def test_exact_assignment_identical_to_expr(spark, emb):
    """assign_centroid_pandas_exact must reproduce the literal-HOF
    expression's assignment BIT-identically (same fold order, same half
    norms, same tie-break) — it is the default execution of the "expr"
    semantics, so any divergence is a correctness bug, not a near-tie."""
    from kafka_connect_gcs_spark.operators.similarity import (
        assign_centroid_expr,
        assign_centroid_pandas_exact,
    )

    _, cents = ivf_assign(emb, num_centroids=8, iterations=2)
    via_expr = emb.withColumn(
        "centroid", assign_centroid_expr(cents, F.col("embedding"))
    )
    via_exact = assign_centroid_pandas_exact(emb, cents)
    a_expr = {r.vec_id: r.centroid for r in via_expr.collect()}
    a_np = {r.vec_id: r.centroid for r in via_exact.collect()}
    assert a_expr == a_np


def test_pandas_assignment_agrees_with_expr(spark, emb):
    """assign_centroid_pandas (numpy matmul) must bucket the corpus the
    same way as the literal-HOF expression — the two paths share the
    argmax objective and tie-break; only pathological float near-ties
    could differ, and the test corpus has none."""
    from kafka_connect_gcs_spark.operators.similarity import (
        assign_centroid_pandas,
    )

    assigned, cents = ivf_assign(emb, num_centroids=8, iterations=2)
    via_pandas = assign_centroid_pandas(emb, cents)
    a_expr = {r.vec_id: r.centroid for r in assigned.collect()}
    a_np = {r.vec_id: r.centroid for r in via_pandas.collect()}
    assert a_expr == a_np


def test_ivf_topk_pandas_assignment_same_result(spark, emb):
    queries = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    base = ivf_topk(emb, queries, k=5, num_centroids=8, nprobe=4)
    alt = ivf_topk(
        emb, queries, k=5, num_centroids=8, nprobe=4, assign_method="pandas"
    )
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(base) == rows(alt)
