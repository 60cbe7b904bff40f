"""Product quantization: training determinism, encode parity (expr vs
numpy), ADC recall vs exact brute force."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.pq import (
    l2_normalize,
    pq_adc_topk,
    pq_encode,
    pq_train,
)
from kafka_connect_gcs_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, num_subspaces=8, codes_per_subspace=16, iterations=3)


def test_l2_normalize_unit_norm(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {r.vec_id: r.embedding for r in l2_normalize(df).collect()}
    assert out[1] == pytest.approx([0.6, 0.8])
    assert out[2] == [0.0, 0.0]  # zero vector passes through


def test_pq_train_shape_and_determinism(emb, books):
    assert len(books) == 8
    for cb in books:
        assert len(cb) == 16
        assert sorted(c for c, _ in cb) == list(range(16))
        assert all(len(v) == 8 for _, v in cb)  # 64-dim / 8 subspaces
    again = pq_train(emb, num_subspaces=8, codes_per_subspace=16, iterations=3)
    assert books == again


def test_pq_encode_total_and_in_range(emb, books):
    codes = pq_encode(emb, books)
    n = emb.count()
    assert codes.count() == n
    bad = codes.where(
        (F.size("codes") != 8)
        | F.exists("codes", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0


def test_pq_encode_pandas_matches_expr(emb, books):
    via_expr = {r.vec_id: r.codes for r in pq_encode(emb, books).collect()}
    via_np = {
        r.vec_id: r.codes
        for r in pq_encode(emb, books, method="pandas").collect()
    }
    assert via_expr == via_np


def test_pq_encode_is_map_only(emb, books):
    plan = pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_adc_topk_recall(spark, emb, books):
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes = pq_encode(emb, books)
    approx = pq_adc_topk(codes, books, queries, k=10)
    truth = brute_force_topk(emb, queries, k=10)
    t = {(r.query_id, r.vec_id) for r in truth.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(a & t) / len(t)
    # PQ with M=8/K=16 on uniform-random 64-dim data is a lossy sketch at
    # its worst case (no cluster structure, cosines concentrate); the
    # gate is "clearly better than chance + finds the self-match", not
    # parity. Measured 0.2875 deterministic at sf0.001; chance ~ k/n.
    assert recall >= 0.25, f"recall {recall}"
    # every query's own vector has the maximal ADC self-score, so the
    # self pair must be in the top-k
    self_pairs = {(q, q) for q in range(8)}
    assert self_pairs <= a


def test_adc_scores_monotone_with_duplicates(spark, books):
    # a corpus where vec 100 duplicates the query exactly: ADC must rank
    # it first (identical codes -> maximal LUT sum)
    base = [(100 + i, [float((i * 7 + j) % 5) for j in range(64)]) for i in range(20)]
    q = [(0, base[0][1])]
    corpus = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(q, "query_id long, embedding array<double>")
    codes = pq_encode(corpus, books)
    top = pq_adc_topk(codes, books, queries, k=3).orderBy("rank").collect()
    assert top[0].vec_id == 100


def test_ivfpq_store_prunes_and_ranks(spark, emb, books, tmp_path):
    """ivfpq_write stores codes partitioned by centroid; the
    prepartitioned query prunes unprobed directories (PartitionFilters)
    and its per-bucket ADC ranking agrees with full-corpus ADC on the
    probed subset."""
    from kafka_connect_gcs_spark.operators.pq import (
        ivfpq_topk_prepartitioned,
        ivfpq_write,
    )
    from kafka_connect_gcs_spark.plans.inspect import explain_str

    path = str(tmp_path / "ivfpq_store")
    centroids, codebooks = ivfpq_write(
        emb, path, num_centroids=8, num_subspaces=8, codes_per_subspace=16
    )
    queries = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivfpq_topk_prepartitioned(
        spark, path, centroids, codebooks, queries, k=5, nprobe=8
    )
    # nprobe = num_centroids probes everything, so the store path must
    # equal plain full-corpus ADC with the same codebooks
    codes = pq_encode(emb, codebooks)
    want = pq_adc_topk(codes, codebooks, queries, k=5)
    assert sorted(
        (r.query_id, r.vec_id, r.sim, r.rank) for r in got.collect()
    ) == sorted((r.query_id, r.vec_id, r.sim, r.rank) for r in want.collect())
    plan = explain_str(
        spark.read.parquet(path).where(F.col("centroid").isin([1, 3]))
    )
    assert "PartitionFilters" in plan and "centroid" in plan
    # stored relation is codes-only: the raw vector column is gone
    assert "embedding" not in spark.read.parquet(path).columns


def test_pq_train_empty_and_undersized_inputs(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no vectors"):
        pq_train(empty, num_subspaces=2, codes_per_subspace=4)
    tiny = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 2.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="codes_per_subspace"):
        pq_train(tiny, num_subspaces=2, codes_per_subspace=16)


def test_pq_string_ids_roundtrip(spark, emb, books):
    """Encode + ADC top-k must carry NON-long id types through unchanged
    (schemas are derived from the input, not hardcoded)."""
    s_corpus = emb.where(F.col("vec_id") < 40).select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    for method in ("expr", "pandas"):
        codes = pq_encode(s_corpus, books, method=method)
        assert dict(codes.dtypes)["vec_id"] == "string"
        assert codes.count() == 40
    queries = emb.where(F.col("vec_id") < 3).select(
        F.concat(F.lit("q-"), F.col("vec_id")).alias("query_id"), "embedding"
    )
    codes = pq_encode(s_corpus, books, method="pandas")
    top = pq_adc_topk(codes, books, queries, k=3)
    rows = top.collect()
    assert len(rows) == 9
    assert all(r.query_id.startswith("q-") and r.vec_id.startswith("doc-") for r in rows)
    # each query's own vector is its best match (identical corpus/query ids)
    best = {r.query_id: r.vec_id for r in rows if r.rank == 1}
    assert best == {f"q-{i}": f"doc-{i}" for i in range(3)}


def test_refine_recall_dominates_adc(spark, emb, books):
    """The exact-refine stage must (a) beat or match raw ADC recall vs
    brute force and (b) return exact sims for the survivors (self-match
    sim == 1.0 at rank 1)."""
    from kafka_connect_gcs_spark.operators.pq import pq_refine_topk

    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes = pq_encode(emb, books)
    truth = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, queries, k=10).collect()}
    adc = {
        (r.query_id, r.vec_id)
        for r in pq_adc_topk(codes, books, queries, k=10).collect()
    }
    refined_rows = pq_refine_topk(
        emb, codes, books, queries, k=10, expand=4
    ).collect()
    refined = {(r.query_id, r.vec_id) for r in refined_rows}
    r_adc = len(adc & truth) / len(truth)
    r_ref = len(refined & truth) / len(truth)
    assert r_ref >= r_adc, (r_ref, r_adc)
    for r in refined_rows:
        if r.rank == 1:
            # exact rescoring restores the true self-match at sim 1
            assert r.vec_id == r.query_id
            assert abs(r.sim - 1.0) < 1e-6


def test_refine_is_exact_on_candidates(spark, books):
    """Within the candidate set the refine output is the EXACT cosine
    ranking — for a corpus small enough that candidates = everything,
    refine must equal brute force row-for-row."""
    from kafka_connect_gcs_spark.operators.pq import pq_refine_topk

    base = [
        (100 + i, [float((i * 13 + j * 3) % 7) - 3.0 for j in range(64)])
        for i in range(12)
    ]
    corpus = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, base[3][1]), (1, base[7][1])],
        "query_id long, embedding array<double>",
    )
    codes = pq_encode(corpus, books)
    # k*expand = 12 >= corpus size -> candidate set is the whole corpus
    got = [
        (r.query_id, r.rank, r.vec_id)
        for r in pq_refine_topk(corpus, codes, books, queries, k=3, expand=4)
        .orderBy("query_id", "rank")
        .collect()
    ]
    want = [
        (r.query_id, r.rank, r.vec_id)
        for r in brute_force_topk(corpus, queries, k=3)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == want
