"""Similarity search over embedding columns (array<float>).

* :func:`cosine` — pure-Catalyst cosine similarity (zip_with + aggregate;
  whole-stage codegen, no Python).
* :func:`brute_force_topk` — exact top-k neighbors for a (small, broadcast)
  query set: broadcast-join × corpus, per-query top-k. The correctness
  baseline; at 100 TB cost is |Q|·n dot products, embarrassingly parallel,
  no shuffle except the final per-query top-k aggregation.
* :func:`neardup_pairs_cosine` — all pairs with cosine ≥ τ, LSH-bucketed by
  random-hyperplane signs so the self-join is per-bucket, not n².
* :func:`rp_bucket` — deterministic random-hyperplane signature; the plane
  components are hash-derived (no RNG state, reproducible everywhere).
* :func:`brute_force_topk_pandas` — the same top-k as an Arrow-batched
  pandas UDF doing the dot products in numpy BLAS over the broadcast query
  matrix; the fast path when |Q| is large enough that per-row expressions
  lose to matrix multiply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast (small side);
    the per-query top-k is a shuffle on query_id only."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries_pd,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same result as :func:`brute_force_topk`, computed as one numpy matmul
    per Arrow batch against the broadcast query matrix (BLAS beats per-row
    expressions once |Q|·dim is large). queries_pd: pandas DataFrame with
    columns (query_id, embedding)."""
    import numpy as np

    spark = corpus.sparkSession
    qids = queries_pd["query_id"].to_numpy()
    qmat = np.stack(queries_pd["embedding"].to_numpy()).astype("float64")
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    bq = spark.sparkContext.broadcast((qids, qmat))

    def score(batches):
        import pandas as pd

        qids_b, qmat_b = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            cmat = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
            sims = cmat @ qmat_b.T  # (batch, |Q|)
            n_b, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids_b, n_b),
                    id_col: np.tile(pdf[id_col].to_numpy(), n_q),
                    "sim": np.round(sims.T.reshape(-1), 6),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id long, {id_col} long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_assign(
    df: DataFrame,
    num_centroids: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF coarse quantizer: k-means (Lloyd) with deterministic hash-seeded
    init, fully in DataFrame ops. Returns (assignments df with ``centroid``
    column, centroids as a python list of (cid, vector)).

    Scale shape: each Lloyd iteration is one broadcast (centroids are tiny)
    + one map (argmin over k dot products, all Catalyst) + one groupBy
    (vector mean via ``aggregate`` elementwise sums) — no collect of data,
    centroids only come to the driver.
    """
    spark = df.sparkSession
    dim = len(df.select(vec_col).first()[0])

    # deterministic init: pick the num_centroids rows with smallest key hash
    init = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(num_centroids)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[1]]) for i, r in enumerate(init)]

    def assign_expr(cents):
        # argmin over squared L2 distance; ||v||² is common → argmax dot−||c||²/2.
        # MUST be a flat array_max over (score, cid) structs: chaining
        # when(cond, …).otherwise(prev) references prev twice per centroid →
        # exponential expression tree → driver OOM at ~16 centroids (measured).
        entries = [
            F.struct(
                (
                    dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in cvec]))
                    - F.lit(sum(x * x for x in cvec) / 2.0)
                ).alias("s"),
                F.lit(cid).alias("cid"),
            )
            for cid, cvec in cents
        ]
        return F.array_max(F.array(*entries))["cid"]

    for _ in range(iterations):
        assigned = df.select(id_col, vec_col).withColumn(
            "centroid", assign_expr(centroids)
        )
        sums = (
            assigned.groupBy("centroid")
            .agg(
                F.aggregate(
                    F.collect_list(vec_col),
                    F.array_repeat(F.lit(0.0), dim),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("vsum"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_cents = []
        for r in sums:
            new_cents.append((r.centroid, [x / r.n for x in r.vsum]))
        # keep centroids that lost all members unchanged
        have = {c for c, _ in new_cents}
        new_cents += [(c, v) for c, v in centroids if c not in have]
        centroids = sorted(new_cents)
    assigned = df.withColumn("centroid", assign_expr(centroids))
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    iterations: int = 3,
) -> DataFrame:
    """IVF approximate top-k: assign corpus to centroids once, then score
    each query only against its ``nprobe`` nearest centroid buckets — the
    classic recall/cost dial (nprobe=num_centroids ⇒ exact brute force).
    At 100 TB the corpus assignment is a write-once partitioning column and
    the per-query work drops by ~num_centroids/nprobe."""
    assigned, centroids = ivf_assign(
        corpus,
        num_centroids=num_centroids,
        iterations=iterations,
        seed=seed,
        vec_col=vec_col,
    )
    import math

    # rank centroids per query on the driver? No — queries live in a df.
    # centroids are tiny: compute query→centroid scores as expressions.
    def probe_set_expr(qvec_col):
        scores = []
        for cid, cvec in centroids:
            c = F.array(*[F.lit(float(x)) for x in cvec])
            nc = math.sqrt(sum(x * x for x in cvec)) or 1.0
            scores.append(
                F.struct(
                    (dot(qvec_col, c) / F.lit(nc)).alias("s"),
                    F.lit(cid).alias("cid"),
                )
            )
        arr = F.sort_array(F.array(*scores), asc=False)
        return F.transform(F.slice(arr, 1, nprobe), lambda s: s["cid"])

    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    ).withColumn("_probes", probe_set_expr(F.col("_qvec")))
    qx = q.select(query_id_col, "_qvec", F.explode("_probes").alias("centroid"))
    scored = (
        assigned.join(F.broadcast(qx), "centroid")
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rp_bucket(vec, num_planes: int = 8, seed: int = 42, dim: int = 64):
    """Random-hyperplane LSH bucket id: bit p = sign(v · plane_p), plane
    components derived from xxhash64(seed, p, d) → uniform in [-1, 1].
    Deterministic, stateless, identical on every executor."""
    bits = []
    for p in range(num_planes):
        plane = F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.lit(seed), F.lit(p), F.lit(d)), F.lit(2001))
                    - 1000
                ).cast("double")
                / 1000.0
                for d in range(dim)
            ]
        )
        bits.append(
            F.when(dot(vec, plane) >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def neardup_pairs_cosine(
    df: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. exact=True does the full n² self-join
    (oracle path); otherwise candidates come from matching random-hyperplane
    buckets (high-cosine pairs collide with high probability; multi-probe
    by also joining on neighbor buckets is left to callers needing recall)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        ab = df.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("v_a"),
            rp_bucket(F.col(vec_col), num_planes, dim=dim).alias("bkt"),
        )
        bb = df.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("v_b"),
            rp_bucket(F.col(vec_col), num_planes, dim=dim).alias("bkt"),
        )
        pairs = ab.join(bb, "bkt").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b", F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("sim")
        )
        .where(F.col("sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
