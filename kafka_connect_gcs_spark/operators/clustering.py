"""Distributed Lloyd's k-means over an embedding column.

The full-corpus companion to the bounded-sample k-means that trains the
IVF/PQ quantizers (similarity.py / pq.py train driver-side numpy on a
hash-ordered sample): here every iteration assigns the WHOLE corpus and
re-estimates centroids from ALL members — the clustering step a
SemDeDup-style curation pipeline runs before per-cluster dedup, and the
shape Spark MLlib's KMeans uses, re-expressed on the DataFrame API so it
composes with this engine's operators (no MLlib / RDD dependency).

Scale shape (the part that matters at 10^10 rows):

* assignment is a PURE MAP — the centroid set rides into the executors as
  one O(k·dim) literal array (``assign_centroid_expr``) or a numpy matmul
  per Arrow batch (``method="pandas"``); the corpus never shuffles;
* the update step is ONE partial-aggregated exchange per iteration
  carrying ≤ k rows per map partition (count + dim running sums each) —
  never member vectors, never a ``collect_list`` of points;
* the model itself (k × dim doubles) is driver metadata, collected once
  per iteration — independent of corpus size;
* iterations are bounded (``max_iter``), so the whole fit is
  ``max_iter + 1`` corpus scans; the projected (id, vector) relation is
  persisted across them and released before returning.

Determinism: seeds are the ``k`` vectors with the smallest hash of their
id (``portable=True`` → the md5-60bit hash DuckDB replays bit-for-bit;
else ``xxhash64``), ties broken by id; assignment tie-breaks to the
smallest centroid id; per-dimension means are rounded to 9 decimals each
update so the float-addition order inside the aggregate cannot leak into
the model — the driver query's oracle replays every iteration exactly.

Empty clusters keep their previous centroid (deterministic, replayable).

No reference analog (the connector moves opaque bytes); part of the
training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.similarity import (
    _centroid_literals,
    assign_centroid_expr,
    assign_centroid_pandas,
)


def _id_hash(col: Column, seed: int, portable: bool) -> Column:
    """Deterministic per-id hash for seed selection — portable form is the
    engine's md5-60bit (`('0x' || substr(md5('km{seed}:' || id), 1,
    15))::BIGINT` in DuckDB)."""
    if portable:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"km{seed}:"), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    return F.xxhash64(col, F.lit(seed))


def kmeans_seeds(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    portable: bool = False,
) -> list:
    """``[(cid, [float, ...]), ...]`` — the ``k`` vectors with the smallest
    id hash (ties by id), numbered 0..k-1 in that order. Plans as a
    TakeOrderedAndProject (top-k, never a full sort)."""
    rows = (
        df.select(
            _id_hash(F.col(id_col), seed, portable).alias("_h"),
            F.col(id_col).alias("_i"),
            F.col(vec_col).alias("_v"),
        )
        .orderBy("_h", "_i")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} but corpus has only {len(rows)} rows")
    return [(cid, [float(x) for x in r["_v"]]) for cid, r in enumerate(rows)]


def _assign(df, centroids, vec_col: str, out_col: str, method: str):
    """``method``: "expr" (the literal-HOF expression), "pandas" (BLAS
    argmax — fast, not bit-pinned to the expression fold), or "fused"
    (only meaningful inside :func:`kmeans_fit`; assignments outside the
    fit fall back to the expression form, so labeled output stays
    bit-identical to the all-expr plan)."""
    if method == "pandas":
        return assign_centroid_pandas(
            df, centroids, vec_col=vec_col, out_col=out_col
        )
    return df.withColumn(
        out_col, assign_centroid_expr(centroids, F.col(vec_col))
    )


def _iteration_stats_fused(pts, centroids, dim: int):
    """One Lloyd iteration's sufficient statistics ``{cid: (n, sumvec)}``
    computed by a single fused mapInPandas pass: the bit-exact numpy
    assignment (:func:`assign_centroid_pandas_exact`'s index-order score
    fold) plus per-cluster member counts and per-dimension running sums,
    emitted as one ≤ k-row partial per task. Replaces the k·dim-column
    aggregate, whose codegen alone (65 aggregate expressions at dim=64)
    dominated the iteration at bench scale (measured 1.4-2.9 s vs
    ~0.25 s for this pass on 20k×64); the means consumer rounds to 9
    decimals, which absorbs the partial-sum association difference
    exactly as it does between Spark's own partial aggregate and the
    DuckDB oracle."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    cids = np.asarray([int(c) for c, _ in centroids])
    order = np.argsort(cids, kind="stable")
    cids = cids[order]
    vecs = [centroids[i][1] for i in order]
    CT = np.ascontiguousarray(np.asarray(vecs, dtype="float64").T)
    # EXACT same half-norm fold as _centroid_literals (python float sum)
    half = np.asarray([sum(x * x for x in v) / 2.0 for v in vecs])
    schema = StructType(
        [
            StructField("_cid", IntegerType()),
            StructField("_n", LongType()),
            StructField("_s", ArrayType(DoubleType())),
        ]
    )

    def partials(batches):
        import pandas as pd

        acc_n = np.zeros(len(cids), dtype="int64")
        acc_s = np.zeros((len(cids), dim), dtype="float64")
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["_v"].to_numpy()).astype("float64")
            # index-order accumulation — the Catalyst zip_with fold twin
            scores = np.zeros((len(pdf), len(cids)), dtype="float64")
            for d in range(CT.shape[0]):
                scores += np.multiply.outer(V[:, d], CT[d])
            scores -= half
            a = scores.argmax(axis=1)
            for ci in range(len(cids)):
                m = a == ci
                if m.any():
                    acc_n[ci] += int(m.sum())
                    acc_s[ci] += V[m].sum(axis=0)
        yield pd.DataFrame(
            {
                "_cid": cids.astype("int32"),
                "_n": acc_n,
                "_s": [list(r) for r in acc_s],
            }
        )

    rows = pts.mapInPandas(partials, schema=schema).collect()
    import numpy as np  # noqa: F811 — keep local for clarity

    agg: dict = {}
    for r in rows:
        n0, s0 = agg.get(r["_cid"], (0, np.zeros(dim)))
        agg[r["_cid"]] = (n0 + r["_n"], s0 + np.asarray(r["_s"]))
    return agg


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    portable: bool = False,
    method: str = "expr",
) -> list:
    """Train k-means with ``max_iter`` Lloyd iterations over the full
    corpus; returns the centroid list ``[(cid, vector), ...]`` (pass it to
    :func:`kmeans_assign`, or to ``ivf``-style consumers that take a
    trained quantizer).

    Each iteration runs ONE job: a map-only assignment fused into a
    partial-aggregated ``groupBy(cid)`` computing member counts and
    per-dimension running sums (k × (dim+1) numbers — metadata-scale), so
    member vectors are never shuffled or collected. Means are rounded to
    9 decimals (see module docstring). Clusters that lose every member
    keep their previous centroid.
    """
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0: {max_iter}")
    from pyspark import StorageLevel

    centroids = kmeans_seeds(
        df, k, id_col=id_col, vec_col=vec_col, seed=seed, portable=portable
    )
    if max_iter == 0:
        return centroids
    dim = len(centroids[0][1])
    # the fit re-scans (id, vec) once per iteration — persist the narrow
    # projection across iterations, release before returning
    pts = df.select(F.col(vec_col).alias("_v")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        for _ in range(max_iter):
            if method == "fused":
                agg = _iteration_stats_fused(pts, centroids, dim)
                nxt = []
                for cid, old in centroids:
                    hit = agg.get(cid)
                    if hit is None or hit[0] == 0:
                        nxt.append((cid, old))
                    else:
                        n, s = hit
                        nxt.append(
                            (cid, [round(float(x) / n, 9) for x in s])
                        )
                centroids = nxt
                continue
            assigned = _assign(pts, centroids, "_v", "_cid", method)
            stats = (
                assigned.groupBy("_cid")
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    *[
                        F.sum(
                            F.element_at(F.col("_v"), d + 1).cast("double")
                        ).alias(f"_s{d}")
                        for d in range(dim)
                    ],
                )
                .collect()
            )
            by_cid = {r["_cid"]: r for r in stats}
            nxt = []
            for cid, old in centroids:
                r = by_cid.get(cid)
                if r is None or r["_n"] == 0:
                    nxt.append((cid, old))
                else:
                    n = r["_n"]
                    nxt.append(
                        (cid, [round(r[f"_s{d}"] / n, 9) for d in range(dim)])
                    )
            centroids = nxt
    finally:
        pts.unpersist()
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    out_col: str = "cid",
    dist_col: "str | None" = None,
    method: str = "expr",
) -> DataFrame:
    """Label every row with its nearest centroid (smallest-cid tie-break) —
    a pure map-only projection, no shuffle (plan-asserted in tests).
    ``dist_col`` adds the squared L2 distance to the chosen centroid,
    computed by the same sequential fold the oracle replays."""
    out = _assign(df, centroids, vec_col, out_col, method)
    if dist_col is None:
        return out
    # the distance slice indexes the flat matrix BY cid — require the
    # dense 0..k-1 numbering kmeans_seeds produces (arbitrary cid sets
    # still assign fine without dist_col via the CID literal array)
    centroids = sorted(centroids, key=lambda cv: int(cv[0]))
    if [int(c) for c, _ in centroids] != list(range(len(centroids))):
        raise ValueError("dist_col requires contiguous cids 0..k-1")
    M, _, _, _, dim = _centroid_literals(centroids)
    c_slice = F.slice(M, F.col(out_col) * dim + 1, dim)
    sq = F.aggregate(
        F.zip_with(
            F.col(vec_col), c_slice, lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return out.withColumn(dist_col, sq)


def kmeans(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    portable: bool = False,
    method: str = "expr",
    out_col: str = "cid",
    dist_col: "str | None" = None,
) -> "tuple[DataFrame, list]":
    """Fit + final assignment: ``(labeled df, centroids)``."""
    centroids = kmeans_fit(
        df,
        k=k,
        max_iter=max_iter,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        portable=portable,
        method=method,
    )
    return (
        kmeans_assign(
            df,
            centroids,
            vec_col=vec_col,
            out_col=out_col,
            dist_col=dist_col,
            method=method,
        ),
        centroids,
    )
