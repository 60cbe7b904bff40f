"""Distributed Lloyd's k-means (operators/clustering.py): exact small-case
behavior, a pure-python replay of the whole fit (seeds, assignment
tie-break, round-9 means, empty-cluster rule), expr/pandas agreement, and
the map-only assignment plan contract."""

import hashlib
import struct

import pytest

from kafka_connect_gcs_spark.operators.clustering import (
    kmeans,
    kmeans_assign,
    kmeans_fit,
    kmeans_seeds,
)


def _f32(x: float) -> float:
    """The double exactly representing float32(x) — the vectors live in an
    ``array<float>`` column, so python-side references must see the same
    quantized values Spark does."""
    return struct.unpack("f", struct.pack("f", x))[0]


def _df(spark, pts, ids=None):
    ids = ids or list(range(len(pts)))
    return spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in zip(ids, pts)],
        "vec_id long, embedding array<float>",
    )


def test_two_obvious_clusters(spark):
    pts = [(0.0, 0.0), (0.1, 0.0), (0.0, 0.1), (9.0, 9.0), (9.1, 9.0), (9.0, 9.1)]
    df = _df(spark, pts)
    labeled, cents = kmeans(df, k=2, max_iter=3, seed=1)
    got = {r.vec_id: r.cid for r in labeled.collect()}
    low = {got[0], got[1], got[2]}
    high = {got[3], got[4], got[5]}
    assert len(low) == 1 and len(high) == 1 and low != high
    # converged centroids are the exact cluster means (round-9) of the
    # float32-quantized inputs
    means = sorted(
        [tuple(v) for _, v in cents],
        key=lambda c: c[0],
    )
    lo = round(_f32(0.1) / 3, 9)
    hi_a = round((9.0 + _f32(9.1) + 9.0) / 3, 9)
    assert means[0] == (lo, lo)
    assert means[1] == (hi_a, hi_a)


def test_seed_determinism_and_order(spark):
    df = _df(spark, [(float(i), float(-i)) for i in range(20)])
    s1 = kmeans_seeds(df, 4, seed=7, portable=True)
    s2 = kmeans_seeds(df, 4, seed=7, portable=True)
    assert s1 == s2
    assert [c for c, _ in s1] == [0, 1, 2, 3]
    # matches the documented md5-60bit ordering
    def h(i):
        return int(hashlib.md5(f"km7:{i}".encode()).hexdigest()[:15], 16)

    want = sorted(range(20), key=lambda i: (h(i), i))[:4]
    assert [v[0] for _, v in s1] == [float(i) for i in want]


def test_empty_cluster_keeps_previous_centroid(spark):
    # two identical seed vectors: the duplicate cid never wins a point
    # (ties break to the smaller cid) and must keep its seed centroid
    pts = [(0.0, 0.0), (0.0, 0.0), (5.0, 5.0), (5.0, 5.0), (5.0, 6.0)]
    df = _df(spark, pts)
    # seed=2/portable picks ids [3, 2, 4] -> cids 0 and 1 are both (5,5)
    seeds = kmeans_seeds(df, 3, seed=2, portable=True)
    dup_cids = [
        c
        for c, v in seeds
        if sum(1 for _, w in seeds if w == v) > 1
    ]
    assert dup_cids == [0, 1], seeds
    cents = kmeans_fit(df, k=3, max_iter=2, seed=2, portable=True)
    loser = max(dup_cids)
    assert dict(cents)[loser] == dict(seeds)[loser]
    # and the winner moved off the shared seed (it absorbed points)
    assert dict(cents)[0] != dict(seeds)[0]


def _py_kmeans(rows, k, max_iter, seed):
    """Pure-python replay of kmeans_fit's documented contract."""
    def h(i):
        return int(hashlib.md5(f"km{seed}:{i}".encode()).hexdigest()[:15], 16)

    order = sorted(rows, key=lambda r: (h(r[0]), r[0]))
    cents = [list(map(float, v)) for _, v in order[:k]]
    dim = len(cents[0])
    for _ in range(max_iter):
        members = {c: [] for c in range(k)}
        for _i, v in rows:
            best, best_s = None, None
            for c in range(k):
                s = 0.0
                for a, b in zip(v, cents[c]):
                    s += a * b
                s -= sum(x * x for x in cents[c]) / 2.0
                if best_s is None or s > best_s:
                    best, best_s = c, s
            members[best].append(v)
        for c in range(k):
            if members[c]:
                n = len(members[c])
                cents[c] = [
                    round(sum(v[d] for v in members[c]) / n, 9)
                    for d in range(dim)
                ]
    return cents


def test_fit_matches_python_replay(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [_f32(round(rng.uniform(-1, 1), 3)) for _ in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = kmeans_fit(df, k=4, max_iter=3, seed=5, portable=True)
    want = _py_kmeans(rows, 4, 3, 5)
    for (cid, v), w in zip(got, want):
        assert v == pytest.approx(w, abs=1e-9), cid


def test_assign_dist_and_plan(spark):
    pts = [(0.0, 0.0), (1.0, 1.0), (4.0, 4.0)]
    df = _df(spark, pts)
    cents = [(0, [0.0, 0.0]), (1, [4.0, 4.0])]
    out = kmeans_assign(df, cents, dist_col="sq")
    rows = {r.vec_id: (r.cid, r.sq) for r in out.collect()}
    assert rows[0] == (0, 0.0)
    assert rows[1] == (0, 2.0)  # tie in distance? no: d0=2 < d1=18
    assert rows[2] == (1, 0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_expr_and_pandas_methods_agree(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(16)])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ce = kmeans_fit(df, k=3, max_iter=2, seed=9, method="expr")
    cp = kmeans_fit(df, k=3, max_iter=2, seed=9, method="pandas")
    for (c1, v1), (c2, v2) in zip(ce, cp):
        assert c1 == c2
        assert v1 == pytest.approx(v2, abs=1e-9)
    a = {r.vec_id: r.cid for r in kmeans_assign(df, ce).collect()}
    b = {
        r.vec_id: r.cid
        for r in kmeans_assign(df, ce, method="pandas").collect()
    }
    assert a == b


def test_validation(spark):
    df = _df(spark, [(0.0, 0.0), (1.0, 1.0)])
    with pytest.raises(ValueError, match="only 2 rows"):
        kmeans_seeds(df, 5)
    with pytest.raises(ValueError, match="max_iter"):
        kmeans_fit(df, k=2, max_iter=-1)
    with pytest.raises(ValueError, match="contiguous"):
        kmeans_assign(df, [(0, [0.0, 0.0]), (2, [1.0, 1.0])], dist_col="d")
