"""Fixed-point PageRank: pure-python recurrence replay, structure sanity,
determinism, duplicate-edge collapse, validation."""

from collections import Counter, defaultdict

import pytest

from kafka_connect_gcs_spark.operators.graph import SCALE_BITS, pagerank


def _py_pagerank(edges, iterations, num=85, den=100):
    E = sorted(set(edges))
    deg = Counter(u for u, v in E)
    nodes = {u for e in E for u in e}
    B = 1 << SCALE_BITS
    tel = ((den - num) << SCALE_BITS) // den
    r = {n: B for n in nodes}
    for _ in range(iterations):
        s = defaultdict(int)
        for u, v in E:
            s[v] += r[u] // deg[u]
        r = {n: tel + (num * s.get(n, 0)) // den for n in nodes}
    return r


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "a"), ("e", "c"),  # e,d point in; c is the hub
]


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank_fp"] for r in pagerank(df, **kw).collect()}


def test_matches_python_recurrence(spark):
    for it in (1, 3, 5):
        got = _spark_ranks(spark, EDGES, iterations=it)
        assert got == _py_pagerank(EDGES, it)


def test_hub_outranks_leaves_and_dangling_sits_at_teleport(spark):
    got = _spark_ranks(spark, EDGES, iterations=5)
    # a and c dominate (c collects 4 in-edges; a receives c's whole rank)
    assert sorted(got, key=got.get, reverse=True)[:2] == ["a", "c"]
    # e has no in-links: rank = teleport constant exactly
    assert got["e"] == ((100 - 85) << SCALE_BITS) // 100
    # dangling-by-construction: e appears (it has out-edges); b dangles
    # nothing — every edge-set node is present
    assert set(got) == {"a", "b", "c", "d", "e"}


def test_duplicate_and_null_edges_collapse(spark):
    noisy = EDGES + EDGES[:3] + [(None, "c"), ("a", None)]
    df = spark.createDataFrame(noisy, "src string, dst string")
    got = {r["node"]: r["rank_fp"] for r in pagerank(df).collect()}
    assert got == _py_pagerank(EDGES, 5)


def test_deterministic_across_runs_and_partitioning(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = sorted(tuple(r) for r in pagerank(df).collect())
    b = sorted(tuple(r) for r in pagerank(df.repartition(7)).collect())
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_num=100, damping_den=100)
