"""Content-defined chunking: pure-python replay, coverage invariants,
the boundary-alignment (shared-suffix dedup) property, max-split
enforcement, map-only plan, validation."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.cdc_chunking import (
    DEFAULT_BOUNDARY_BITS,
    DEFAULT_MAX_WORDS,
    DEFAULT_MIN_WORDS,
    DEFAULT_WINDOW,
    RABIN_A,
    RABIN_P,
    chunk_dedup_stats,
    content_defined_chunks,
)


def _py_chunks(
    text,
    window=DEFAULT_WINDOW,
    bits=DEFAULT_BOUNDARY_BITS,
    mn=DEFAULT_MIN_WORDS,
    mx=DEFAULT_MAX_WORDS,
):
    ws = [w for w in re.split(r"\s+", text.lower()) if w]
    n = len(ws)
    g = [
        int(hashlib.md5(("cdc:" + w).encode()).hexdigest()[:15], 16) % RABIN_P
        for w in ws
    ]
    cand = [
        i
        for i in range(window, n + 1)
        if (sum(g[i - 1 - d] * RABIN_A**d for d in range(window)) % RABIN_P)
        % (1 << bits)
        == 0
    ]
    last, ks = 0, []
    for c in cand:
        if c - last >= mn:
            last, ks = c, ks + [c]
    bounds = [0] + ks + ([n] if n > last else [])
    out = []
    for b0, e in zip(bounds, bounds[1:]):
        s = b0 + 1
        k = 0
        while s + k * mx <= e:
            st = s + k * mx
            nw = min(mx, e - st + 1)
            txt = " ".join(ws[st - 1 : st - 1 + nw])
            out.append((st, nw, hashlib.md5(txt.encode()).hexdigest()))
            k += 1
    return [(i, st, nw, h) for i, (st, nw, h) in enumerate(out)]


def _spark_chunks(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    rows = content_defined_chunks(df, portable=True, **kw).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_word"], r["n_words"], r["chunk_hash"])
        )
    return {k: sorted(v) for k, v in got.items()}


def _doc(seed, n):
    # deterministic pseudo-random word soup, no RNG; ~997 distinct words
    # so rolling-window hashes behave uniformly (boundary prob 2^-bits)
    return " ".join(
        "w%d" % ((seed * 7919 + i * i * 31 + i * 17) % 997) for i in range(n)
    )


def test_matches_python_replay(spark):
    texts = [_doc(s, n) for s, n in [(1, 0), (2, 3), (3, 9), (4, 60), (5, 200), (6, 401)]]
    texts += ["   ", "one", "Tabs\tand\nnewlines  mixed   spacing " * 9]
    got = _spark_chunks(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, []) == _py_chunks(t), f"doc {i}"


def test_chunks_exactly_cover_each_doc(spark):
    texts = [_doc(s, 37 * s % 350 + 1) for s in range(1, 30)]
    got = _spark_chunks(spark, texts)
    for i, t in enumerate(texts):
        n = len([w for w in t.split() if w])
        pieces = got[i]
        assert pieces[0][1] == 1
        pos = 1
        for _cid, st, nw, _h in pieces:
            assert st == pos and 1 <= nw <= DEFAULT_MAX_WORDS
            pos += nw
        assert pos - 1 == n


def test_shared_suffix_chunks_align_despite_offset_shift(spark):
    # the CDC property: same long suffix behind different-length prefixes
    # dedups everywhere past the first in-suffix boundary
    suffix = _doc(9, 160)
    texts = [_doc(1, 17) + " " + suffix, _doc(2, 61) + " " + suffix]
    got = _spark_chunks(spark, texts)
    h0 = {h for _c, _s, _n, h in got[0]}
    h1 = {h for _c, _s, _n, h in got[1]}
    shared = h0 & h1
    # nearly every suffix chunk must be shared (>= half of the smaller doc)
    assert len(shared) >= max(2, len(got[0]) // 2)
    # and a fixed-size chunker at the same granularity shares nothing:
    fixed = lambda t: {  # noqa: E731
        " ".join(t.lower().split()[i : i + DEFAULT_MAX_WORDS])
        for i in range(0, len(t.split()), DEFAULT_MAX_WORDS)
    }
    assert not (fixed(texts[0]) & fixed(texts[1]))


def test_max_split_enforced(spark):
    # one word repeated: g identical everywhere -> at most one distinct
    # window hash; whatever it is, every chunk must obey max_words
    texts = ["word " * 300]
    got = _spark_chunks(spark, texts, max_words=10)
    assert all(nw <= 10 for _c, _s, nw, _h in got[0])
    assert sum(nw for _c, _s, nw, _h in got[0]) == 300
    assert got[0] == _py_chunks(texts[0], mx=10)


def test_dedup_stats(spark):
    df = spark.createDataFrame(
        [(i, "grp", _doc(i % 3, 90)) for i in range(9)],
        "doc_id long, source string, text string",
    )
    ch = content_defined_chunks(df, carry_cols=["source"], portable=True)
    row = chunk_dedup_stats(ch).collect()[0]
    # 9 docs, 3 distinct texts -> every chunk appears exactly 3 times
    assert row["total_chunks"] == 3 * row["distinct_chunks"]
    assert row["dup_chunks"] == row["total_chunks"] - row["distinct_chunks"]
    assert row["words_total"] == 9 * 90
    assert row["words_saved"] == row["words_total"] * 2 // 3
    assert row["dup_ratio"] == pytest.approx(2 / 3, abs=1e-6)


def test_production_path_runs_and_covers(spark):
    df = spark.createDataFrame(
        [(1, _doc(4, 120))], "doc_id long, text string"
    )
    rows = content_defined_chunks(df).collect()
    assert sum(r["n_words"] for r in rows) == 120


def test_chunker_plan_is_map_only(spark):
    df = spark.range(4).select(
        F.col("id").alias("doc_id"), F.lit(_doc(3, 50)).alias("text")
    )
    plan = content_defined_chunks(df, portable=True)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        content_defined_chunks(df, window=1)
    with pytest.raises(ValueError):
        content_defined_chunks(df, min_words=0)
    with pytest.raises(ValueError):
        content_defined_chunks(df, min_words=9, max_words=8)
