"""Span corruption (operators/masking.py): greedy mask selection vs a
pure-python reference, reconstruction invariants, edge cases."""

import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_gcs_spark.operators.masking import span_corruption  # noqa: E402

H60 = float(1 << 60)


def _draw(doc, i, seed):
    h = int(hashlib.md5(f"{doc}:{i}:{seed}".encode()).hexdigest()[:15], 16)
    return (h + 0.5) / H60


def _reference(doc, tokens, p, L, base, seed):
    starts, nf = [], 0
    for i in range(len(tokens)):
        if i >= nf and i + L <= len(tokens) and _draw(doc, i, seed) < p:
            starts.append(i)
            nf = i + L + 1
    inputs, targets, pos = [], [], 0
    for k, s in enumerate(starts):
        inputs.extend(tokens[pos:s])
        inputs.append(base + k)
        targets.append(base + k)
        targets.extend(tokens[s : s + L])
        pos = s + L
    inputs.extend(tokens[pos:])
    return starts, inputs, targets


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    return {
        r["doc_id"]: r
        for r in span_corruption(df, **kw).collect()
    }


def test_matches_python_reference(spark):
    rows = [
        (f"d{j}", [(j * 31 + i * 7) % 30000 for i in range(40 + j * 13)])
        for j in range(8)
    ]
    got = _run(spark, rows, p_start=0.2, span_len=3, seed=9)
    for doc, toks in rows:
        starts, inputs, targets = _reference(doc, toks, 0.2, 3, 100_000, 9)
        r = got[doc]
        assert r["n_spans"] == len(starts), doc
        assert r["inputs"] == inputs, doc
        assert r["targets"] == targets, doc


def test_reconstruction_and_budget(spark):
    rows = [("a", list(range(200)))]
    r = _run(spark, rows, p_start=0.3, span_len=3)["a"]
    assert r["n_spans"] > 0
    # splice the targets back into the inputs at each sentinel →
    # the original sequence, exactly
    spans = {}
    t = r["targets"]
    i = 0
    while i < len(t):
        sent = t[i]
        spans[sent] = t[i + 1 : i + 4]
        i += 4
    rebuilt = []
    for x in r["inputs"]:
        rebuilt.extend(spans[x] if x >= 100_000 else [x])
    assert rebuilt == list(range(200))
    # non-adjacent: sentinels never touch in the inputs
    for a, b in zip(r["inputs"], r["inputs"][1:]):
        assert not (a >= 100_000 and b >= 100_000)


def test_empty_and_short_docs(spark):
    rows = [("e", []), ("s", [1, 2])]
    got = _run(spark, rows, p_start=1.0, span_len=3)
    assert got["e"]["n_spans"] == 0 and got["e"]["inputs"] == []
    # a 2-token doc can't fit a 3-span: untouched
    assert got["s"]["n_spans"] == 0 and got["s"]["inputs"] == [1, 2]


def test_deterministic_and_seed_sensitive(spark):
    rows = [("d", list(range(100)))]
    a = _run(spark, rows, seed=1)["d"]
    b = _run(spark, rows, seed=1)["d"]
    c = _run(spark, rows, seed=2)["d"]
    assert a["inputs"] == b["inputs"]
    assert a["inputs"] != c["inputs"]


def test_plan_is_map_only(spark):
    df = spark.createDataFrame(
        [("x", [1, 2, 3])], "doc_id string, tokens array<int>"
    )
    plan = (
        span_corruption(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
