"""chunk_documents + temperature_mix: hand-computed shapes and invariants."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.packing import chunk_documents
from kafka_connect_gcs_spark.operators.sampling import temperature_mix


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),  # 10 words
            (2, "a b c"),  # 3 words (< chunk)
            (3, ""),  # empty → no chunks
            (4, "x1 x2 x3 x4"),  # exactly one chunk at size 4
        ],
        ["doc_id", "text"],
    )


def test_chunk_no_overlap(docs):
    out = chunk_documents(docs, chunk_size=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 words / stride 4 → chunks at 1,5,9 with sizes 4,4,2
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [(r["start"], r["chunk_n"]) for r in c1] == [(1, 4), (5, 4), (9, 2)]
    assert c1[0]["chunk_text"] == "w1 w2 w3 w4"
    assert c1[2]["chunk_text"] == "w9 w10"
    # short doc: one short chunk; empty doc: none; exact doc: one chunk
    assert [(r["start"], r["chunk_n"]) for r in by_doc[2]] == [(1, 3)]
    assert 3 not in by_doc
    assert [(r["start"], r["chunk_n"]) for r in by_doc[4]] == [(1, 4)]


def test_chunk_with_overlap(docs):
    out = sorted(
        chunk_documents(docs, chunk_size=4, overlap=2)
        .where(F.col("doc_id") == 1)
        .collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 2: starts 1,3,5,7 — windows stop once the last word is
    # covered (no redundant trailing window whose words all appeared)
    assert [(r["start"], r["chunk_n"]) for r in out] == [
        (1, 4), (3, 4), (5, 4), (7, 4),
    ]
    # consecutive chunks share `overlap` words
    assert out[0]["chunk_text"].split()[-2:] == out[1]["chunk_text"].split()[:2]


def test_chunk_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=4, overlap=4)


def test_chunk_covers_every_word(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_documents(docs, chunk_size=32)
    # no overlap → chunk words per doc == doc words
    per_doc = out.groupBy("doc_id").agg(F.sum("chunk_n").alias("n"))
    from kafka_connect_gcs_spark.operators.text import words

    truth = docs.select("doc_id", F.size(words(F.col("text"))).alias("t"))
    bad = per_doc.join(truth, "doc_id").where(F.col("n") != F.col("t"))
    assert bad.count() == 0


def _mk_corpus(spark, sizes):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_temperature_one_is_identity_rates(spark):
    df = _mk_corpus(spark, {"big": 800, "small": 200})
    out = temperature_mix(df, temperature=1.0)
    # T=1 → q_s = natural proportions → rate 1.0 for every source
    rates = {r["source"]: r["rate"] for r in out.select("source", "rate").distinct().collect()}
    assert rates == {"big": pytest.approx(1.0), "small": pytest.approx(1.0)}
    assert out.count() == 1000


def test_temperature_flattens(spark):
    df = _mk_corpus(spark, {"big": 900, "small": 100})
    out = temperature_mix(df, temperature=100.0, seed=3)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # T→∞ flattens to ~500/500: small upsampled ~5x, big downsampled ~0.55
    assert counts["small"] > 400 and counts["big"] < 600
    # expected totals hold within hash-sampling noise
    assert abs(counts["small"] - 500) < 80 and abs(counts["big"] - 500) < 80


def test_temperature_rates_match_formula(spark):
    df = _mk_corpus(spark, {"a": 640, "b": 160, "c": 200})
    out = temperature_mix(df, temperature=2.0)
    rates = {
        r["source"]: r["rate"]
        for r in out.select("source", "rate").distinct().collect()
    }
    c = {"a": 640, "b": 160, "c": 200}
    tot = sum(c.values())
    z = sum(v ** 0.5 for v in c.values())
    for s, n in c.items():
        assert rates[s] == pytest.approx(tot * (n ** 0.5 / z) / n, rel=1e-12)


def test_temperature_deterministic(spark):
    df = _mk_corpus(spark, {"a": 300, "b": 100})
    ids1 = {
        (r["doc_id"], r["epoch"])
        for r in temperature_mix(df, 4.0, seed=7).collect()
    }
    ids2 = {
        (r["doc_id"], r["epoch"])
        for r in temperature_mix(df, 4.0, seed=7).collect()
    }
    assert ids1 == ids2 and len(ids1) > 0


def test_temperature_total_budget(spark):
    df = _mk_corpus(spark, {"a": 300, "b": 100})
    out = temperature_mix(df, temperature=1.0, total=100)
    # total=100 at T=1 → uniform 25% rate on both sources
    rates = {r["source"]: r["rate"] for r in out.select("source", "rate").distinct().collect()}
    for v in rates.values():
        assert v == pytest.approx(0.25)
    assert abs(out.count() - 100) < 40
