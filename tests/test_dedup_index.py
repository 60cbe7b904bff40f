"""Incremental near-dup dedup against a stored minhash signature index."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.dedup_index import (
    dedup_against_index,
    minhash_index_append,
    minhash_index_write,
    read_index_params,
)


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "machine learning models require large amounts of training data"),
    (2, "distributed systems tolerate partial failures through replication"),
    (3, "a completely different document about cooking pasta with tomatoes"),
    (4, "spark executes declarative plans through catalyst and tungsten"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_index_dedup_detects_planted_clones(spark, tmp_path):
    path = str(tmp_path / "idx")
    minhash_index_write(
        _df(spark, CORPUS), path, num_hashes=16, bands=8, shingle_n=1
    )
    assert read_index_params(path)["bands"] == 8
    batch = _df(spark, [
        # near-clone of doc 0 (one word changed)
        (100, "the quick brown fox jumps over the lazy cat near the river bank"),
        # exact clone of doc 2
        (101, "distributed systems tolerate partial failures through replication"),
        # fresh content — must NOT match
        (102, "quantum chemistry basis sets converge slowly with excitation order"),
    ])
    got = {r.doc_id: (r.dup_of, r.est_jaccard)
           for r in dedup_against_index(batch, path, threshold=0.5).collect()}
    assert got[100][0] == 0 and got[100][1] >= 0.5
    assert got[101] == (2, 1.0)
    assert 102 not in got


def test_index_append_extends_coverage(spark, tmp_path):
    path = str(tmp_path / "idx")
    minhash_index_write(
        _df(spark, CORPUS), path, num_hashes=16, bands=8, shingle_n=1
    )
    fresh = (200, "completely novel sentence about underwater basket weaving contests")
    assert dedup_against_index(_df(spark, [fresh]), path).count() == 0
    minhash_index_append(_df(spark, [fresh]), path)
    # a clone of the appended doc now matches it
    clone = (201, "completely novel sentence about underwater basket weaving contests")
    got = dedup_against_index(_df(spark, [clone]), path).collect()
    assert len(got) == 1 and got[0].dup_of == 200 and got[0].est_jaccard == 1.0


def test_redelivered_doc_does_not_match_itself(spark, tmp_path):
    path = str(tmp_path / "idx")
    minhash_index_write(
        _df(spark, CORPUS), path, num_hashes=16, bands=8, shingle_n=1
    )
    # the same (id, text) arrives again: its only qualifying match is doc 1
    # itself, which is excluded; nothing else is near it
    redelivered = _df(spark, [CORPUS[1]])
    assert dedup_against_index(redelivered, path, threshold=0.5).count() == 0


def test_best_match_ties_break_to_smallest_id(spark, tmp_path):
    path = str(tmp_path / "idx")
    dup_text = "identical duplicated content stored twice in the corpus today"
    minhash_index_write(
        _df(spark, [(10, dup_text), (11, dup_text)]), path,
        num_hashes=16, bands=8, shingle_n=1,
    )
    got = dedup_against_index(_df(spark, [(300, dup_text)]), path).collect()
    assert len(got) == 1 and got[0].dup_of == 10 and got[0].est_jaccard == 1.0


def test_string_id_ties_break_to_smallest_id(spark, tmp_path):
    # the tie-break must not assume numeric ids (no unary negation of the
    # id column — that would cast a string to double and yield NULL)
    path = str(tmp_path / "idx")
    dup_text = "identical duplicated content stored twice in the corpus today"
    corpus = spark.createDataFrame(
        [("doc-b", dup_text), ("doc-a", dup_text)], "doc_id string, text string"
    )
    minhash_index_write(corpus, path, num_hashes=16, bands=8, shingle_n=1)
    batch = spark.createDataFrame(
        [("doc-z", dup_text)], "doc_id string, text string"
    )
    got = dedup_against_index(batch, path).collect()
    assert len(got) == 1
    assert got[0].dup_of == "doc-a" and got[0].est_jaccard == 1.0


def test_probe_prunes_bucket_partitions_and_gates_broadcast(spark, tmp_path):
    from kafka_connect_gcs_spark.plans.inspect import explain_str

    path = str(tmp_path / "idx")
    minhash_index_write(
        _df(spark, CORPUS), path, num_hashes=16, bands=8, shingle_n=1,
        bucket_parts=16,
    )
    assert read_index_params(path)["bucket_parts"] == 16
    batch = _df(spark, [
        # near-clone of doc 0 → non-empty candidate set, so the gated path
        # has a real relation to (not) broadcast
        (100, "the quick brown fox jumps over the lazy cat near the river bank"),
    ])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # above the gate: no broadcast hint anywhere — with auto-broadcast
        # disabled the joins must all be shuffle joins (run first, and clear
        # caches between probes: the cache manager matches relations across
        # calls hint-insensitively, so a prior call's compiled plan would
        # leak into this explain)
        spark.catalog.clearCache()
        lazy0 = dedup_against_index(
            batch, path, max_broadcast_rows=0, eager=False
        )
        assert "BroadcastHashJoin" not in explain_str(lazy0)
        # small batch: hinted broadcast joins + static bucket_part pruning
        spark.catalog.clearCache()
        lazy = dedup_against_index(batch, path, eager=False)
        txt = explain_str(lazy)
        assert "BroadcastHashJoin" in txt
        assert "PartitionFilters" in txt and "bucket_part" in txt.split(
            "PartitionFilters", 1
        )[1][:400]
        spark.catalog.clearCache()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # both paths produce the identical (correct) result
    small = {(r.doc_id, r.dup_of) for r in dedup_against_index(batch, path).collect()}
    big = {
        (r.doc_id, r.dup_of)
        for r in dedup_against_index(batch, path, max_broadcast_rows=0).collect()
    }
    assert small == big == {(100, 0)}


def test_legacy_index_without_bucket_parts_still_probes(spark, tmp_path):
    import json
    import os

    path = str(tmp_path / "idx")
    minhash_index_write(
        _df(spark, CORPUS), path, num_hashes=16, bands=8, shingle_n=1,
        bucket_parts=0,
    )
    # layout written with bucket_parts=0 has no bucket_part column at all
    assert "bucket_parts" in read_index_params(path)
    with open(os.path.join(path, "params.json")) as f:
        p = json.load(f)
    del p["bucket_parts"]  # simulate an index written before the field existed
    with open(os.path.join(path, "params.json"), "w") as f:
        json.dump(p, f)
    batch = _df(spark, [
        (101, "distributed systems tolerate partial failures through replication"),
    ])
    got = dedup_against_index(batch, path, threshold=0.5).collect()
    assert len(got) == 1 and got[0].dup_of == 2 and got[0].est_jaccard == 1.0
