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
