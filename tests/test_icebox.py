"""Icebox table format: commits, time travel, schema evolution, pruning.

Ports the reference's storage-layer invariants: exact index/cursor contents
(system_test/run.py:214-221), restart produces no duplicates (run.py:223-257),
resume skips whole files by key order (GCSFilesReader.java:173-181 →
manifest range pruning here).
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.icebox.table import (
    CommitConflict,
    Field,
    IceboxTable,
)

FIELDS = (
    Field("doc_id", "string"),
    Field("tokens", "array<int>"),
    Field("n_tok", "int"),
    Field("source", "string"),
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    return IceboxTable.create(spark, str(tmp_path / "t"), FIELDS)


def _append(table, df, batch_id):
    m = table.write_data_files(df, batch_id)
    return table.commit(batch_id, "append", table.snapshot().manifests, m)


def test_append_read_roundtrip_and_manifest_stats(spark, table):
    rows = [(f"doc{i:03d}", [i, i + 1], 2, "web") for i in range(100)]
    _append(table, _df(spark, rows), "b1")
    got = sorted((r.doc_id, tuple(r.tokens)) for r in table.read().collect())
    assert got == [(d, tuple(t)) for d, t, _, _ in rows]
    snap = table.snapshot()
    assert sum(m.num_records for m in snap.manifests) == 100
    for m in snap.manifests:
        assert m.min_doc_id is not None and m.min_doc_id <= m.max_doc_id


def test_manifest_pruning_reads_only_overlapping_files(spark, table):
    rows = [(f"doc{i:03d}", [i], 1, "web") for i in range(100)]
    _append(table, _df(spark, rows).repartitionByRange(4, F.col("doc_id")), "b1")
    snap = table.snapshot()
    assert len(snap.manifests) >= 3  # range-partitioned into several files
    pruned = [m for m in snap.manifests if m.overlaps_keys("doc000", "doc010")]
    assert len(pruned) < len(snap.manifests)
    got = table.read(key_range=("doc000", "doc010")).collect()
    assert {r.doc_id for r in got} >= {f"doc{i:03d}" for i in range(11)}


def test_time_travel(spark, table):
    _append(table, _df(spark, [("a", [1], 1, "web")]), "b1")
    v1 = table.current_version()
    _append(table, _df(spark, [("b", [2], 1, "web")]), "b2")
    assert table.read(version=v1).count() == 1
    assert table.read().count() == 2
    hist = table.history()
    assert [h["operation"] for h in hist] == ["create", "append", "append"]


def test_replayed_batch_id_is_noop(spark, table):
    _append(table, _df(spark, [("a", [1], 1, "web")]), "b1")
    v = table.current_version()
    # a replayed commit with the same batch_id is a committed no-op
    got = table.commit("b1", "append", table.snapshot().manifests, ())
    assert got == v
    # and re-WRITING data for a committed batch is refused outright: it
    # would clobber files the live snapshot points to
    with pytest.raises(ValueError, match="already committed"):
        table.write_data_files(_df(spark, [("zzz", [9], 1, "web")]), "b1")
    assert table.read().count() == 1


def test_commit_conflict_detected(spark, table):
    v = table.current_version()
    _append(table, _df(spark, [("a", [1], 1, "web")]), "b1")
    with pytest.raises(CommitConflict):
        table.commit("b2", "append", (), (), expected_version=v)


def test_schema_evolution_add_column_and_widen(spark, table):
    """Old files (pre-evolution) and new files coexist; reads null-fill the
    new column and widen n_tok int→long without rewriting anything."""
    _append(table, _df(spark, [("a", [1, 2], 2, "web")]), "b1")
    old_files = {m.path for m in table.snapshot().manifests}

    new_fields = (
        Field("doc_id", "string"),
        Field("tokens", "array<int>"),
        Field("n_tok", "long"),  # widened
        Field("source", "string"),
        Field("lang", "string"),  # added
    )
    table.evolve_schema(new_fields)
    # old data files untouched
    assert {m.path for m in table.snapshot().manifests} == old_files

    new_df = spark.createDataFrame(
        [("b", [3], 1, "code", "en")],
        "doc_id string, tokens array<int>, n_tok long, source string, lang string",
    )
    m = table.write_data_files(new_df, "b2")
    table.commit("b2", "append", table.snapshot().manifests, m)

    got = {r.doc_id: r for r in table.read().collect()}
    assert got["a"].lang is None and got["b"].lang == "en"
    assert table.read().schema["n_tok"].dataType.simpleString() == "bigint"
    assert got["a"].n_tok == 2 and tuple(got["a"].tokens) == (1, 2)


def test_illegal_evolutions_rejected(spark, table):
    with pytest.raises(ValueError, match="dropped"):
        table.evolve_schema((Field("doc_id", "string"),))
    with pytest.raises(ValueError, match="illegal type change"):
        bad = list(FIELDS)
        bad[2] = Field("n_tok", "string")
        table.evolve_schema(tuple(bad))


def test_orphan_data_files_are_ignored(spark, table, tmp_path):
    """A crash between data write and pointer rename leaves orphans that
    readers never see (pointer is truth — run.py:202-218 ordering)."""
    _append(table, _df(spark, [("a", [1], 1, "web")]), "b1")
    # simulate: data written for b2 but commit never happened
    table.write_data_files(_df(spark, [("ghost", [0], 1, "web")]), "b2")
    assert table.read().where(F.col("doc_id") == "ghost").count() == 0


def test_point_lookup_prunes_files_and_finds_winner(spark, table):
    """A6 end-to-end: manifest range pruning selects the one candidate
    file; the equality predicate is pushed to parquet (row-group stats +
    the doc_id bloom filter written at flush time); result is exact."""
    from kafka_connect_gcs_spark.plans.inspect import pushed_filters

    rows = [(f"doc{i:03d}", [i], 1, "web") for i in range(200)]
    _append(table, _df(spark, rows).repartitionByRange(8, F.col("doc_id")), "b1")
    got = table.point_lookup("doc123").collect()
    assert [(r.doc_id, list(r.tokens)) for r in got] == [("doc123", [123])]
    # pruning actually happened: only overlapping files feed the scan
    snap = table.snapshot()
    cand = [m for m in snap.manifests if m.overlaps_keys("doc123", "doc123")]
    assert len(cand) < len(snap.manifests)
    # the equality predicate reaches the parquet scan
    pf = pushed_filters(table.point_lookup("doc123"))
    assert any("doc_id" in f for f in pf), pf
    # missing key: no rows, same pruned plan
    assert table.point_lookup("zzz-missing").count() == 0
