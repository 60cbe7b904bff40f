"""Incremental changelog reads (icebox/changes.py): the candidate-
restricted diff must equal a naive full-state diff at every version step,
for BOTH merge modes, and replaying the changelog must reconstruct the
final state."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_gcs_spark.config import EngineConfig  # noqa: E402
from kafka_connect_gcs_spark.icebox.changes import table_changes  # noqa: E402
from kafka_connect_gcs_spark.icebox.table import IceboxTable  # noqa: E402
from kafka_connect_gcs_spark.sources.binlog import (  # noqa: E402
    BinlogSpec,
    write_feed,
)
from kafka_connect_gcs_spark.streaming.pipeline import CdcPipeline  # noqa: E402

SPEC = BinlogSpec(
    num_events=4_000,
    num_docs=500,
    seed=23,
    num_partitions=4,
    min_tokens=4,
    max_tokens=12,
)


def _build(spark, tmp, mode):
    feed = os.path.join(tmp, "feed")
    write_feed(spark, SPEC, feed, 6)
    cfg = EngineConfig(
        table_path=os.path.join(tmp, "table"),
        feed_path=feed,
        checkpoint_path=os.path.join(tmp, "ckpt"),
        max_files_per_batch=2,
        merge_mode=mode,
    )
    pipe = CdcPipeline(spark, cfg)
    versions = [pipe.table.current_version()]
    while True:
        done = pipe.run_available(max_batches=1)
        if not done:
            break
        v = pipe.table.current_version()
        if v != versions[-1]:
            versions.append(v)
    return pipe.table, versions


def _naive_diff(spark, table, va, vb):
    """Full-state diff with the same I/U/D classification — no candidate
    restriction, so it catches any candidate-set hole."""
    live = lambda df: df.where(  # noqa: E731
        ~F.coalesce(F.col("deleted"), F.lit(False))
    )
    a = live(table.read(va)).select("doc_id", F.col("last_offset").alias("ao"))
    b = live(table.read(vb)).select("doc_id", F.col("last_offset").alias("bo"))
    j = a.join(b, "doc_id", "full_outer")
    return {
        (
            r["doc_id"],
            "I" if r["ao"] is None else ("D" if r["bo"] is None else "U"),
        )
        for r in j.collect()
        if r["ao"] is None or r["bo"] is None or r["ao"] != r["bo"]
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_changes_match_naive_diff_each_step(spark, tmp_path, mode):
    table, versions = _build(spark, str(tmp_path), mode)
    assert len(versions) >= 3
    for va, vb in zip(versions, versions[1:]):
        got = {
            (r["doc_id"], r["change"])
            for r in table_changes(table, va, vb).collect()
        }
        assert got == _naive_diff(spark, table, va, vb), (mode, va, vb)


def test_changes_compose_to_final_state(spark, tmp_path):
    table, versions = _build(spark, str(tmp_path), "auto")
    v0, vn = versions[0], versions[-1]
    ch = table_changes(table, v0, vn)
    # replay: start from the v0 live state, apply I/U upserts and D drops
    base = table.read(v0).where(
        ~F.coalesce(F.col("deleted"), F.lit(False))
    ).select("doc_id", F.col("last_offset").alias("offset"))
    ups = ch.where(F.col("change") != "D").select(
        "doc_id", F.col("new_offset").alias("offset")
    )
    drops = ch.where(F.col("change") == "D").select("doc_id")
    replayed = (
        base.join(ups.select("doc_id"), "doc_id", "left_anti")
        .unionByName(ups)
        .join(drops, "doc_id", "left_anti")
    )
    final = table.read(vn).where(
        ~F.coalesce(F.col("deleted"), F.lit(False))
    ).select("doc_id", F.col("last_offset").alias("offset"))
    got = sorted(map(tuple, replayed.collect()))
    want = sorted(map(tuple, final.collect()))
    assert got == want


def test_empty_step_and_validation(spark, tmp_path):
    table, versions = _build(spark, str(tmp_path), "cow")
    v = versions[-1]
    assert table_changes(table, v, v).count() == 0
    with pytest.raises(ValueError):
        table_changes(table, v, v - 1)


def test_changes_across_schema_evolution(spark, tmp_path):
    table, versions = _build(spark, str(tmp_path), "cow")
    v_before = table.current_version()
    from kafka_connect_gcs_spark.icebox.table import Field
    from kafka_connect_gcs_spark.operators.merge import CDC_TABLE_FIELDS

    table.evolve_schema(tuple(CDC_TABLE_FIELDS) + (Field("lang", "string"),))
    v_after = table.current_version()
    ch = table_changes(table, v_before, v_after)
    assert "lang" in ch.columns
    assert ch.count() == 0  # schema-only commit changes no rows


# -- changelog tail (downstream consumer cursor) ------------------------------


def test_changelog_tail_consume_then_commit(spark, tmp_path):
    from kafka_connect_gcs_spark.icebox.changes import ChangelogTail

    table, versions = _build(spark, str(tmp_path), "auto")
    tail = ChangelogTail(table, str(tmp_path / "cursors"))
    # first poll sees EVERYTHING since v0
    ch, to = tail.poll()
    n_first = ch.count()
    assert to == versions[-1] and n_first > 0
    # crash before advance: a fresh tail re-polls the identical window
    tail2 = ChangelogTail(table, str(tmp_path / "cursors"))
    ch2, to2 = tail2.poll()
    assert to2 == to and ch2.count() == n_first
    tail2.advance(to2)
    assert tail2.poll() is None  # caught up
    # advance without a matching poll is rejected
    with pytest.raises(ValueError):
        tail2.advance(to2 + 1)
    # a new commit wakes the tail with ONLY the new delta
    from kafka_connect_gcs_spark.operators.merge import merge_into

    extra = spark.createDataFrame(
        [("zzz-new", "U", 10_000_000, [1, 2], 2, "s")],
        "doc_id string, op string, offset long, tokens array<int>, "
        "n_tok int, source string",
    )
    merge_into(table, extra, "tail-extra")
    ch3, to3 = tail2.poll()
    rows = ch3.collect()
    assert [(r["change"], r["doc_id"]) for r in rows] == [("I", "zzz-new")]
    tail2.advance(to3)
    assert tail2.poll() is None


def test_two_independent_consumers(spark, tmp_path):
    from kafka_connect_gcs_spark.icebox.changes import ChangelogTail

    table, _versions = _build(spark, str(tmp_path), "cow")
    a = ChangelogTail(table, str(tmp_path / "cursors"), name="a")
    b = ChangelogTail(table, str(tmp_path / "cursors"), name="b")
    ch_a, to_a = a.poll()
    a.advance(to_a)
    # b's cursor is untouched by a's progress
    ch_b, to_b = b.poll()
    assert to_b == to_a and ch_b.count() == ch_a.count()


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
