"""The composed curation micro-batch loop (streaming/curation.py):
gate → exact dedup → index probe → index append → table commit, with
crash/resume probes at each dangerous window.

The headline scenario: two near-duplicate docs arrive in ONE batch, the
process dies between the index append and the table commit, and the
replay must still land BOTH in the table (without the exclude-marker
protocol each would match the other's orphaned index rows and both would
be silently dropped)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.streaming.curation import CurationPipeline, FailPoint

# quality-gate-passing filler prose (distinct enough not to near-dup)
GOOD = [
    "The quick brown fox jumps over the lazy dog near the quiet river bank today.",
    "A completely different sentence about compilers, lexers and parsing theory notes.",
    "Market gardens in the valley produce heirloom tomatoes and sweet basil each summer.",
    "Deep learning models require careful regularization to avoid memorizing noise patterns.",
    "The committee approved the annual budget after a long discussion about infrastructure.",
]
NEAR_A = (
    "Distributed systems need careful clock synchronization to order events correctly "
    "across many machines in a large cluster deployment today."
)
NEAR_B = (
    "Distributed systems need careful clock synchronization to order events correctly "
    "across many machines in a large cluster deployment tomorrow."
)


def _write_seg(spark, feed, seg, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{feed}/seg={seg:04d}")


def _pipe(spark, tmp_path, **kw):
    return CurationPipeline(
        spark,
        feed_path=str(tmp_path / "feed"),
        table_path=str(tmp_path / "table"),
        index_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_batch=1,
        index_params={
            "num_hashes": 16,
            "bands": 4,
            "shingle_n": 3,
            "portable": False,
            "bucket_parts": 8,
        },
        **kw,
    )


def _table_ids(pipe):
    return sorted(r.doc_id for r in pipe.read_table().select("doc_id").collect())


def test_end_to_end_lineage_counts(spark, tmp_path):
    """One batch with one of everything: a gate-dropped doc, an exact dup,
    a near-dup of an already-indexed doc, and clean survivors."""
    feed = str(tmp_path / "feed")
    _write_seg(spark, feed, 0, [(1, GOOD[0], "web"), (2, GOOD[1], "web")])
    _write_seg(
        spark,
        feed,
        1,
        [
            (10, GOOD[2], "web"),          # survivor
            (11, "too short", "web"),      # gate: too_short
            (12, GOOD[2], "web"),          # exact dup of 10 (same batch)
            (13, GOOD[0] + " today", "web"),  # near-dup of indexed doc 1
        ],
    )
    pipe = _pipe(spark, tmp_path)
    out = pipe.run_available()
    assert len(out) == 2
    l0, l1 = out
    assert (l0["events_in"], l0["appended"]) == (2, 2)
    assert l1["events_in"] == 4
    assert l1["gate_dropped"] == 1
    assert l1["exact_dup_dropped"] == 1
    assert l1["neardup_dropped"] == 1
    assert l1["appended"] == 1
    assert _table_ids(pipe) == [1, 2, 10]
    # lineage rows were persisted to the checkpoint log
    assert [r["batch_id"] for r in pipe.ckpt.lineage()] == [
        "seg=0000..seg=0000",
        "seg=0001..seg=0001",
    ]
    # idempotence: nothing left to do
    assert pipe.run_available() == []
    assert _table_ids(pipe) == [1, 2, 10]


@pytest.mark.parametrize(
    "failpoint",
    ["before_index_append", "after_index_append", "after_table_commit"],
)
def test_crash_resume_no_dup_no_loss(spark, tmp_path, failpoint):
    """Kill the batch at each dangerous window; a fresh pipeline resumes
    with no duplicates and no loss. The after_index_append window is the
    two-sink race: index updated, table not."""
    feed = str(tmp_path / "feed")
    _write_seg(spark, feed, 0, [(1, GOOD[0], "web")])
    _write_seg(spark, feed, 1, [(20, GOOD[3], "web"), (21, GOOD[4], "web")])
    pipe = _pipe(spark, tmp_path)
    assert [l["appended"] for l in pipe.run_available(max_batches=1)] == [1]

    pipe.failpoints.add(failpoint)
    with pytest.raises(FailPoint):
        pipe.run_available()

    resumed = _pipe(spark, tmp_path)  # fresh process analog
    out = resumed.run_available()
    assert [l["batch_id"] for l in out] == ["seg=0001..seg=0001"]
    assert out[0]["appended"] == 2
    assert out[0]["neardup_dropped"] == 0  # replay saw the pre-append state
    assert _table_ids(resumed) == [1, 20, 21]
    assert resumed.run_available() == []


def test_crash_between_sinks_keeps_both_near_dups(spark, tmp_path):
    """THE scenario the exclude-marker protocol exists for: two near-dup
    docs in one batch, crash after the index append — the replay's probe
    must not let them drop each other."""
    feed = str(tmp_path / "feed")
    _write_seg(
        spark, feed, 0, [(100, NEAR_A, "web"), (101, NEAR_B, "web")]
    )
    pipe = _pipe(spark, tmp_path)
    pipe.failpoints.add("after_index_append")
    with pytest.raises(FailPoint):
        pipe.run_available()

    resumed = _pipe(spark, tmp_path)
    out = resumed.run_available()
    assert out[0]["appended"] == 2 and out[0]["neardup_dropped"] == 0
    assert _table_ids(resumed) == [100, 101]

    # and the index really works: a later near-dup of either is dropped
    _write_seg(
        spark, feed, 1, [(102, NEAR_A.replace("today", "yesterday"), "web")]
    )
    out2 = resumed.run_available()
    assert out2[0]["neardup_dropped"] == 1 and out2[0]["appended"] == 0
    assert _table_ids(resumed) == [100, 101]


def test_crash_mid_index_rows_is_replay_safe(spark, tmp_path, monkeypatch):
    """Crash INSIDE the index append (rows written, done-marker not):
    replay re-appends; the duplicate index rows change no decision and the
    table still gets every survivor exactly once."""
    import kafka_connect_gcs_spark.operators.dedup_index as di

    feed = str(tmp_path / "feed")
    _write_seg(spark, feed, 0, [(100, NEAR_A, "web"), (101, NEAR_B, "web")])
    pipe = _pipe(spark, tmp_path)

    real = di._write_batch_marker

    def dying_marker(path, batch_id, payload):
        if payload.get("done"):  # rows are on disk, done flag never lands
            raise FailPoint("mid_index_rows")
        real(path, batch_id, payload)

    monkeypatch.setattr(di, "_write_batch_marker", dying_marker)
    with pytest.raises(FailPoint):
        pipe.run_available()
    monkeypatch.setattr(di, "_write_batch_marker", real)

    resumed = _pipe(spark, tmp_path)
    out = resumed.run_available()
    assert out[0]["appended"] == 2 and out[0]["neardup_dropped"] == 0
    assert _table_ids(resumed) == [100, 101]


def test_structured_streaming_twin_parity(spark, tmp_path):
    """run_structured_curation drives the SAME run_batch_df plan through a
    Structured Streaming file tail: final table contents and lineage
    totals match the explicit loop over an identical feed, and a second
    availableNow invocation is a no-op (zero epochs, table unchanged)."""
    from kafka_connect_gcs_spark.streaming.curation import run_structured_curation

    feed = str(tmp_path / "feed")
    _write_seg(spark, feed, 0, [(1, GOOD[0], "web"), (2, GOOD[1], "web")])
    _write_seg(
        spark,
        feed,
        1,
        [
            (10, GOOD[2], "web"),             # survivor
            (11, "too short", "web"),         # gate drop
            (12, GOOD[2], "web"),             # exact dup of 10
            (13, GOOD[0] + " today", "web"),  # near-dup of doc 1
        ],
    )
    loop = _pipe(spark, tmp_path)
    loop_lineage = loop.run_available()

    ss = CurationPipeline(
        spark,
        feed_path=feed,
        table_path=str(tmp_path / "ss_table"),
        index_path=str(tmp_path / "ss_index"),
        checkpoint_path=str(tmp_path / "ss_ckpt"),
        max_files_per_batch=1,
        index_params={
            "num_hashes": 16,
            "bands": 4,
            "shingle_n": 3,
            "portable": False,
            "bucket_parts": 8,
        },
    )
    ss_lineage = run_structured_curation(ss)

    assert _table_ids(ss) == _table_ids(loop) == [1, 2, 10]
    keys = ("events_in", "gate_dropped", "exact_dup_dropped",
            "neardup_dropped", "appended")
    totals = lambda ls: {k: sum(l[k] for l in ls) for k in keys}  # noqa: E731
    assert totals(ss_lineage) == totals(loop_lineage)
    # ss batch ids are epoch-derived and logged durably
    assert [l["batch_id"] for l in ss.ckpt.lineage()] == ["ss-0", "ss-1"]

    # availableNow idempotence: drained feed -> zero epochs, no new rows
    again = run_structured_curation(ss)
    assert again == []
    assert _table_ids(ss) == [1, 2, 10]
