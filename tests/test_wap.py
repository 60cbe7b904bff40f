"""Write–audit–publish gating (icebox/wap.py): consumers pinned to the
published ref, audits over the incremental changelog, fast-forward-only
semantics."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_gcs_spark.icebox.table import IceboxTable  # noqa: E402
from kafka_connect_gcs_spark.icebox.wap import (  # noqa: E402
    AuditFailed,
    audit_and_publish,
    publish,
    published_version,
    read_published,
)
from kafka_connect_gcs_spark.operators.merge import (  # noqa: E402
    CDC_TABLE_FIELDS,
    merge_into,
)


def _mk(spark, tmp):
    return IceboxTable.create(spark, os.path.join(tmp, "t"), CDC_TABLE_FIELDS)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, op string, offset long, tokens array<int>, "
        "n_tok int, source string",
    )


def _live_count(df):
    return df.where(~F.coalesce(F.col("deleted"), F.lit(False))).count()


def test_consumers_see_only_published(spark, tmp_path):
    t = _mk(spark, str(tmp_path))
    merge_into(t, _batch(spark, [("a", "U", 1, [1], 1, "s")]), "b0")
    # nothing published: consumers see an empty table, log has the rows
    assert published_version(t) == 0
    assert _live_count(read_published(t)) == 0
    assert _live_count(t.read()) == 1
    publish(t)
    assert _live_count(read_published(t)) == 1
    # next unpublished batch stays invisible
    merge_into(t, _batch(spark, [("b", "U", 2, [2], 1, "s")]), "b1")
    assert _live_count(read_published(t)) == 1


def test_audit_veto_keeps_ref_and_reports_reasons(spark, tmp_path):
    t = _mk(spark, str(tmp_path))
    merge_into(t, _batch(spark, [("a", "U", 1, [1], 1, "s")]), "b0")
    audit_and_publish(t, [lambda ch: True])
    v_good = published_version(t)
    # a batch that deletes everything — the audit must veto it
    merge_into(t, _batch(spark, [("a", "D", 9, None, None, "s")]), "b1")

    def no_mass_deletes(ch):
        total = ch.count()
        dels = ch.where(F.col("change") == "D").count()
        return "!mass-delete" if total and dels / total > 0.5 else True

    with pytest.raises(AuditFailed, match="mass-delete"):
        audit_and_publish(t, [no_mass_deletes])
    assert published_version(t) == v_good
    assert _live_count(read_published(t)) == 1  # consumers unaffected
    # operator override after investigation: explicit publish
    publish(t)
    assert _live_count(read_published(t)) == 0


def test_fast_forward_only_and_idempotent(spark, tmp_path):
    t = _mk(spark, str(tmp_path))
    merge_into(t, _batch(spark, [("a", "U", 1, [1], 1, "s")]), "b0")
    v = publish(t)
    assert publish(t) == v  # same head: no-op
    with pytest.raises(ValueError):
        publish(t, v - 1)
    res = audit_and_publish(t, [lambda ch: True])
    assert res.get("skipped") is True


def test_audit_sees_only_the_incremental_changes(spark, tmp_path):
    t = _mk(spark, str(tmp_path))
    merge_into(t, _batch(spark, [("a", "U", 1, [1], 1, "s"),
                                 ("b", "U", 2, [2], 1, "s")]), "b0")
    audit_and_publish(t, [lambda ch: True])
    merge_into(t, _batch(spark, [("c", "U", 3, [3], 1, "s")]), "b1")
    seen = {}

    def capture(ch):
        seen["rows"] = sorted(r["doc_id"] for r in ch.collect())
        return True

    audit_and_publish(t, [capture])
    assert seen["rows"] == ["c"]  # a, b were already published


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
