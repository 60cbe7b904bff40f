"""JSONL ingestion (sources/jsonl.py): schema-pinned parse, corrupt-line
quarantine, write→read round-trip."""

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_gcs_spark.sources.jsonl import (  # noqa: E402
    CORRUPT_COL,
    parse_jsonl,
    read_jsonl,
    to_jsonl_lines,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_good_bad_split_and_raw_capture(spark):
    lines = [
        ('{"doc_id": 1, "text": "hello", "lang": "en"}',),
        ('{"doc_id": 2, "text": "welt", "lang"',),  # truncated
        ("not json at all",),
        ('{"doc_id": 3, "text": null, "lang": "fr"}',),  # null field is FINE
        ('{"doc_id": "x", "text": "bad type", "lang": "en"}',),  # type gate
    ]
    df = spark.createDataFrame(lines, "value string")
    good, bad = parse_jsonl(df, SCHEMA)
    g = {r["doc_id"]: r for r in good.collect()}
    assert set(g) == {1, 3}
    assert g[3]["text"] is None and g[3]["lang"] == "fr"
    raws = sorted(r["raw"] for r in bad.collect())
    assert raws == sorted(
        [lines[1][0], lines[2][0], lines[4][0]]
    )


def test_roundtrip_through_files(spark, tmp_path):
    rows = [(i, f"text {i} é", ["en", "de"][i % 2]) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    p = str(tmp_path / "corpus")
    write_jsonl(df, p)
    good, bad = read_jsonl(spark, p, SCHEMA)
    assert bad.count() == 0
    assert sorted(map(tuple, good.collect())) == sorted(rows)


def test_passthrough_columns_survive(spark):
    df = spark.createDataFrame(
        [("f1", '{"doc_id": 7, "text": "t", "lang": "en"}'), ("f1", "junk")],
        "src string, value string",
    )
    good, bad = parse_jsonl(df, SCHEMA)
    assert good.columns == ["src", "doc_id", "text", "lang"]
    assert bad.collect()[0]["src"] == "f1"


def test_schema_reserved_name_rejected(spark):
    s = T.StructType([T.StructField(CORRUPT_COL, T.StringType())])
    df = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(ValueError):
        parse_jsonl(df, s)


def test_parse_is_map_only(spark):
    df = spark.createDataFrame([('{"doc_id":1}',)], "value string")
    good, _ = parse_jsonl(df, SCHEMA)
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
