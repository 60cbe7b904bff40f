"""Text normalization (operators/normalize.py): Unicode normal forms via
the Arrow kernel vs unicodedata ground truth, JVM-side control strip /
whitespace collapse, and the map-only plan contract."""

import unicodedata

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.normalize import (
    collapse_whitespace,
    normalize_text,
    strip_control_chars,
    unicode_normalize,
)

TRICKY = [
    "cafe\u0301",        # e + combining acute -> caf\u00e9 under NFC
    "\u00e9cole",         # already composed
    "\ufb01ne print",     # fi ligature -> "fine print" under NFKC only
    "\u212b ring",        # ANGSTROM SIGN -> \u00c5 under NFC
    "A\u030a",            # A + combining ring -> \u00c5
    "ascii only",
    "",
]


def _df(spark, values):
    return spark.createDataFrame([Row(t=v) for v in values], "t string")


@pytest.mark.parametrize("form", ["NFC", "NFKC", "NFD", "NFKD"])
def test_unicode_normalize_matches_unicodedata(spark, form):
    out = (
        _df(spark, TRICKY)
        .select("t", unicode_normalize(form)(F.col("t")).alias("n"))
        .collect()
    )
    for r in out:
        assert r.n == unicodedata.normalize(form, r.t), (form, r.t)


def test_unicode_normalize_null_passthrough(spark):
    got = (
        spark.createDataFrame([Row(t=None), Row(t="x")], "t string")
        .select(unicode_normalize("NFC")(F.col("t")).alias("n"))
        .collect()
    )
    assert {r.n for r in got} == {None, "x"}


def test_unicode_normalize_rejects_bad_form():
    with pytest.raises(ValueError):
        unicode_normalize("NFX")


def test_strip_control_keeps_tab_newline(spark):
    raw = "a\x00b\x01c\td\ne\x7ff"
    got = _df(spark, [raw]).select(
        strip_control_chars(F.col("t")).alias("s")
    ).collect()[0].s
    assert got == "abc\td\nef"


def test_collapse_whitespace(spark):
    got = _df(spark, ["  a \t b\n\nc  "]).select(
        collapse_whitespace(F.col("t")).alias("s")
    ).collect()[0].s
    assert got == "a b c"


def test_normalize_text_pipeline_and_idempotence(spark):
    df = _df(spark, ["  café\x01  x\ty "])
    once = normalize_text(df, "t", "n").select("n").collect()[0].n
    assert once == "caf\u00e9 x y"
    again = normalize_text(
        _df(spark, [once]), "t", "n"
    ).select("n").collect()[0].n
    assert again == once


def test_normalize_text_lowercase_option(spark):
    got = normalize_text(
        _df(spark, ["MiXeD Case"]), "t", "n", lowercase=True
    ).select("n").collect()[0].n
    assert got == "mixed case"


def test_normalize_text_is_map_only(spark):
    out = normalize_text(_df(spark, TRICKY), "t", "n")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for shuffle in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert f"Exchange {shuffle}" not in plan, plan
    assert "ArrowEvalPython" in plan or "Python" in plan  # the Arrow UDF step
