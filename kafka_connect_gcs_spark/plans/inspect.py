"""Physical-plan inspection helpers.

The reference has no optimizer — its §4 "physical tricks" are hand-coded
(file pruning by key order, chunk-index seeks, lazy iterators). In the new
engine those jobs belong to Catalyst, and THESE helpers are how we verify
Catalyst actually did them: tests assert that filters reach the parquet
scan (PushedFilters), projections prune columns (ReadSchema), small dims
broadcast, and aggregations run partially map-side.

Used by tests/test_plans.py and handy at a REPL:
    from kafka_connect_gcs_spark.plans.inspect import explain_str, assert_pushed_filter
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (data-skipping at the source,
    the analog of the reference's chunk-index seek, GCSFilesReader.java:278-297)."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read from each parquet scan (column pruning)."""
    txt = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """True if the plan contains a map-side (partial) aggregation — the
    property that makes hot-key dedup skew-resistant."""
    txt = explain_str(df)
    return "partial_" in txt or "HashAggregate(keys" in txt


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages. With AQE enabled the markers
    only exist in the FINAL (executed) plan, so execute once through the
    noop sink (no collect, no output) and read the formatted plan."""
    df.collect()  # a write command would spawn its own queryExecution;
    # collect executes THIS df's qe so its final AQE plan carries the ids
    txt = explain_str(df)
    ids = set(re.findall(r"codegen id : (\d+)", txt))
    if ids:
        return len(ids)
    txt2 = explain_str(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", txt2)
    return int(m.group(1)) if m else 0


def num_python_udf_nodes(df: DataFrame) -> int:
    """Row-at-a-time Python evaluation nodes in the plan. The input_hint
    demands zero in hot paths (Arrow/pandas nodes show as ArrowEvalPython /
    MapInPandas and are allowed)."""
    txt = explain_str(df)
    return len(re.findall(r"BatchEvalPython", txt))
