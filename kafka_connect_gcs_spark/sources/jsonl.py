"""JSONL corpus ingestion with schema pinning and corrupt-line quarantine.

JSONL is the lingua franca of LLM training corpora (one JSON document per
line). Reading it at 100 TB needs the same discipline the reference
applies to its byte formats: a PINNED schema (never schema inference — an
inference pass is a full extra scan and yields drifting types across
drops), and malformed lines QUARANTINED rather than nulled or crashed —
the file-format twin of the engine's type-gate validation quarantine
(operators/validate.py, A16).

Parsing is ``from_json`` with an explicit corrupt-record column — one
JVM-side projection, no Python, no extra scan. The writer is the exact
inverse (``to_json`` of the pinned struct), so write → read round-trips
byte-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: name of the synthetic column that captures the raw text of a line that
#: failed to parse against the pinned schema
CORRUPT_COL = "_corrupt_line"


def parse_jsonl(
    df: DataFrame,
    schema: T.StructType,
    text_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Split a string-column DataFrame into ``(good, quarantined)``.

    ``good`` carries the schema's columns; ``quarantined`` carries the
    raw offending line (plus any passthrough columns), mirroring the
    validation quarantine's keep-everything-diagnosable rule.
    """
    if CORRUPT_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not already contain {CORRUPT_COL}")
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = df.withColumn(
        "_p",
        F.from_json(
            F.col(text_col),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    passthrough = [c for c in df.columns if c != text_col]
    good = parsed.where(
        F.col(f"_p.{CORRUPT_COL}").isNull() & F.col("_p").isNotNull()
    ).select(
        *passthrough, *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.where(
        F.col(f"_p.{CORRUPT_COL}").isNotNull() | F.col("_p").isNull()
    ).select(*passthrough, F.col(text_col).alias("raw"))
    return good, bad


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL files under ``path`` → ``(good, quarantined)``. One
    text scan + one projection; the pinned schema means column pruning
    and filter pushdown behave exactly as for any other source."""
    return parse_jsonl(spark.read.text(path), schema)


def to_jsonl_lines(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Serialize rows to one JSON string per row (column ``value``)."""
    names = cols or df.columns
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in names])).alias("value")
    )


def write_jsonl(df: DataFrame, path: str, cols: list[str] | None = None) -> None:
    """Write ``df`` as JSONL text files (the exact inverse of
    :func:`read_jsonl` under the same schema)."""
    to_jsonl_lines(df, cols).write.mode("overwrite").text(path)
