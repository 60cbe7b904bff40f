"""Text normalization — the first stage of every web-scale curation
pipeline: Unicode normal forms (NFC/NFKC/NFD/NFKD), control-character
stripping, and whitespace collapsing.

Shape at 100 TB: the whole operator is ONE map-only projection — no
shuffle, no aggregation, nothing driver-side (plan-asserted in
tests/test_normalize.py). The Unicode normal form is the one step
Catalyst genuinely cannot express, so it runs as an Arrow-batched pandas
UDF whose body is ``Series.str.normalize`` (the C-implemented
``unicodedata.normalize`` over the batch — this container's pyarrow
16 ``utf8_normalize`` kernel lacks canonical COMPOSITION, verified:
NFC('e'+U+0301) stays decomposed, so it cannot implement NFC/NFKC); the
control-char strip and whitespace collapse stay JVM-side codegen
(``regexp_replace``).

Determinism: NFC is a pure function of the input string, identical across
ICU/utf8proc implementations for assigned codepoints, so the driver query
``normalize_text`` is replayed exactly by DuckDB's ``nfc_normalize``
(DuckDB exposes NFC only — the other forms are covered by unicodedata
parity tests instead).

No reference analog (the connector moves opaque bytes); part of the
training-data-pipeline surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: C0 controls except \t \n \r, plus DEL — the characters quality
#: pipelines treat as encoding damage rather than content
_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def strip_control_chars(col: Column) -> Column:
    """Remove C0 control characters (keeping tab/newline/CR) and DEL —
    pure JVM-side ``regexp_replace``."""
    return F.regexp_replace(col, _CONTROL_RE, "")


def collapse_whitespace(col: Column) -> Column:
    """Collapse every whitespace run to a single space and trim the
    ends — pure JVM-side expression."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def unicode_normalize(form: str = "NFC"):
    """An Arrow-batched pandas UDF applying the Unicode normal form
    ``form`` via ``Series.str.normalize`` (C ``unicodedata.normalize``
    per element — no Python-level loop body). Nulls pass through as
    nulls."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}: {form}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return _norm


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    form: "str | None" = "NFC",
    strip_control: bool = True,
    collapse_ws: bool = True,
    lowercase: bool = False,
) -> DataFrame:
    """Append ``out_col`` = the normalized form of ``text_col``.

    Steps (each optional, applied in this order): Unicode normal form →
    control-char strip → whitespace collapse → lowercase. One map-only
    projection; every step but the normal form is codegen'd JVM
    expression, and the normal form is one vectorized Arrow kernel per
    batch.
    """
    col: Column = F.col(text_col)
    if form is not None:
        col = unicode_normalize(form)(col)
    if strip_control:
        col = strip_control_chars(col)
    if collapse_ws:
        col = collapse_whitespace(col)
    if lowercase:
        col = F.lower(col)
    return df.withColumn(out_col, col)
