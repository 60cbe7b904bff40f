"""Span corruption for denoising objectives (T5/UL2-style).

Turns a token sequence into an ``(inputs, targets)`` pair: non-adjacent
spans are cut out of the sequence, each replaced by one sentinel id in
the inputs; the targets interleave the sentinels with the removed spans
(Raffel et al., "Exploring the Limits of Transfer Learning with a
Unified Text-to-Text Transformer", JMLR 2020, §3.1.4).

Everything is DETERMINISTIC: span starts come from a greedy left-to-right
scan over per-position uniform draws that are pure md5 hashes of
``(doc, position, seed)`` — the same portable-draw trick as
``dsir.gumbel_noise`` — so retries/AQE can't move a mask, reruns are
reproducible, and the DuckDB oracle replays the draw AND the greedy scan
exactly. The whole operator is ONE map-only projection (plan-asserted):
a single ``aggregate`` fold selects the span starts (runtime fold — no
expression-tree growth), then index-aware ``transform``s assemble inputs
and targets from slices, O(tokens + spans) per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_H60 = float(1 << 60)


def _draw(id_col: Column, i: Column, seed: int) -> Column:
    """Portable uniform in (0,1): md5-60bit of '<id>:<pos>:<seed>'."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    id_col.cast("string"),
                    F.lit(":"),
                    i.cast("string"),
                    F.lit(f":{seed}"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    return (h + F.lit(0.5)) / F.lit(_H60)


def span_corruption(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    p_start: float = 0.05,
    span_len: int = 3,
    sentinel_base: int = 100_000,
    seed: int = 0,
) -> DataFrame:
    """Append ``inputs``, ``targets`` (array<int>) and ``n_spans``.

    Greedy scan: position ``i`` starts a span iff its draw < ``p_start``,
    the whole span fits, and ``i`` lies at least one position past the
    previous span's end (the gap keeps sentinels unambiguous). Span ``k``
    is replaced by sentinel ``sentinel_base + k`` in the inputs; targets
    are ``[sent_0, span_0..., sent_1, span_1..., ...]``. With the
    defaults the expected corruption rate is ``p_start·span_len ≈ 15%``,
    the T5 recipe's mean-3 spans.
    """
    toks = F.col(tokens_col)
    n = F.size(toks)
    did = F.col(id_col)
    L = span_len

    # greedy start selection: fold positions through (starts, next_free)
    zero = F.struct(
        F.array().cast("array<int>").alias("s"),
        F.lit(0).alias("nf"),
    )
    take = lambda acc, i: (  # noqa: E731
        (i >= acc["nf"])
        & (i + L <= n)
        & (_draw(did, i, seed) < F.lit(float(p_start)))
    )
    # sequence(0, n-1) would count DOWN for n == 0 — guard the empty row
    positions = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    starts = F.aggregate(
        positions,
        zero,
        lambda acc, i: F.when(
            take(acc, i),
            F.struct(
                F.concat(acc["s"], F.array(i.cast("int"))).alias("s"),
                (i + L + 1).cast("int").alias("nf"),
            ),
        ).otherwise(acc),
    )["s"]

    def assemble(sts: Column) -> tuple[Column, Column]:
        # inputs: [gap before span k] ++ [sentinel k], then the tail
        prev_end = lambda s, k: F.when(  # noqa: E731  (exclusive end)
            k == 0, F.lit(0)
        ).otherwise(F.element_at(sts, k) + L)  # element_at is 1-based → s[k-1]
        pieces = F.transform(
            sts,
            lambda s, k: F.concat(
                F.slice(toks, prev_end(s, k) + 1, s - prev_end(s, k)),
                F.array((F.lit(sentinel_base) + k).cast("int")),
            ),
        )
        last_end = F.when(
            F.size(sts) > 0, F.element_at(sts, -1) + L
        ).otherwise(F.lit(0))
        inputs = F.concat(
            F.flatten(pieces), F.slice(toks, last_end + 1, n - last_end)
        )
        targets = F.flatten(
            F.transform(
                sts,
                lambda s, k: F.concat(
                    F.array((F.lit(sentinel_base) + k).cast("int")),
                    F.slice(toks, s + 1, L),
                ),
            )
        )
        return inputs, targets

    staged = df.withColumn("_sc_starts", starts)
    inputs, targets = assemble(F.col("_sc_starts"))
    return (
        staged.withColumn("inputs", inputs)
        .withColumn("targets", targets)
        .withColumn("n_spans", F.size("_sc_starts").cast("long"))
        .drop("_sc_starts")
    )
