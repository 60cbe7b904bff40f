"""Content-defined chunking (Rabin rolling hash) + chunk-level dedup.

The storage-dedup primitive behind LBFS/rsync/backup dedup and the
"remove near-identical page regions" pass of web-corpus curation: cut
each document at positions where a rolling hash of the last ``window``
words hits a boundary pattern, so chunk boundaries move WITH the content
— an insertion early in a page shifts every fixed-size block but leaves
all content-defined chunks after the next boundary untouched. Chunks are
then dedup'd corpus-wide by hash, which is what makes mirrored
boilerplate (headers, navboxes, license blocks) collapse to one stored
copy even when it floats at different offsets in each page.

Boundary rule: for 1-based word index ``i >= window``,

    h_i = ( sum_{d=0}^{window-1} g(word_{i-d}) * A^d ) mod P
    candidate  iff  h_i mod 2^boundary_bits == 0

with ``g`` the repo's portable 60-bit md5 hash (or xxhash64 in
production) reduced mod P. This is the classic Rabin-Karp window
fingerprint: h_i depends on exactly the last ``window`` words, so the
candidate set is a pure per-position function of local content —
order-sensitive (A is an odd prime multiplier, so permuting the window
changes h) and replayable verbatim in any engine with 64-bit integers
(all intermediates stay below 2^59; see the constants).

Min/max enforcement matches gear-CDC practice: a greedy left-to-right
fold keeps a candidate only if it lands >= ``min_words`` after the
previous kept cut, and any resulting segment longer than ``max_words``
is post-split at exact ``max_words`` strides (equivalent to the
"force a cut at max" rule).

Expression-shape note: the whole chunker is built as ONE projection of
nested let-bindings (:func:`let_` — ``transform(array(x), v -> body)[1]``
evaluates ``x`` once and binds it) rather than a chain of staged
``select``s. Chained projections are NOT safe here: CollapseProject
merges them and re-inlines each staged array into every lambda that
references it — the tokenizer re-runs per rolling-hash position and the
plan goes O(n_words^2) per doc (measured: 125 s for 500 docs before the
rewrite, ~1 s after). Lambda variables are bound values, so every stage
is evaluated exactly once per document no matter how many times the
next stage reads it.

Scale shape (the 100 TB question): the WHOLE chunker is ONE map-only
projection — tokenize, per-word hash, ``window`` lookups per position, a
per-doc fold over the tiny candidate list (~n/2^bits entries), explode.
No shuffle of any kind; document text never leaves its input partition.
The only exchange in the pipeline is the dedup aggregation, and it
carries ``(group, 32-byte hash, int)`` rows — never chunk text. Contrast
the reference's fixed-size chunk rotation (GCSObjectStreamWriter's
size-gated chunks, sources/archive.py:185-238): that splits BYTE STREAMS
for upload; this splits CONTENT for dedup.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rolling-hash window, in words
DEFAULT_WINDOW = 4
#: odd prime multiplier; A**3 < 2**37 so g*A**3 < 2**57 — the 4-term
#: window sum stays below 2**59, exact in int64 in every engine
RABIN_A = 4099
#: modulus (prime < 2**20) so per-word hashes g < 2**20
RABIN_P = 1048573
#: boundary probability 2**-bits per position
DEFAULT_BOUNDARY_BITS = 5
DEFAULT_MIN_WORDS = 8
DEFAULT_MAX_WORDS = 40


def let_(val: Column, body: Callable[[Column], Column]) -> Column:
    """Catalyst let-binding: evaluate ``val`` ONCE, bind it as a lambda
    variable in ``body``. ``transform`` materializes the one-element
    array before calling the lambda, and lambda variables are plain
    value lookups — so ``body`` may reference the binding any number of
    times (including inside nested HOF lambdas) without re-evaluating
    ``val``. The safe alternative to staged ``select``s, which
    CollapseProject merges and re-inlines (module docstring)."""
    return F.element_at(F.transform(F.array(val), body), 1)


def _g(word: Column, portable: bool) -> Column:
    """Per-word hash reduced mod P (portable: md5-60bit, the DuckDB
    expression ``('0x'||substr(md5('cdc:'||w),1,15))::BIGINT % P``)."""
    if portable:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit("cdc:"), word)), 1, 15), 16, 10
        ).cast("long")
    else:
        h = F.xxhash64(F.concat(F.lit("cdc:"), word)).bitwiseAND(
            F.lit((1 << 63) - 1)
        )
    return h % F.lit(RABIN_P)


def _chunks_expr(
    text: Column,
    window: int,
    boundary_bits: int,
    min_words: int,
    max_words: int,
    portable: bool,
    keep_text: bool,
) -> Column:
    """``array<struct<start_word:int, n_words:int, chunk_hash:string
    [, chunk_text:string]>>`` for one document — a single expression of
    nested let-bindings; every stage evaluated exactly once."""
    from kafka_connect_gcs_spark.operators.text import words

    apow = [pow(RABIN_A, d) for d in range(window)]
    empty_i = F.array().cast("array<int>")
    mx = F.lit(max_words)

    def h_at(gs: Column, i: Column) -> Column:
        s = F.element_at(gs, i)
        for d in range(1, window):
            s = s + F.element_at(gs, i - d) * F.lit(apow[d])
        return (s % F.lit(RABIN_P)) % F.lit(1 << boundary_bits)

    def candidates(ws: Column, gs: Column) -> Column:
        return F.when(
            F.size(ws) >= window,
            F.filter(
                F.transform(
                    F.sequence(F.lit(window), F.size(ws)),
                    lambda i: F.when(h_at(gs, i) == 0, i).otherwise(F.lit(0)),
                ),
                lambda x: x > 0,
            ),
        ).otherwise(empty_i)

    def greedy_keep(cand: Column) -> Column:
        # fold over the SMALL candidate list (~n/2^bits entries)
        return F.aggregate(
            cand,
            F.struct(F.lit(0).cast("int").alias("last"), empty_i.alias("ks")),
            lambda acc, c: F.when(
                c - acc["last"] >= F.lit(min_words),
                F.struct(
                    c.cast("int").alias("last"),
                    F.concat(acc["ks"], F.array(c.cast("int"))).alias("ks"),
                ),
            ).otherwise(acc),
        )

    def bounds_of(ws: Column, kept: Column) -> Column:
        n = F.size(ws)
        return F.concat(
            F.array(F.lit(0).cast("int")),
            kept["ks"],
            F.when(n > kept["last"], F.array(n.cast("int"))).otherwise(
                empty_i
            ),
        )

    def pieces_of(bounds: Column) -> Column:
        # segments between consecutive bounds, force-split at max_words
        segs = F.when(
            F.size(bounds) > 1,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size(bounds) - 1),
                    lambda j: let_(
                        F.struct(
                            (F.element_at(bounds, j) + 1).alias("s"),
                            F.element_at(bounds, j + 1).alias("e"),
                        ),
                        lambda seg: F.transform(
                            F.sequence(
                                F.lit(0),
                                F.floor(
                                    (seg["e"] - seg["s"]) / mx
                                ).cast("int"),
                            ),
                            lambda k: F.struct(
                                (seg["s"] + k * mx).alias("start"),
                                F.least(
                                    mx, seg["e"] - (seg["s"] + k * mx) + 1
                                ).alias("nw"),
                            ),
                        ),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<struct<start:int,nw:int>>"))
        return segs

    def finish(ws: Column, pieces: Column) -> Column:
        def mk(p: Column) -> Column:
            return let_(
                F.concat_ws(" ", F.slice(ws, p["start"], p["nw"])),
                lambda txt: F.struct(
                    p["start"].alias("start_word"),
                    p["nw"].alias("n_words"),
                    F.md5(txt).alias("chunk_hash"),
                    *([txt.alias("chunk_text")] if keep_text else []),
                ),
            )

        return F.transform(pieces, mk)

    return let_(
        words(text),
        lambda ws: let_(
            F.transform(ws, lambda w: _g(w, portable)),
            lambda gs: let_(
                greedy_keep(candidates(ws, gs)),
                lambda kept: finish(
                    ws, pieces_of(bounds_of(ws, kept))
                ),
            ),
        ),
    )


def content_defined_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = DEFAULT_WINDOW,
    boundary_bits: int = DEFAULT_BOUNDARY_BITS,
    min_words: int = DEFAULT_MIN_WORDS,
    max_words: int = DEFAULT_MAX_WORDS,
    carry_cols: Sequence[str] = (),
    portable: bool = False,
    keep_text: bool = False,
) -> DataFrame:
    """One row per chunk: ``(id_col, *carry_cols, chunk_id, start_word,
    n_words, chunk_hash)`` (+ ``chunk_text`` if ``keep_text``), chunks
    covering each doc's word sequence exactly, boundaries content-defined
    as per the module docstring. Empty docs emit no rows. Map-only."""
    if window < 2:
        raise ValueError("window must be >= 2")
    if not 0 < boundary_bits < 20:
        raise ValueError("boundary_bits must be in (0, 20)")
    if not 0 < min_words <= max_words:
        raise ValueError("need 0 < min_words <= max_words")

    carry = list(carry_cols)
    chunks = _chunks_expr(
        F.col(text_col),
        window,
        boundary_bits,
        min_words,
        max_words,
        portable,
        keep_text,
    )
    out = df.select(
        id_col, *carry, F.posexplode(chunks).alias("chunk_id", "_p")
    )
    cols = [
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("chunk_id"),
        F.col("_p")["start_word"].alias("start_word"),
        F.col("_p")["n_words"].alias("n_words"),
        F.col("_p")["chunk_hash"].alias("chunk_hash"),
    ]
    if keep_text:
        cols.append(F.col("_p")["chunk_text"].alias("chunk_text"))
    return out.select(*cols)


def chunk_dedup_stats(
    chunks: DataFrame, by_col: str = "source"
) -> DataFrame:
    """Storage-dedup summary per ``by_col`` group: total vs distinct
    chunk count and the word volume a hash-keyed chunk store would save.

    Two-level aggregation: the first exchange carries ``(group, hash,
    n_words)`` with map-side partial counts — chunk text is never
    shuffled; the second collapses to one row per group."""
    per_hash = chunks.groupBy(by_col, "chunk_hash").agg(
        F.count(F.lit(1)).alias("_cnt"),
        # identical hash => identical text => identical n_words
        F.min("n_words").alias("_nw"),
    )
    return (
        per_hash.groupBy(by_col)
        .agg(
            F.sum("_cnt").alias("total_chunks"),
            F.count(F.lit(1)).alias("distinct_chunks"),
            (F.sum("_cnt") - F.count(F.lit(1))).alias("dup_chunks"),
            F.sum(F.col("_cnt") * F.col("_nw")).alias("words_total"),
            (F.sum(F.col("_cnt") * F.col("_nw")) - F.sum("_nw")).alias(
                "words_saved"
            ),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("words_saved") / F.col("words_total"), 6),
        )
    )
