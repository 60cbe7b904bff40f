"""Text analysis for training-data curation: token counting, quality
scoring, language ID, document fingerprinting.

These extend the engine beyond the reference's byte-opaque model (the
reference never looks inside a payload; we add the operators a 100 TB
training-data pipeline needs). All hot paths are Catalyst built-ins —
whole-stage codegen, no Python — so they are also expressible as ANSI SQL
for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword marker sets. Chosen to be disjoint so the
# argmax is stable; mirrors classic dictionary-based language ID.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "pas", "avec"],
    "es": ["el", "los", "las", "es", "y", "no", "con"],
}

#: GPT-2-flavored pretokenizer pieces: contractions, letter runs, digit
#: runs, punctuation runs (simplified to ASCII classes so Spark's and
#: DuckDB's regex engines agree).
BPE_PIECE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def words(col: Column) -> Column:
    """Lower-cased whitespace tokens with empties removed."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")


def ws_token_count(col: Column) -> Column:
    return F.size(words(col))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pretokenizer pieces (regexp_count stays JVM-side)."""
    return F.regexp_count(col, F.lit(BPE_PIECE_RE))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    return F.when(n > 0, F.regexp_count(col, F.lit(r"[^A-Za-z0-9\s]")) / n).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(col: Column, markers: list[str] | None = None) -> Column:
    ws = words(col)
    marker_set = markers or sorted({w for v in LANG_MARKERS.values() for w in v})
    hits = F.size(
        F.filter(ws, lambda w: w.isin(marker_set))
    )
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))


def mean_word_len(col: Column) -> Column:
    ws = words(col)
    return F.when(
        F.size(ws) > 0,
        F.aggregate(ws, F.lit(0).cast("double"), lambda acc, w: acc + F.length(w))
        / F.size(ws),
    ).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: long enough, mostly words,
    sane word lengths — the classic cheap pre-filter before dedup."""
    n = F.length(col)
    len_ok = F.least(n / F.lit(200.0), F.lit(1.0))  # saturates at 200 chars
    punct_pen = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    mwl = mean_word_len(col)
    word_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok + punct_pen + word_ok) / 3.0, 6)


def lang_scores(col: Column) -> list[Column]:
    ws = words(col)
    out = []
    for lang, markers in LANG_MARKERS.items():
        out.append(
            F.size(F.array_intersect(F.array_distinct(ws),
                                     F.array([F.lit(m) for m in markers])))
            .alias(f"score_{lang}")
        )
    return out


def lang_guess(col: Column) -> Column:
    """argmax over marker-set hits; 'und' (undetermined) when all zero.
    Ties break by language code order (deterministic, oracle-matchable)."""
    ws = F.array_distinct(words(col))
    scored = [
        (
            lang,
            F.size(F.array_intersect(ws, F.array([F.lit(m) for m in markers]))),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = scored[0][1]
    for _, s in scored[1:]:
        best = F.greatest(best, s)
    expr = F.lit("und")
    for lang, s in reversed(scored):  # earlier langs override on tie
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column) -> Column:
    """Exact-content fingerprint: md5 (identical in Spark and DuckDB, so the
    oracle can verify it byte-for-byte)."""
    return F.md5(col)


def gram_hashes(col: Column, k: int = 8, portable: bool = False) -> Column:
    """Hashes of every character k-gram of ``col`` — the winnowing input.
    Split out so DataFrame-level callers can STAGE it into its own
    projection: the sliding-minimum chain below references the hash array
    ~2^rounds times, and interpreted HOFs re-evaluate duplicated subtrees
    (no CSE), so an inlined gram-hash expression re-hashes the document
    once per duplicate while an attribute re-read is free."""
    n = F.length(col)
    grams = F.when(
        n >= k, F.sequence(F.lit(1), n - (k - 1))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    if portable:
        def gram_hash(i):
            return F.conv(
                F.substring(F.md5(F.substring(col, i, k)), 1, 15), 16, 10
            ).cast("long")
    else:
        def gram_hash(i):
            return F.xxhash64(F.substring(col, i, k))
    return F.transform(grams, gram_hash)


def winnow_fingerprint(
    col: Column, k: int = 8, w: int = 4, portable: bool = False
) -> Column:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every character k-gram, slide a window of ``w`` consecutive k-gram
    hashes, keep each window's minimum, return the distinct minima sorted.
    Guarantees: any shared substring of length ≥ k+w-1 contributes at least
    one common fingerprint hash — the standard local-similarity sketch for
    plagiarism/near-dup detection.

    A true rolling hash is an efficiency trick for sequential scanners; on a
    columnar engine the k-grams are materialized per row and hashed
    vectorized inside codegen, which is the Spark-native equivalent.
    portable=True uses md5-derived 60-bit ints (bit-identical in DuckDB, so
    the oracle replays the whole pipeline); default is xxhash64 (one JVM
    hash per gram — the production path).

    One-shot expression form: the gram-hash array is inlined into the
    sliding chain and re-evaluated per duplicate. Hot paths use
    :func:`winnow_fingerprints`, which stages :func:`gram_hashes` into its
    own projection first."""
    return winnow_from_gram_hashes(gram_hashes(col, k, portable), w)


def winnow_from_gram_hashes(hs: Column, w: int = 4) -> Column:
    """Winnowing over an already-computed gram-hash array — pass an
    ATTRIBUTE (projected column) so the ~2^rounds structural duplicates
    below re-read a row slot instead of re-hashing the document."""
    nh = F.size(hs)
    # Sliding-window minimum via sparse-table doubling (zip_with of the
    # array against its own shifted slice, log2(w) rounds + one overlap
    # round). The naive transform(seq, j -> array_min(slice(hs, j, w)))
    # re-inlines — and re-EVALUATES — the whole gram-hash array once per
    # window (higher-order functions get no common-subexpression
    # elimination): O(len²) hashing per document, measured 20× slower on
    # 300-char docs. Here hs is referenced ~2·log2(w) times total.
    # zip_with pads the shorter side with nulls and least() skips nulls, so
    # tail entries hold truncated-window minima — harmless: the final slice
    # keeps only the n-w+1 full windows.
    # 2^30, not Int.MaxValue: Slice computes start+length in Int, and an
    # overflow there silently yields an EMPTY slice (zip_with then pads all
    # nulls and the "min" degenerates to the unshifted array).
    big = F.lit(1 << 30)
    sliding = hs
    span = 1
    while span * 2 <= w:
        sliding = F.zip_with(
            sliding, F.slice(sliding, 1 + span, big), lambda a, b: F.least(a, b)
        )
        span *= 2
    if span < w:
        rem = w - span  # windows [i, i+span) ∪ [i+rem, i+rem+span) = [i, i+w)
        sliding = F.zip_with(
            sliding, F.slice(sliding, 1 + rem, big), lambda a, b: F.least(a, b)
        )
    wins = F.when(nh >= w, F.slice(sliding, 1, nh - (w - 1))).otherwise(
        # short docs: a single fingerprint = min over all gram hashes
        F.when(nh > 0, F.array(F.array_min(hs))).otherwise(
            F.expr("CAST(array() AS array<bigint>)")
        )
    )
    return F.array_sort(F.array_distinct(wins))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    portable: bool = False,
) -> DataFrame:
    """DataFrame-level winnowing: spreads a few-file input across cores
    first (per-doc hashing is embarrassingly parallel and otherwise pins to
    the input's file count — a single-file corpus runs on one task)."""
    from kafka_connect_gcs_spark.operators.util import spread_small_input

    src = spread_small_input(df.select(id_col, text_col))
    # stage gram hashing into its own projection (see gram_hashes): the
    # sliding chain's duplicates then re-read an attribute, not re-hash
    return src.select(
        id_col, gram_hashes(F.col(text_col), k=k, portable=portable).alias("_hs")
    ).select(
        id_col, winnow_from_gram_hashes(F.col("_hs"), w=w).alias("winnow")
    )


def minhash_signature_words(col: Column, num_hashes: int = 16) -> Column:
    """Bottom-sketch fingerprint over the word set: for each of H seeded
    hash functions take min over words of md5-derived 60-bit ints. Built
    from engine-portable primitives (md5 + hex→int) so DuckDB can reproduce
    it exactly — used by both the LSH near-dup path and its oracle.

    One-shot expression form — the word set is inlined (and re-evaluated,
    no CSE in interpreted HOFs) once per hash lane. Hot paths project
    ``array_distinct(words(col))`` first and call
    :func:`minhash_signature_of_words` on the attribute."""
    return minhash_signature_of_words(
        F.array_distinct(words(col)), num_hashes
    )


def minhash_signature_of_words(ws: Column, num_hashes: int = 16) -> Column:
    """Signature over an already-projected distinct-word array (pass an
    ATTRIBUTE; see :func:`minhash_signature_words`)."""

    def hasher(i: int):
        # NOTE: single-arg lambda only — a two-parameter lambda makes
        # F.transform pass the array INDEX as the second arg.
        prefix = f"s{i}:"
        return lambda w: F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), w)), 1, 15), 16, 10
        ).cast("long")

    sigs = [F.array_min(F.transform(ws, hasher(i))) for i in range(num_hashes)]
    return F.array(*sigs)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "doc_id",
        ws_token_count(c).alias("ws_tokens"),
        bpe_token_count(c).alias("bpe_tokens"),
        F.length(c).alias("chars"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(mean_word_len(c), 6).alias("mean_word_len"),
        quality_score(c).alias("quality"),
        lang_guess(c).alias("lang_guess"),
        fingerprint(c).alias("fp"),
    )
