"""Corpus tokenizer: vocabulary build + token-id encoding.

The piece between raw text and :func:`..packing.pack_sequences`: pretokenize
with the GPT-2-flavored regex (``text.BPE_PIECE_RE``), build a closed
vocabulary of the corpus's most frequent pieces, and encode every document
to an ``array<int>`` of ids with character-level fallback for
out-of-vocabulary pieces (the role byte-fallback plays in GPT-2's BPE —
character granularity here so both Spark and the DuckDB oracle index the
same units).

Beyond the reference's scope (byte-opaque payloads). Scale shape:

* the vocabulary is a bounded artifact (``size`` pieces + the corpus
  character set): the count aggregate is map-side combined and the top-K
  selection is a ``TakeOrdered`` (distributed heads, never a global sort);
  id assignment ranks only the K survivors — metadata-scale;
* encoding explodes pieces WITH positions (rows ∝ token volume, the
  floor), joins the BROADCAST vocab once, char-explodes only the OOV
  pieces, and reassembles per-doc arrays with one shuffle on the doc id;
* everything is Catalyst built-ins — the greedy-iterative algorithms
  (real BPE merges / wordpiece) are deliberately out of scope: this is
  the closed-vocab encode step, deterministic and oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.text import BPE_PIECE_RE


def _pieces(text_col: str):
    return F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECE_RE), F.lit(0))


def _chars(piece):
    return F.transform(
        F.sequence(F.lit(1), F.length(piece)),
        lambda i: F.substring(piece, i, 1),
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    size: int = 4096,
    min_count: int = 1,
) -> DataFrame:
    """Closed vocabulary ``(piece, id, count, is_char)``.

    Ids are contiguous and deterministic: every distinct CHARACTER seen in
    the corpus's pieces first (ordered by the character, so encode always
    has a fallback id for corpus text), then the top ``size`` multi-char
    pieces by ``(count desc, piece asc)`` with ``count >= min_count``.
    Single-char pieces live in the char block only (no duplicate ids). The
    relation is bounded by ``size + |charset|`` — an artifact, like a PQ
    codebook, meant to be broadcast at encode time.
    """
    pieces = df.select(F.explode(_pieces(text_col)).alias("piece"))
    counts = pieces.groupBy("piece").agg(F.count("*").alias("count"))

    chars = (
        pieces.select(F.explode(_chars(F.col("piece"))).alias("piece"))
        .distinct()
    )
    # |charset| rows — the single-partition rank window is metadata-scale
    w_char = Window.orderBy("piece")
    char_vocab = chars.select(
        "piece",
        (F.row_number().over(w_char) - 1).cast("int").alias("id"),
        F.lit(True).alias("is_char"),
    )

    # TakeOrdered top-K (bounded), then rank the K survivors
    top = (
        counts.where(
            (F.col("count") >= min_count) & (F.length("piece") > 1)
        )
        .orderBy(F.col("count").desc(), F.col("piece").asc())
        .limit(size)
    )
    n_chars = char_vocab.agg(F.count("*").alias("_n"))
    w_piece = Window.orderBy(F.col("count").desc(), F.col("piece").asc())
    piece_vocab = (
        top.withColumn("_rk", F.row_number().over(w_piece) - 1)
        .crossJoin(F.broadcast(n_chars))
        .select(
            "piece",
            (F.col("_rk") + F.col("_n")).cast("int").alias("id"),
            F.lit(False).alias("is_char"),
        )
    )
    return (
        char_vocab.unionByName(piece_vocab)
        .join(counts, "piece", "left")
        .select(
            "piece", "id",
            F.coalesce("count", F.lit(0)).cast("long").alias("count"),
            "is_char",
        )
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
) -> DataFrame:
    """Encode each document to ``(id, tokens array<int>, n_tok)``.

    Pieces found in the vocabulary map to their id; OOV pieces fall back
    to one id per character (every corpus character has an id by
    construction; a character absent from the vocab — possible only when
    encoding NEW text against an old vocab — is dropped). Empty documents
    yield an empty array, not null. Order is preserved via (piece position,
    intra-piece char position) sort keys at reassembly.
    """
    v = vocab.select("piece", "id")
    pieced = df.select(
        F.col(id_col), F.posexplode(_pieces(text_col)).alias("pos", "piece")
    )
    hit = pieced.join(F.broadcast(v), "piece", "left")
    known = hit.where(F.col("id").isNotNull()).select(
        id_col, "pos", F.lit(0).alias("sub"), F.col("id").alias("tok")
    )
    oov_units = (
        hit.where(F.col("id").isNull())
        .select(
            id_col,
            "pos",
            F.posexplode(_chars(F.col("piece"))).alias("sub", "u"),
        )
    )
    oov = oov_units.join(
        F.broadcast(v.withColumnRenamed("piece", "u")), "u", "inner"
    ).select(id_col, "pos", "sub", F.col("id").alias("tok"))

    assembled = known.unionByName(oov).groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sub", "tok"))),
            lambda s: s["tok"],
        ).alias(out_col)
    )
    base = df.select(F.col(id_col))
    return base.join(assembled, id_col, "left").select(
        id_col,
        F.coalesce(out_col, F.array().cast("array<int>")).alias(out_col),
        F.coalesce(F.size(out_col), F.lit(0)).cast("long").alias("n_tok"),
    )


def decode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    out_col: str = "decoded",
) -> DataFrame:
    """Inverse of :func:`encode_tokens`: ids → concatenated piece text.

    Round-trips exactly (``decode(encode(text)) == ''.join(pieces)``) when
    every piece was in-vocabulary at encode time (e.g. a vocab built with
    ``min_count=1`` over the same corpus); char-fallback encodes decode to
    the same characters, so the text is still reconstructed — unknown IDS
    (never produced by encode) decode to nothing.

    Same scale shape as encode: one explode ∝ token volume, one broadcast
    vocab join, one doc-id shuffle to reassemble.
    """
    v = vocab.select(F.col("id").alias("tok"), "piece")
    units = df.select(
        F.col(id_col), F.posexplode(F.col(tokens_col)).alias("pos", "tok")
    )
    joined = units.join(F.broadcast(v), "tok", "inner")
    assembled = joined.groupBy(id_col).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "piece"))),
                lambda s: s["piece"],
            ),
        ).alias(out_col)
    )
    base = df.select(F.col(id_col))
    return base.join(assembled, id_col, "left").select(
        id_col, F.coalesce(out_col, F.lit("")).alias(out_col)
    )
