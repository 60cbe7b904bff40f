"""Tokenizer: vocab construction determinism, encode/fallback, round-trip."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.tokenizer import build_vocab, encode_tokens

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "zebra!"),
    (4, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_vocab_ids_contiguous_and_deterministic(docs):
    v1 = {r["piece"]: r["id"] for r in build_vocab(docs, size=10).collect()}
    v2 = {r["piece"]: r["id"] for r in build_vocab(docs, size=10).collect()}
    assert v1 == v2
    assert sorted(v1.values()) == list(range(len(v1)))
    # chars come first (ordered), then pieces by (count desc, piece)
    chars = sorted(p for p in v1 if len(p) == 1)
    for i, c in enumerate(chars):
        assert v1[c] == i, (c, v1[c])
    # pretokenizer keeps the leading space: "the"/" sat" count 2, " the"
    # count 1; ranking is (count desc, piece asc) so " sat" takes the
    # first piece id
    multi = {p: v1[p] for p in v1 if len(p) > 1}
    assert {"the", " sat", " the"} <= set(multi)
    top_piece = min(multi, key=lambda p: multi[p])
    assert top_piece == " sat"


def test_vocab_min_count_filters(docs):
    v = build_vocab(docs, size=100, min_count=2)
    pieces = {r["piece"] for r in v.where(~F.col("is_char")).collect()}
    assert pieces == {"the", " sat"}  # the only count-2 multi-char pieces


def test_encode_known_and_fallback(docs, spark):
    vocab = build_vocab(docs, size=100, min_count=2)
    out = {r["doc_id"]: r for r in encode_tokens(docs, vocab).collect()}
    vmap = {r["piece"]: r["id"] for r in vocab.collect()}
    # doc 2: "the" (piece 'the'? count 1 → OOV unless min_count=1) —
    # reconstruct expected encoding in python for every doc
    import re

    rx = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+")
    for doc_id, text in CORPUS:
        expected = []
        for piece in rx.findall(text):
            if piece in vmap:
                expected.append(vmap[piece])
            else:
                expected.extend(vmap[c] for c in piece if c in vmap)
        assert list(out[doc_id]["tokens"]) == expected, doc_id
        assert out[doc_id]["n_tok"] == len(expected)
    assert out[4]["tokens"] == [] and out[4]["n_tok"] == 0


def test_encode_composes_with_packing(docs):
    from kafka_connect_gcs_spark.operators.packing import pack_sequences

    vocab = build_vocab(docs, size=100, min_count=1)
    enc = encode_tokens(docs, vocab)
    packed = pack_sequences(
        enc.where(F.col("n_tok") > 0), 4, drop_remainder=False
    )
    total = packed.agg(F.sum("n_tok")).first()[0]
    expect = enc.agg(F.sum("n_tok")).first()[0]
    assert total == expect  # lossless repack


def test_encode_on_corpus_roundtrip_chars(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_vocab(docs, size=200, min_count=2)
    enc = encode_tokens(docs, vocab)
    # every document's token count >= its piece count is false in general
    # (fallback splits); instead: decode lengths must cover all chars of
    # pieces — check total ids > 0 and no null arrays
    assert enc.where(F.col("tokens").isNull()).count() == 0
    assert enc.agg(F.sum("n_tok")).first()[0] > 0
    assert enc.count() == docs.count()


def test_decode_round_trip(docs):
    from kafka_connect_gcs_spark.operators.tokenizer import decode_tokens

    vocab = build_vocab(docs, size=100, min_count=1)
    enc = encode_tokens(docs, vocab)
    dec = {
        r["doc_id"]: r["decoded"]
        for r in decode_tokens(enc, vocab).collect()
    }
    import re

    rx = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+")
    for doc_id, text in CORPUS:
        assert dec[doc_id] == "".join(rx.findall(text)), doc_id


def test_decode_round_trip_on_corpus(spark, sf_dir):
    """Property over the real corpus: with a min_count=1 vocab (every
    piece in-vocab) decode∘encode reproduces the pretokenized text for
    EVERY document."""
    from kafka_connect_gcs_spark.operators.tokenizer import decode_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_vocab(docs, size=1 << 20, min_count=1)
    enc = encode_tokens(docs, vocab)
    dec = decode_tokens(enc, vocab)
    truth = docs.select(
        "doc_id",
        F.concat_ws(
            "",
            F.regexp_extract_all(
                F.col("text"),
                F.lit(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"),
                F.lit(0),
            ),
        ).alias("expect"),
    )
    bad = dec.join(truth, "doc_id").where(F.col("decoded") != F.col("expect"))
    assert bad.count() == 0
