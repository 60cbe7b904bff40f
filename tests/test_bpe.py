"""BPE training/encoding vs an independent pure-python reference."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.bpe import (
    bpe_decode,
    bpe_encode,
    bpe_train,
    bpe_vocab,
)
from kafka_connect_gcs_spark.operators.text import BPE_PIECE_RE

CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new newer"),
    (3, "wide wider widest low new"),
    (4, "the lowest and the newest of the low"),
    (5, ""),
]


def ref_pieces(text):
    return re.findall(BPE_PIECE_RE, text)


def _merge_once(syms, l, r):
    acc = [syms[0]]
    for x in syms[1:]:
        if acc[-1] == l and x == r:
            acc[-1] = acc[-1] + x
        else:
            acc.append(x)
    return acc


def ref_train(texts, num_merges, min_pair_count=2):
    words = Counter(p for t in texts for p in ref_pieces(t))
    syms = {w: list(w) for w in words}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, c in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        cands = [(c, l, r) for (l, r), c in pc.items() if c >= min_pair_count]
        if not cands:
            break
        _, l, r = min(cands, key=lambda t: (-t[0], t[1], t[2]))
        merges.append((l, r))
        for w in syms:
            if len(syms[w]) >= 2:
                syms[w] = _merge_once(syms[w], l, r)
    return merges, syms


def ref_encode(text, merges, tok_ids):
    toks = []
    for p in ref_pieces(text):
        syms = list(p)
        for l, r in merges:
            if len(syms) >= 2:
                syms = _merge_once(syms, l, r)
        toks.extend(tok_ids[s] for s in syms if s in tok_ids)
    return toks


def ref_ids(texts, merges):
    chars = sorted({c for t in texts for p in ref_pieces(t) for c in p})
    ids = {c: i for i, c in enumerate(chars)}
    for rank, (l, r) in enumerate(merges):
        ids.setdefault(l + r, len(chars) + rank)
    return ids


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_train_matches_reference(docs):
    merges = bpe_train(docs, num_merges=12, min_pair_count=2)
    ref, _ = ref_train([t for _, t in CORPUS], 12, 2)
    assert [(m["left"], m["right"]) for m in merges] == ref
    assert [m["rank"] for m in merges] == list(range(len(ref)))


@pytest.mark.parametrize("impl", ["expr", "pandas"])
def test_encode_matches_reference(docs, impl):
    merges = bpe_train(docs, num_merges=10, min_pair_count=2)
    vocab = bpe_vocab(docs, merges)
    out = bpe_encode(docs, merges, vocab, impl=impl)
    ref_m, _ = ref_train([t for _, t in CORPUS], 10, 2)
    ids = ref_ids([t for _, t in CORPUS], ref_m)
    got = {r.doc_id: list(r.tokens) for r in out.collect()}
    for doc_id, text in CORPUS:
        assert got[doc_id] == ref_encode(text, ref_m, ids), doc_id
    # empty doc: empty array, not null
    assert got[5] == []


def test_expr_checkpointing_path_agrees(docs):
    """More merges than checkpoint_every exercises the mid-loop plan
    truncation; output must be identical to the pandas path."""
    merges = bpe_train(docs, num_merges=24, min_pair_count=1)
    assert len(merges) > 16
    vocab = bpe_vocab(docs, merges)
    a = {r.doc_id: list(r.tokens)
         for r in bpe_encode(docs, merges, vocab, impl="expr").collect()}
    b = {r.doc_id: list(r.tokens)
         for r in bpe_encode(docs, merges, vocab, impl="pandas").collect()}
    assert a == b


def test_decode_roundtrip(docs):
    merges = bpe_train(docs, num_merges=8, min_pair_count=2)
    vocab = bpe_vocab(docs, merges)
    enc = bpe_encode(docs, merges, vocab)
    dec = {r.doc_id: r.decoded for r in bpe_decode(enc, vocab).collect()}
    for doc_id, text in CORPUS:
        assert dec[doc_id] == "".join(ref_pieces(text)), doc_id


def test_encode_new_text_drops_unknown_chars(spark, docs):
    merges = bpe_train(docs, num_merges=4, min_pair_count=2)
    vocab = bpe_vocab(docs, merges)
    new = spark.createDataFrame([(9, "low δ new")], ["doc_id", "text"])
    out = bpe_encode(new, merges, vocab).collect()[0]
    dec = bpe_decode(
        spark.createDataFrame([(9, out.tokens)], "doc_id long, tokens array<int>"),
        vocab,
    ).collect()[0]
    assert "δ" not in dec.decoded
    assert "low" in dec.decoded and "new" in dec.decoded


def test_vocab_ids_disjoint_and_stable(docs):
    merges = bpe_train(docs, num_merges=10, min_pair_count=2)
    vocab = bpe_vocab(docs, merges).collect()
    ids = [r.id for r in vocab]
    assert len(ids) == len(set(ids))
    chars = sorted(r.token for r in vocab if r.is_char)
    char_ids = {r.token: r.id for r in vocab if r.is_char}
    assert [char_ids[c] for c in chars] == list(range(len(chars)))
    for r in vocab:
        if not r.is_char:
            assert r.id >= len(chars)


def test_bpe_to_pack_sequences_lossless(spark, docs):
    """The north-star composition: text -> BPE ids -> packed fixed-length
    training sequences, losslessly repackable back to the original pieces."""
    from kafka_connect_gcs_spark.operators.packing import pack_sequences

    merges = bpe_train(docs, num_merges=10, min_pair_count=2)
    vocab = bpe_vocab(docs, merges)
    enc = bpe_encode(docs, merges, vocab)
    packed = pack_sequences(enc, 16, drop_remainder=False)
    rows = sorted(packed.collect(), key=lambda r: r.seq_id)
    # fixed shapes except the final remainder
    assert all(len(r.tokens) == 16 for r in rows[:-1])
    stream = [t for r in rows for t in r.tokens]
    # the packed stream equals the doc-id-ordered concatenation of ids
    enc_rows = sorted(enc.collect(), key=lambda r: r.doc_id)
    assert stream == [t for r in enc_rows for t in r.tokens]
    # and decoding the stream restores the concatenated corpus pieces
    dec = bpe_decode(
        spark.createDataFrame([(0, stream)], "doc_id long, tokens array<int>"),
        vocab,
    ).collect()[0]
    expected = "".join(
        "".join(ref_pieces(t)) for _, t in sorted(CORPUS)
    )
    assert dec.decoded == expected


def ref_train_batched(texts, num_merges, min_pair_count=2, P=1):
    """Pure-python reference of the BATCHED trainer: one count snapshot
    per round, top-3P candidates, largest independent rank-order prefix
    applied sequentially (mirrors bpe_train(merges_per_round=P))."""
    words = Counter(p for t in texts for p in ref_pieces(t))
    syms = {w: list(w) for w in words}
    merges = []
    while len(merges) < num_merges:
        p = min(P, num_merges - len(merges))
        pc = Counter()
        for w, c in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        cands = sorted(
            ((c, l, r) for (l, r), c in pc.items() if c >= min_pair_count),
            key=lambda t: (-t[0], t[1], t[2]),
        )[: 3 * p]
        if not cands:
            break
        batch, used, minted = [], set(), set()
        for _, l, r in cands:
            if len(batch) >= p:
                break
            m = l + r
            if (l in used or r in used or l in minted or r in minted
                    or m in used or m in minted):
                break
            batch.append((l, r))
            used.update((l, r))
            minted.add(m)
        for l, r in batch:
            merges.append((l, r))
            for w in syms:
                if len(syms[w]) >= 2:
                    syms[w] = _merge_once(syms[w], l, r)
    return merges


def test_batched_p1_reproduces_classic(docs):
    classic = bpe_train(docs, num_merges=12, min_pair_count=2)
    p1 = bpe_train(docs, num_merges=12, min_pair_count=2, merges_per_round=1)
    assert classic == p1
    ref, _ = ref_train([t for _, t in CORPUS], 12, 2)
    assert [(m["left"], m["right"]) for m in p1] == ref


@pytest.mark.parametrize("P", [3, 8])
def test_batched_matches_batched_reference(docs, P):
    got = bpe_train(docs, num_merges=16, min_pair_count=1, merges_per_round=P)
    want = ref_train_batched([t for _, t in CORPUS], 16, 1, P=P)
    assert [(m["left"], m["right"]) for m in got] == want
    assert [m["rank"] for m in got] == list(range(len(want)))


def test_batched_roundtrip_lossless(docs):
    merges = bpe_train(docs, num_merges=16, min_pair_count=1,
                       merges_per_round=6)
    vocab = bpe_vocab(docs, merges)
    enc = bpe_encode(docs, merges, vocab)
    dec = {r.doc_id: r.decoded for r in bpe_decode(enc, vocab).collect()}
    for doc_id, text in CORPUS:
        assert dec[doc_id] == "".join(ref_pieces(text)), doc_id


def test_batched_rejects_bad_round_size(docs):
    with pytest.raises(ValueError):
        bpe_train(docs, merges_per_round=0)
