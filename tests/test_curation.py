"""Curation operators: decontamination, repetition stats, PII, unigram LM.

Each test pins hand-computed expectations on tiny literal corpora (the
driver's DuckDB oracle re-checks the same ops at sf0.01)."""

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.curation import (
    PII_PATTERNS,
    decontaminate,
    pii_redact,
    pii_stats,
    repetition_stats,
    unigram_logprob,
    word_ngrams,
)
from kafka_connect_gcs_spark.operators.text import words


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_shapes(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b"), (3, "a"), (4, "")])
    out = (
        df.select("doc_id", words(F.col("text")).alias("ws"))
        .select("doc_id", word_ngrams(F.col("ws"), 3).alias("g"))
        .orderBy("doc_id")
        .collect()
    )
    assert out[0].g == ["a b c", "b c d"]
    assert out[1].g == []  # shorter than n
    assert out[2].g == []
    assert out[3].g == []


def test_decontaminate_flags_overlap(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated words about cooking pasta with basil sauce"),
            (3, "quick brown fox jumps over nothing else here at all"),
        ],
    )
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    out = {
        r.doc_id: r
        for r in decontaminate(corpus, bench, n=5, threshold=0.05).collect()
    }
    # doc 1 shares several 5-grams with the benchmark doc
    assert out[1].n_hit > 0 and out[1].contaminated
    # doc 2 shares none
    assert out[2].n_hit == 0 and not out[2].contaminated
    # doc 3 shares exactly "quick brown fox jumps over"
    assert out[3].n_hit == 1
    # totals: distinct 5-grams of a 10-word doc = 6
    assert out[1].n_grams == 6
    assert out[1].contamination == round(out[1].n_hit / out[1].n_grams, 6)


def test_decontaminate_identical_doc_is_fully_contaminated(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = _docs(spark, [(1, text)])
    bench = _docs(spark, [(9, text)])
    row = decontaminate(corpus, bench, n=5).collect()[0]
    assert row.contamination == 1.0 and row.contaminated


def test_repetition_stats_hand_computed(spark):
    df = _docs(
        spark,
        [
            # "spam spam spam spam": 4 words 1 distinct -> dup 0.75;
            # 2-grams: ["spam spam"]x3 -> top2 1.0
            (1, "spam spam spam spam"),
            # all distinct words, each 2-gram unique -> top2 = 1/3
            (2, "one two three four"),
            (3, ""),
        ],
    )
    # thresholds loosened for the tiny docs: a 4-word doc has only 3
    # bigrams, so its top-bigram fraction is at least 1/3 by pigeonhole
    out = {
        r.doc_id: r
        for r in repetition_stats(df, max_top2_frac=0.5, max_top3_frac=0.5).collect()
    }
    assert out[1].dup_word_frac == 0.75
    assert out[1].top2gram_frac == 1.0
    assert out[1].repetitive
    assert out[2].dup_word_frac == 0.0
    assert out[2].top2gram_frac == round(1 / 3, 6)
    assert not out[2].repetitive
    assert out[3].n_words == 0 and out[3].dup_word_frac == 0.0


def test_repetition_top3gram_counts_most_frequent(spark):
    # "a b c a b c a b c" -> 3-grams: abc bca cab abc bca cab abc
    # most frequent ("a b c") appears 3 of 7
    df = _docs(spark, [(1, "a b c a b c a b c")])
    row = repetition_stats(df).collect()[0]
    assert row.top3gram_frac == round(3 / 7, 6)


def test_pii_stats_and_redact(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jane.doe+x@corp.example.com or 10.0.0.1 ok"),
            (2, "account 123456789012 and phone 9876543210"),
            (3, "clean text with no personal data at all"),
            (4, "short digits 12345678 dotted 1.2.3 are NOT pii"),
        ],
    )
    st = {r.doc_id: r for r in pii_stats(df).collect()}
    assert (st[1].n_email, st[1].n_ipv4, st[1].n_long_digits) == (1, 1, 0)
    assert st[2].n_long_digits == 2 and st[2].n_pii == 2
    assert st[3].n_pii == 0
    # 8 digits < 9 threshold; 1.2.3 is not a full IPv4
    assert st[4].n_pii == 0

    red = {r.doc_id: r.text for r in pii_redact(df).collect()}
    assert red[1] == "mail me at [PII] or [PII] ok"
    assert red[2] == "account [PII] and phone [PII]"
    assert red[3] == "clean text with no personal data at all"


def test_pii_email_digits_not_double_redacted(spark):
    # the email pattern consumes its local part before the digit-run
    # pattern could split it
    df = _docs(spark, [(1, "reach 123456789x@ex.org please")])
    assert pii_redact(df).collect()[0].text == "reach [PII] please"


def test_unigram_logprob_matches_numpy(spark):
    rows = [
        (1, "a a b"),
        (2, "b c"),
        (3, "a c c d"),
    ]
    df = _docs(spark, rows)
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    # corpus counts: a=3 b=2 c=3 d=1, total=9
    c = {"a": 3, "b": 2, "c": 3, "d": 1}
    tot = 9
    for doc_id, text in rows:
        ws = text.split()
        exp = sum(math.log(c[w] / tot) for w in ws) / len(ws)
        assert out[doc_id].n_words == len(ws)
        assert out[doc_id].avg_logprob == pytest.approx(exp, abs=1e-6)
    # rarer vocabulary ⇒ lower score
    assert out[3].avg_logprob < out[1].avg_logprob


def test_decontaminate_plan_broadcasts_benchmark(spark):
    corpus = _docs(spark, [(i, f"w{i} x{i} y{i} z{i} q{i} r{i}") for i in range(20)])
    bench = _docs(spark, [(0, "w0 x0 y0 z0 q0 r0")])
    plan = decontaminate(corpus, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_decontaminate_spans_removes_only_covered_words(spark):
    from kafka_connect_gcs_spark.operators.curation import decontaminate_spans

    # benchmark phrase "a b c d e" sits mid-doc; only its 5 words go
    corpus = _docs(
        spark,
        [
            (1, "u1 u2 a b c d e u3 u4"),
            (2, "v1 v2 v3 v4 v5 v6"),  # no hit -> verbatim
            (3, "a b c d e"),  # exact hit -> empty
            (4, "a b c d x e"),  # broken gram -> no 5-gram hit
        ],
    )
    bench = _docs(spark, [(9, "zz a b c d e yy")])
    got = {
        r["doc_id"]: r["clean_text"]
        for r in decontaminate_spans(corpus, bench, k=5, portable=True).collect()
    }
    assert got[1] == "u1 u2 u3 u4"
    assert got[2] == "v1 v2 v3 v4 v5 v6"
    assert got[3] == ""
    assert got[4] == "a b c d x e"


def test_decontaminate_spans_overlapping_hits_merge(spark):
    from kafka_connect_gcs_spark.operators.curation import decontaminate_spans

    # benchmark contains "a b c d e f" -> two overlapping corpus 5-grams
    corpus = _docs(spark, [(1, "p a b c d e f q")])
    bench = _docs(spark, [(9, "a b c d e f")])
    got = decontaminate_spans(corpus, bench, k=5, portable=True).collect()[0]
    assert got["clean_text"] == "p q"


def test_decontaminate_spans_plan_broadcasts_benchmark(spark):
    from kafka_connect_gcs_spark.operators.curation import decontaminate_spans

    corpus = _docs(spark, [(i, f"w{i} x{i} y{i} z{i} q{i} r{i}") for i in range(20)])
    bench = _docs(spark, [(0, "w0 x0 y0 z0 q0 r0")])
    plan = (
        decontaminate_spans(corpus, bench, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_pii_patterns_are_re2_safe():
    # the oracle runs these under DuckDB's RE2 — no backrefs/lookaround
    for pat in PII_PATTERNS.values():
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat


def test_quality_gate_rules_and_reasons(spark):
    from kafka_connect_gcs_spark.operators.curation import quality_gate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and keeps "
                "going with a clear and rather long account of events that "
                "is written in plain english and reads naturally through "
                "the end of the paragraph with enough words to pass"),
            (2, "short doc"),                              # too_short
            (3, "the " + "spam spam spam " * 40),          # repetitive
            (4, "the contact is user@example.org and the message goes on "
                "with enough additional words to stay above the length "
                "floor while still containing that address and the usual "
                "clear english filler text to pass other rules here"),  # pii
            (5, "der und das ist nicht mit der und das ist nicht mit der "
                "und wieder der und das ist nicht mit noch einmal der und "
                "das ist nicht mit der und das ist ein text"),  # lang (de)
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in quality_gate(
            docs, min_words=20, allowed_langs=("en",)
        ).collect()
    }
    assert out[1]["keep"] and list(out[1]["reasons"]) == []
    assert "too_short" in out[2]["reasons"] and not out[2]["keep"]
    assert "repetitive" in out[3]["reasons"]
    assert "pii" in out[4]["reasons"]
    assert "lang" in out[5]["reasons"]
    # reasons are sorted
    for r in out.values():
        rs = list(r["reasons"])
        assert rs == sorted(rs)
    # original columns survive the gate
    assert out[1]["text"].startswith("the quick")


def test_quality_gate_is_one_scan(spark, sf_dir):
    from kafka_connect_gcs_spark.operators.curation import quality_gate
    from kafka_connect_gcs_spark.plans.inspect import (
        explain_str,
        num_python_udf_nodes,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = quality_gate(docs, allowed_langs=("en", "de"))
    plan = explain_str(df, mode="simple")
    assert "Exchange" not in plan, plan
    assert num_python_udf_nodes(df) == 0


def test_bigram_logprob_hand_computed(spark):
    from kafka_connect_gcs_spark.operators.curation import bigram_logprob

    df = _docs(spark, [(1, "a b c"), (2, "a b a c"), (3, "solo"), (4, "")])
    out = {r.doc_id: r for r in bigram_logprob(df).collect()}
    # corpus bigrams: ab(2) bc(1) ba(1) ac(1); prefixes: a.=3, b.=2
    assert set(out) == {1, 2}  # <2-word docs have no bigrams
    assert out[1].n_bigrams == 2
    assert out[1].avg_logprob == pytest.approx(
        round((math.log(2 / 3) + math.log(1 / 2)) / 2, 6), abs=1e-9
    )
    assert out[2].n_bigrams == 3
    assert out[2].avg_logprob == pytest.approx(
        round((math.log(2 / 3) + math.log(1 / 2) + math.log(1 / 3)) / 3, 6),
        abs=1e-9,
    )


def test_bigram_logprob_no_null_padding_leak(spark):
    """The last word must NOT leak through as a fake unigram 'bigram'
    (zip_with pads the short side with NULL and concat_ws skips nulls)."""
    from kafka_connect_gcs_spark.operators.curation import bigram_logprob

    df = _docs(spark, [(1, "q r"), (2, "q r")])
    out = {r.doc_id: r for r in bigram_logprob(df).collect()}
    # exactly one bigram per doc; if 'r' leaked, n_bigrams would be 2
    assert out[1].n_bigrams == 1 and out[2].n_bigrams == 1
    # P(r|q) = 1 -> ln 1 = 0
    assert out[1].avg_logprob == 0.0
