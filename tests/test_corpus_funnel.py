"""End-to-end corpus funnel: normalize → quality gate → line dedup →
minhash near-dup dedup → tokenize → pack → shard export, composed on one
corpus with planted junk, boilerplate, and near-duplicates. Every stage
is unit-tested elsewhere; this pins the COMPOSITION (column contracts,
ordering assumptions, losslessness across stage boundaries)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_gcs_spark.operators.curation import quality_gate  # noqa: E402
from kafka_connect_gcs_spark.operators.dedup_lines import dedup_lines  # noqa: E402
from kafka_connect_gcs_spark.operators.dedup_text import (  # noqa: E402
    connected_components,
    minhash_lsh_pairs,
)
from kafka_connect_gcs_spark.operators.normalize import normalize_text  # noqa: E402
from kafka_connect_gcs_spark.operators.packing import pack_sequences  # noqa: E402
from kafka_connect_gcs_spark.operators.shards import (  # noqa: E402
    read_training_shards,
    write_training_shards,
)
from kafka_connect_gcs_spark.operators.tokenizer import (  # noqa: E402
    build_vocab,
    encode_tokens,
)

FOOTER = "subscribe to our newsletter today"


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 250)
    )
    did, t = F.col("doc_id"), F.col("text")
    # boilerplate footer on every 3rd doc; junk (2-word) docs every 50th;
    # NFD-decomposed é on every 7th (normalize must recompose)
    shaped = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(did % 7 == 0, F.concat(t, F.lit(" café"))).otherwise(t),
            F.when(did % 3 == 0, F.lit(FOOTER)),
        ).alias("text"),
    ).select(
        "doc_id",
        F.when(did % 50 == 17, F.lit("too short")).otherwise(F.col("text")).alias("text"),
    )
    # near-duplicates: clones of every 25th doc with one word appended
    clones = shaped.where(did % 25 == 0).select(
        (did + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended")).alias("text"),
    )
    return shaped.unionByName(clones)


def test_funnel_end_to_end(spark, corpus, tmp_path):
    n0 = corpus.count()
    n_junk = corpus.where(F.col("text") == "too short").count()
    n_clones = corpus.where(F.col("doc_id") >= 1_000_000).count()
    assert n_junk > 0 and n_clones > 0

    # 1. normalize (NFC recompose + control strip) — whitespace collapse
    # MUST wait until after the line-granular stages: it folds newlines
    # into spaces and would erase the very line structure dedup_lines
    # keys on (ordering pinned here on purpose)
    normed = normalize_text(corpus, collapse_ws=False).select(
        "doc_id", F.col("norm_text").alias("text")
    )
    assert normed.where(F.col("text").contains("café")).count() > 0

    # 2. quality gate: junk docs drop, everything else survives
    gated = quality_gate(normed, min_words=5)
    kept = gated.where(F.col("keep")).select("doc_id", "text")
    dropped = gated.where(~F.col("keep"))
    assert dropped.count() >= n_junk
    assert {r["doc_id"] % 50 for r in dropped.collect()} >= {17}

    # 3. line dedup BEFORE doc-level dedup needs C4's min_docs=3: at 2,
    # a (doc, near-clone) pair makes every shared line "boilerplate" and
    # hollows both docs out — the footer sits in ~170 docs either way
    clean = dedup_lines(kept, policy="drop_all", min_docs=3)
    assert clean.where(F.col("text").contains(FOOTER)).count() == 0
    assert clean.count() == kept.count()  # docs survive, lines drop

    # 4. near-dup dedup: 3-gram shingles — unigram shingles over a
    # shared-vocabulary corpus call everything a near-dup (measured:
    # 22k pairs at J≥0.6); word 3-grams separate topic-mates from clones
    pairs = minhash_lsh_pairs(
        clean, num_hashes=16, bands=8, threshold=0.7, shingle_n=3
    )
    comps = connected_components(pairs)
    drop_ids = comps.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    survivors = clean.join(drop_ids, "doc_id", "left_anti")
    n_dropped_dups = clean.count() - survivors.count()
    n_clone_pairs = clean.where(F.col("doc_id") >= 1_000_000).count()
    assert n_dropped_dups >= n_clone_pairs  # every planted pair collapsed
    # keep-min: the ORIGINAL (small id) survives, the clone goes
    assert survivors.where(F.col("doc_id") >= 1_000_000).count() == 0

    # 5. tokenize against the corpus's own vocab — lossless token budget
    vocab = build_vocab(survivors, size=2048)
    toks = encode_tokens(survivors, vocab)
    total_tokens = toks.agg(F.sum(F.size("tokens"))).collect()[0][0]
    assert total_tokens > 0

    # 6. pack to fixed sequences, keep the remainder for losslessness
    packed = pack_sequences(
        toks, seq_len=64, id_col="doc_id", drop_remainder=False
    )
    packed_tokens = packed.agg(F.sum(F.size("tokens"))).collect()[0][0]
    assert packed_tokens == total_tokens  # nothing lost at the boundary

    # 7. shard export keyed by the dense seq_id; read-back order == pack order
    shards = write_training_shards(
        packed.select("seq_id", "tokens"),
        str(tmp_path / "shards"),
        shard_size=16,
        key_col="seq_id",
    )
    n_seqs = packed.count()
    assert sum(r["n_rows"] for r in shards.collect()) == n_seqs
    back = read_training_shards(spark, str(tmp_path / "shards"))
    got = [
        r["seq_id"]
        for r in back.orderBy("shard_id", "pos_in_shard").collect()
    ]
    assert got == list(range(n_seqs))


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
