"""Training-data curation operators: text stats, exact/near dedup,
similarity search, multimodal plumbing — verified against DuckDB or exact
brute-force oracles."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.dedup_text import (
    dedup_exact,
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from kafka_connect_gcs_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_pandas,
    cosine,
    neardup_pairs_cosine,
)
from kafka_connect_gcs_spark.operators.text import text_stats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_text_stats_match_duckdb(spark, docs, sf_dir):
    got = {
        r.doc_id: r
        for r in text_stats(docs.select("doc_id", "text")).collect()
    }
    want = duckdb.sql(
        f"""
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               w -> w <> '')) AS ws_tokens,
               length(text) AS chars,
               md5(text) AS fp
        FROM read_parquet('{sf_dir}/documents.parquet')
        """
    ).fetchall()
    assert len(want) == len(got)
    for doc_id, ws_tokens, chars, fp in want:
        g = got[doc_id]
        assert g.ws_tokens == ws_tokens, doc_id
        assert g.chars == chars
        assert g.fp == fp  # md5 identical across engines
    # sanity on derived metrics
    for g in got.values():
        assert 0.0 <= g.punct_ratio <= 1.0
        assert 0.0 <= g.quality <= 1.0
        assert g.lang_guess in {"en", "de", "fr", "es", "und"}
        assert g.bpe_tokens >= g.ws_tokens  # pieces at least as many as words


def test_dedup_exact_finds_planted_duplicates(spark, docs):
    base = docs.select("doc_id", "text")
    clones = base.where(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 100_000
    )
    with_dups = base.unionByName(clones)
    groups = exact_dup_groups(with_dups)
    assert groups.where(F.col("copies") == 2).count() == 50
    assert groups.where(F.col("copies") == 1).count() == base.count() - 50
    # keeper is always the min id (the original)
    keepers = groups.where(F.col("copies") == 2).select("keep_id")
    assert keepers.where(F.col("keep_id") >= 100_000).count() == 0
    kept = dedup_exact(with_dups)
    assert kept.count() == base.count()  # one survivor per content group
    assert kept.where(F.col("doc_id") >= 100_000).count() == 0


def test_minhash_lsh_recall_and_precision(spark, docs):
    """LSH-verified pairs ⊆ brute-force pairs (precision 1.0 by
    construction); recall at j≥0.7 with 16 hashes / 8 bands ≥ 0.9."""
    sample = docs.select("doc_id", "text").where(F.col("doc_id") < 150)
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(sample, n=1, threshold=0.7).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            sample, num_hashes=16, bands=8, threshold=0.7
        ).collect()
    }
    assert got <= truth  # exact-verify step ⇒ no false positives
    if truth:
        recall = len(got) / len(truth)
        assert recall >= 0.9, f"recall {recall:.2f} over {len(truth)} pairs"


def test_simhash_blocking_is_exhaustive_within_guarantee(spark, docs):
    """Pigeonhole: with 4 blocks any pair at Hamming ≤ 3 shares a block, so
    block-join recall is exactly 1.0 there. Verify against the n² oracle."""
    sample = docs.select("doc_id", "text").where(F.col("doc_id") < 120)
    sh = sample.select("doc_id", simhash64(F.col("text")).alias("sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    truth = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("d"),
        )
        .where(F.col("d") <= 3)
        .collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(sample, max_hamming=3, blocks=4).collect()
    }
    assert got == truth


def test_pandas_simhash_bit_identical_to_expression(spark, docs):
    """The numpy fast path must emit the EXACT portable signature the
    Catalyst expression computes — same tokenization, same md5-60-bit
    word hash, same strict bit-majority."""
    from kafka_connect_gcs_spark.operators.dedup_text import (
        simhash_signatures_pandas,
    )

    sample = docs.select("doc_id", "text").where(F.col("doc_id") < 150)
    expr = {
        r.doc_id: r.sh
        for r in sample.select(
            "doc_id", simhash64(F.col("text"), portable=True).alias("sh")
        ).collect()
    }
    fast = {r.doc_id: r.sh for r in simhash_signatures_pandas(sample).collect()}
    assert fast == expr
    # whitespace/empty/case/NULL edge docs — null text must yield a NULL
    # signature on BOTH paths (the expression is null-propagating; the
    # pandas path must not stringify None into a real signature)
    edge = spark.createDataFrame(
        [
            (1, "  Mixed   CASE\twords\nhere  "),
            (2, ""),
            (3, "   "),
            (4, "one"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    e = {
        r.doc_id: r.sh
        for r in edge.select(
            "doc_id", simhash64(F.col("text"), portable=True).alias("sh")
        ).collect()
    }
    f = {r.doc_id: r.sh for r in simhash_signatures_pandas(edge).collect()}
    assert f == e


def test_hybrid_simhash_bit_identical_to_expression(spark, docs):
    """The hybrid path (JVM word hashes + numpy bit-majority) must emit
    the EXACT signature of the Catalyst fold for BOTH hash variants —
    including the production xxhash64 one the all-python path can't
    reproduce — plus the null/empty edge semantics."""
    from kafka_connect_gcs_spark.operators.dedup_text import (
        simhash_signatures_hybrid,
    )

    sample = docs.select("doc_id", "text").where(F.col("doc_id") < 150)
    edge = spark.createDataFrame(
        [
            (1001, "  Mixed   CASE\twords\nhere  "),
            (1002, ""),
            (1003, "   "),
            (1004, "one"),
            (1005, None),
        ],
        "doc_id long, text string",
    )
    both = sample.unionByName(edge)
    for portable in (False, True):
        expr = {
            r.doc_id: r.sh
            for r in both.select(
                "doc_id", simhash64(F.col("text"), portable=portable).alias("sh")
            ).collect()
        }
        fast = {
            r.doc_id: r.sh
            for r in simhash_signatures_hybrid(both, portable=portable).collect()
        }
        assert fast == expr, f"portable={portable}"


def test_simhash_pairs_pandas_impl_same_pairs(spark, docs):
    sample = docs.select("doc_id", "text").where(F.col("doc_id") < 150)
    base = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(sample, max_hamming=3, portable=True).collect()
    }
    fast = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(
            sample, max_hamming=3, portable=True, sig_impl="pandas"
        ).collect()
    }
    assert fast == base


def test_cosine_matches_duckdb(spark, emb, sf_dir):
    got = {
        r.vec_id: r.sim
        for r in emb.where(F.col("vec_id") < 20)
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("embedding")), 4).alias("sim"),
        )
        .collect()
    }
    assert all(abs(v - 1.0) < 1e-3 for v in got.values())
    want = duckdb.sql(
        f"""
        SELECT a.vec_id, round(list_cosine_similarity(a.embedding, b.embedding), 4)
        FROM read_parquet('{sf_dir}/embeddings.parquet') a
        JOIN read_parquet('{sf_dir}/embeddings.parquet') b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < 20
        """
    ).fetchall()
    got2 = {
        r.vec_id: r.sim
        for r in emb.alias("a")
        .join(emb.alias("b"), F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .where(F.col("a.vec_id") < 20)
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 4).alias("sim"),
        )
        .collect()
    }
    for vid, sim in want:
        assert abs(got2[vid] - sim) <= 1e-3


def test_topk_expression_and_pandas_paths_agree(spark, emb):
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    expr = brute_force_topk(emb, queries, k=5)
    pd_q = queries.toPandas()
    fast = brute_force_topk_pandas(emb, pd_q, k=5)
    e = {(r.query_id, r.rank): (r.vec_id, r.sim) for r in expr.collect()}
    f = {(r.query_id, r.rank): (r.vec_id, r.sim) for r in fast.collect()}
    assert set(e) == set(f)
    for key in e:
        assert e[key][0] == f[key][0], key
        assert abs(e[key][1] - f[key][1]) < 1e-4
    # self-similarity must rank first
    for (qid, rank), (vid, sim) in e.items():
        if rank == 1:
            assert vid == qid and abs(sim - 1.0) < 1e-3


def test_neardup_lsh_subset_of_exact(spark, emb):
    exact = {
        (r.id_a, r.id_b)
        for r in neardup_pairs_cosine(emb, threshold=0.8, exact=True).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in neardup_pairs_cosine(emb, threshold=0.8, num_planes=4).collect()
    }
    assert approx <= exact


def test_word_shingles_short_docs(spark):
    """Docs with fewer than n words yield an EMPTY shingle set (matching
    the DuckDB oracle's range(1, greatest(len-2,0)+1)) — and must not crash
    on Spark's descending sequence(1, 0) → slice(ws, 0, n) path."""
    from kafka_connect_gcs_spark.operators.dedup_text import word_shingles

    df = spark.createDataFrame(
        [("a", ""), ("b", "one"), ("c", "one two"),
         ("d", "one two three"), ("e", "one two three four")],
        "doc_id string, text string",
    )
    got = {
        r.doc_id: sorted(r.sh)
        for r in df.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    assert got["a"] == [] and got["b"] == [] and got["c"] == []
    assert got["d"] == ["one two three"]
    assert got["e"] == ["one two three", "two three four"]
    # jaccard over short docs: no crash, no pairs (empty sets never match)
    pairs = ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {("d", "e")}


def test_connected_components_chain_ring_and_pairs(spark):
    """Hash-to-min CC: a chain (needs multiple propagation rounds), a ring,
    and a disjoint pair each collapse to their min id; non-edge nodes are
    absent (callers default them to themselves)."""
    from kafka_connect_gcs_spark.operators.dedup_text import (
        connected_components,
        neardup_dedup_decision,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5),      # chain 1-5
             (10, 11), (11, 12), (12, 10),        # ring
             (20, 21)]                            # pair
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    cc = {r.node: r.component for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                  10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    dec = {
        r.doc_id: (r.keep_id, r.drop)
        for r in neardup_dedup_decision(pairs).collect()
    }
    assert dec[5] == (1, True) and dec[1] == (1, False)
    assert dec[21] == (20, True) and dec[10] == (10, False)


def test_winnow_guarantee_and_short_docs(spark):
    """Winnowing invariant: two docs sharing a substring of length ≥ k+w-1
    share at least one fingerprint hash (both hash paths); sub-k docs get
    exactly one fingerprint; empty docs none."""
    from kafka_connect_gcs_spark.operators.text import winnow_fingerprint

    shared = "the quick brown fox jumps over"  # 30 chars ≥ 8+4-1
    df = spark.createDataFrame(
        [("a", f"AAAA {shared} BBBB"), ("b", f"zzz {shared} qqq"),
         ("c", "totally unrelated content here"),
         ("d", "ten chars!"),  # k ≤ 10 < k+w-1: fewer grams than the window
         ("e", ""), ("f", "tiny")],  # shorter than one k-gram: no prints
        "doc_id string, text string",
    )
    for portable in (False, True):
        fp = {
            r.doc_id: set(r.w)
            for r in df.select(
                "doc_id",
                winnow_fingerprint(F.col("text"), k=8, w=4, portable=portable)
                .alias("w"),
            ).collect()
        }
        assert fp["a"] & fp["b"], "shared substring must share a fingerprint"
        assert not (fp["a"] & fp["c"] and fp["b"] & fp["c"]) or fp["c"]
        assert len(fp["d"]) == 1  # sub-window doc: single min-hash print
        assert fp["e"] == set() and fp["f"] == set()


def test_multimodal_plumbing(spark):
    from kafka_connect_gcs_spark.operators.multimodal import (
        FakeCodec,
        MediaPipeline,
        synthesize_media,
    )

    media = synthesize_media(spark, n=60)
    pipe = MediaPipeline()
    feats = pipe.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r.feature) == FakeCodec.feature_dim for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.feature)
    # deterministic across runs
    again = {r.media_id: tuple(r.feature) for r in pipe.extract_features(media).collect()}
    assert {r.media_id: tuple(r.feature) for r in rows} == again

    plan = pipe.frame_sample_plan(media, every_ms=1000)
    one = media.where(F.col("kind") == "video").first()
    n_frames = plan.where(F.col("media_id") == one.media_id).count()
    import math

    assert n_frames == math.ceil(one.duration_ms / 1000)

    with pytest.raises(NotImplementedError):
        FakeCodec().resize([b"x"], 8, 8)


def test_default_codec_auto_detects_media_libs():
    """The codec seam upgrades itself: RealCodec where PIL imports,
    FakeCodec otherwise — no call-site change either way."""
    from kafka_connect_gcs_spark.operators.multimodal import (
        FakeCodec,
        RealCodec,
        default_codec,
    )

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    codec = default_codec()
    assert isinstance(codec, RealCodec if have_pil else FakeCodec)
    assert codec.feature_dim == FakeCodec.feature_dim


def test_real_codec_decodes_and_resizes():
    """Runs only where PIL exists (skipped in this sandbox): RealCodec
    must decode a PNG to 16 grayscale features and resize to PNG bytes,
    and degrade to hash features on undecodable payloads."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from kafka_connect_gcs_spark.operators.multimodal import FakeCodec, RealCodec

    buf = io.BytesIO()
    Image.new("RGB", (10, 10), (200, 30, 60)).save(buf, format="PNG")
    png = buf.getvalue()
    codec = RealCodec()
    feats = codec.features([png, b"not an image", None])
    assert len(feats[0]) == 16 and all(0.0 <= v <= 1.0 for v in feats[0])
    assert feats[1] == FakeCodec().features([b"not an image"])[0]
    assert feats[2] is None
    out = codec.resize([png, b"junk"], 4, 4)
    assert Image.open(io.BytesIO(out[0])).size == (4, 4)
    assert out[1] is None


def test_topk_two_phase_matches_single_window(spark):
    """topk_per_query (local per-partition head + bounded final window)
    must be row-identical to the naive single-window plan it replaced —
    including sim ties across vec_ids, which the (sim desc, id asc) total
    order resolves identically in both phases."""
    from pyspark.sql import Window

    from kafka_connect_gcs_spark.operators.similarity import topk_per_query

    scored = (
        spark.range(2000)
        .select(
            (F.col("id") % 4).alias("query_id"),
            F.col("id").alias("vec_id"),
            (F.pmod(F.xxhash64("id"), F.lit(50)) / 50.0).alias("sim"),
        )
        .repartition(8)
        .cache()
    )
    got = topk_per_query(scored, 7).collect()
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    want = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 7)
        .select("query_id", "vec_id", "sim", "rank")
        .collect()
    )
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    scored.unpersist()


def test_ivf_centroid_cache_hits_and_matches(spark, emb):
    """cache_key memoizes the trained quantizer; a hit must be
    bit-identical to retraining (training is deterministic)."""
    from kafka_connect_gcs_spark.operators.similarity import (
        _CENTROID_CACHE,
        ivf_assign,
    )

    _CENTROID_CACHE.clear()
    _, fresh = ivf_assign(emb, num_centroids=4, iterations=2, cache_key="k1")
    assert len(_CENTROID_CACHE) == 1
    _, cached = ivf_assign(emb, num_centroids=4, iterations=2, cache_key="k1")
    _, retrained = ivf_assign(emb, num_centroids=4, iterations=2)
    assert cached == fresh == retrained


def test_ngram_jaccard_composes_with_lsh_candidates(spark):
    """The exact scorer scoped to LSH candidates equals the all-pairs
    result restricted to the candidate set — the scalable composition
    (candidates from banding, exact Jaccard only on those pairs)."""
    from kafka_connect_gcs_spark.operators.dedup_text import minhash_lsh_pairs

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river"),
        (1, "the quick brown fox jumps over the lazy cat near the river"),
        (2, "machine learning systems need large curated training corpora"),
        (3, "machine learning systems need large curated training data corpora"),
        (4, "an entirely unrelated sentence about volcanic rock formations"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # candidates at a permissive threshold, no prefilter (exact candidate set)
    cand = minhash_lsh_pairs(
        df, num_hashes=16, bands=8, threshold=0.0, prefilter_slack=None
    ).select("id_a", "id_b")
    composed = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, n=1, threshold=0.6, candidates=cand).collect()
    }
    brute = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, n=1, threshold=0.6).collect()
    }
    cand_set = {(r.id_a, r.id_b) for r in cand.collect()}
    assert composed == {p: j for p, j in brute.items() if p in cand_set}
    assert (0, 1) in composed and (2, 3) in composed


def test_ngram_jaccard_all_pairs_guard(spark):
    import pytest

    df = spark.range(11).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("w"), F.col("id")).alias("text")
    )
    with pytest.raises(ValueError, match="all-pairs cartesian"):
        ngram_jaccard_pairs(df, max_all_pairs_docs=10)
    # explicit raise of the bound restores the brute-force path
    assert ngram_jaccard_pairs(df, max_all_pairs_docs=11).count() == 0


def test_connected_components_log_rounds_on_chain(spark):
    """Pointer jumping makes convergence O(log diameter): a 50-node chain
    (diameter 49) must converge within 8 rounds — the pre-jump algorithm
    moved the min label one hop per round and raised at 20. The changed
    count rides each round's checkpoint job as an Observation, so the
    whole fixpoint loop runs ONE job per round (asserted via job group)."""
    from kafka_connect_gcs_spark.operators.dedup_text import connected_components

    edges = [(i, i + 1) for i in range(49)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    # count SQL executions (actions), not jobs — AQE and broadcast
    # exchanges split one action into several jobs, but each round must
    # issue exactly ONE action (the old separate convergence count was a
    # second action per round). Delta the MAX execution id, not
    # executionsCount(): the status store retains at most
    # spark.sql.ui.retainedExecutions (1000), so deep into a shared-session
    # suite the count saturates at the cap and the delta reads 0 (the
    # "flake" three sessions chased); execution ids increase monotonically
    # and the newest entry always survives eviction.
    store = spark._jsparkSession.sharedState().statusStore()
    bus = spark.sparkContext._jsc.sc().listenerBus()

    def max_execution_id():
        lst = store.executionsList()
        return lst.last().executionId() if lst.size() > 0 else -1

    bus.waitUntilEmpty()
    e0 = max_execution_id()
    # max_local_edges=0 forces the DISTRIBUTED fixpoint (the default
    # size gate would solve 49 edges driver-side) — this test pins the
    # log-rounds property of the scale path
    result = connected_components(pairs, max_iterations=8, max_local_edges=0)
    bus.waitUntilEmpty()
    executions = max_execution_id() - e0
    cc = {r.node: r.component for r in result.collect()}
    assert cc == {i: 0 for i in range(50)}
    # one count action for the gate + ≤8 one-action rounds
    assert 0 < executions <= 9, f"expected ≤9 one-action rounds, saw {executions}"


def test_connected_components_local_matches_distributed(spark):
    """The size-gated driver union-find must label exactly like the
    distributed fixpoint: component = smallest reachable id, every node
    present — checked on a graph mixing a chain, a ring, singleton-free
    pairs and string ids."""
    from kafka_connect_gcs_spark.operators.dedup_text import (
        connected_components,
    )

    edges = (
        [(i, i + 1) for i in range(10)]
        + [(20, 21), (21, 22), (22, 20)]
        + [(30, 31)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {
        r.node: r.component for r in connected_components(pairs).collect()
    }
    dist = {
        r.node: r.component
        for r in connected_components(pairs, max_local_edges=0).collect()
    }
    assert local == dist
    spairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    slocal = {
        r.node: r.component for r in connected_components(spairs).collect()
    }
    assert slocal == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_pair_ops_eager_release_no_leaked_cache(spark, docs):
    """minhash_lsh_pairs / simhash_pairs default to eager mode: the bounded
    pair result is checkpointed and the signature cache released — at most
    the result's own storage may remain; eager=False must agree."""
    from kafka_connect_gcs_spark.operators.dedup_text import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    sample = docs.limit(120)
    sample.count()  # materialize the fixture's own .cache() first
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    m = minhash_lsh_pairs(sample, num_hashes=16, bands=4, threshold=0.4)
    m.count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before + 1
    lazy = minhash_lsh_pairs(
        sample, num_hashes=16, bands=4, threshold=0.4, eager=False
    )
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, lazy.collect()))

    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    s = simhash_pairs(sample, max_hamming=3, blocks=4)
    s.count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before + 1
    slazy = simhash_pairs(sample, max_hamming=3, blocks=4, eager=False)
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, slazy.collect()))


def test_semantic_dedup_decision(spark):
    from kafka_connect_gcs_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [10.0, 0.0, 0.0, 0.0]),
        (2, [10.0, 0.1, 0.0, 0.0]),   # ~1 with 1
        (3, [10.0, 0.0, 0.1, 0.0]),   # ~1 with 1 and 2 (transitive cluster)
        (4, [0.0, 10.0, 0.0, 0.0]),   # orthogonal singleton
        (5, [0.0, 0.0, 7.0, 7.0]),
        (6, [0.0, 0.0, 7.0, 7.1]),    # ~1 with 5
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: (r.keep_id, r.is_drop)
        for r in semantic_dedup(df, threshold=0.99, dim=4, exact=True).collect()
    }
    assert out == {
        1: (1, False),
        2: (1, True),
        3: (1, True),
        4: (4, False),
        5: (5, False),
        6: (5, True),
    }
    # all input columns survive alongside the decision
    cols = semantic_dedup(df, threshold=0.99, dim=4, exact=True).columns
    assert cols == ["vec_id", "embedding", "keep_id", "is_drop"]


def test_semantic_dedup_lsh_consistent_with_exact(spark, emb):
    """LSH-path decisions must be a relaxation of the exact path: any doc
    the LSH path drops must also be dropped by the exact path (buckets can
    only MISS pairs, never invent them)."""
    from kafka_connect_gcs_spark.operators.similarity import semantic_dedup

    exact = {
        r.vec_id: r.is_drop
        for r in semantic_dedup(emb, threshold=0.8, exact=True).collect()
    }
    lsh = {
        r.vec_id: r.is_drop
        for r in semantic_dedup(emb, threshold=0.8, num_planes=4).collect()
    }
    assert set(lsh) == set(exact)
    for vid, dropped in lsh.items():
        if dropped:
            assert exact[vid], vid


def test_connected_components_empty_edges(spark):
    """No near-dup pairs at all must be 'converged', not a 20-round spin:
    an Observation sum over zero rows observes NULL, not 0."""
    from kafka_connect_gcs_spark.operators.dedup_text import connected_components

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


def test_lsh_hashed_verify_matches_string_jaccard(spark, docs):
    """Production stores the cached shingle sets as xxhash64 longs (the
    verify join then shuffles 8-byte hashes, not strings); the reported
    jaccard must still equal the exact string-shingle value pair-for-pair
    (set sizes survive hashing short of an in-doc 64-bit collision)."""
    sample = docs.select("doc_id", "text").where(F.col("doc_id") < 150)
    truth = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(sample, n=3, threshold=0.05).collect()
    }
    got = minhash_lsh_pairs(
        sample, num_hashes=16, bands=8, threshold=0.3, shingle_n=3
    ).collect()
    for r in got:
        assert (r.id_a, r.id_b) in truth
        assert r.jaccard == pytest.approx(truth[(r.id_a, r.id_b)], abs=2e-6)


def test_neardup_keep_best_argmax_and_ties(spark):
    """Quality-aware decision: highest score survives per cluster, ties
    fall back to the smallest id; string ids work (type-agnostic argmax)."""
    from kafka_connect_gcs_spark.operators.dedup_text import neardup_keep_best

    edges = [(1, 2), (2, 3), (10, 11), (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    scores = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.5), (10, 0.4), (11, 0.4), (20, 0.2), (21, 0.8)],
        "doc_id long, score double",
    )
    dec = {
        r.doc_id: (r.keep_id, r.is_drop)
        for r in neardup_keep_best(pairs, scores).collect()
    }
    assert dec[2] == (2, False) and dec[1] == (2, True) and dec[3] == (2, True)
    assert dec[10] == (10, False) and dec[11] == (10, True)  # tie -> min id
    assert dec[21] == (21, False) and dec[20] == (21, True)

    spairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    sscores = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("c", 2.0)], "doc_id string, score double"
    )
    sdec = {
        r.doc_id: r.keep_id for r in neardup_keep_best(spairs, sscores).collect()
    }
    assert sdec == {"a": "c", "b": "c", "c": "c"}
