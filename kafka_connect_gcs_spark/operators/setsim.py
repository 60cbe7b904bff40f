"""Exact set-similarity join via prefix filtering (PPJoin family).

:func:`ngram_jaccard_pairs` scores exact Jaccard but needs a candidate
relation to avoid the O(n²) self-join; the engine's LSH families produce
candidates *probabilistically* (false negatives at a tunable rate). This
module adds the third option a 100 TB curation stack wants: an EXACT
similarity join — every pair with Jaccard ≥ t, no false negatives — whose
candidate generation is the prefix-filtering principle (Chaudhuri et al.
SSJoin, ICDE 2006; Xiao et al. PPJoin, WWW 2008) in the distributed shape
of Vernica et al., SIGMOD 2010 ("Efficient Parallel Set-Similarity Joins
Using MapReduce").

The lemma: order every set's tokens by one global total order (here
ascending document frequency, ties by token — rarest first) and keep only
the first ``p = |x| - ceil(t*|x|) + 1`` tokens (the *prefix*). Two sets
with Jaccard ≥ t MUST share at least one token prefix-to-prefix; if the
intersection avoided x's prefix entirely it would fit inside x's last
``ceil(t*|x|) - 1`` tokens, yet ``J ≥ t`` forces ``|a∩b| ≥ t*max ≥
t*|x|`` — contradiction. So joining prefix-exploded against
prefix-exploded is a LOSSLESS blocking scheme, and the driver oracle
(the naive quadratic join) proves it: a hash match means not one pair
was missed.

Why this scales where the all-pairs join can't:

* the join key is a token *chosen to be rare* — prefixes keep each
  set's lowest-frequency tokens, so per-token bucket sizes stay small
  and the self-join's output is near the true-pair floor instead of
  quadratic (stop-word buckets never form: ``the`` is ordered last and
  falls outside every prefix at any realistic threshold);
* prefix length shrinks as the threshold rises (t = 0.8 keeps ~20% of
  each set), so the exploded relation is a fraction of token volume;
* the length filter (``J ≥ t ⇒ t*|a| ≤ |b| ≤ |a|/t``) prunes
  candidates before the verify join ships any shingle sets;
* every stage is a plain aggregate / equi-join — map-side combined
  frequency counts, one token-volume exchange to attach frequencies,
  one to re-group per doc, then the (small) prefix self-join. Nothing
  driver-side, nothing quadratic, no Python in the hot path.

Float-robust prefix arithmetic: ``ceil(t*|x|)`` computed in binary
floating point can land one ULP ABOVE the true integer (0.8*5 →
4.000000000000001 → ceil 5), silently SHRINKING the prefix and breaking
losslessness. All ceils here subtract 1e-9 first — an error in that
direction only ever widens the prefix / loosens the length filter, which
costs a few candidates but can never drop a true pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup_text import ngram_jaccard_pairs, staged_shingles
from .util import spread_small_input


def _safe_ceil(x):
    """ceil that cannot round an exact integer UP a unit via float error."""
    return F.ceil(x - F.lit(1e-9))


def jaccard_prefix_candidates(
    df: DataFrame,
    threshold: float,
    n: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    is_small: "bool | None" = None,
) -> DataFrame:
    """(id_a, id_b) candidate pairs — a provable superset of all pairs with
    word-``n``-gram Jaccard ≥ ``threshold`` (prefix + length filters only;
    compose with :func:`ngram_jaccard_pairs` ``candidates=`` to verify, or
    use :func:`jaccard_prefix_join` which does exactly that)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    # spread KEYED BY DOC: the per-doc re-group below then reuses this one
    # exchange (HashPartitioning(id) satisfies the (id, sz) clustering)
    # instead of shuffling the full token volume a second time
    spark = df.sparkSession
    if is_small is None:
        try:
            files = df.inputFiles()
        except Exception:
            files = []
        is_small = bool(files) and len(files) < spark.sparkContext.defaultParallelism
    sh = staged_shingles(
        spread_small_input(df, is_small, by=[id_col]), id_col, text_col, n
    )
    toks = sh.select(
        F.col(id_col), F.size("sh").alias("sz"), F.explode("sh").alias("tok")
    )
    # document frequency per token: map-side combined, exchange ∝ vocab
    tf = toks.groupBy("tok").agg(F.count("*").alias("df_cnt"))
    # attach frequencies, then rebuild each set in canonical order by
    # sorting (df_cnt, tok) structs per doc: a per-group sort, NOT a
    # global rank (no single-partition window anywhere). For a small
    # (already-spread) input the frequency relation is vocabulary-scale —
    # broadcast it so neither the attach join nor the re-group shuffles
    # the token volume; at real scale the planner keeps the shuffle join
    # (shingle vocabulary grows with the corpus, blind broadcast would
    # not survive 100 TB).
    ordered = (
        toks.join(F.broadcast(tf) if is_small else tf, "tok")
        .groupBy(id_col, "sz")
        .agg(F.array_sort(F.collect_list(F.struct("df_cnt", "tok"))).alias("ord"))
    )
    # prefix length p = sz - ceil(t*sz) + 1  (≥ 1; slice of an empty set
    # is empty, so zero-shingle docs emit no candidates — correct: their
    # Jaccard with anything is 0 < t)
    plen = (F.col("sz") - _safe_ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int")
    prefix = ordered.select(
        F.col(id_col),
        F.col("sz"),
        F.explode(F.transform(F.slice("ord", 1, plen), lambda s: s["tok"])).alias(
            "tok"
        ),
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "tok"
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "tok"
    )
    return (
        a.join(b, "tok")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length filter: J ≥ t ⇒ |b| ≥ ceil(t|a|) and |a| ≥ ceil(t|b|)
            & (F.col("sz_b") >= _safe_ceil(F.lit(threshold) * F.col("sz_a")))
            & (F.col("sz_a") >= _safe_ceil(F.lit(threshold) * F.col("sz_b")))
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard_prefix_join(
    df: DataFrame,
    threshold: float,
    n: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    is_small: "bool | None" = None,
) -> DataFrame:
    """EXACT similarity self-join: every pair with word-``n``-gram Jaccard
    ≥ ``threshold``, as (id_a, id_b, jaccard) with id_a < id_b.

    Identical output to the quadratic all-pairs form of
    :func:`ngram_jaccard_pairs` (the driver oracle IS that naive join —
    a hash match proves the prefix filter lossless), produced with
    equi-joins only."""
    cands = jaccard_prefix_candidates(
        df, threshold, n=n, text_col=text_col, id_col=id_col, is_small=is_small
    )
    return ngram_jaccard_pairs(
        df,
        n=n,
        threshold=threshold,
        text_col=text_col,
        id_col=id_col,
        candidates=cands,
    )
