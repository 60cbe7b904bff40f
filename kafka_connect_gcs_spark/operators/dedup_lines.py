"""Cross-document line deduplication — the C4 / CCNet boilerplate pass.

Web corpora repeat whole LINES across documents (cookie banners,
navigation menus, "all rights reserved" footers); C4 removes any line
occurring ≥ 3 times in the corpus, CCNet deduplicates paragraphs across
shards. This module is that pass over a ``(doc_id, text)`` table:

* :func:`line_stats` — the corpus-wide line frequency table, ONE
  aggregate grouped by the line string. The exchange carries
  ``(line, doc)`` count partials (map-side combined), never documents.
* :func:`dedup_lines` — rewrite documents under one of two policies:

  - ``drop_all``: remove EVERY occurrence of any line appearing in
    ``min_docs`` or more DISTINCT documents (the C4 boilerplate rule —
    within-doc repetition alone never triggers it; that is
    :func:`~kafka_connect_gcs_spark.operators.curation.repetition_stats`'
    job);
  - ``keep_first``: exact line dedup — of all occurrences of a
    duplicated line (within or across docs), only the globally first by
    ``(doc_id, pos)`` survives.

  Blank lines (whitespace-only) are STRUCTURAL and exempt under both
  policies: they carry paragraph layout, not content, and dropping "the
  most frequent line in the corpus is the empty string" is a classic
  implementation bug this module pins tests against.

Scale shape (the 100 TB question): the duplicate-line table is the only
corpus-scale aggregate, and it aggregates line STRINGS with map-side
partial counts — the same floor C4's own implementation pays. Document
rebuilds are then confined to AFFECTED docs only: ONE conditional left
join against the narrow per-doc position sets rebuilds affected docs and
passes untouched documents through byte-exact (the CASE branch never
re-splits them; plan- and byte-asserted in tests/test_dedup_lines.py) —
a single scan of the document relation. The rebuild shuffle therefore
scales with the volume of text in affected docs, not the corpus. Docs
whose every line is dropped survive as empty strings (the doc row is
never lost).

No reference analog (eeveebank/kafka-connect-gcs moves opaque byte
records); part of the training-data-curation surface the engine adds, a
sibling of operators/dedup_text.py (whole-doc near-dup) and
operators/dedup_spans.py (sub-line span dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, line): 0-based position explode of the newline split.

    The input is round-robin spread first (operators/util.py): a one-file
    corpus otherwise pins the split+explode — and every stage planned on
    top of the persisted explosion — to the scan's 1-2 tasks (measured
    ~2 s per stage at sf1.0 dense worst case vs ~0.3 s spread). Results
    are partition-order independent (aggregates and joins only)."""
    from kafka_connect_gcs_spark.operators.util import spread_small_input

    return spread_small_input(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    )


def _is_blank(line: Column) -> Column:
    return F.trim(line) == ""


def line_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_blank: bool = False,
) -> DataFrame:
    """Corpus line-frequency table ``(line, n_docs, n_occ)``:
    ``n_docs`` = distinct documents containing the line, ``n_occ`` = total
    occurrences. ONE aggregate; the shuffle carries (line, doc) partials.

    Whitespace-only lines are excluded unless ``include_blank`` — they
    dominate any web corpus and are structural, not content.
    """
    ln = _lines(df, text_col, id_col)
    if not include_blank:
        ln = ln.where(~_is_blank(F.col("line")))
    return ln.groupBy("line").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occ"),
    )


def dedup_lines(
    df: DataFrame,
    policy: str = "drop_all",
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    eager: bool = True,
    max_broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """Rewrite documents with duplicated lines removed; returns
    ``(id_col, text_col)`` with the SAME column names, one row per input
    document (empty string if every line was dropped).

    ``policy="drop_all"`` removes every occurrence of lines whose
    DISTINCT-document frequency is ≥ ``min_docs`` (the C4 boilerplate
    rule; C4 itself uses 3). ``policy="keep_first"`` keeps only the
    globally first occurrence — minimum ``(doc_id, pos)`` — of each line
    occurring more than once anywhere, dropping the rest.

    Blank (whitespace-only) lines are never dropped under either policy.
    ``id_col`` must be unique (it is the rebuild group key and the
    passthrough anti-join key).

    Plan shape: offending occurrences are located by joining the line
    explosion against the duplicate-line table, then grouped into ONE row
    per affected document (``collect_set(pos)``) — the single exchange the
    rewrite pays beyond the duplicate-table aggregate. Affected documents
    are rebuilt by a pure map-only projection (re-split, index-filter via
    the position set, re-join — no second explode, no per-doc collect of
    line text); untouched documents keep their original bytes through the
    same single conditional left join — one scan, no separate
    passthrough branch.
    An earlier shape checkpointed the raw ``(id, pos)`` occurrence rows
    and re-exploded affected docs into a sorted per-doc collect; in the
    dense worst case (every line duplicated) that materialized and then
    re-shuffled corpus-scale line text — measured 2× slower at the
    scaling bench than this grouped form.

    With ``eager=True`` (default) the line explosion is persisted across
    its two consumers (the duplicate-table aggregate and the mark join),
    the duplicate-line table is persisted, counted, and BROADCAST into
    the mark join when it fits ``max_broadcast_rows`` (the real count,
    not a guess — and an EXPLICIT hint: the mark side sits above the
    cached explosion, where AQE does not re-plan the join from runtime
    stats), and the grouped per-doc position relation is checkpointed
    once before both caches are released. ``eager=False`` keeps the
    whole plan lazy (plan inspection / composition) with the original
    shuffle joins.
    """
    if policy not in ("drop_all", "keep_first"):
        raise ValueError(f"unknown policy {policy!r}")
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")

    ln = _lines(df, text_col, id_col)
    nonblank = ln.where(~_is_blank(F.col("line")))
    if eager:
        from pyspark import StorageLevel

        # the split+explode (and whatever upstream projection produced
        # text_col) otherwise re-runs for BOTH consumers below (the
        # duplicate-table aggregate and the mark join) — measured ~1.3 s
        # per pass on the dense worst case at sf1.0
        nonblank = nonblank.persist(StorageLevel.MEMORY_AND_DISK)

    if policy == "drop_all":
        dup = (
            nonblank.groupBy("line")
            .agg(F.countDistinct(id_col).alias("_nd"))
            .where(F.col("_nd") >= min_docs)
            .select("line")
        )
        mark_keys, mark_filter = dup, None
    else:  # keep_first
        firsts = (
            nonblank.groupBy("line")
            .agg(
                F.min(
                    F.struct(
                        F.col(id_col).alias("i"), F.col("pos").alias("p")
                    )
                ).alias("_f"),
                F.count(F.lit(1)).alias("_c"),
            )
            .where(F.col("_c") >= 2)
            .select("line", "_f")
        )
        mark_keys = firsts
        mark_filter = ~(
            (F.col(id_col) == F.col("_f.i")) & (F.col("pos") == F.col("_f.p"))
        )

    if eager:
        from pyspark import StorageLevel

        # explicit count-gated broadcast: the mark side sits above the
        # CACHED explosion, where AQE does not re-plan the join from
        # runtime stats (measured: the no-hint shape shuffled the whole
        # explosion by line — 4.8 s vs 2.5 s warm at sf1.0 dense); the
        # count is one cheap job over the cached explosion and keeps the
        # decision row-bounded instead of unconditionally broadcasting
        mark_keys = mark_keys.persist(StorageLevel.MEMORY_AND_DISK)
        side = (
            F.broadcast(mark_keys)
            if mark_keys.count() <= max_broadcast_rows
            else mark_keys
        )
    else:
        side = mark_keys
    offending = nonblank.join(side, "line")
    if mark_filter is not None:
        offending = offending.where(mark_filter)
    # ONE row per affected document: the set of 0-based line positions to
    # drop — grouped here so downstream needs no second corpus explode and
    # no per-doc collect of line TEXT (positions are ints; the text ships
    # only inside the original doc row)
    off_by_doc = offending.groupBy(id_col).agg(
        F.collect_set("pos").alias("_dp")
    )
    if eager:
        off_by_doc = off_by_doc.localCheckpoint(eager=True)
        mark_keys.unpersist()
        nonblank.unpersist()

    # ONE pass over the corpus: LEFT join the narrow per-doc position
    # sets and rebuild CONDITIONALLY — untouched docs (null _dp) keep
    # their original bytes (the CASE branch never evaluates the re-split
    # for them), affected docs re-split once inside a projection, keep
    # lines whose index is not in the drop set, re-join. A doc whose
    # every line was offending keeps its row as "". An earlier shape ran
    # a rebuild join PLUS a LEFT ANTI passthrough — two full scans of the
    # document relation (and of whatever projection feeds it) where this
    # needs one.
    parts = F.split(F.col(text_col), "\n", -1)
    indexed = F.zip_with(
        parts,
        F.sequence(F.lit(0), F.size(parts) - 1),
        lambda line, i: F.struct(line.alias("l"), i.alias("i")),
    )
    kept = F.filter(
        indexed, lambda s: ~F.array_contains(F.col("_dp"), s["i"])
    )
    return (
        df.select(id_col, text_col)
        .join(off_by_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("_dp").isNull(), F.col(text_col))
            .otherwise(
                F.concat_ws("\n", F.transform(kept, lambda s: s["l"]))
            )
            .alias(text_col),
        )
    )


def _rebuild_without(text_col: str, dp_col: str) -> "Column":
    """Conditional rebuild expression: the original bytes when ``dp_col``
    is NULL or empty (untouched doc — the re-split never evaluates),
    otherwise the doc re-split once with the 0-based positions in
    ``dp_col`` removed and re-joined."""
    parts = F.split(F.col(text_col), "\n", -1)
    indexed = F.zip_with(
        parts,
        F.sequence(F.lit(0), F.size(parts) - 1),
        lambda line, i: F.struct(line.alias("l"), i.alias("i")),
    )
    kept = F.filter(
        indexed, lambda s: ~F.array_contains(F.col(dp_col), s["i"])
    )
    return (
        F.when(
            F.col(dp_col).isNull() | (F.size(F.col(dp_col)) == 0),
            F.col(text_col),
        )
        .otherwise(F.concat_ws("\n", F.transform(kept, lambda s: s["l"])))
    )


def dedup_lines_both(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    eager: bool = True,
) -> DataFrame:
    """BOTH policies of :func:`dedup_lines` in one shared pass: returns
    ``(id_col, <text_col>_drop_all, <text_col>_keep_first)``, one row per
    input document, where each text column equals the corresponding
    single-policy rewrite bit-for-bit.

    A caller that needs both policies (audit queries comparing rules,
    A/B curation runs) would otherwise explode and aggregate the corpus
    TWICE — the line explosion and the line-frequency table are the only
    corpus-scale work in this module, and they are policy-independent.
    This variant explodes once, computes ONE line aggregate carrying
    everything either policy needs (distinct-doc count for ``drop_all``,
    total count and globally-first occurrence for ``keep_first``), marks
    both policies' offending positions in ONE join + ONE per-doc
    ``collect_set`` pair, and rebuilds both texts in a single conditional
    projection — halving the exchanges and fixed job count of two
    separate calls (guide §2.4: share the exchange; measured 3.1 s → per
    the two-call shape at sf0.1, see OPTIMIZATION_r06.md).
    """
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")

    ln = _lines(df, text_col, id_col)
    nonblank = ln.where(~_is_blank(F.col("line")))
    if eager:
        from pyspark import StorageLevel

        nonblank = nonblank.persist(StorageLevel.MEMORY_AND_DISK)

    stats = (
        nonblank.groupBy("line")
        .agg(
            F.countDistinct(id_col).alias("_nd"),
            F.count(F.lit(1)).alias("_c"),
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))
            ).alias("_f"),
        )
        # keep only lines relevant to EITHER policy — the mark join's
        # build side stays duplicate-vocabulary-sized; it is an aggregate
        # output, so AQE broadcasts it from its RUNTIME bytes (measured:
        # the count-gated explicit hint of dedup_lines costs one extra
        # job here, 1.96 s vs 1.28 s at sf0.1 on the boilerplate query,
        # while AQE picks the same broadcast; oversized mark tables
        # degrade to a shuffle join instead of a forced broadcast)
        .where((F.col("_nd") >= min_docs) | (F.col("_c") >= 2))
    )
    side = stats

    not_first = ~(
        (F.col(id_col) == F.col("_f.i")) & (F.col("pos") == F.col("_f.p"))
    )
    off_by_doc = (
        nonblank.join(side, "line")
        .groupBy(id_col)
        .agg(
            # collect_set skips NULLs: a doc offending under only one
            # policy gets an EMPTY set for the other (rebuild passes the
            # original bytes through for empty sets)
            F.collect_set(
                F.when(F.col("_nd") >= min_docs, F.col("pos"))
            ).alias("_dpa"),
            F.collect_set(
                F.when((F.col("_c") >= 2) & not_first, F.col("pos"))
            ).alias("_dpk"),
        )
    )
    if eager:
        off_by_doc = off_by_doc.localCheckpoint(eager=True)
        nonblank.unpersist()

    return (
        df.select(id_col, text_col)
        .join(off_by_doc, id_col, "left")
        .select(
            F.col(id_col),
            _rebuild_without(text_col, "_dpa").alias(f"{text_col}_drop_all"),
            _rebuild_without(text_col, "_dpk").alias(f"{text_col}_keep_first"),
        )
    )
