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
rebuilds are then confined to AFFECTED docs only: untouched documents
pass through a ``LEFT ANTI`` join on the narrow affected-id relation,
byte-exact, never re-split and never re-concatenated (plan-asserted in
tests/test_dedup_lines.py). The rebuild shuffle therefore scales with the
volume of text in affected docs, not the corpus. Docs whose every line is
dropped survive as empty strings (the doc row is never lost).

No reference analog (eeveebank/kafka-connect-gcs moves opaque byte
records); part of the training-data-curation surface the engine adds, a
sibling of operators/dedup_text.py (whole-doc near-dup) and
operators/dedup_spans.py (sub-line span dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, line): 0-based position explode of the newline split."""
    return df.select(
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
    explosion against the duplicate-line table; only documents owning at
    least one offending occurrence are re-split and re-assembled
    (``concat_ws`` over a per-doc sorted collect bounded by the doc's own
    line count). Everything else passes through a LEFT ANTI join against
    the narrow affected-id relation — original bytes, no rewrite cost.

    With ``eager=True`` (default) the duplicate-line table is persisted,
    counted, and BROADCAST into the mark join when it fits
    ``max_broadcast_rows`` (the real count, not a guess) — the corpus
    line explosion then never shuffles for the mark; and the narrow
    ``(id, pos)`` offending relation (referenced twice downstream) is
    checkpointed once, so the corpus is not re-exploded per consumer and
    the duplicate-table cache is released before returning.
    ``eager=False`` keeps the whole plan lazy (plan inspection /
    composition) with the original shuffle joins.
    """
    if policy not in ("drop_all", "keep_first"):
        raise ValueError(f"unknown policy {policy!r}")
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")

    ln = _lines(df, text_col, id_col)
    nonblank = ln.where(~_is_blank(F.col("line")))

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
    offending = offending.select(id_col, "pos")
    if eager:
        offending = offending.localCheckpoint(eager=True)
        mark_keys.unpersist()

    affected_ids = offending.select(id_col).distinct()

    # rebuild ONLY affected docs: semi-join the DOCUMENTS first so the
    # rebuild re-explodes just the affected text (the corpus-scale first
    # explosion above exists only inside the dup-table aggregate), then
    # drop the offending (id, pos) occurrences and reassemble in order
    affected_docs = df.select(id_col, text_col).join(
        affected_ids, id_col, "semi"
    )
    remaining = _lines(affected_docs, text_col, id_col).join(
        offending.withColumn("_drop", F.lit(True)),
        [id_col, "pos"],
        "left",
    ).where(F.col("_drop").isNull())
    rebuilt_text = remaining.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("pos").alias("p"), F.col("line").alias("l"))
                    )
                ),
                lambda s: s["l"],
            ),
        ).alias(text_col)
    )
    # a doc whose every line was offending has no remaining rows: keep the
    # doc as an empty string rather than losing the row
    rebuilt = affected_ids.join(rebuilt_text, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
    )

    # untouched docs pass through byte-exact — never re-split/re-joined
    untouched = df.select(id_col, text_col).join(
        affected_ids, id_col, "left_anti"
    )
    return untouched.unionByName(rebuilt)
