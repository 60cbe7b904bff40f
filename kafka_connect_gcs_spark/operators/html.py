"""HTML text extraction: the raw-crawl -> clean-text stage (WET-file
generation) that runs before every other curation operator when the
input is crawled markup rather than plain text.

Everything is JVM-side codegen (``regexp_replace`` / ``regexp_extract``
chains) — ONE map-only projection per document, no shuffle, no Python in
the hot path. Patterns are restricted to the RE2 ∩ java.util.regex
common dialect (inline ``(?is)`` flags, lazy quantifiers, no
lookaround/backreferences) so the DuckDB oracle runs the byte-identical
expressions.

This is deliberately a REGEX extractor, not an HTML5 parser: at corpus
scale the goal is boilerplate-free visible text with deterministic,
engine-portable semantics (trafilatura/jusText-class DOM heuristics are
not reproducible across engines). The extraction order matters and is
part of the contract:

1. strip comments (``<!-- -->`` may contain markup),
2. strip <script>/<style> subtrees (their CONTENT is not text — and a
   naked ``1 < 2`` inside a script would otherwise corrupt tag removal),
3. replace every remaining tag with a space (block boundaries must not
   glue words together),
4. decode the common entities, ``&amp;`` LAST (never double-decode),
5. collapse whitespace and trim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: extraction patterns, in application order (shared with the oracle)
COMMENT_RE = r"(?s)<!--.*?-->"
SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
HEAD_RE = r"(?is)<head[^>]*>.*?</head>"
TAG_RE = r"(?s)<[^>]*>"
TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
HREF_RE = r"(?i)href\s*=\s*\"([^\"]*)\""

#: (entity, replacement) in application order — ``&amp;`` must be last
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def decode_entities(col: Column) -> Column:
    """Decode the common named/numeric entities (amp last)."""
    for ent, rep in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def strip_invisible(col: Column) -> Column:
    """Remove the regions that never render: comments (which may contain
    markup), <script> and <style> subtrees. Every extractor starts here —
    a commented-out ``<a href>`` is not a link and script text is not
    text."""
    out = F.regexp_replace(col, COMMENT_RE, " ")
    out = F.regexp_replace(out, SCRIPT_RE, " ")
    return F.regexp_replace(out, STYLE_RE, " ")


def _text_of(stripped: Column) -> Column:
    # <head> content (title/meta) is metadata, not body text — but it
    # stays visible to _title_of, so drop it here, not in strip_invisible
    out = F.regexp_replace(stripped, HEAD_RE, " ")
    out = F.regexp_replace(out, TAG_RE, " ")
    out = decode_entities(out)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def _title_of(stripped: Column) -> Column:
    return F.trim(decode_entities(F.regexp_extract(stripped, TITLE_RE, 1)))


def _links_of(stripped: Column) -> Column:
    return F.regexp_extract_all(stripped, F.lit(HREF_RE), 1)


def extract_text(col: Column) -> Column:
    """Visible text of an HTML document (module-docstring pipeline)."""
    return _text_of(strip_invisible(col))


def extract_title(col: Column) -> Column:
    """<title> content, entity-decoded and trimmed ('' when absent)."""
    return _title_of(strip_invisible(col))


def extract_links(col: Column) -> Column:
    """All double-quoted href values in VISIBLE markup, in document
    order (raw values — resolution/normalization is :mod:`urls`' job)."""
    return _links_of(strip_invisible(col))


def parse_html(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    carry_cols: tuple = (),
) -> DataFrame:
    """``(id_col, *carry_cols, title, links array<string>, text)`` — one
    map-only projection over the crawl; feeds the text operators
    (quality_gate, dedup, chunking) directly."""
    from kafka_connect_gcs_spark.operators.cdc_chunking import let_

    # strip the invisible regions ONCE and share it across the three
    # extractors via a let-binding (cdc_chunking.let_ — inlining the
    # strip chain three times would triple the heaviest regex passes);
    # unpack through inline(): a generator is an optimizer barrier, so
    # the struct is evaluated once per row (a 3-field struct access in a
    # projection would re-inline the whole chain per field)
    parts = let_(
        strip_invisible(F.col(html_col)),
        lambda s: F.struct(
            _title_of(s).alias("title"),
            _links_of(s).alias("links"),
            _text_of(s).alias("text"),
        ),
    )
    return df.select(id_col, *carry_cols, F.inline(F.array(parts)))


#: a complete visible ``<a href="...">...</a>`` element (double-quoted
#: href, RE2∩Java dialect, lazy body so adjacent anchors don't merge)
ANCHOR_RE = r"(?is)<a\s[^>]*href\s*=\s*\"[^\"]*\"[^>]*>.*?</a>"


def extract_anchors(col: Column) -> Column:
    """``array<struct<href,anchor>>`` of the VISIBLE ``<a>`` elements:
    the raw href plus the anchor's rendered text (inner tags stripped,
    entities decoded, whitespace collapsed) in document order. The
    invisible-region strip runs once on the whole page; the per-element
    regexes cost ∝ the (bounded) link count."""
    elems = F.regexp_extract_all(strip_invisible(col), F.lit(ANCHOR_RE), 0)
    return F.transform(
        elems,
        lambda e: F.struct(
            F.regexp_extract(e, HREF_RE, 1).alias("href"),
            F.trim(
                F.regexp_replace(
                    decode_entities(F.regexp_replace(e, TAG_RE, " ")),
                    r"\s+",
                    " ",
                )
            ).alias("anchor"),
        ),
    )


def anchor_text_agg(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Anchor-text aggregation per TARGET registrable domain — the
    link-context signal web pipelines mine for ranking (the classic
    anchor-text corpus) and for label-free topic hints: for every domain
    the crawl links TO, the inbound link count, distinct linking docs,
    distinct anchor strings, and the lexicographically first anchor (a
    deterministic exemplar). Relative hrefs carry no authority and are
    excluded — resolution against a base URL is a crawl-frontier concern.

    Scale shape: one map-only extract + explode (∝ links on the page,
    bodies never carried), then ONE aggregate keyed by the target
    domain; the two exact count-distincts expand the link rows 2× into
    the shuffle — the floor for exact per-domain distinct counts (swap
    in HLL from :mod:`sketches` when approximate is acceptable at the
    full 10^10-link graph).
    """
    from kafka_connect_gcs_spark.operators.urls import (
        registrable_domain,
        url_host,
    )

    flat = df.select(
        F.col(id_col), F.explode(extract_anchors(F.col(html_col))).alias("a")
    ).select(
        id_col,
        F.col("a.href").alias("href"),
        F.col("a.anchor").alias("anchor"),
    )
    tgt = flat.withColumn(
        "domain", registrable_domain(url_host(F.col("href")))
    ).where(F.col("domain") != "")
    return tgt.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct(id_col).alias("n_src_docs"),
        F.countDistinct("anchor").alias("n_anchors"),
        F.min("anchor").alias("first_anchor"),
    )
