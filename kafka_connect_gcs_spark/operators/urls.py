"""URL / domain curation — host extraction, registrable-domain
derivation, and blocklist filtering.

Web-scale corpora are filtered by domain before anything touches the
text: UT1/adult blocklists in RefinedWeb and FineWeb, allowlists for
curated subsets, per-domain budgets (that part is
``sampling.cap_per_key``). This module is the URL side of that stage:

* :func:`url_host` — hostname out of a URL string, one codegen
  ``regexp_extract`` (scheme-relative and bare-authority forms included,
  ports and userinfo stripped, lowercased);
* :func:`registrable_domain` — the eTLD+1 under a DETERMINISTIC
  simplification of the Public Suffix List: a built-in set of common
  two-level public suffixes (``co.uk``-style, overridable) plus the
  default single-label rule. The full PSL is a data file that changes
  monthly — a reproducible pipeline pins its suffix set in config, so
  the operator takes it as an argument rather than shipping a snapshot;
* :func:`filter_blocked_domains` — drop (or just mark) documents whose
  registrable domain is in a blocklist. The corpus side stays MAP-ONLY:
  the blocklist is a per-executor literal when it is a python list, or a
  broadcast anti/left join when it is a DataFrame (blocklists are
  thousands to low millions of rows — broadcast-sized by construction).

Everything here is pure projection/broadcast work: no corpus shuffle at
any size (plan-asserted in tests/test_urls.py). Regexes stay in the
RE2∩java.util.regex dialect so the DuckDB oracle replays byte-for-byte.

No reference analog (the connector moves opaque bytes); part of the
training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hostname of a URL: optional scheme / scheme-relative prefix, optional
#: userinfo, host captured up to port/path/query/fragment. RE2-safe (no
#: lookaround), replayable in DuckDB.
_HOST_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?(?://)?(?:[^/@?#]*@)?([^/:?#]+)"

#: common two-level public suffixes — the deterministic default for
#: :func:`registrable_domain`; pass the pipeline's pinned set to extend.
DEFAULT_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def url_host(col: Column) -> Column:
    """Lowercased hostname of a URL string (empty string when the value
    has no authority-ish prefix — callers treat '' as unparseable)."""
    return F.lower(F.regexp_extract(col, _HOST_RE, 1))


def registrable_domain(
    host: Column,
    two_level_suffixes: "tuple[str, ...]" = DEFAULT_TWO_LEVEL_SUFFIXES,
) -> Column:
    """eTLD+1 of a hostname: the last three labels when the last two form
    a known two-level public suffix, else the last two labels; a bare
    label (no dot) passes through unchanged. Pure array expressions over
    one split — no UDF, no shuffle."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    is_two_level = last2.isin(*two_level_suffixes)
    return (
        F.when(n <= 2, host)
        .when((n >= 3) & is_two_level, last3)
        .otherwise(last2)
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist,
    url_col: str = "url",
    mode: str = "drop",
    domain_col: str = "domain",
    flag_col: str = "blocked",
    two_level_suffixes: "tuple[str, ...]" = DEFAULT_TWO_LEVEL_SUFFIXES,
) -> DataFrame:
    """Filter (``mode="drop"``) or annotate (``mode="mark"``) documents by
    the registrable domain of ``url_col``.

    ``blocklist`` is either a python sequence of registrable domains (a
    pinned config artifact — becomes a literal ``isin``, the corpus plan
    stays one map-only projection) or a single-column DataFrame (a
    maintained blocklist table — joined broadcast; the corpus side still
    never shuffles). Blocking is by registrable-domain equality, so
    ``example.com`` blocks every subdomain, the standard UT1 semantics.

    ``mode="mark"`` appends ``domain_col`` + boolean ``flag_col`` and
    keeps every row (the lineage-friendly form); ``mode="drop"`` returns
    the surviving rows without helper columns.
    """
    if mode not in ("drop", "mark"):
        raise ValueError(f"unknown mode {mode!r}")
    dom = registrable_domain(
        url_host(F.col(url_col)), two_level_suffixes
    )
    out = df.withColumn(domain_col, dom)
    if isinstance(blocklist, DataFrame):
        bcols = blocklist.columns
        if len(bcols) != 1:
            raise ValueError(
                f"blocklist DataFrame must have exactly 1 column: {bcols}"
            )
        bl = F.broadcast(
            blocklist.select(F.col(bcols[0]).alias(domain_col)).distinct()
        )
        if mode == "drop":
            return out.join(bl, domain_col, "left_anti").drop(domain_col)
        hit = bl.withColumn(flag_col, F.lit(True))
        return out.join(hit, domain_col, "left").withColumn(
            flag_col, F.coalesce(F.col(flag_col), F.lit(False))
        )
    domains = sorted({str(d).lower() for d in blocklist})
    if not domains:
        flag = F.lit(False)
    else:
        flag = F.col(domain_col).isin(*domains)
    if mode == "drop":
        return out.where(~flag).drop(domain_col)
    return out.withColumn(flag_col, flag)


#: query parameters that never identify a resource — the classic tracking
#: set stripped by crawl canonicalizers (RE2∩Java dialect, anchored).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)="

#: scheme → default port, dropped during canonicalization
_DEFAULT_PORTS = (("http", "80"), ("https", "443"))


def canonicalize_url(
    col: Column,
    strip_www: bool = True,
    tracking_param_re: str = TRACKING_PARAM_RE,
) -> Column:
    """Canonical form of an http(s)-ish URL for frontier/corpus dedup:
    fragment dropped, scheme + host lowercased (missing scheme →
    ``http``), trailing-dot and (optionally) ``www.`` stripped from the
    host, default ports removed, empty path normalized to ``/``, query
    parameters filtered of tracking keys and SORTED so parameter order
    can't split a group. Everything is codegen regex + array built-ins —
    one map-only projection, replayable in DuckDB.

    The path keeps its exact bytes (``/a/b`` vs ``/a/b/`` are different
    resources — collapsing them is a recall/precision call this operator
    refuses to make). Non-HTTP shapes (``mailto:`` etc.) canonicalize
    deterministically but meaninglessly; filter them upstream with
    :func:`url_host` if the corpus carries them.
    """
    u = F.regexp_replace(col, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    authority = F.regexp_extract(
        u, r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?(?://)?(?:[^/@?#]*@)?([^/?#]*)", 1
    )
    host = F.lower(F.regexp_replace(authority, r":\d+$", ""))
    host = F.regexp_replace(host, r"\.$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    is_default = F.lit(False)
    for sch, prt in _DEFAULT_PORTS:
        is_default = is_default | ((scheme == sch) & (port == prt))
    portpart = F.when(
        (port == "") | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(
        u, r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?(?://)?[^/?#]*(/[^?#]*)?", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qraw = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(qraw, "&"),
        lambda p: (p != "") & ~p.rlike(tracking_param_re),
    )
    query = F.concat_ws("&", F.array_sort(params))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    canon_col: str = "canon_url",
    strip_www: bool = True,
) -> DataFrame:
    """URL-keyed exact dedup groups: one row per canonical URL with the
    deterministic keeper (min id) and the variant count. Map-only
    canonicalization, then ONE map-side-combined groupBy on the
    canonical string — shuffle ∝ distinct URLs, the floor for a
    frontier/corpus URL table. Semi-join the keeper ids back against the
    corpus to materialize surviving documents."""
    canon = canonicalize_url(F.col(url_col), strip_www=strip_www)
    staged = df.select(F.col(id_col), canon.alias(canon_col))
    return staged.groupBy(canon_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_variants"),
    )
