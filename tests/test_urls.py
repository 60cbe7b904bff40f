"""URL/domain curation (operators/urls.py): host extraction forms,
registrable-domain rules, blocklist drop/mark with list and DataFrame
blocklists, and the map-only / broadcast-only plan contract."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.urls import (
    filter_blocked_domains,
    registrable_domain,
    url_host,
)


def _hosts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.h for r in df.select(url_host(F.col("url")).alias("h")).collect()
    ]


def test_url_host_forms(spark):
    got = _hosts(
        spark,
        [
            "https://WWW.Example.COM/path?q=1",
            "http://a.b.co.uk:8080/x",
            "//cdn.host.net/y",
            "ftp://user:pw@files.example.org/z",
            "bare-host.io/path",
            "",
        ],
    )
    assert got == [
        "www.example.com",
        "a.b.co.uk",
        "cdn.host.net",
        "files.example.org",
        "bare-host.io",
        "",
    ]


def test_registrable_domain_rules(spark):
    cases = {
        "www.example.com": "example.com",
        "a.b.news.co.uk": "news.co.uk",
        "news.co.uk": "news.co.uk",
        "co.uk": "co.uk",          # the suffix itself: <=2 labels
        "example.com": "example.com",
        "localhost": "localhost",
        "x.y.z.shop.com.au": "shop.com.au",
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = dict(
        df.select(
            "h", registrable_domain(F.col("h")).alias("d")
        ).collect()
    )
    assert got == cases


def _docs(spark):
    rows = [
        (1, "https://ads.tracker.com/b"),
        (2, "http://sub.news.co.uk/a"),
        (3, "https://ok.media.net/c"),
        (4, "https://deep.sub.tracker.com/d"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_blocklist_list_drop_and_mark(spark):
    df = _docs(spark)
    kept = filter_blocked_domains(df, ["tracker.com", "news.co.uk"])
    assert sorted(r.doc_id for r in kept.collect()) == [3]
    assert kept.columns == ["doc_id", "url"]
    marked = filter_blocked_domains(
        df, ["tracker.com", "news.co.uk"], mode="mark"
    )
    got = {r.doc_id: (r.domain, r.blocked) for r in marked.collect()}
    assert got == {
        1: ("tracker.com", True),
        2: ("news.co.uk", True),
        3: ("media.net", False),
        4: ("tracker.com", True),
    }


def test_blocklist_dataframe_matches_list(spark):
    df = _docs(spark)
    bl = spark.createDataFrame(
        [("tracker.com",), ("news.co.uk",)], "d string"
    )
    via_df = sorted(
        r.doc_id for r in filter_blocked_domains(df, bl).collect()
    )
    via_list = sorted(
        r.doc_id
        for r in filter_blocked_domains(
            df, ["tracker.com", "news.co.uk"]
        ).collect()
    )
    assert via_df == via_list == [3]
    marked = filter_blocked_domains(df, bl, mode="mark")
    got = {r.doc_id: r.blocked for r in marked.collect()}
    assert got == {1: True, 2: True, 3: False, 4: True}


def test_empty_blocklist_keeps_everything(spark):
    df = _docs(spark)
    assert filter_blocked_domains(df, []).count() == 4
    marked = filter_blocked_domains(df, [], mode="mark")
    assert all(not r.blocked for r in marked.collect())


def test_mode_validation_and_bad_blocklist_df(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="mode"):
        filter_blocked_domains(df, [], mode="annotate")
    two_col = spark.createDataFrame([("a", "b")], "x string, y string")
    with pytest.raises(ValueError, match="exactly 1 column"):
        filter_blocked_domains(df, two_col)


def test_plan_contract(spark):
    df = _docs(spark)
    # python-list blocklist: pure map, no exchange at all
    plan = (
        filter_blocked_domains(df, ["tracker.com"], mode="mark")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    # DataFrame blocklist: the corpus side still never shuffles — the
    # only join is broadcast, and the only hash exchange is the
    # blocklist-side distinct (blocklist-sized, not corpus-sized)
    bl = spark.createDataFrame([("tracker.com",)], "d string")
    plan = (
        filter_blocked_domains(df, bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1 and "domain#" in exchanges[0], plan


# -- canonicalization ---------------------------------------------------------


def _canon(spark, urls, **kw):
    from kafka_connect_gcs_spark.operators.urls import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c
        for r in df.select(
            canonicalize_url(F.col("url"), **kw).alias("c")
        ).collect()
    ]


def test_canonicalize_variants_collapse(spark):
    variants = [
        "http://www.Site.com/a/b?x=1&y=2",
        "HTTP://site.com/a/b?y=2&x=1#frag",
        "http://site.com:80/a/b?utm_source=n&x=1&y=2",
        "http://site.com./a/b?x=1&y=2&gclid=abc",
        "//site.com/a/b?x=1&y=2",            # scheme-relative -> http
    ]
    got = _canon(spark, variants)
    assert set(got) == {"http://site.com/a/b?x=1&y=2"}


def test_canonicalize_preserves_real_differences(spark):
    got = _canon(
        spark,
        [
            "https://site.com/a/b?x=1",   # https stays https
            "http://site.com/a/b/",       # trailing slash is a real path
            "http://site.com:8080/a/b",   # non-default port kept
            "http://sub.site.com/a/b",    # subdomain kept (only www strips)
            "http://site.com/a/b?x=2",    # different param value
        ],
    )
    assert len(set(got)) == 5
    assert "http://site.com:8080/a/b" in got


def test_canonicalize_edge_shapes(spark):
    got = _canon(
        spark,
        [
            "http://site.com",            # no path -> /
            "http://site.com?y=2&x=1",    # query with no path
            "http://user:pw@site.com/p",  # userinfo stripped
            "https://site.com:443/p",     # default https port dropped
        ],
    )
    assert got == [
        "http://site.com/",
        "http://site.com/?x=1&y=2",
        "http://site.com/p",
        "https://site.com/p",
    ]


def test_canonicalize_keep_www(spark):
    got = _canon(spark, ["http://www.site.com/p"], strip_www=False)
    assert got == ["http://www.site.com/p"]


def test_dedup_by_url_groups(spark):
    from kafka_connect_gcs_spark.operators.urls import dedup_by_url

    rows = [
        (1, "http://www.site.com/p?b=2&a=1"),
        (2, "http://site.com/p?a=1&b=2#x"),
        (3, "http://site.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canon_url"]: (r["keep_id"], r["n_variants"])
           for r in dedup_by_url(df).collect()}
    assert out == {
        "http://site.com/p?a=1&b=2": (1, 2),
        "http://site.com/other": (3, 1),
    }
