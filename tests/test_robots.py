"""robots.txt governance (operators/robots.py): group scoping, RFC 9309
longest-match semantics, URL governance join."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_gcs_spark.operators.robots import (  # noqa: E402
    govern_urls,
    parse_robots,
    robots_allowed,
)

ROBOTS = """# corp crawler policy
User-agent: specialbot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:
Allow: /tmp/x

User-agent: otherbot
Disallow: /other
"""


def _verdicts(spark, robots_txt, paths):
    rb = spark.createDataFrame(
        [("d.com", robots_txt)], "domain string, robots_txt string"
    )
    rules = parse_robots(rb).collect()[0]["rules"]
    urls = spark.createDataFrame(
        [("d.com", p) for p in paths], "domain string, path string"
    )
    out = govern_urls(urls, rb)
    return rules, {r["path"]: r["allowed"] for r in out.collect()}


def test_group_scoping_and_longest_match(spark):
    rules, v = _verdicts(
        spark,
        ROBOTS,
        [
            "/public/page",     # no rule matches -> allowed
            "/private/doc",     # Disallow /private
            "/private/ok/x",    # Allow /private/ok (longer) wins
            "/other/page",      # otherbot's rule must NOT apply to *
            "/tmp/x",           # exact allow
        ],
    )
    # only the * group's non-empty rules parsed, in order
    assert [(r["path"], r["is_allow"]) for r in rules] == [
        ("/private", 0),
        ("/private/ok", 1),
        ("/tmp/x", 1),
    ]
    assert v == {
        "/public/page": True,
        "/private/doc": False,
        "/private/ok/x": True,
        "/other/page": True,
        "/tmp/x": True,
    }


def test_allow_beats_disallow_on_tie(spark):
    txt = "User-agent: *\nDisallow: /a/b\nAllow: /a/c\n"
    _rules, v = _verdicts(spark, txt, ["/a/b/x", "/a/c/x"])
    assert v == {"/a/b/x": False, "/a/c/x": True}
    # equal-length rules on the SAME prefix: allow wins
    txt2 = "User-agent: *\nDisallow: /a\nAllow: /a\n"
    _r, v2 = _verdicts(spark, txt2, ["/a/x"])
    assert v2 == {"/a/x": True}


def test_unknown_domain_and_empty_robots(spark):
    rb = spark.createDataFrame(
        [("known.com", "User-agent: *\nDisallow: /\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("known.com", "/x"), ("unknown.com", "/x")],
        "domain string, path string",
    )
    out = {(r["domain"], r["allowed"]) for r in govern_urls(urls, rb).collect()}
    assert out == {("known.com", False), ("unknown.com", True)}
    # robots with no * group: everything allowed
    _r, v = _verdicts(spark, "User-agent: special\nDisallow: /\n", ["/x"])
    assert v == {"/x": True}


def test_case_insensitive_directives_and_comments(spark):
    txt = "USER-AGENT: *\nDISALLOW: /secret  # hidden\nALLOW: /secret/pub\n"
    rules, v = _verdicts(spark, txt, ["/secret/a", "/secret/pub/b"])
    assert [(r["path"], r["is_allow"]) for r in rules] == [
        ("/secret", 0),
        ("/secret/pub", 1),
    ]
    assert v == {"/secret/a": False, "/secret/pub/b": True}


def test_plan_is_broadcast_plus_map(spark):
    rb = spark.createDataFrame(
        [("d.com", "User-agent: *\nDisallow: /p\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("d.com", "/p/x")], "domain string, path string"
    )
    plan = (
        govern_urls(urls, rb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
