"""HTML extraction: hand-pinned documents, ordering hazards (script
content with '<', comments containing tags, entity double-decode), link
order, map-only plan."""

from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.html import parse_html

DOC = (
    '<html><head><title> Hello &amp; <b>World</b> </title>'
    "<style>p {color: red}</style></head>"
    "<body><!-- secret <a href=\"http://x.test/hidden\">c</a> -->"
    '<h1>Head</h1><p>one&nbsp;two &lt;tag&gt; &amp;amp; three</p>'
    '<a href="https://a.test/1">A</a> mid '
    "<a HREF=\"/rel?x=1&amp;y=2\">B</a>"
    '<script type="text/javascript">var x = 1 < 2; "no"</script>'
    "tail</body></html>"
)


def _one(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return parse_html(df).collect()[0]


def test_text_title_links(spark):
    r = _one(spark, DOC)
    # title keeps inner-tag REMOVAL out of scope: extract then decode;
    # the <b> tag inside the title is markup -> extract_text semantics
    # don't apply to extract_title (raw inner markup is preserved)
    assert r["title"] == "Hello & <b>World</b>"
    # comment link is gone; order preserved; entities inside href decoded
    # only via the &amp; entity pass NOT applied to links (raw hrefs)
    assert r["links"] == ["https://a.test/1", "/rel?x=1&amp;y=2"]
    assert (
        r["text"]
        == "Head one two <tag> &amp; three A mid B tail"
    )


def test_script_with_angle_bracket_does_not_corrupt(spark):
    r = _one(spark, "<p>a</p><script>if (1 < 2) x();</script><p>b</p>")
    assert r["text"] == "a b"


def test_comment_containing_tags_is_removed_whole(spark):
    r = _one(spark, "x<!-- <p>no</p> <script> -->y")
    assert r["text"] == "x y"


def test_no_title_no_links(spark):
    r = _one(spark, "<p>just text</p>")
    assert r["title"] == "" and r["links"] == [] and r["text"] == "just text"


def test_multiline_blocks(spark):
    r = _one(spark, "<style>\n.a{}\n</style><p>\nkeep\nme\n</p>")
    assert r["text"] == "keep me"


def test_plan_is_map_only(spark):
    df = spark.range(3).select(F.col("id").alias("doc_id"), F.lit(DOC).alias("html"))
    plan = parse_html(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# -- anchors ------------------------------------------------------------------


def _anchors(spark, html):
    from kafka_connect_gcs_spark.operators.html import extract_anchors

    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        extract_anchors(F.col("html")).alias("a")
    ).collect()[0]["a"]


def test_extract_anchors_pairs_and_scrub(spark):
    got = _anchors(
        spark,
        '<a href="http://x.com/1">one &amp; only</a>'
        '<a HREF="/rel">see <b>two</b>\n now</a>'
        '<!-- <a href="http://no.com">gone</a> -->',
    )
    assert [(a["href"], a["anchor"]) for a in got] == [
        ("http://x.com/1", "one & only"),
        ("/rel", "see two now"),
    ]


def test_anchor_text_agg_groups_by_target_domain(spark):
    from kafka_connect_gcs_spark.operators.html import anchor_text_agg

    rows = [
        (1, '<a href="http://a.site.com/x">read this</a>'
            '<a href="http://b.site.com/y">read this</a>'),
        (2, '<a href="http://site.com/z">other text</a>'
            '<a href="/relative">nav</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r["domain"]: r for r in anchor_text_agg(df).collect()}
    assert set(out) == {"site.com"}
    r = out["site.com"]
    assert r["n_links"] == 3
    assert r["n_src_docs"] == 2
    assert r["n_anchors"] == 2
    assert r["first_anchor"] == "other text"
