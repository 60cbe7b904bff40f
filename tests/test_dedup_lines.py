"""Cross-document line dedup (operators/dedup_lines.py): policy
semantics on literal corpora, the blank-line structural exemption,
within-doc vs cross-doc thresholds, a full DuckDB rewrite parity check on
the sf documents corpus, and the untouched-docs LEFT ANTI passthrough
plan shape."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.dedup_lines import dedup_lines, line_stats

FOOTER = "subscribe to our newsletter"
LEGAL = "all rights reserved"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(
        spark,
        [
            (1, f"alpha one\n{FOOTER}\nbody of doc one"),
            (2, f"beta two\n\n{FOOTER}\n{LEGAL}"),
            (3, f"gamma three\n{LEGAL}\nrepeat me\nrepeat me"),
            (4, "delta four stands alone"),
            (5, f"{FOOTER}\n{FOOTER}"),
        ],
    )


def test_line_stats_counts(corpus):
    st = {r.line: r for r in line_stats(corpus).collect()}
    # footer: docs 1, 2, 5 (5 has it twice) -> n_docs 3, n_occ 4
    assert (st[FOOTER].n_docs, st[FOOTER].n_occ) == (3, 4)
    assert (st[LEGAL].n_docs, st[LEGAL].n_occ) == (2, 2)
    # within-doc repeat: one doc, two occurrences
    assert (st["repeat me"].n_docs, st["repeat me"].n_occ) == (1, 2)
    # blank lines excluded by default, included on request
    assert "" not in st
    with_blank = {r.line: r for r in line_stats(corpus, include_blank=True).collect()}
    assert with_blank[""].n_occ == 1


def _texts(df):
    return {r.doc_id: r.text for r in df.collect()}


def test_drop_all_policy(corpus):
    out = _texts(dedup_lines(corpus, policy="drop_all", min_docs=2))
    assert out[1] == "alpha one\nbody of doc one"
    # blank line survives (structural), both cross-doc lines go
    assert out[2] == "beta two\n"
    # within-doc repetition is NOT cross-doc boilerplate: "repeat me" stays
    assert out[3] == "gamma three\nrepeat me\nrepeat me"
    assert out[4] == "delta four stands alone"
    # every line offending -> doc survives as empty string
    assert out[5] == ""
    assert set(out) == {1, 2, 3, 4, 5}


def test_drop_all_threshold(corpus):
    # min_docs=3: only the footer (3 distinct docs) qualifies
    out = _texts(dedup_lines(corpus, policy="drop_all", min_docs=3))
    assert out[2] == f"beta two\n\n{LEGAL}"
    assert out[3] == f"gamma three\n{LEGAL}\nrepeat me\nrepeat me"
    assert out[5] == ""


def test_keep_first_policy(corpus):
    out = _texts(dedup_lines(corpus, policy="keep_first"))
    # first occurrence of the footer is (doc 1, pos 1): doc 1 unchanged
    assert out[1] == f"alpha one\n{FOOTER}\nbody of doc one"
    # doc 2 loses the footer, keeps the first LEGAL occurrence + blank
    assert out[2] == f"beta two\n\n{LEGAL}"
    # doc 3 owns the first LEGAL? no — doc 2 pos 3 < doc 3 pos 1; loses it;
    # within-doc duplicate "repeat me" keeps only its first occurrence
    assert out[3] == "gamma three\nrepeat me"
    assert out[4] == "delta four stands alone"
    # doc 5: both lines are later occurrences of doc 1's footer
    assert out[5] == ""


def test_invalid_args(corpus):
    with pytest.raises(ValueError):
        dedup_lines(corpus, policy="nope")
    with pytest.raises(ValueError):
        dedup_lines(corpus, min_docs=0)


def test_untouched_docs_pass_through_single_scan(corpus):
    """Untouched docs ride ONE conditional left join (null position set →
    original bytes), not a separate LEFT ANTI passthrough branch — the
    union-of-two-scans shape read the document relation twice."""
    plan = dedup_lines(corpus)._jdf.queryExecution().toString()
    assert "LeftAnti" not in plan
    assert "LeftOuter" in plan
    assert "Union" not in plan
    # the passthrough branch must not re-split text: byte-exact equality
    # for a doc with trailing whitespace oddities no rebuild would keep
    weird = _docs(corpus.sparkSession, [(1, "a \n b \n"), (2, "zz")])
    out = _texts(dedup_lines(weird))
    assert out[1] == "a \n b \n" and out[2] == "zz"


def test_duckdb_rewrite_parity_on_sf_corpus(spark, sf_dir):
    """Full-corpus parity: inject shared boilerplate into the sf documents
    table, rewrite with both policies, and compare every doc against a
    DuckDB replay of the same split→dup-table→rebuild."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    did, t = F.col("doc_id"), F.col("text")
    inj = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring(t, 1, 30),
            F.when(did % 3 == 0, F.lit(FOOTER)),
            F.when(did % 4 == 0, F.lit("")),
            F.when(did % 5 == 0, F.lit(LEGAL)),
            F.substring(t, 31, 100000),
        ).alias("text"),
    )
    got_drop = _texts(dedup_lines(inj, policy="drop_all", min_docs=2))
    got_first = _texts(dedup_lines(inj, policy="keep_first"))

    pdf = inj.toPandas()  # noqa: F841  (duckdb scans it by name)
    want = duckdb.sql(
        """
        WITH lines AS (
          SELECT doc_id, i - 1 AS pos, l[i] AS line
          FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM pdf),
               UNNEST(generate_series(1, len(l))) AS u(i)
        ),
        nonblank AS (SELECT * FROM lines WHERE trim(line) <> ''),
        dup AS (
          SELECT line FROM nonblank
          GROUP BY line HAVING count(DISTINCT doc_id) >= 2
        ),
        off_a AS (SELECT doc_id, pos FROM nonblank JOIN dup USING (line)),
        off_f AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos, count(*) OVER (PARTITION BY line) AS c,
                   row_number() OVER (PARTITION BY line
                                      ORDER BY doc_id, pos) AS rn
            FROM nonblank
          ) WHERE c >= 2 AND rn > 1
        ),
        keep_a AS (
          SELECT l.* FROM lines l LEFT JOIN off_a o
            ON l.doc_id = o.doc_id AND l.pos = o.pos
          WHERE o.doc_id IS NULL
        ),
        keep_f AS (
          SELECT l.* FROM lines l LEFT JOIN off_f o
            ON l.doc_id = o.doc_id AND l.pos = o.pos
          WHERE o.doc_id IS NULL
        )
        SELECT p.doc_id,
               coalesce(a.t, '') AS drop_all_text,
               coalesce(f.t, '') AS keep_first_text
        FROM pdf p
        LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t
                   FROM keep_a GROUP BY doc_id) a USING (doc_id)
        LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t
                   FROM keep_f GROUP BY doc_id) f USING (doc_id)
        """
    ).fetchall()
    assert len(want) == len(got_drop) == len(got_first)
    for doc_id, want_drop, want_first in want:
        assert got_drop[doc_id] == want_drop, doc_id
        assert got_first[doc_id] == want_first, doc_id


def test_both_policies_shared_pass_matches_single_calls(corpus):
    """dedup_lines_both must equal the two single-policy rewrites
    bit-for-bit (it shares one explosion + one line aggregate)."""
    from kafka_connect_gcs_spark.operators.dedup_lines import (
        dedup_lines_both,
    )

    both = {
        r.doc_id: (r.text_drop_all, r.text_keep_first)
        for r in dedup_lines_both(corpus, min_docs=2).collect()
    }
    drop = _texts(dedup_lines(corpus, policy="drop_all", min_docs=2))
    keep = _texts(dedup_lines(corpus, policy="keep_first"))
    assert set(both) == set(drop) == set(keep)
    for did, (ta, tk) in both.items():
        assert ta == drop[did], did
        assert tk == keep[did], did


def test_both_policies_lazy_matches_eager(corpus):
    from kafka_connect_gcs_spark.operators.dedup_lines import (
        dedup_lines_both,
    )

    eager = sorted(map(tuple, dedup_lines_both(corpus).collect()))
    lazy = sorted(map(tuple, dedup_lines_both(corpus, eager=False).collect()))
    assert eager == lazy
