"""Deterministic synthetic binlog / change-feed generator.

Stand-in for the 10^10-event CDC feed the north_rule targets. Mirrors the
reference's test-fixture strategy (GCSFilesReaderTest.givenSomeData builds
real block-gzip archives deterministically, GCSFilesReaderTest.java:210-261;
system_test/run.py produces 100 numbered JSON records) but generates the new
engine's typed change events:

    (doc_id string, offset long, op string I|U|D, tokens array<int>,
     n_tok int, source string, part int, delivery_seq long)

Design constraints honored:
* **Fully distributed & size-oblivious** — built from ``spark.range(n)`` and
  JVM built-ins only (xxhash64 pseudo-randomness), so generating 10^10 rows
  is the same code as 10^4; nothing is collected to the driver.
* **Deterministic** — every column is a pure function of (row id, seed), so
  tests, the DuckDB/pandas oracle, and the bench all see identical data.
* **Scenario knobs** (FIXTURES.md §1): hot-key skew (a configurable fraction
  of events hitting a small hot set), verbatim duplicates (~at-least-once
  delivery), out-of-order delivery (delivery_seq != offset order), deletes,
  conflicting updates (multiple offsets per doc_id → known LWW winner).

``op`` semantics: I and U are both upserts (CDC engines treat them
identically on apply); D is a delete. Orphan deletes (D for a never-seen
doc_id) occur naturally and must be tolerated.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BinlogSpec:
    num_events: int = 100_000
    num_docs: int = 20_000
    num_partitions: int = 8
    seed: int = 42
    #: fraction of events routed to the hot key set (skew fixture)
    hot_fraction: float = 0.30
    #: size of the hot key set (1 → a single ~30%-of-traffic doc_id)
    hot_keys: int = 1
    #: fraction of events re-delivered verbatim (at-least-once duplicates)
    duplicate_fraction: float = 0.10
    #: fraction of events that are deletes
    delete_fraction: float = 0.15
    #: out-of-order window: delivery_seq = offset + uniform(-w, w)
    shuffle_window: int = 1_000
    min_tokens: int = 16
    max_tokens: int = 128
    vocab_size: int = 50_257


def _h(col, *salts) -> F.Column:
    """Deterministic 64-bit hash of a column + literal salts."""
    return F.xxhash64(col, *[F.lit(s) for s in salts])


def _pm(col, m: int) -> F.Column:
    return F.pmod(col, F.lit(m))


def generate_changes(spark: SparkSession, spec: BinlogSpec) -> DataFrame:
    """Return the change-event DataFrame (one row per delivered event,
    including duplicate deliveries), deterministic for a given spec."""
    s = spec.seed
    base = spark.range(spec.num_events).withColumnRenamed("id", "seq")

    # --- key choice with skew ------------------------------------------------
    u_hot = _pm(_h(F.col("seq"), s, 1), 1_000_000)
    hot_cut = int(spec.hot_fraction * 1_000_000)
    doc_num = F.when(
        u_hot < F.lit(hot_cut), _pm(_h(F.col("seq"), s, 2), max(spec.hot_keys, 1))
    ).otherwise(
        F.lit(spec.hot_keys)
        + _pm(_h(F.col("seq"), s, 3), max(spec.num_docs - spec.hot_keys, 1))
    )

    # --- op mix ---------------------------------------------------------------
    u_op = _pm(_h(F.col("seq"), s, 4), 1_000_000)
    del_cut = int(spec.delete_fraction * 1_000_000)
    ins_cut = del_cut + (1_000_000 - del_cut) // 3
    op = (
        F.when(u_op < F.lit(del_cut), F.lit("D"))
        .when(u_op < F.lit(ins_cut), F.lit("I"))
        .otherwise(F.lit("U"))
    )

    # --- tokens (deterministic per event; null for deletes) --------------------
    n_tok = (
        F.lit(spec.min_tokens)
        + _pm(_h(F.col("seq"), s, 5), spec.max_tokens - spec.min_tokens + 1)
    ).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(F.xxhash64(F.col("seq"), i, F.lit(s), F.lit(6)),
                         F.lit(spec.vocab_size)).cast("int"),
    )

    source = F.element_at(
        F.array(F.lit("web"), F.lit("books"), F.lit("code"), F.lit("wiki")),
        (_pm(_h(F.col("seq"), s, 7), 4) + 1).cast("int"),
    )

    # --- delivery order (out-of-order within a bounded window) -----------------
    w = max(spec.shuffle_window, 1)
    jitter = _pm(_h(F.col("seq"), s, 8), 2 * w) - F.lit(w)
    delivery_seq = F.greatest(F.lit(0), F.col("seq") + jitter)

    ev = base.select(
        F.col("seq").alias("offset"),
        F.format_string("doc%09d", doc_num).alias("doc_id"),
        op.alias("op"),
        F.when(op != "D", tokens).alias("tokens"),
        F.when(op != "D", n_tok).alias("n_tok"),
        source.alias("source"),
        _pm(_h(F.format_string("doc%09d", doc_num), s, 9), spec.num_partitions)
        .cast("int")
        .alias("part"),
        delivery_seq.alias("delivery_seq"),
    )

    # --- verbatim duplicate deliveries (at-least-once) -------------------------
    if spec.duplicate_fraction > 0:
        dup_cut = int(spec.duplicate_fraction * 1_000_000)
        dups = ev.where(_pm(_h(F.col("offset"), s, 10), 1_000_000) < F.lit(dup_cut))
        dups = dups.withColumn(
            "delivery_seq",
            F.col("delivery_seq") + _pm(_h(F.col("offset"), s, 11), 2 * w),
        )
        ev = ev.unionByName(dups)
    return ev


def write_feed(
    spark: SparkSession,
    spec: BinlogSpec,
    feed_dir: str,
    num_segments: int = 16,
) -> list[str]:
    """Materialize the change feed as an ordered sequence of Parquet segment
    dirs ``{feed_dir}/seg=%08d`` — the stand-in for the reference's GCS
    archive whose lexicographic object-key order defines global order
    (GCSFilesReader.java:44-47,58-63). Segment k holds the events whose
    delivery_seq falls in the k-th slice, so consuming segments in name order
    replays the (out-of-order, duplicate-bearing) delivery stream."""
    import os

    ev = generate_changes(spark, spec)
    max_seq = spec.num_events + 2 * max(spec.shuffle_window, 1) + 1
    seg_size = max(1, (max_seq + num_segments - 1) // num_segments)
    ev = ev.withColumn(
        "seg", F.least(F.lit(num_segments - 1), (F.col("delivery_seq") / seg_size).cast("int"))
    )
    ev.write.mode("overwrite").partitionBy("seg").parquet(feed_dir)
    segs = sorted(
        d for d in os.listdir(feed_dir) if d.startswith("seg=")
    )
    # normalize to zero-padded lexicographic names (seg=0 → seg=00000000)
    out = []
    for d in segs:
        k = int(d.split("=")[1])
        new = f"seg={k:08d}"
        if d != new:
            os.rename(os.path.join(feed_dir, d), os.path.join(feed_dir, new))
        out.append(os.path.join(feed_dir, new))
    return sorted(out)
