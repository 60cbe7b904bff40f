"""Link-graph ranking for web curation: fixed-point PageRank.

Web-scale curation stacks rank registrable domains by link authority
(CommonCrawl publishes harmonic-centrality/PageRank domain ranks; quality
pipelines use them as a crawl-prioritization and filtering signal). This
module adds the engine's third iterative-fixpoint operator, next to
``connected_components`` and ``clustering.kmeans_fit``.

Design decision — INTEGER fixed-point arithmetic, not doubles: a PageRank
iteration sums contributions per target node, and float addition is
order-dependent, so a double-typed rank would differ across partial-
aggregation orders (task retries, AQE re-plans) and across engines
(breaking the DuckDB oracle). Ranks here are BIGINTs in units of
``2^-SCALE_BITS`` (the exact-integer-indicator trick HLL uses,
``operators/sketches.py``): integer sums commute exactly, so every
iteration is bit-deterministic under ANY execution order, and the oracle
replays all iterations to hash equality. Each iteration floors twice
(per-edge contribution ``r DIV out_degree``, then the damped sum); the
bias is bounded by ``(in_degree + 1) · 2^-SCALE_BITS`` per node per
iteration — noise at rank scale 2^30 — and identical in both engines by
construction.

Semantics: un-normalized damped PageRank over the DISTINCT edge set,

    r0(v)      = 2^SCALE_BITS
    r_{k+1}(v) = floor((1-d) · 2^SCALE_BITS)
                 + (d_num · Σ_{(u,v) ∈ E} (r_k(u) DIV deg_out(u))) DIV d_den

with dangling nodes (no out-edges) contributing nothing. Scale shape per
iteration: one equi-join of the rank relation (2 skinny columns) with the
edge list plus one map-side-combined sum per target — shuffle ∝ |E|, the
floor for any link-propagation pass; out-degrees are computed once. The
iteration count is fixed and small (authority signals use 5-20 rounds),
so the unrolled lazy plan stays shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank unit = 2^-30 — integer sums of ~10^10 nodes at rank ~2^30 stay
#: far inside int64
SCALE_BITS = 30


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_num: int = 85,
    damping_den: int = 100,
    iterations: int = 5,
    out_col: str = "rank_fp",
) -> DataFrame:
    """(node, out_col) for every node in the distinct edge set, out_col =
    the fixed-point rank BIGINT after ``iterations`` rounds (divide by
    ``2^SCALE_BITS`` for the float value). Deterministic bit-for-bit
    under any partitioning/retry — see the module docstring."""
    if iterations <= 0:
        raise ValueError(f"iterations must be positive, got {iterations}")
    if not (0 < damping_num < damping_den):
        raise ValueError("damping must satisfy 0 < num < den")

    base = F.lit(1 << SCALE_BITS).cast("long")
    e = (
        edges.select(
            F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
        )
        .where(F.col("_src").isNotNull() & F.col("_dst").isNotNull())
        .dropDuplicates(["_src", "_dst"])
    )
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    teleport = F.lit(
        ((damping_den - damping_num) << SCALE_BITS) // damping_den
    ).cast("long")

    # degree is loop-invariant: attach it to the edge list ONCE, so each
    # iteration is a single equi-join of the skinny rank relation
    e_deg = e.join(deg, "_src")

    ranks = nodes.withColumn(out_col, base)
    for _ in range(iterations):
        contrib = (
            ranks.join(e_deg, ranks["node"] == e_deg["_src"])
            .select(
                F.col("_dst").alias("node"),
                F.expr(f"`{out_col}` DIV `_deg`").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    teleport
                    + F.expr(
                        f"(CAST({damping_num} AS BIGINT)"
                        f" * coalesce(`_s`, CAST(0 AS BIGINT)))"
                        f" DIV CAST({damping_den} AS BIGINT)"
                    )
                ).cast("long").alias(out_col),
            )
        )
    return ranks
