"""Exact per-key top-k with a salted two-phase reduction.

"Top k rows per group" is the classic skew trap: the natural
``row_number() OVER (PARTITION BY key ORDER BY score)`` funnels EVERY row
of a group through one reducer — at 10^10 rows a hot domain/language
group is a single-task stage. But top-k is algebraically reducible: the
global top-k of a group is contained in the union of per-slice top-ks of
any partition of that group. So:

* phase 1 spreads each group over ``num_salts`` deterministic salt
  slices (hash of the row id — retry/AQE-stable, no ``rand()``) and
  takes the per-(key, salt) top-k — the widest window partition is now
  ``|group| / num_salts``;
* phase 2 takes the true top-k over the ≤ ``k·num_salts`` survivors per
  group — a provably bounded relation (``groups × k × num_salts`` rows)
  no matter how skewed the input.

The result is EXACTLY the naive window's output (the oracle is that
naive window — a hash match proves the two-phase reduction lossless),
with a total order ``(score DESC, id)`` so ties are deterministic.

The same shape finalizes the ANN top-k in ``operators/similarity.py``;
this is the general, any-key form a curation stack reaches for ("keep
the 1000 highest-quality docs per domain", "3 freshest snapshots per
URL").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    key_col: str,
    score_col: str,
    k: int,
    id_col: str = "doc_id",
    num_salts: int = 32,
    ascending: bool = False,
    rank_col: str = "rank",
) -> DataFrame:
    """All input columns plus ``rank_col`` (1-based, dense within each
    key) for the exact top-``k`` rows per ``key_col`` under the total
    order ``(score_col [DESC], id_col)``. ``id_col`` must be unique —
    it totalizes the order so retries and salt choice can't change the
    kept set."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if num_salts <= 0:
        raise ValueError(f"num_salts must be positive, got {num_salts}")

    score = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    order = [score, F.col(id_col).asc()]

    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_salts))
    w1 = Window.partitionBy(F.col(key_col), salt).orderBy(*order)
    survivors = (
        df.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= k)
    )
