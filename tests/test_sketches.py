"""HyperLogLog + Count-Min sketch operators (operators/sketches.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.sketches import (
    countmin_lookup,
    countmin_sketch,
    hll_distinct,
    hll_merge,
    hll_registers,
    hll_standard_error,
)


def _keys(spark, values):
    return spark.createDataFrame([Row(k=v) for v in values])


@pytest.mark.parametrize("portable", [False, True])
def test_hll_estimate_within_error_bounds(spark, portable):
    n = 5000
    df = _keys(spark, [f"key-{i}" for i in range(n)])
    est = hll_distinct(df, "k", num_registers=256, portable=portable).collect()[0]
    rel = abs(est.estimate - n) / n
    # 1.04/sqrt(256) = 6.5% std error; 5 sigma is a deterministic-safe bound
    assert rel < 5 * hll_standard_error(256), (est.estimate, n)
    assert est.num_registers == 256
    assert 0 <= est.zero_registers < 256


def test_hll_duplicates_do_not_move_the_estimate(spark):
    base = [f"key-{i}" for i in range(1000)]
    a = hll_distinct(_keys(spark, base), "k").collect()[0]
    b = hll_distinct(_keys(spark, base * 7), "k").collect()[0]
    assert a.estimate == b.estimate
    assert a.sum_scaled == b.sum_scaled


def test_hll_merge_equals_whole(spark):
    a = [f"a-{i}" for i in range(800)]
    b = [f"b-{i}" for i in range(800)] + a[:100]
    whole = hll_registers(_keys(spark, a + b), "k")
    merged = hll_merge(
        hll_registers(_keys(spark, a), "k"), hll_registers(_keys(spark, b), "k")
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_small_range_uses_linear_counting_and_is_near_exact(spark):
    df = _keys(spark, [f"key-{i}" for i in range(30)])
    est = hll_distinct(df, "k").collect()[0]
    # 30 distinct over 256 registers: linear counting is near-exact
    assert abs(est.estimate - 30) <= 2, est.estimate


def test_hll_null_and_empty_inputs(spark):
    df = spark.createDataFrame([Row(k=None), Row(k="x")], "k string")
    est = hll_distinct(df, "k").collect()[0]
    assert abs(est.estimate - 1) <= 0.5
    empty = hll_distinct(df.where(F.lit(False)), "k").collect()[0]
    assert est.num_registers == 256
    assert empty.zero_registers == 256
    assert empty.estimate == 0.0  # ln(m/m) = 0 via linear counting


def test_hll_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        hll_registers(None, "k", num_registers=100)


@pytest.mark.parametrize("portable", [False, True])
def test_countmin_never_underestimates(spark, portable):
    words = (["alpha"] * 50) + (["beta"] * 20) + [f"w{i}" for i in range(500)]
    df = _keys(spark, words)
    sk = countmin_sketch(df, "k", depth=4, width=512, portable=portable)
    probes = _keys(spark, ["alpha", "beta", "w3", "missing"])
    got = {
        r.k: r.cm_est
        for r in countmin_lookup(
            sk, probes, "k", depth=4, width=512, portable=portable
        ).collect()
    }
    assert got["alpha"] >= 50 and got["beta"] >= 20 and got["w3"] >= 1
    # the classic bound: overestimate ≤ 2N/width with prob 1 - 2^-depth;
    # deterministic data, so assert a loose multiple
    n = len(words)
    for k, true in [("alpha", 50), ("beta", 20), ("w3", 1), ("missing", 0)]:
        assert got[k] <= true + 8 * n / 512, (k, got[k])


def test_countmin_merge_by_cell_sum(spark):
    a = _keys(spark, ["x"] * 5 + ["y"] * 3)
    b = _keys(spark, ["x"] * 2 + ["z"] * 4)
    merged = (
        countmin_sketch(a, "k")
        .unionByName(countmin_sketch(b, "k"))
        .groupBy("row_j", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_sketch(_keys(spark, ["x"] * 7 + ["y"] * 3 + ["z"] * 4), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_countmin_weighted(spark):
    df = spark.createDataFrame([Row(k="a", w=10), Row(k="a", w=5), Row(k="b", w=2)])
    sk = countmin_sketch(df, "k", weight_col="w", depth=3, width=64)
    got = {
        r.k: r.cm_est
        for r in countmin_lookup(sk, _keys(spark, ["a", "b"]), "k", depth=3, width=64)
        .collect()
    }
    assert got["a"] >= 15 and got["b"] >= 2


def test_sketch_shuffle_is_register_sized(spark):
    """The exchange input is the partial aggregate over ≤ m register rows
    per partition — assert partial aggregation is in the plan."""
    df = _keys(spark, [f"key-{i}" for i in range(100)])
    plan = hll_registers(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan or "HashAggregate" in plan
    cm = countmin_sketch(df, "k")
    plan = cm._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "HashAggregate" in plan


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

from kafka_connect_gcs_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_fp_rate,
    bloom_maybe_contains,
    bloom_pack,
)

_BLOOM_BITS = 1 << 12
_BLOOM_K = 4


def _bloom(spark, members, portable):
    bits = bloom_build(
        _keys(spark, members), "k", _BLOOM_BITS, _BLOOM_K, portable=portable
    )
    return bloom_pack(spark, bits, _BLOOM_BITS)


@pytest.mark.parametrize("portable", [False, True])
def test_bloom_no_false_negatives(spark, portable):
    members = [f"m-{i}" for i in range(300)]
    packed = _bloom(spark, members, portable)
    probe = _keys(spark, members).crossJoin(F.broadcast(packed))
    hits = probe.select(
        bloom_maybe_contains(
            F.col("k"), F.col("bloom"), _BLOOM_BITS, _BLOOM_K, portable=portable
        ).alias("hit")
    )
    assert all(r.hit for r in hits.collect())


@pytest.mark.parametrize("portable", [False, True])
def test_bloom_fp_rate_is_bounded(spark, portable):
    members = [f"m-{i}" for i in range(300)]
    packed = _bloom(spark, members, portable)
    non = [f"x-{i}" for i in range(2000)]
    probe = _keys(spark, non).crossJoin(F.broadcast(packed))
    n_fp = probe.where(
        bloom_maybe_contains(
            F.col("k"), F.col("bloom"), _BLOOM_BITS, _BLOOM_K, portable=portable
        )
    ).count()
    # expected fp ~ bloom_fp_rate(4096, 4, 300) ≈ 0.46% → ~9 of 2000;
    # deterministic hashes, loose 5x headroom
    assert n_fp <= 5 * bloom_fp_rate(_BLOOM_BITS, _BLOOM_K, 300) * len(non), n_fp


def test_bloom_merge_is_union(spark):
    a = [f"a-{i}" for i in range(100)]
    b = [f"b-{i}" for i in range(100)] + a[:20]
    merged = (
        bloom_build(_keys(spark, a), "k", _BLOOM_BITS, _BLOOM_K)
        .unionByName(bloom_build(_keys(spark, b), "k", _BLOOM_BITS, _BLOOM_K))
        .distinct()
    )
    whole = bloom_build(_keys(spark, a + b), "k", _BLOOM_BITS, _BLOOM_K)
    assert sorted(r.bit_idx for r in merged.collect()) == sorted(
        r.bit_idx for r in whole.collect()
    )


def test_bloom_probe_inside_array_filter_is_map_only(spark):
    """The decontamination shape: filter a doc's gram ARRAY against the
    broadcast bitmap inside a HOF lambda — no exchange on the probe side."""
    members = ["the quick", "brown fox"]
    packed = _bloom(spark, members, portable=False)
    docs = spark.createDataFrame(
        [Row(doc_id=1, gs=["the quick", "lazy dog"]), Row(doc_id=2, gs=["lazy dog"])]
    )
    out = docs.crossJoin(F.broadcast(packed)).select(
        "doc_id",
        F.size(
            F.filter(
                "gs",
                lambda g: bloom_maybe_contains(
                    g, F.col("bloom"), _BLOOM_BITS, _BLOOM_K
                ),
            )
        ).alias("n_flagged"),
    )
    got = {r.doc_id: r.n_flagged for r in out.collect()}
    assert got[1] >= 1 and got[2] <= got[1]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only exchange is the 1-row bitmap broadcast; no shuffle
    for shuffle in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert f"Exchange {shuffle}" not in plan, plan


def test_bloom_null_keys_are_skipped(spark):
    df = spark.createDataFrame([Row(k=None), Row(k="x")], "k string")
    bits = bloom_build(df, "k", _BLOOM_BITS, _BLOOM_K)
    assert bits.count() <= _BLOOM_K


def test_bloom_validation():
    with pytest.raises(ValueError):
        bloom_build(None, "k", num_bits=100)
    with pytest.raises(ValueError):
        bloom_build(None, "k", num_bits=32)
    with pytest.raises(ValueError):
        bloom_build(None, "k", num_hashes=0)


def test_bloom_pack_rejects_out_of_range(spark):
    bad = spark.createDataFrame([Row(bit_idx=_BLOOM_BITS)])
    with pytest.raises(ValueError):
        bloom_pack(spark, bad, _BLOOM_BITS)
