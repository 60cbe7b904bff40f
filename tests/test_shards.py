"""Training-shard export (operators/shards.py): shard assignment
arithmetic, the one-file-per-shard layout, global-order read-back, and
determinism across re-runs."""

import glob

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_connect_gcs_spark.operators.shards import (
    assign_shards,
    read_training_shards,
    write_training_shards,
)


@pytest.fixture(scope="module")
def seqs(spark):
    # packed-sequence shape: dense 0-based seq_id + payload
    return spark.range(103).select(
        F.col("id").alias("seq_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("body"),
    )


def test_assign_shards_dense_order(seqs):
    out = assign_shards(seqs, 10, key_col="seq_id").collect()
    for r in out:
        assert r.shard_id == r.seq_id // 10
        assert r.pos_in_shard == r.seq_id % 10
    assert {r.shard_id for r in out} == set(range(11))  # 103 rows -> 11 shards


def test_assign_shards_shuffled_is_permutation(seqs):
    out = assign_shards(seqs, 10, key_col="seq_id", seed=5).collect()
    ranks = sorted(r.shard_id * 10 + r.pos_in_shard for r in out)
    assert ranks == list(range(103))
    # shuffled: the identity order is broken
    ident = sum(1 for r in out if r.shard_id * 10 + r.pos_in_shard == r.seq_id)
    assert ident < 20
    with pytest.raises(ValueError):
        assign_shards(seqs, 0)


def test_assign_shards_matches_duckdb(seqs):
    got = sorted(
        (r.seq_id, r.shard_id, r.pos_in_shard)
        for r in assign_shards(
            seqs, 16, key_col="seq_id", seed=3, portable=True
        ).collect()
    )
    pdf = seqs.select("seq_id").toPandas()
    want = sorted(
        duckdb.sql(
            "SELECT seq_id,"
            " CAST((row_number() OVER (ORDER BY"
            "   ('0x' || substr(md5('s3:' || seq_id), 1, 15))::BIGINT, seq_id)"
            "   - 1) // 16 AS BIGINT),"
            " CAST((row_number() OVER (ORDER BY"
            "   ('0x' || substr(md5('s3:' || seq_id), 1, 15))::BIGINT, seq_id)"
            "   - 1) % 16 AS BIGINT)"
            " FROM pdf"
        ).fetchall()
    )
    assert got == want


def test_write_one_file_per_shard_and_order(spark, seqs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = {
        r.shard_id: r.n_rows
        for r in write_training_shards(
            seqs, path, 10, key_col="seq_id", seed=7
        ).collect()
    }
    assert sum(manifest.values()) == 103
    assert sorted(manifest) == list(range(11))
    assert all(n == 10 for s, n in manifest.items() if s != 10)
    assert manifest[10] == 3  # the short tail shard
    for s in manifest:
        files = glob.glob(f"{path}/shard_id={s}/*.parquet")
        assert len(files) == 1, f"shard {s} split across {len(files)} files"
    # read-back in (shard, pos) order is the full permuted corpus
    back = read_training_shards(spark, path)
    assert back.count() == 103
    assert sorted(r.seq_id for r in back.collect()) == list(range(103))
    # within-file row order equals pos order (loader reads sequentially)
    one = spark.read.parquet(f"{path}/shard_id=0")
    pos = [r.pos_in_shard for r in one.collect()]
    assert pos == sorted(pos)


def test_rewrite_is_deterministic(spark, seqs, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(seqs, p1, 10, key_col="seq_id", seed=7)
    write_training_shards(seqs, p2, 10, key_col="seq_id", seed=7)
    a = sorted(map(tuple, spark.read.parquet(p1).collect()))
    b = sorted(map(tuple, spark.read.parquet(p2).collect()))
    assert a == b


def test_dense_rank_requires_integral_key(spark):
    df = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    with pytest.raises(ValueError, match="integral|dense"):
        assign_shards(df, 10)
