#!/usr/bin/env python
"""spark-submit entrypoint for the CDC ingest pipeline.

Cluster usage (north_rule: spark-submit --py-files on a multi-executor
cluster; the same module runs unchanged on local[N]):

    cd /root/repo && zip -qr /tmp/engine.zip kafka_connect_gcs_spark
    spark-submit --py-files /tmp/engine.zip scripts/run_pipeline.py \
        --feed /data/binlog --table /lake/docs --checkpoint /ckpt/docs \
        --max-files-per-batch 64 --shuffle-partitions 2000 --follow

On a real cluster set executor/memory via the usual spark-submit flags; the
engine itself is size-oblivious (no driver-side data paths).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feed", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--max-files-per-batch", type=int, default=64)
    ap.add_argument("--shuffle-partitions", type=int, default=200)
    ap.add_argument("--vocab-size", type=int, default=50_257)
    ap.add_argument("--follow", action="store_true",
                    help="keep polling for new segments (A28 loop)")
    ap.add_argument("--poll-interval", type=float, default=30.0,
                    help="idle re-list interval, like gcs.new.record.poll.interval")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from kafka_connect_gcs_spark.config import EngineConfig
    from kafka_connect_gcs_spark.streaming.pipeline import CdcPipeline

    spark = SparkSession.builder.appName("cdc-ingest").getOrCreate()
    cfg = EngineConfig(
        table_path=args.table,
        feed_path=args.feed,
        checkpoint_path=args.checkpoint,
        max_files_per_batch=args.max_files_per_batch,
        shuffle_partitions=args.shuffle_partitions,
        vocab_size=args.vocab_size,
        poll_interval_s=args.poll_interval,
    )
    pipe = CdcPipeline(spark, cfg)
    if args.follow:
        lineages = pipe.run_forever()
    else:
        lineages = pipe.run_available()
    for ln in lineages:
        ln.pop("_bounds", None)
        print(json.dumps(ln))


if __name__ == "__main__":
    main()
