"""kafka_connect_gcs_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference connector
``eeveebank/kafka-connect-gcs`` (a Kafka Connect GCS sink/source pair that
archives ordered byte-record streams to block-gzip files with a JSON chunk
index and replays them exactly-once-ish) as an idiomatic Spark pipeline:

* binlog/WAL-style change feed (insert/update/delete events keyed by doc_id)
* last-writer-wins dedup by ``(doc_id, offset)``
* key-partitioned MERGE upserts into an Iceberg-style snapshot table
  ("icebox": snapshot log + manifests over Parquet — the reference's
  ChunksIndex + cursor-file commit protocol, re-done as table metadata)
* exactly-once micro-batch commits keyed by batch_id (idempotent replay),
  per-partition offset checkpoints, mid-stream resume
* additive schema evolution (new columns, widened types) without rewrite
* salted repartitionByRange on doc_id against hot-key skew
* vectorized Arrow/pandas UDFs only — no per-row Python anywhere

Reference parity map lives in SURVEY.md §2 (operators A1–A30); each module
docstring cites the reference file:line it re-expresses.
"""

__version__ = "0.1.0"

from kafka_connect_gcs_spark.config import EngineConfig  # noqa: F401


def __getattr__(name):
    """Lazy top-level exports (keep `import kafka_connect_gcs_spark` free of
    a SparkSession/pyspark import cost until actually used)."""
    lazy = {
        "CdcPipeline": ("kafka_connect_gcs_spark.streaming.pipeline", "CdcPipeline"),
        "IceboxTable": ("kafka_connect_gcs_spark.icebox.table", "IceboxTable"),
        "ArchiveTailer": ("kafka_connect_gcs_spark.sources.archive", "ArchiveTailer"),
        "read_archive": ("kafka_connect_gcs_spark.sources.archive", "read_archive"),
        "write_archive": ("kafka_connect_gcs_spark.sources.archive", "write_archive"),
        "ingest_archive": ("kafka_connect_gcs_spark.sources.archive", "ingest_archive"),
        "ArchiveFilter": ("kafka_connect_gcs_spark.sources.archive", "ArchiveFilter"),
        "GzipFilter": ("kafka_connect_gcs_spark.sources.archive", "GzipFilter"),
        "create_format": ("kafka_connect_gcs_spark.sources.formats", "create_format"),
        "create_metrics": ("kafka_connect_gcs_spark.metrics", "create_metrics"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
