"""Typed engine configuration.

The reference drives ALL behavior from java properties (its "query language",
SURVEY.md §2.3: ``gcs.bucket``, ``compressed_block_size``, ``max.poll.records``,
``gcs.page.size`` …, README.md:159-190). This is the Spark-native equivalent: a
small frozen dataclass passed to the pipeline, with defaults mirroring the
reference's documented constants where a direct analog exists.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # --- table layout -----------------------------------------------------
    table_path: str = "/tmp/icebox/table"
    #: target uncompressed bytes per data file before rotation — mirrors the
    #: sink's ``compressed_block_size`` 64 MiB chunk threshold
    #: (reference BlockGZIPFileWriter.java:95-105, README.md:171).
    target_file_bytes: int = 64 * 1024 * 1024
    #: cap on records per written file (Spark ``maxRecordsPerFile``); the
    #: rotation analog of the reference's chunk threshold.
    max_records_per_file: int = 2_000_000

    # --- feed / micro-batch -----------------------------------------------
    feed_path: str = "/tmp/icebox/feed"
    checkpoint_path: str = "/tmp/icebox/checkpoint"
    #: max feed files consumed per micro-batch — mirrors ``max.poll.records``
    #: (GCSSourceTask.java:126-128, default 1000) batch-bounding, at file
    #: granularity like maxFilesPerTrigger.
    max_files_per_batch: int = 64
    #: max feed segments VISIBLE per listing pass — the reference's
    #: ``gcs.page.size`` (GCSSourceTask.java:164, default 100): a bound on
    #: the object LISTING, independent of the poll-batch bound above (the
    #: reference treats them as separate knobs; one poll may span several
    #: listing pages and one page may feed several batches). The poll loop
    #: re-lists, so later pages are picked up on the next poll. None = no
    #: paging.
    listing_page_size: int | None = 100
    #: the reference's ``tasks`` count (GCSSourceTask.java:45-53). Spark's
    #: scheduler owns task placement (A22), so this is a PRESERVED HINT for
    #: migrating .properties files, not a scheduling input — recorded so
    #: the intent isn't silently dropped.
    num_tasks: int | None = None
    #: the reference's ``tasks.splitTopics`` (hash(topic) % taskCount
    #: assignment, GCSSourceTask.java:175-193). n/a under Spark — shuffles
    #: already hash-partition by key across executors — but preserved for
    #: the same reason as num_tasks.
    split_topics_across_tasks: bool = False

    # --- shuffle / skew ----------------------------------------------------
    #: UPPER BOUND on merge-write fan-out; the actual partition count is
    #: sized from data volume (≈ output_bytes / target_file_bytes, min 4) —
    #: core-count-sized shuffles on small batches measured 2.5× slower than
    #: volume-sized ones (task overhead + small parquet files).
    shuffle_partitions: int = 32
    #: rough bytes/row used to size the write fan-out before writing
    #: (tokens avg ~72 int32 + strings ≈ 350-500 B).
    estimated_row_bytes: int = 450
    #: number of salt buckets used to split a hot doc_id across tasks —
    #: generalizes the reference's hash-split assignment
    #: (GCSSourceTask.java:181-193) into salted repartitioning.
    salt_buckets: int = 8
    #: a key is "hot" when its share of a batch exceeds this fraction;
    #: hot keys get salted, cold keys keep a single bucket.
    hot_key_fraction: float = 0.01

    # --- merge strategy ------------------------------------------------------
    #: "cow" (copy-on-write: rewrite touched files), "mor" (merge-on-read:
    #: append winners + delete-vector sidecars, nothing rewritten), or
    #: "auto" (MoR when the batch is sparse relative to the files it
    #: touches, else COW). MoR trades read-time DV reconciliation for write
    #: volume ∝ changes instead of ∝ touched bytes — the sparse-update win
    #: at 100 TB; fold with icebox.maintenance.fold_deletes / compact.
    merge_mode: str = "auto"
    #: auto mode picks MoR when changed_keys / touched_file_rows ≤ this.
    mor_max_changed_ratio: float = 0.2
    #: automatic MoR maintenance: after a table commit the pipeline folds
    #: delete vectors into the data files (icebox.maintenance.fold_deletes)
    #: once DV-dead rows exceed this fraction of physically-stored rows —
    #: the read-amplification bound: every reconciling read joins against
    #: the DVs until they are folded. Pure metadata check (manifest sums +
    #: the mor_dead_rows counter), zero extra Spark jobs per batch. None
    #: disables auto-fold (maintenance stays manual).
    auto_fold_dead_ratio: float | None = 0.25
    #: don't bother folding below this many dead rows, whatever the ratio
    #: (a fold rewrites overlapping files — pointless for tiny DVs).
    auto_fold_min_dead: int = 10_000
    #: automatic small-file compaction: after a commit, when more than this
    #: many data files sit below half the target file size, bin-pack them
    #: (icebox.maintenance.compact). Micro-batch COW otherwise shreds the
    #: table into per-batch files and scan task count grows without bound.
    #: Metadata-only check. None disables.
    auto_compact_min_small_files: int | None = 64

    # --- payload -----------------------------------------------------------
    #: token vocabulary bound for validation (exclusive upper bound).
    vocab_size: int = 50_257

    # --- routing / filtering (reference A4/A24 analogs) ---------------------
    #: feed partitions to consume; None = all — the reference's partition-set
    #: membership filter (GCSFilesReader.java:86-109).
    parts_allow: tuple | None = None
    #: feed partitions to SKIP — the reference's ``topics.ignore`` deny-list
    #: (GCSSourceTask.java:88-93, README.md:190). Applied after parts_allow.
    parts_ignore: tuple | None = None
    #: source-label allow-list — the reference's ``topics`` list maps HERE
    #: (topics are source labels, like targetTopic.* remaps the source
    #: column), NOT onto the numeric feed partitions above.
    source_allow: tuple | None = None
    #: source-label deny-list (``topics.ignore``). Applied after source_allow.
    source_ignore: tuple | None = None
    #: begin mid-feed WITHOUT a checkpoint: segments lexicographically below
    #: this name are skipped on first start — the reference's
    #: ``gcs.start.marker`` (GCSSourceConfig.java:9, GCSFilesReader.java:148-158,
    #: README.md:184). Ignored once a checkpoint exists (checkpoint wins,
    #: like stored Connect offsets win over the marker).
    start_marker: str | None = None
    #: source-label remap applied on ingest — the reference's targetTopic.*
    #: routing (GCSSourceTask.java:286-288), e.g. {"web": "web-archive"}.
    source_remap: dict | None = None

    # --- poll loop (reference A28 analogs) -----------------------------------
    #: sleep between idle re-lists, seconds (gcs.new.record.poll.interval=30s,
    #: GCSSourceTask.java:39,129-131 — scaled down for tests).
    poll_interval_s: float = 5.0
    #: backoff after a retryable batch failure (gcs.error.backoff=1s,
    #: GCSSourceTask.java:40,132-134).
    error_backoff_s: float = 1.0
    #: max consecutive failures before giving up.
    max_retries: int = 3

    # --- misc ----------------------------------------------------------------
    properties: dict = field(default_factory=dict)

    @staticmethod
    def from_properties(props: dict) -> "EngineConfig":
        """Build a config from the REFERENCE'S property names, so a user's
        existing ``.properties`` file carries over (README.md:159-190;
        GCSSourceTask.java:73-142). Unknown keys ride along in
        ``properties`` (where e.g. ``format.*`` and ``metrics.reporter``
        already live); engine-native snake_case keys override.

            EngineConfig.from_properties({
                "gcs.start.marker": "seg=00000100",
                "topics.ignore": "web,spam",
                "max.poll.records": "500",
                "targetTopic.web": "web-archive",
                "compressed_block_size": "67108864",
            })
        """
        import dataclasses

        fields = {f.name for f in dataclasses.fields(EngineConfig)}
        kw: dict = {}
        remap = {}
        for k, v in props.items():
            if k.startswith("targetTopic."):
                remap[k[len("targetTopic."):]] = str(v)
            elif k == "topics":
                # topics are SOURCE LABELS (strings) — filtering the int
                # feed-partition column with them would ANSI-crash or
                # silently drop everything
                kw["source_allow"] = tuple(
                    x.strip() for x in str(v).split(",") if x.strip()
                )
            elif k == "topics.ignore":
                kw["source_ignore"] = tuple(
                    x.strip() for x in str(v).split(",") if x.strip()
                )
            elif k == "gcs.start.marker":
                kw["start_marker"] = str(v)
            elif k == "max.poll.records":
                kw["max_files_per_batch"] = int(v)
            elif k == "gcs.page.size":
                # a LISTING bound, distinct from the poll-batch bound
                kw["listing_page_size"] = int(v)
            elif k in ("tasks", "tasks.max"):
                kw["num_tasks"] = int(v)
            elif k == "tasks.splitTopics":
                kw["split_topics_across_tasks"] = str(v).lower() == "true"
            elif k == "gcs.new.record.poll.interval":
                kw["poll_interval_s"] = float(v)
            elif k == "gcs.error.backoff":
                kw["error_backoff_s"] = float(v)
            elif k == "compressed_block_size":
                kw["target_file_bytes"] = int(v)
            elif k in fields:
                # engine-native name — coerce from the string a .properties
                # file delivers to the field's declared type
                ftype = {f.name: f.type for f in dataclasses.fields(EngineConfig)}[k]
                if isinstance(v, str):
                    if ftype in ("int", "int | None"):
                        v = int(v)
                    elif ftype in ("float", "float | None"):
                        v = float(v)
                    elif ftype == "bool":
                        v = v.lower() == "true"
                kw[k] = v
        leftovers = {
            k: v
            for k, v in props.items()
            if k not in kw and not k.startswith("targetTopic.")
            and k not in (
                "topics", "topics.ignore", "gcs.start.marker",
                "max.poll.records", "gcs.page.size",
                "tasks", "tasks.max", "tasks.splitTopics",
                "gcs.new.record.poll.interval", "gcs.error.backoff",
                "compressed_block_size",
            )
        }
        if remap:
            kw["source_remap"] = remap
        kw["properties"] = leftovers
        return EngineConfig(**kw)
