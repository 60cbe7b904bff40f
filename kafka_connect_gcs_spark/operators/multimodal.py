"""Multimodal payload plumbing: image/audio/video as opaque binary columns.

The reference's whole data model is "opaque bytes + a framing format"
(ConsumerRecord<byte[],byte[]>, GCSRecordsReader.java:32) — this module is
that idea at training-pipeline scale: media stays `binary` with typed
metadata columns; all per-item work runs as Arrow-batched ``mapInPandas``
so bytes move Spark→Python once per batch, never per row.

The actual codec step is STUBBED (no PIL/ffmpeg in this container): decoders
are pluggable callables and the default ``FakeCodec`` produces deterministic
feature vectors from the bytes, so the Spark-side plumbing — schema,
batching, partition sizing, UDF signatures — is real and fully tested.
Swap ``codec=RealCodec()`` in production.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


class FakeCodec:
    """Deterministic stand-in for image/audio decode. Real decode would
    hand `payload` bytes to PIL/soundfile/ffmpeg here; everything around it
    (Arrow batching, numpy vectorization, output schema) is production
    shape."""

    feature_dim = 16

    def features(self, payloads) -> "list":
        import hashlib

        import numpy as np

        out = []
        for p in payloads:  # per-item loop is inherent to codecs; each item
            if p is None:  # is a self-contained compressed stream
                out.append(None)
                continue
            h = hashlib.sha256(bytes(p)).digest()
            v = np.frombuffer(h[: self.feature_dim * 2], dtype=np.uint16)
            out.append((v.astype(np.float32) / 65535.0).tolist())
        return out

    def resize(self, payloads, w: int, h: int) -> "list":
        raise NotImplementedError(
            "real image resize needs PIL/opencv — not in this container; "
            "plug a RealCodec with the same signature"
        )


class RealCodec:
    """PIL-backed codec with the same signature as :class:`FakeCodec` —
    the production side of the seam. Only constructible when PIL imports
    (``default_codec`` falls back to :class:`FakeCodec` otherwise, so the
    pipeline stays green in containers without media libraries).

    ``features``: decode → grayscale → 4×4 downsample → 16 floats in
    [0, 1] (same ``feature_dim`` contract as the fake). Payloads that are
    not decodable images (audio/video containers, junk) degrade to the
    deterministic hash features so one mixed-kind batch never fails.
    ``resize``: decode → LANCZOS resize → PNG bytes."""

    feature_dim = 16

    def __init__(self):
        from PIL import Image  # raises ImportError where PIL is absent

        self._Image = Image

    def _decode(self, p):
        import io

        try:
            img = self._Image.open(io.BytesIO(bytes(p)))
            img.load()
            return img
        except Exception:
            return None

    def features(self, payloads) -> "list":
        import numpy as np

        fallback = FakeCodec()
        out = []
        for p in payloads:
            if p is None:
                out.append(None)
                continue
            img = self._decode(p)
            if img is None:
                out.append(fallback.features([p])[0])
                continue
            g = np.asarray(img.convert("L").resize((4, 4)), dtype=np.float32)
            out.append((g.reshape(-1) / 255.0).tolist())
        return out

    def resize(self, payloads, w: int, h: int) -> "list":
        import io

        out = []
        for p in payloads:
            img = None if p is None else self._decode(p)
            if img is None:
                out.append(None)
                continue
            buf = io.BytesIO()
            img.resize((w, h), self._Image.LANCZOS).save(buf, format="PNG")
            out.append(buf.getvalue())
        return out


def default_codec():
    """RealCodec when the media libraries import, else the deterministic
    FakeCodec — the seam auto-upgrades outside this sandbox without any
    call-site change."""
    try:
        return RealCodec()
    except ImportError:
        return FakeCodec()


@dataclass
class MediaPipeline:
    codec: object = None
    batch_hint: int = 256

    def __post_init__(self):
        if self.codec is None:
            self.codec = default_codec()

    def extract_features(self, df: DataFrame) -> DataFrame:
        """media rows → (media_id, kind, feature array<float>). One Arrow
        batch in, one out; payload bytes never round-trip back to the JVM."""
        codec = self.codec
        dim = codec.feature_dim
        out_schema = T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("kind", T.StringType()),
                T.StructField("feature", T.ArrayType(T.FloatType())),
            ]
        )

        def run(batches: Iterable["object"]):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                feats = codec.features(pdf["payload"].tolist())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"].to_numpy(),
                        "kind": pdf["kind"].to_numpy(),
                        "feature": feats,
                    }
                )

        # select() before mapInPandas = column pruning: the binary column is
        # the big one; everything else stays behind.
        return df.select("media_id", "kind", "payload").mapInPandas(
            run, schema=out_schema
        )

    def frame_sample_plan(self, df: DataFrame, every_ms: int = 1000) -> DataFrame:
        """Video → (media_id, frame_ts_ms) expansion, metadata-only: the
        sampling *plan* is pure Catalyst (sequence/explode); actual frame
        decode would be a second mapInPandas over (payload, frame_ts_ms)."""
        return (
            df.where(F.col("kind") == "video")
            .select(
                "media_id",
                F.explode(
                    F.sequence(
                        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                    )
                ).alias("frame_ts_ms"),
            )
        )


def synthesize_media_portable(spark, n: int = 200) -> DataFrame:
    """Deterministic fake media table where EVERY column is a pure ANSI-SQL
    function of the row id — so a DuckDB oracle can rebuild the table and
    replay the whole feature pipeline bit-for-bit. The payload is the UTF-8
    bytes of a 128-hex-char string (a real ``binary`` column to Spark;
    reproducible as a VARCHAR to DuckDB's string-only sha256)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    hexstr = F.concat(
        F.sha2(F.concat(F.lit("m"), F.col("id")), 256),
        F.sha2(F.concat(F.lit("n"), F.col("id")), 256),
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        hexstr.cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") * 37 % 1920 + 16).cast("int").alias("width"),
        (F.col("id") * 53 % 1080 + 16).cast("int").alias("height"),
        (F.col("id") * 97 % 60_000 + 1000).cast("int").alias("duration_ms"),
    )


def synthesize_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived from
    the id via sha2 — stable across engines and runs."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.to_binary(
            F.concat(F.sha2(F.concat(F.lit("m"), F.col("id")), 256),
                     F.sha2(F.concat(F.lit("n"), F.col("id")), 256)),
            F.lit("hex"),
        ).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(60_000)) + 1000).cast("int").alias("duration_ms"),
    )
