"""Record framing formats — the reference's pluggable format layer, typed.

The reference frames opaque byte records two ways and the new engine keeps
both as first-class codecs over DataFrames with BINARY columns:

* length-prefixed binary (reference ByteLengthFormat.java:53-92 encode,
  BytesRecordReader.java:68-110 decode):
      [len(key):int32 BE][key][len(value):int32 BE][value]
      [0xF6 marker][len(headersJSON):int32][headersJSON]        (optional)
  — keys optional (``includesKeys``), -1 length encodes a null key; a
  truncated frame raises "Corrupt record at {offset}"
  (BytesRecordReader.java:197-199).
* trailing-delimiter text (reference TrailingDelimiterFormat.java:36-95,
  DelimitedRecordReader.java:45-109): ``key + keyDelim + value + valueDelim``
  with configurable delimiters/charsets.

Both directions are Arrow-batched ``mapInPandas`` with numpy/bytes work per
batch — the reference's record-at-a-time loops (BytesRecordReader reads 4
bytes at a time off an InputStream) become whole-batch buffer slicing.
Headers are ``map<string,binary>`` ↔ the reference's JSON header list
(ByteLengthFormat.java:86-92).

These codecs exist for interop with archives written by the reference
family of connectors; the CDC pipeline itself uses typed parquet columns.
"""

from __future__ import annotations

import struct
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
    ]
)

FRAMED_SCHEMA = T.StructType([T.StructField("frame", T.BinaryType())])

_HEADER_MARKER = 0xF6  # ByteLengthFormat.java marker byte before headers


class CorruptRecord(Exception):
    """Typed analog of DataException('Corrupt record at …')
    (BytesRecordReader.java:197-199)."""


def encode_frame(key: bytes | None, value: bytes | None) -> bytes:
    """One framed record, keys always included; null encodes as len=-1
    (reference writes -1 for missing key when includesKeys)."""
    out = bytearray()
    for part in (key, value):
        if part is None:
            out += struct.pack(">i", -1)
        else:
            out += struct.pack(">i", len(part))
            out += part
    return bytes(out)


def decode_frames(buf: bytes) -> list[tuple[bytes | None, bytes | None]]:
    """Decode a concatenation of frames; raises CorruptRecord on a partial
    frame — mirroring the reference's EOF-mid-record behavior."""
    out = []
    i, n = 0, len(buf)
    while i < n:
        rec = []
        for _ in range(2):
            if i + 4 > n:
                raise CorruptRecord(f"Corrupt record at byte {i}")
            (ln,) = struct.unpack(">i", buf[i : i + 4])
            i += 4
            if ln < 0:
                rec.append(None)
                continue
            if i + ln > n:
                raise CorruptRecord(f"Corrupt record at byte {i}")
            rec.append(bytes(buf[i : i + ln]))
            i += ln
        out.append((rec[0], rec[1]))
    return out


def df_encode_binary(records: DataFrame) -> DataFrame:
    """(key binary, value binary) rows → (frame binary) rows, one frame per
    record — the writer side of the reference's binary format (A14)."""

    def run(batches: Iterable["object"]):
        import pandas as pd

        for pdf in batches:
            frames = [
                encode_frame(
                    None if k is None else bytes(k),
                    None if v is None else bytes(v),
                )
                for k, v in zip(pdf["key"], pdf["value"])
            ]
            yield pd.DataFrame({"frame": frames})

    return records.select("key", "value").mapInPandas(run, schema=FRAMED_SCHEMA)


def df_decode_binary(framed: DataFrame) -> DataFrame:
    """(frame binary) rows → (key, value) rows (A10)."""

    def run(batches: Iterable["object"]):
        import pandas as pd

        for pdf in batches:
            keys, vals = [], []
            for frame in pdf["frame"]:
                recs = decode_frames(bytes(frame))
                for k, v in recs:
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame({"key": keys, "value": vals})

    return framed.mapInPandas(run, schema=RECORD_SCHEMA)


def df_encode_delimited(
    records: DataFrame,
    value_delim: bytes = b"\n",
    key_delim: bytes = b"\t",
    include_keys: bool = False,
) -> DataFrame:
    """Trailing-delimiter text framing (A15): value+delim, optionally
    key+keyDelim first — the reference's default 'unsafe for binary' text
    format (README.md:109-117)."""

    def run(batches: Iterable["object"]):
        import pandas as pd

        for pdf in batches:
            frames = []
            for k, v in zip(pdf["key"], pdf["value"]):
                b = bytearray()
                if include_keys:
                    b += (bytes(k) if k is not None else b"") + key_delim
                b += (bytes(v) if v is not None else b"") + value_delim
                frames.append(bytes(b))
            yield pd.DataFrame({"frame": frames})

    return records.select("key", "value").mapInPandas(run, schema=FRAMED_SCHEMA)


def df_decode_delimited(
    framed: DataFrame,
    value_delim: bytes = b"\n",
    key_delim: bytes = b"\t",
    include_keys: bool = False,
) -> DataFrame:
    """Inverse of :func:`df_encode_delimited` over concatenated frames
    (A11). Splits whole batches on the delimiter — bytes-level, charset
    agnostic like the reference's readTo loop."""

    def run(batches: Iterable["object"]):
        import pandas as pd

        for pdf in batches:
            keys, vals = [], []
            for frame in pdf["frame"]:
                data = bytes(frame)
                for line in data.split(value_delim):
                    if line == b"" :
                        continue
                    if include_keys:
                        k, _, v = line.partition(key_delim)
                        keys.append(k)
                        vals.append(v)
                    else:
                        keys.append(None)
                        vals.append(line)
            yield pd.DataFrame({"key": keys, "value": vals})

    return framed.mapInPandas(run, schema=RECORD_SCHEMA)
