"""Record framing formats — the reference's pluggable format layer, typed.

The reference frames opaque byte records two ways and the new engine keeps
both as first-class codecs over DataFrames with BINARY columns:

* length-prefixed binary (ByteLengthFormat.java:53-92 encode,
  BytesRecordReader.java:68-134 decode)::

      [len(key):int32 BE][key]          -- only when include_keys
      [len(value):int32 BE][value]
      [0xF6][len(headersJSON):int32 BE][headersJSON]   -- only when headers

  A null key/value encodes as length 0 (reference NO_BYTES,
  ByteLengthFormat.java:59-60) — so include_keys round-trips a null key to
  b"". The header marker 0xF6 can never start a (non-negative) length
  field, which is what makes the block self-describing
  (ByteLengthFormat.java:27-28). A truncated frame raises
  "Corrupt record at {offset}" (BytesRecordReader.java:197-199).

* trailing-delimiter text (TrailingDelimiterFormat.java:36-95,
  DelimitedRecordReader.java:45-109)::

      [key][keyDelim]        -- keyDelim only when configured; key skipped
                                when null (but the delimiter still written)
      [value][valueDelim]
      [headersJSON]          -- only when headers non-empty
      [headerDelim]          -- ALWAYS (TrailingDelimiterFormat.java:72)

  Delimiters are configurable per field WITH per-field charsets (incl.
  UTF-16BE; TrailingDelimiterFormat.java:36-54); the headers JSON itself is
  always UTF-8 (TrailingDelimiterFormat.java:84-90). Empty values are
  preserved (an empty segment decodes to b"", never dropped).

Headers are ``array<struct<key:string, value:binary>>`` ↔ the reference's
Gson JSON list ``[{"key":"h1","value":[102,111,111]}]`` (signed Java bytes;
a null header value omits the field entirely, Gson default).

Both DataFrame directions are Arrow-batched ``mapInPandas`` with
bytes-level work per batch — the reference's record-at-a-time InputStream
loops become whole-batch buffer slicing. These codecs exist for interop
with archives written by the reference family of connectors; the CDC
pipeline itself uses typed parquet columns.

``create_format`` mirrors the reference's reflective factory + alias map
(Configure.java:20-23,37-66,115-135): ``format=binary|text|<class>`` with
``format.*`` sub-keys.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

Header = tuple[str, "bytes | None"]

HEADERS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.BinaryType()),
        ]
    )
)

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("headers", HEADERS_TYPE),
    ]
)

FRAMED_SCHEMA = T.StructType([T.StructField("frame", T.BinaryType())])

_HEADER_MARKER = 0xF6  # ByteLengthFormat.java:78 marker byte before headers
_HEADER_MARKER_BYTES = bytes([_HEADER_MARKER])


class CorruptRecord(Exception):
    """Typed analog of DataException('Corrupt record at …')
    (BytesRecordReader.java:197-199)."""


# ---------------------------------------------------------------------------
# headers ↔ Gson JSON
# ---------------------------------------------------------------------------


def encode_headers(headers: "list[Header] | None") -> "bytes | None":
    """Gson-compatible header JSON (ByteLengthFormat.java:86-92): a list of
    {"key": k, "value": [signed bytes]}; a null value omits the field; an
    empty header list serializes to None (no block written at all)."""
    if not headers:
        return None
    out = []
    for k, v in headers:
        if v is None:
            out.append({"key": k})
        else:
            out.append(
                {"key": k, "value": list(struct.unpack(f"{len(v)}b", bytes(v)))}
            )
    return json.dumps(out, separators=(",", ":")).encode("utf-8")


def decode_headers(blob: "bytes | None") -> list[Header]:
    """Inverse of :func:`encode_headers` (BytesRecordReader.java:128-134)."""
    if blob is None or len(blob) == 0:
        return []
    out = []
    for h in json.loads(blob.decode("utf-8")):
        v = h.get("value")
        out.append(
            (h["key"], None if v is None else bytes((x + 256) % 256 for x in v))
        )
    return out


# ---------------------------------------------------------------------------
# length-prefixed binary (A10/A12/A14)
# ---------------------------------------------------------------------------


def encode_frame(
    key: "bytes | None",
    value: "bytes | None",
    headers: "list[Header] | None" = None,
    include_keys: bool = True,
) -> bytes:
    """One framed record (ByteLengthFormat.encode, :53-84). Null key/value
    encode as length 0 — the reference substitutes NO_BYTES, it never writes
    a negative length (its own reader would die on one)."""
    out = bytearray()
    if include_keys:
        k = key or b""
        out += struct.pack(">i", len(k))
        out += k
    v = value or b""
    out += struct.pack(">i", len(v))
    out += v
    hblob = encode_headers(headers)
    if hblob is not None:
        out += _HEADER_MARKER_BYTES
        out += struct.pack(">i", len(hblob))
        out += hblob
    return bytes(out)


def decode_frames(
    buf: bytes, include_keys: bool = True
) -> list[tuple["bytes | None", bytes, list[Header]]]:
    """Decode a concatenation of frames → (key, value, headers) triples;
    raises CorruptRecord on a partial frame, mirroring the reference's
    EOF-mid-record behavior (BytesRecordReader.java:73-110). key is None
    in values-only mode (the reference default: includesKeys=false,
    ByteLengthFormat.java:47-50)."""
    out = []
    i, n = 0, len(buf)

    def read_len(at: int, eof_ok: bool) -> tuple["int | None", int]:
        if at + 4 > n:
            if eof_ok and at == n:
                return None, at
            raise CorruptRecord(f"Corrupt record at byte {at}")
        (ln,) = struct.unpack(">i", buf[at : at + 4])
        if ln < 0:
            raise CorruptRecord(f"Corrupt record at byte {at}")
        return ln, at + 4

    def read_bytes(at: int, ln: int) -> tuple[bytes, int]:
        if at + ln > n:
            raise CorruptRecord(f"Corrupt record at byte {at}")
        return bytes(buf[at : at + ln]), at + ln

    while i < n:
        key: "bytes | None" = None
        if include_keys:
            klen, i = read_len(i, eof_ok=True)
            if klen is None:
                break
            key, i = read_bytes(i, klen)
            vlen, i = read_len(i, eof_ok=False)
        else:
            vlen, i = read_len(i, eof_ok=True)
            if vlen is None:
                break
        value, i = read_bytes(i, vlen)
        headers: list[Header] = []
        # peek: a 0xF6 byte cannot start a valid (non-negative) length
        if i < n and buf[i] == _HEADER_MARKER:
            hlen, i = read_len(i + 1, eof_ok=False)
            hblob, i = read_bytes(i, hlen)
            headers = decode_headers(hblob)
        out.append((key, value, headers))
    return out


# ---------------------------------------------------------------------------
# trailing-delimiter text (A11/A15)
# ---------------------------------------------------------------------------

DEFAULT_HEADER_DELIMITER = "\x0b"  # TrailingDelimiterFormat.java:30 (byte 11)


@dataclass(frozen=True)
class DelimitedConfig:
    """TrailingDelimiterFormat.configure analog (:36-54): per-field
    delimiter strings with per-field charsets. ``key_delimiter=None`` means
    values-only mode; key_encoding without a key delimiter is rejected
    exactly like the reference (:51-53)."""

    value_delimiter: str = "\n"
    value_encoding: str = "utf-8"
    key_delimiter: "str | None" = None
    key_encoding: "str | None" = None
    header_delimiter: str = DEFAULT_HEADER_DELIMITER
    header_encoding: str = "utf-8"

    def __post_init__(self):
        if self.key_delimiter is None and self.key_encoding is not None:
            raise ValueError("Key encoding specified without delimiter!")

    @property
    def value_delim_bytes(self) -> bytes:
        return self.value_delimiter.encode(self.value_encoding)

    @property
    def key_delim_bytes(self) -> "bytes | None":
        if self.key_delimiter is None:
            return None
        return self.key_delimiter.encode(self.key_encoding or "utf-8")

    @property
    def header_delim_bytes(self) -> bytes:
        return self.header_delimiter.encode(self.header_encoding)


def encode_delimited_record(
    key: "bytes | None",
    value: "bytes | None",
    headers: "list[Header] | None",
    cfg: DelimitedConfig,
) -> bytes:
    """TrailingDelimiterFormat.encode (:63-82): key (only when a key
    delimiter is configured AND the key is non-null), keyDelim (whenever
    configured), value (when non-null), valueDelim, headersJSON (when
    non-empty), headerDelim (ALWAYS — ':72 so it's easier to parse')."""
    kd = cfg.key_delim_bytes
    out = bytearray()
    if kd is not None:
        if key is not None:
            out += key
        out += kd
    if value is not None:
        out += value
    out += cfg.value_delim_bytes
    hblob = encode_headers(headers)
    if hblob is not None:
        out += hblob
    out += cfg.header_delim_bytes
    return bytes(out)


def _read_to(buf: bytes, pos: int, delim: bytes) -> tuple["bytes | None", int]:
    """DelimitedRecordReader.readTo (:83-100): bytes up to (excluding) the
    next delimiter; at EOF return the remainder, or None if nothing left."""
    i = buf.find(delim, pos)
    if i == -1:
        if pos >= len(buf):
            return None, pos
        return bytes(buf[pos:]), len(buf)
    return bytes(buf[pos:i]), i + len(delim)


def decode_delimited(
    buf: bytes, cfg: DelimitedConfig
) -> list[tuple["bytes | None", bytes, list[Header]]]:
    """DelimitedRecordReader.read (:45-68) over a whole buffer. Empty
    segments decode to b\"\" (a record with an empty value is PRESERVED —
    round-1 dropped it). A null key is indistinguishable from b\"\" after
    the trip, like the reference."""
    out = []
    kd = cfg.key_delim_bytes
    vd = cfg.value_delim_bytes
    hd = cfg.header_delim_bytes
    pos = 0
    n = len(buf)
    while pos < n:
        key: "bytes | None" = None
        if kd is not None:
            key, pos = _read_to(buf, pos, kd)
            if key is None:
                break
        value, pos = _read_to(buf, pos, vd)
        if value is None:
            if kd is not None:
                raise CorruptRecord(f"missing value for key! {key!r}")
            break
        hblob, pos = _read_to(buf, pos, hd)
        headers = decode_headers(hblob)
        out.append((key, value, headers))
    return out


# ---------------------------------------------------------------------------
# DataFrame codecs (Arrow-batched)
# ---------------------------------------------------------------------------


def _headers_in(h) -> "list[Header] | None":
    """Arrow gives array<struct> cells as a list of dicts (or Rows)."""
    if h is None:
        return None
    out = []
    for x in h:
        k = x["key"] if isinstance(x, dict) else x.key
        v = x["value"] if isinstance(x, dict) else x.value
        out.append((k, None if v is None else bytes(v)))
    return out


def _headers_out(headers: list[Header]):
    return [{"key": k, "value": v} for k, v in headers]


def _iter_records(pdf):
    has_headers = "headers" in pdf.columns
    for idx in range(len(pdf)):
        k = pdf["key"].iloc[idx]
        v = pdf["value"].iloc[idx]
        h = pdf["headers"].iloc[idx] if has_headers else None
        yield (
            None if k is None else bytes(k),
            None if v is None else bytes(v),
            _headers_in(h),
        )


def df_encode_binary(records: DataFrame, include_keys: bool = True) -> DataFrame:
    """(key, value[, headers]) rows → (frame binary) rows, one frame per
    record — the writer side of the reference's binary format (A14)."""

    def run(batches: Iterable["object"]):
        import pandas as pd

        for pdf in batches:
            frames = [
                encode_frame(k, v, h, include_keys=include_keys)
                for k, v, h in _iter_records(pdf)
            ]
            yield pd.DataFrame({"frame": frames})

    cols = [c for c in ("key", "value", "headers") if c in records.columns]
    return records.select(*cols).mapInPandas(run, schema=FRAMED_SCHEMA)


def df_decode_binary(framed: DataFrame, include_keys: bool = True) -> DataFrame:
    """(frame binary) rows → (key, value, headers) rows (A10 + A12)."""

    def run(batches: Iterable["object"]):
        import pandas as pd

        for pdf in batches:
            keys, vals, hdrs = [], [], []
            for frame in pdf["frame"]:
                for k, v, h in decode_frames(bytes(frame), include_keys=include_keys):
                    keys.append(k)
                    vals.append(v)
                    hdrs.append(_headers_out(h))
            yield pd.DataFrame({"key": keys, "value": vals, "headers": hdrs})

    return framed.mapInPandas(run, schema=RECORD_SCHEMA)


def df_encode_delimited(
    records: DataFrame,
    config: "DelimitedConfig | None" = None,
    **kwargs,
) -> DataFrame:
    """Trailing-delimiter text framing (A15) — the reference's default
    'unsafe for binary' text format (README.md:109-117)."""
    cfg = config or DelimitedConfig(**_legacy_delim_kwargs(kwargs))

    def run(batches: Iterable["object"]):
        import pandas as pd

        for pdf in batches:
            frames = [
                encode_delimited_record(k, v, h, cfg)
                for k, v, h in _iter_records(pdf)
            ]
            yield pd.DataFrame({"frame": frames})

    cols = [c for c in ("key", "value", "headers") if c in records.columns]
    return records.select(*cols).mapInPandas(run, schema=FRAMED_SCHEMA)


def df_decode_delimited(
    framed: DataFrame,
    config: "DelimitedConfig | None" = None,
    **kwargs,
) -> DataFrame:
    """Inverse of :func:`df_encode_delimited` over concatenated frames
    (A11). Bytes-level scanning like the reference's readTo loop."""
    cfg = config or DelimitedConfig(**_legacy_delim_kwargs(kwargs))

    def run(batches: Iterable["object"]):
        import pandas as pd

        for pdf in batches:
            keys, vals, hdrs = [], [], []
            for frame in pdf["frame"]:
                for k, v, h in decode_delimited(bytes(frame), cfg):
                    keys.append(k)
                    vals.append(v)
                    hdrs.append(_headers_out(h))
            yield pd.DataFrame({"key": keys, "value": vals, "headers": hdrs})

    return framed.mapInPandas(run, schema=RECORD_SCHEMA)


def _legacy_delim_kwargs(kwargs: dict) -> dict:
    """Back-compat shim for the round-1 byte-delimiter signature
    (value_delim=b'\\n', key_delim=b'\\t', include_keys=False)."""
    if not kwargs:
        return {}
    out: dict = {}
    if "value_delim" in kwargs:
        out["value_delimiter"] = kwargs["value_delim"].decode("utf-8")
    if kwargs.get("include_keys"):
        out["key_delimiter"] = kwargs.get("key_delim", b"\t").decode("utf-8")
    return out


# ---------------------------------------------------------------------------
# format factory (A17) — Configure.java:20-23,37-66,115-135
# ---------------------------------------------------------------------------


class ByteLengthFormat:
    """Pluggable binary format object (ByteLengthFormat.java). Like the
    reference, include_keys defaults to FALSE (:47-50 — only an explicit
    truthy config turns it on)."""

    def __init__(self, include_keys: bool = False):
        self.include_keys = include_keys

    def encode_df(self, records: DataFrame) -> DataFrame:
        return df_encode_binary(records, include_keys=self.include_keys)

    def decode_df(self, framed: DataFrame) -> DataFrame:
        return df_decode_binary(framed, include_keys=self.include_keys)

    def encode(self, key, value, headers=None) -> bytes:
        return encode_frame(key, value, headers, include_keys=self.include_keys)

    def decode(self, buf: bytes):
        return decode_frames(buf, include_keys=self.include_keys)


class TrailingDelimiterFormat:
    """Pluggable text format object (TrailingDelimiterFormat.java)."""

    def __init__(self, config: "DelimitedConfig | None" = None):
        self.config = config or DelimitedConfig()

    def encode_df(self, records: DataFrame) -> DataFrame:
        return df_encode_delimited(records, self.config)

    def decode_df(self, framed: DataFrame) -> DataFrame:
        return df_decode_delimited(framed, self.config)

    def encode(self, key, value, headers=None) -> bytes:
        return encode_delimited_record(key, value, headers, self.config)

    def decode(self, buf: bytes):
        return decode_delimited(buf, self.config)


FORMAT_ALIASES = {"binary": ByteLengthFormat, "text": TrailingDelimiterFormat}


def create_format(props: "dict | None" = None):
    """String-name registry + sub-key configuration, mirroring
    Configure.createFormat (Configure.java:115-135; aliases :20-23):

        create_format({"format": "binary", "format.include.keys": "true"})
        create_format({"format": "text", "format.key.delimiter": "\\t",
                       "format.key.encoding": "UTF-16BE"})

    Unknown names resolve as dotted ``module:Class`` paths (the reference's
    reflective ``format=com.mycompany.Impl``)."""
    props = props or {}
    name = str(props.get("format", "binary"))
    sub = {
        k[len("format.") :]: v for k, v in props.items() if k.startswith("format.")
    }
    if name == "binary":
        inc = str(sub.get("include.keys", "false")).lower() == "true"
        return ByteLengthFormat(include_keys=inc)
    if name == "text":
        cfg = DelimitedConfig(
            value_delimiter=str(sub.get("value.delimiter", "\n")),
            value_encoding=str(sub.get("value.encoding", "utf-8")),
            key_delimiter=(
                str(sub["key.delimiter"]) if "key.delimiter" in sub else None
            ),
            key_encoding=(
                str(sub["key.encoding"]) if "key.encoding" in sub else None
            ),
            header_delimiter=str(
                sub.get("header.delimiter", DEFAULT_HEADER_DELIMITER)
            ),
            header_encoding=str(sub.get("header.encoding", "utf-8")),
        )
        return TrailingDelimiterFormat(cfg)
    # reflective path: "pkg.mod:ClassName"
    mod_name, _, cls_name = name.partition(":")
    import importlib

    cls = getattr(importlib.import_module(mod_name), cls_name)
    return cls()
