"""Format round-trip tests — ports the reference's FormatTests harness
(FormatTests.java:108-125 roundTrip: write → read → assert identical),
including binary-unsafe payloads with embedded delimiters/control bytes
(ByteLengthFormatTest.java:22-68), headers incl. empty/null values
(ByteLengthFormatTest.java:44-69), golden byte layouts
(ByteLengthFormatTest.java:71-118, TrailingDelimiterFormatTest.java:56-98
— UTF-16BE delimiters), and the factory (Configure.java:115-135)."""

import pytest

from kafka_connect_gcs_spark.sources.formats import (
    CorruptRecord,
    DelimitedConfig,
    ByteLengthFormat,
    TrailingDelimiterFormat,
    create_format,
    decode_delimited,
    decode_frames,
    df_decode_binary,
    df_decode_delimited,
    df_encode_binary,
    df_encode_delimited,
    encode_delimited_record,
    encode_frame,
)

# (key, value, headers) — mirrors ByteLengthFormatTest.withKeysAndHeaders
# incl. empty header value, null header value, control bytes in the value
CASES = [
    (b"k1", b"abcd", []),
    (
        b"k2",
        b"567\tav",
        [("h1", b""), ("h2", None), ("h3", b"foo"), ("h4", b"0b9a14e5-5f45")],
    ),
    (
        b"k3",
        b"\x06GET\x02H396a14e5\x14/auth/user\x00",
        [("h1", b"foo")],
    ),
    (b"", b"238473\n847109\n49837", [("traceparent", b"00-9e9f-01")]),
]


def test_golden_frame_layout_with_keys():
    """ByteLengthFormatTest.outputWithKeys (:71-93)."""
    f = encode_frame(b"abc", b"defghi")
    assert f == b"\x00\x00\x00\x03abc\x00\x00\x00\x06defghi"


def test_golden_frame_layout_with_keys_and_headers():
    """ByteLengthFormatTest.outputWithKeysAndHeaders (:95-118): value block,
    then 0xF6 (byte -10), headers length, Gson JSON with signed byte ints."""
    f = encode_frame(b"abc", b"defghi", [("h1", b"foo")])
    hjson = b'[{"key":"h1","value":[102,111,111]}]'
    assert f == (
        b"\x00\x00\x00\x03abc\x00\x00\x00\x06defghi"
        + b"\xf6"
        + len(hjson).to_bytes(4, "big")
        + hjson
    )


def test_null_key_encodes_as_length_zero():
    """The reference writes NO_BYTES (length 0) for a null key
    (ByteLengthFormat.java:59-63) — its reader would die on -1."""
    assert encode_frame(None, b"v") == b"\x00\x00\x00\x00\x00\x00\x00\x01v"
    # and decodes back as the empty key, like BytesRecordReader
    assert decode_frames(encode_frame(None, b"v")) == [(b"", b"v", [])]


def test_values_only_mode():
    """includesKeys=false is the reference DEFAULT (ByteLengthFormat.java:47-50)."""
    f = encode_frame(b"ignored-is-none", b"val", include_keys=False)
    assert f == b"\x00\x00\x00\x03val"
    assert decode_frames(f, include_keys=False) == [(None, b"val", [])]


def test_python_roundtrip_with_headers_and_corrupt():
    buf = b"".join(encode_frame(k, v, h) for k, v, h in CASES)
    assert decode_frames(buf) == CASES
    with pytest.raises(CorruptRecord, match="Corrupt record"):
        decode_frames(buf[:-1])  # truncated mid-record, like EOF mid-frame
    with pytest.raises(CorruptRecord, match="Corrupt record"):
        decode_frames(b"\xff\xff\xff\xff\x00")  # negative length = corrupt


def test_header_marker_cannot_be_confused_with_length():
    """A record with NO headers followed by another record: the next frame's
    key-length high byte is 0x00, never 0xF6 — unambiguous peek."""
    buf = encode_frame(b"a", b"b") + encode_frame(b"c", b"d", [("h", b"x")])
    assert decode_frames(buf) == [
        (b"a", b"b", []),
        (b"c", b"d", [("h", b"x")]),
    ]


def test_df_binary_roundtrip_with_headers(spark):
    df = spark.createDataFrame(
        CASES,
        "key binary, value binary, headers array<struct<key:string,value:binary>>",
    )
    back = df_decode_binary(df_encode_binary(df)).collect()
    got = sorted(
        (
            bytes(r.key),
            bytes(r.value),
            tuple(
                (h.key, None if h.value is None else bytes(h.value))
                for h in r.headers
            ),
        )
        for r in back
    )
    assert got == sorted((k, v, tuple(h)) for k, v, h in CASES)


# --- trailing-delimiter text ------------------------------------------------


def test_golden_delimited_utf16be():
    """TrailingDelimiterFormatTest.outputWithKeys (:56-75): UTF-16BE
    delimiters; the frame is key, \\t, value, \\n (all UTF-16BE) + the
    always-written header delimiter (byte 11 in UTF-16BE = 00 0B)."""
    cfg = DelimitedConfig(
        key_delimiter="\t",
        key_encoding="UTF-16BE",
        value_encoding="UTF-16BE",
        header_encoding="UTF-16BE",
    )
    key = "abc".encode("UTF-16BE")
    val = "def".encode("UTF-16BE")
    got = encode_delimited_record(key, val, None, cfg)
    assert got == "abc\tdef\n".encode("UTF-16BE") + b"\x00\x0b"


def test_golden_delimited_utf16be_with_headers():
    """TrailingDelimiterFormatTest.outputWithKeysAndHeaders (:77-98): headers
    JSON is UTF-8 with the header VALUE bytes being UTF-16BE 'foo'."""
    cfg = DelimitedConfig(
        key_delimiter="\t",
        key_encoding="UTF-16BE",
        value_encoding="UTF-16BE",
        header_encoding="UTF-16BE",
    )
    got = encode_delimited_record(
        "abc".encode("UTF-16BE"),
        "def".encode("UTF-16BE"),
        [("h1", "foo".encode("UTF-16BE"))],
        cfg,
    )
    expected = (
        "abc\tdef\n".encode("UTF-16BE")
        + b'[{"key":"h1","value":[0,102,0,111,0,111]}]'
        + b"\x00\x0b"
    )
    assert got == expected


def test_delimited_preserves_empty_value_and_null_key():
    """Round-1 regression: empty-value records were silently dropped; the
    reference preserves them (FormatTests covers empty/null values)."""
    cfg = DelimitedConfig(key_delimiter="\t")
    buf = (
        encode_delimited_record(b"k1", b"", None, cfg)
        + encode_delimited_record(None, b"v2", None, cfg)
        + encode_delimited_record(b"k3", b"v3", [("h", None)], cfg)
    )
    assert decode_delimited(buf, cfg) == [
        (b"k1", b"", []),
        (b"", b"v2", []),  # null key → empty after the trip, like readTo
        (b"k3", b"v3", [("h", None)]),
    ]


def test_delimited_roundtrip_multibyte_delims_and_headers():
    cfg = DelimitedConfig(
        value_delimiter="||END||", key_delimiter="::", header_delimiter="#H#"
    )
    cases = [
        (b"k1", b"hello world", []),
        (b"k2", b"second || almost delim", [("a", b"1"), ("a", b"2")]),
        (b"k3", b"", [("empty", b"")]),
    ]
    buf = b"".join(encode_delimited_record(k, v, h, cfg) for k, v, h in cases)
    assert decode_delimited(buf, cfg) == cases


def test_df_delimited_roundtrip_with_keys(spark):
    cases = [
        (b"k1", b"hello world", [("h1", b"x")]),
        (b"k2", b"second value", []),
    ]
    cfg = DelimitedConfig(key_delimiter="\t")
    df = spark.createDataFrame(
        cases,
        "key binary, value binary, headers array<struct<key:string,value:binary>>",
    )
    back = df_decode_delimited(df_encode_delimited(df, cfg), cfg).collect()
    got = sorted(
        (
            bytes(r.key),
            bytes(r.value),
            [(h.key, bytes(h.value)) for h in r.headers],
        )
        for r in back
    )
    assert got == sorted(cases)


def test_df_delimited_values_only(spark):
    cases = [(None, b"alpha", []), (None, b"beta gamma", [])]
    df = spark.createDataFrame(
        cases,
        "key binary, value binary, headers array<struct<key:string,value:binary>>",
    )
    back = df_decode_delimited(df_encode_delimited(df)).collect()
    assert sorted(bytes(r.value) for r in back) == sorted(v for _, v, _ in cases)
    assert all(r.key is None for r in back)


# --- factory (A17) ----------------------------------------------------------


def test_create_format_registry_and_subkeys():
    f = create_format({"format": "binary", "format.include.keys": "true"})
    assert isinstance(f, ByteLengthFormat) and f.include_keys
    f = create_format({"format": "binary"})
    assert isinstance(f, ByteLengthFormat) and not f.include_keys  # ref default
    f = create_format(
        {
            "format": "text",
            "format.key.delimiter": "\t",
            "format.key.encoding": "UTF-16BE",
            "format.value.encoding": "UTF-16BE",
        }
    )
    assert isinstance(f, TrailingDelimiterFormat)
    assert f.config.key_delim_bytes == b"\x00\t"
    f = create_format(
        {"format": "kafka_connect_gcs_spark.sources.formats:ByteLengthFormat"}
    )
    assert isinstance(f, ByteLengthFormat)


def test_key_encoding_without_delimiter_rejected():
    """TrailingDelimiterFormat.configure (:51-53)."""
    with pytest.raises(ValueError, match="Key encoding"):
        DelimitedConfig(key_encoding="UTF-16BE")


def test_format_objects_roundtrip():
    fmt = create_format({"format": "binary", "format.include.keys": "true"})
    buf = b"".join(fmt.encode(k, v, h) for k, v, h in CASES)
    assert fmt.decode(buf) == CASES
    tfmt = create_format({"format": "text", "format.key.delimiter": "\t"})
    buf = b"".join(tfmt.encode(k, v, h) for k, v, h in CASES[:2])
    assert tfmt.decode(buf) == CASES[:2]
