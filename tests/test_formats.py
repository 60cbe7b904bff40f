"""Format round-trip tests — ports the reference's FormatTests harness
(FormatTests.java:108-125 roundTrip: write → read → assert identical),
including binary-unsafe payloads with embedded delimiters/control bytes
(ByteLengthFormatTest.java:22-68) and golden byte layouts (:71-118)."""

import pytest

from kafka_connect_gcs_spark.sources.formats import (
    CorruptRecord,
    decode_frames,
    df_decode_binary,
    df_decode_delimited,
    df_encode_binary,
    df_encode_delimited,
    encode_frame,
)

CASES = [
    (b"key1", b"value1"),
    (None, b"value-without-key"),
    (b"k", b""),
    (b"bin\x00\n\tkey", b"bin\xf6\x00\xffvalue\nwith\nnewlines"),
    (b"", b"\x00" * 32),
]


def test_golden_frame_layout():
    """Mirrors the reference's golden byte tests: explicit layout check."""
    f = encode_frame(b"ab", b"xyz")
    assert f == b"\x00\x00\x00\x02ab\x00\x00\x00\x03xyz"
    f = encode_frame(None, b"v")
    assert f == b"\xff\xff\xff\xff\x00\x00\x00\x01v"


def test_python_roundtrip_and_corrupt():
    buf = b"".join(encode_frame(k, v) for k, v in CASES)
    assert decode_frames(buf) == CASES
    with pytest.raises(CorruptRecord, match="Corrupt record"):
        decode_frames(buf[:-1])  # truncated mid-record, like EOF mid-frame


def test_df_binary_roundtrip(spark):
    key = lambda t: (t[0] is None, t[0] or b"", t[1] or b"")  # noqa: E731
    df = spark.createDataFrame(CASES, "key binary, value binary")
    back = df_decode_binary(df_encode_binary(df)).collect()
    got = sorted(
        (
            (bytes(r.key) if r.key is not None else None,
             bytes(r.value) if r.value is not None else None)
            for r in back
        ),
        key=key,
    )
    assert got == sorted(CASES, key=key)


def test_df_delimited_roundtrip_with_keys(spark):
    cases = [(b"k1", b"hello world"), (b"k2", b"second value")]
    df = spark.createDataFrame(cases, "key binary, value binary")
    back = df_decode_delimited(
        df_encode_delimited(df, include_keys=True), include_keys=True
    ).collect()
    got = sorted((bytes(r.key), bytes(r.value)) for r in back)
    assert got == sorted(cases)


def test_df_delimited_values_only(spark):
    cases = [(None, b"alpha"), (None, b"beta gamma")]
    df = spark.createDataFrame(cases, "key binary, value binary")
    back = df_decode_delimited(df_encode_delimited(df)).collect()
    assert sorted(bytes(r.value) for r in back) == sorted(v for _, v in cases)
    assert all(r.key is None for r in back)
