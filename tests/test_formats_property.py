"""Property-based round-trip tests for the framing codecs (pure Python,
no Spark session) — the randomized layer the reference's FormatTests lack."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_gcs_spark.sources.formats import (
    CorruptRecord,
    decode_frames,
    encode_frame,
)

record = st.tuples(
    st.one_of(st.none(), st.binary(max_size=64)),
    st.one_of(st.none(), st.binary(max_size=256)),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(record, max_size=20))
def test_roundtrip_any_records(records):
    buf = b"".join(encode_frame(k, v) for k, v in records)
    assert decode_frames(buf) == records


@settings(max_examples=200, deadline=None)
@given(st.lists(record, min_size=1, max_size=8), st.integers(min_value=1, max_value=8))
def test_truncation_always_detected(records, cut):
    buf = b"".join(encode_frame(k, v) for k, v in records)
    truncated = buf[: len(buf) - cut]
    try:
        out = decode_frames(truncated)
    except CorruptRecord:
        return  # detected — good
    # a cut can land exactly on a frame boundary; then we just get a prefix
    assert out == records[: len(out)]
    assert len(out) < len(records) or cut == 0


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_single_value_layout(v):
    f = encode_frame(None, v)
    assert f[:4] == b"\xff\xff\xff\xff"
    assert int.from_bytes(f[4:8], "big") == len(v)
    assert f[8:] == v
