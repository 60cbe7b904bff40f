"""Property-based round-trip tests for the framing codecs (pure Python,
no Spark session) — the randomized layer the reference's FormatTests lack.

Canonicalization rules come straight from the reference semantics:
* binary include_keys: null key/value encode as length 0 → decode as b""
  (ByteLengthFormat.java:59-63);
* values-only: key is always None on decode;
* delimited: null key/value → b"" after the trip (readTo can't distinguish).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_gcs_spark.sources.formats import (
    CorruptRecord,
    DelimitedConfig,
    decode_delimited,
    decode_frames,
    encode_delimited_record,
    encode_frame,
)

header = st.tuples(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=12
    ),
    st.one_of(st.none(), st.binary(max_size=32)),
)
record = st.tuples(
    st.one_of(st.none(), st.binary(max_size=64)),
    st.one_of(st.none(), st.binary(max_size=256)),
    st.lists(header, max_size=4),
)


def _canon_binary(records):
    return [(k or b"", v or b"", list(h)) for k, v, h in records]


@settings(max_examples=200, deadline=None)
@given(st.lists(record, max_size=20))
def test_binary_roundtrip_with_keys(records):
    buf = b"".join(encode_frame(k, v, h) for k, v, h in records)
    assert decode_frames(buf) == _canon_binary(records)


@settings(max_examples=100, deadline=None)
@given(st.lists(record, max_size=20))
def test_binary_roundtrip_values_only(records):
    buf = b"".join(
        encode_frame(None, v, h, include_keys=False) for _, v, h in records
    )
    assert decode_frames(buf, include_keys=False) == [
        (None, v or b"", list(h)) for _, v, h in records
    ]


@settings(max_examples=200, deadline=None)
@given(st.lists(record, min_size=1, max_size=8), st.integers(min_value=1, max_value=8))
def test_truncation_always_detected(records, cut):
    buf = b"".join(encode_frame(k, v, h) for k, v, h in records)
    truncated = buf[: len(buf) - cut]
    try:
        out = decode_frames(truncated)
    except CorruptRecord:
        return  # detected — good
    # a cut can land exactly on a frame boundary; then we just get a prefix
    want = _canon_binary(records)
    assert out == want[: len(out)]
    assert len(out) < len(records)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_single_value_layout(v):
    f = encode_frame(None, v)
    assert f[:4] == b"\x00\x00\x00\x00"  # null key = length 0, never -1
    assert int.from_bytes(f[4:8], "big") == len(v)
    assert f[8:] == v


# --- delimited: delimiter-safe alphabets ------------------------------------

safe_bytes = st.binary(max_size=64).filter(
    lambda b: b"\t" not in b and b"\n" not in b and b"\x0b" not in b
)
delim_record = st.tuples(
    st.one_of(st.none(), safe_bytes),
    st.one_of(st.none(), safe_bytes),
    st.lists(header, max_size=3),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(delim_record, max_size=12))
def test_delimited_roundtrip(records):
    cfg = DelimitedConfig(key_delimiter="\t")
    buf = b"".join(encode_delimited_record(k, v, h, cfg) for k, v, h in records)
    assert decode_delimited(buf, cfg) == [
        (k or b"", v or b"", list(h)) for k, v, h in records
    ]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), safe_bytes), max_size=12))
def test_delimited_values_only_preserves_empties(values):
    cfg = DelimitedConfig()
    buf = b"".join(encode_delimited_record(None, v, None, cfg) for v in values)
    got = decode_delimited(buf, cfg)
    assert [v for _, v, _ in got] == [v or b"" for v in values]
