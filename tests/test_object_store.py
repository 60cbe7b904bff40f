"""Pluggable object-store transport (store.py) — the reference's injected
storage client + fake-server test pattern (GCS.java:18-48 endpoint/projectId
injection; FakeGCS.java:22-47 standing up fake-gcs-server and pointing the
production client at its endpoint).

The Spark cases prove the seam is REAL: the archive writer's executor tasks
PUT data/index objects over HTTP, the reader's chunk decode issues ranged
GETs from executor tasks, and nothing touches the local filesystem — the
same code paths a ``gs://`` bucket client would ride."""

import os

import pytest

from kafka_connect_gcs_spark.sources.archive import (
    cursor_key,
    plan_archive_scan,
    read_archive,
    read_cursor,
    write_archive,
)
from kafka_connect_gcs_spark.sources.formats import ByteLengthFormat
from kafka_connect_gcs_spark.sources.store import (
    HttpStore,
    InMemoryStore,
    PosixStore,
    serve_fake_store,
    store_from_properties,
)

FMT = ByteLengthFormat(include_keys=True)


@pytest.fixture()
def fake_gcs():
    endpoint, backing, shutdown = serve_fake_store()
    yield endpoint, backing
    shutdown()


def _exercise_store_contract(store):
    """The ObjectStore contract every transport must satisfy."""
    assert store.list() == []
    assert not store.exists("a/k1")
    store.put("a/k1", b"hello world")
    store.put("a/k0", b"x" * 100)
    store.put("b/k2", b"")
    assert store.exists("a/k1")
    # last-write-wins overwrite (replay idempotence relies on this)
    store.put("a/k1", b"hello world v2")
    assert store.get("a/k1") == b"hello world v2"
    # ranged reads (chunk decode path)
    assert store.get("a/k1", 6) == b"world v2"
    assert store.get("a/k1", 6, 5) == b"world"
    assert store.get("a/k0", 0, 3) == b"xxx"
    # empty object
    assert store.get("b/k2") == b""
    # lexicographic listing + prefix scoping
    assert store.list() == ["a/k0", "a/k1", "b/k2"]
    assert store.list("a/") == ["a/k0", "a/k1"]
    # json/text helpers
    store.put_json("meta.json", {"chunks": [1, 2]})
    assert store.get_json("meta.json") == {"chunks": [1, 2]}


def test_inmemory_store_contract():
    _exercise_store_contract(InMemoryStore())


def test_posix_store_contract(tmp_path):
    _exercise_store_contract(PosixStore(str(tmp_path)))


def test_http_store_contract(fake_gcs):
    endpoint, _ = fake_gcs
    _exercise_store_contract(HttpStore(endpoint))


def test_posix_list_hides_inflight_puts(tmp_path):
    """A crashed half-written upload (tmp file) is not an object."""
    store = PosixStore(str(tmp_path))
    store.put("d/ok.gz", b"data")
    (tmp_path / "d" / "dead.gz.inprogress").write_bytes(b"partial")
    assert store.list() == ["d/ok.gz"]


def test_store_from_properties_injection(tmp_path, fake_gcs):
    """GCS.gcsclient parity: endpoint override wins, projectId namespaces,
    else bucket root, else a loud error (GCS.java:18-48)."""
    endpoint, backing = fake_gcs
    s = store_from_properties({"gcs.endpoint": endpoint})
    assert isinstance(s, HttpStore)
    s.put("x", b"1")
    assert backing.get("x") == b"1"
    s2 = store_from_properties(
        {"gcs.endpoint": endpoint, "projectId": "test-project"}
    )
    s2.put("y", b"2")
    assert backing.get("test-project/y") == b"2"
    s3 = store_from_properties({"gcs.bucket": str(tmp_path)})
    assert isinstance(s3, PosixStore)
    # empty endpoint string falls through, like the reference's null/"" check
    s4 = store_from_properties({"gcs.endpoint": "", "gcs.bucket": str(tmp_path)})
    assert isinstance(s4, PosixStore)
    with pytest.raises(ValueError):
        store_from_properties({})


def _records_df(spark, topic, partition, first, n):
    rows = [
        (topic, partition, first + i, f"k{first + i}".encode(),
         f"v{first + i}-{topic}".encode(), [])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "topic string, partition int, offset long, key binary, value binary, "
        "headers array<struct<key:string, value:binary>>",
    )


def _collect(df):
    return sorted(
        (r.topic, r.partition, r.offset, bytes(r.key), bytes(r.value))
        for r in df.collect()
    )


def test_archive_roundtrip_through_fake_gcs(spark, fake_gcs, tmp_path):
    """write_archive + read_archive against the HTTP store: executor tasks
    upload and range-read over the wire; the bucket layout and commit order
    are byte-identical to the POSIX default; local disk stays empty."""
    endpoint, backing = fake_gcs
    store = HttpStore(endpoint)
    src = (
        _records_df(spark, "alpha", 0, 0, 25)
        .unionByName(_records_df(spark, "alpha", 1, 0, 10))
    )
    manifest = write_archive(src, store, "2026-08-17", FMT, chunk_threshold=256)
    assert {(m["topic"], m["partition"]) for m in manifest} == {
        ("alpha", 0), ("alpha", 1)
    }
    # layout parity: same keys as the POSIX layout, plus data→index→cursor
    keys = backing.list()
    assert "2026-08-17/alpha-00000-000000000000.gz" in keys
    assert "2026-08-17/alpha-00000-000000000000.index.json" in keys
    assert read_cursor(store, "alpha", 0) == (
        "2026-08-17/alpha-00000-000000000000.index.json"
    )
    # chunked: the 256-byte threshold forced >1 chunk, so the scan plan has
    # chunk granularity and each chunk decodes via a ranged HTTP GET
    plan = plan_archive_scan(store)
    assert len(plan) > 2
    got = read_archive(spark, store, FMT)
    assert _collect(got) == _collect(src)
    # the seam really carried everything: nothing landed on local disk
    assert list(os.walk(str(tmp_path))) == [(str(tmp_path), [], [])]
    # and the stored bytes are what a POSIX archive would hold (transport
    # changes, layout doesn't): replay the same flush into a PosixStore
    posix = PosixStore(str(tmp_path / "posix"))
    write_archive(src, posix, "2026-08-17", FMT, chunk_threshold=256)
    for k in posix.list():
        assert backing.get(k) == posix.get(k), k


def test_tailer_polls_through_fake_gcs(spark, fake_gcs):
    """ArchiveTailer over the HTTP store: metadata-only offset advance via
    index JSONs fetched from the endpoint, incremental pickup of new
    flushes (GCSSourceTask poll loop against fake GCS)."""
    from kafka_connect_gcs_spark.sources.archive import ArchiveTailer

    endpoint, _ = fake_gcs
    store = HttpStore(endpoint)
    write_archive(_records_df(spark, "t", 0, 0, 6), store, "d1", FMT)
    tailer = ArchiveTailer(spark, store, FMT)
    df = tailer.poll()
    assert df is not None and df.count() == 6
    assert tailer.offsets[("t", 0)] == ("d1/t-00000-000000000000.gz", 5)
    assert tailer.poll() is None  # caught up
    write_archive(_records_df(spark, "t", 0, 6, 4), store, "d2", FMT)
    df2 = tailer.poll()
    assert sorted(r.offset for r in df2.collect()) == [6, 7, 8, 9]
    assert read_cursor(store, "t", 0) == "d2/t-00000-000000000006.index.json"
    assert cursor_key("t", 0) == "last_chunk_index.t-00000.txt"


def test_http_store_retries_transient_faults():
    """Retryable 5xx/429 responses are retried with backoff, bounded;
    non-retryable codes surface immediately (GCSSourceTask.java:200-234's
    isRetryable gate, moved to the transport)."""
    import urllib.error

    faults = []
    endpoint, backing, shutdown = serve_fake_store(faults=faults)
    try:
        sleeps = []
        store = HttpStore(endpoint, retries=3, backoff_s=0.25,
                          sleep=sleeps.append)
        # 500s then success — every op recovers transparently
        backing.put("a/k", b"payload")
        faults.extend([500, 503])
        assert store.get("a/k") == b"payload"
        assert sleeps == [0.25, 0.25]
        faults.extend([429])
        store.put("a/k2", b"v2")
        assert backing.get("a/k2") == b"v2"
        faults.extend([502])
        assert store.list("a/") == ["a/k", "a/k2"]
        faults.extend([500])
        assert store.exists("a/k")
        # fault on a missing key's HEAD: retried through to the real 404
        faults.extend([500])
        assert not store.exists("a/nope")
        # retries exhausted -> the error surfaces
        faults.extend([500, 500, 500, 500])
        with pytest.raises(urllib.error.HTTPError):
            store.get("a/k")
        faults.clear()
        # non-retryable 4xx raises immediately without consuming retries
        faults.extend([403, 0])
        with pytest.raises(urllib.error.HTTPError) as ei:
            store.get("a/k")
        assert ei.value.code == 403
        assert faults == [0]
    finally:
        shutdown()


def test_http_store_retries_connection_loss():
    """A dead endpoint is classified retryable (URLError) and the bounded
    loop raises after the configured attempts — no hang."""
    import urllib.error

    endpoint, _backing, shutdown = serve_fake_store()
    shutdown()  # server gone: connections now fail
    sleeps = []
    store = HttpStore(endpoint, retries=2, backoff_s=1.0, sleep=sleeps.append)
    with pytest.raises((urllib.error.URLError, ConnectionError)):
        store.get("k")
    assert sleeps == [1.0, 1.0]


def test_store_from_properties_retry_config(fake_gcs):
    endpoint, _ = fake_gcs
    s = store_from_properties(
        {"gcs.endpoint": endpoint, "gcs.error.backoff": "250",
         "gcs.error.retries": "5"}
    )
    assert isinstance(s, HttpStore)
    assert s.retries == 5 and s.backoff_s == 0.25


def test_archive_roundtrip_survives_injected_faults(spark):
    """Executor-side puts/gets ride the same retry loop: an archive write +
    read completes byte-exact while the server fails every 3rd request."""
    faults = [0, 0, 500] * 40
    endpoint, _backing, shutdown = serve_fake_store(faults=faults)
    try:
        store = HttpStore(endpoint, retries=3, backoff_s=0.01)
        src = _records_df(spark, "alpha", 0, 0, 25)
        write_archive(src, store, "2026-08-18", FMT, chunk_threshold=256)
        got = read_archive(spark, store, FMT)
        assert _collect(got) == _collect(src)
    finally:
        shutdown()
