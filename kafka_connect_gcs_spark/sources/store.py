"""Pluggable object-store transport for the archive layer.

The reference injects a storage client built from config — endpoint
override + projectId (GCS.java:18-48) — and its tests stand up a fake
HTTP object store and point the same client at it
(FakeGCS.java:22-47, the fsouza/fake-gcs-server pattern). This module is
that seam for the Spark engine: every archive byte moves through an
:class:`ObjectStore`, defaulting to POSIX paths (what the sandbox has),
with an HTTP client + stdlib fake server proving the seam carries a real
remote transport unchanged.

Design constraints the implementations must honor:

* **Picklable clients.** Chunk decode and per-partition flush run inside
  Arrow-batched executor tasks, so a store object is shipped to Python
  workers by cloudpickle. Clients therefore hold only plain config
  (root path / endpoint URL) and open connections lazily per call.
* **Atomic, last-write-wins ``put``.** The commit protocol (data →
  index → cursor, system_test/run.py:202-218) relies on a key never
  being observable half-written and on replays overwriting in place
  (A20/A21). POSIX gets this from write-temp + ``os.replace``; object
  stores give it natively (single-request PUT).
* **Lexicographic ``list``.** Key order IS offset order in the layout
  (zero-padded names, GCSFilesReader.java:44-47); every implementation
  returns sorted keys so the scan planner's skip logic is transport-
  independent.
* **Ranged ``get``.** The chunk-parallel scan reads (byte_offset,
  byte_length) slices (GCSFilesReader.java:278-297); HTTP maps this to a
  ``Range`` header, POSIX to ``seek``+``read``.
"""

from __future__ import annotations

import io
import json
import os
import threading
import time
import urllib.error
import urllib.parse
import urllib.request


class ObjectStore:
    """Key/value blob transport under a single root ("bucket"). Keys are
    ``/``-separated relative paths (the archive layout's
    ``{date}/{topic}-{ppppp}-{oooooooooooo}.gz`` etc.)."""

    def get(self, key: str, start: int = 0, length: int = -1) -> bytes:
        """Read ``length`` bytes at ``start`` (whole tail when -1)."""
        raise NotImplementedError

    def put(self, key: str, data: bytes) -> None:
        """Atomic last-write-wins upload; creates parents implicitly."""
        raise NotImplementedError

    def list(self, prefix: str = "") -> "list[str]":
        """All keys under ``prefix``, lexicographically sorted."""
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    # -- small typed helpers shared by every transport -------------------

    def get_text(self, key: str) -> str:
        return self.get(key).decode("utf-8")

    def put_text(self, key: str, text: str) -> None:
        self.put(key, text.encode("utf-8"))

    def get_json(self, key: str):
        return json.loads(self.get_text(key))

    def put_json(self, key: str, obj) -> None:
        self.put_text(key, json.dumps(obj))


class PosixStore(ObjectStore):
    """Default transport: keys are paths under ``root``. Matches the
    pre-seam archive behavior byte-for-byte (same tmp-file + rename
    commit), so existing on-disk archives keep working unchanged."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key)

    def get(self, key: str, start: int = 0, length: int = -1) -> bytes:
        with open(self._path(key), "rb") as f:
            if start:
                f.seek(start)
            return f.read() if length < 0 else f.read(length)

    def put(self, key: str, data: bytes) -> None:
        path = self._path(key)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".inprogress"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic: replay overwrites, never duplicates

    def list(self, prefix: str = "") -> "list[str]":
        keys = []
        for dirpath, _dirs, files in os.walk(self.root):
            for fn in files:
                if fn.endswith(".inprogress"):
                    continue  # an in-flight put is not yet an object
                rel = os.path.relpath(os.path.join(dirpath, fn), self.root)
                rel = rel.replace(os.sep, "/")
                if rel.startswith(prefix):
                    keys.append(rel)
        return sorted(keys)

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))


class InMemoryStore(ObjectStore):
    """Driver-local dict-backed store for unit tests and as the state
    behind :func:`serve_fake_store`. NOT visible across executor
    processes on its own — Spark-side tests go through the HTTP fake,
    exactly like the reference's tests go through fake-gcs-server."""

    def __init__(self):
        self._blobs: "dict[str, bytes]" = {}
        self._lock = threading.Lock()

    def get(self, key: str, start: int = 0, length: int = -1) -> bytes:
        with self._lock:
            blob = self._blobs[key]
        end = len(blob) if length < 0 else start + length
        return blob[start:end]

    def put(self, key: str, data: bytes) -> None:
        with self._lock:
            self._blobs[key] = bytes(data)

    def list(self, prefix: str = "") -> "list[str]":
        with self._lock:
            return sorted(k for k in self._blobs if k.startswith(prefix))

    def exists(self, key: str) -> bool:
        with self._lock:
            return key in self._blobs


# transient server/transport conditions worth a bounded retry — the
# python analogue of StorageException.isRetryable() that the reference
# gates its error backoff on (GCSSourceTask.java:200-234)
_RETRYABLE_HTTP = frozenset({408, 429, 500, 502, 503, 504})


def _is_retryable(exc: BaseException) -> bool:
    if isinstance(exc, urllib.error.HTTPError):
        return exc.code in _RETRYABLE_HTTP
    # connection refused/reset/timeout — the server went away mid-request
    return isinstance(
        exc, (urllib.error.URLError, ConnectionError, TimeoutError)
    )


class HttpStore(ObjectStore):
    """Object-store client over plain HTTP — the injected-endpoint path
    (``gcs.endpoint``, GCS.java:32-37). Speaks the minimal REST dialect
    :func:`serve_fake_store` serves (GET with Range / PUT / list via
    ``?prefix=``), which is the subset the archive layer needs of any
    real bucket API. Holds only the endpoint string + retry config →
    picklable; one request per call → no connection state to ship.

    Transient failures (5xx/429/connection errors) are retried at the
    transport with ``backoff_s`` sleeps, up to ``retries`` extra attempts
    — the reference sleeps ``gcs.error.backoff`` (1 s default) on
    retryable ``StorageException`` and re-polls (GCSSourceTask.java:40,
    200-234); bounding the attempts here keeps poison endpoints from
    hanging an executor task, and the pipeline-level ``run_forever``
    backoff still owns the unbounded outer loop. Every operation is a
    full-request replay, and the dialect's PUT is atomic last-write-wins,
    so retries are idempotent by construction."""

    def __init__(
        self,
        endpoint: str,
        retries: int = 3,
        backoff_s: float = 1.0,
        sleep=time.sleep,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.retries = retries
        self.backoff_s = backoff_s
        self.sleep = sleep

    def _url(self, key: str) -> str:
        return self.endpoint + "/" + urllib.parse.quote(key)

    def _open(self, req):
        """urlopen with bounded retry on retryable failures."""
        attempt = 0
        while True:
            try:
                return urllib.request.urlopen(req)
            except Exception as e:  # noqa: BLE001 — classified below
                if attempt >= self.retries or not _is_retryable(e):
                    raise
                attempt += 1
                self.sleep(self.backoff_s)

    def get(self, key: str, start: int = 0, length: int = -1) -> bytes:
        req = urllib.request.Request(self._url(key))
        if start or length >= 0:
            end = "" if length < 0 else str(start + length - 1)
            req.add_header("Range", f"bytes={start}-{end}")
        with self._open(req) as resp:
            return resp.read()

    def put(self, key: str, data: bytes) -> None:
        req = urllib.request.Request(self._url(key), data=data, method="PUT")
        with self._open(req) as resp:
            resp.read()

    def list(self, prefix: str = "") -> "list[str]":
        q = urllib.parse.urlencode({"prefix": prefix})
        with self._open(
            urllib.request.Request(self.endpoint + "/?" + q)
        ) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def exists(self, key: str) -> bool:
        req = urllib.request.Request(self._url(key), method="HEAD")
        try:
            with self._open(req):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            raise


def serve_fake_store(
    store: "InMemoryStore | None" = None,
    faults: "list[int] | None" = None,
):
    """Stand up a loopback HTTP object store over an :class:`InMemoryStore`
    — the engine's FakeGCS (FakeGCS.java:22-47 runs fake-gcs-server and
    points the production client at its endpoint; this does the same with
    stdlib so the sandbox needs no containers). Returns
    ``(endpoint, store, shutdown)``; tests build ``HttpStore(endpoint)``
    and hand it to the archive functions unchanged.

    ``faults`` injects transport failures: each incoming request pops the
    next status code from the (shared, mutable) list and fails with it
    before touching the store — push ``[500, 503]`` to make the next two
    requests fail, then everything succeeds again. ``0`` entries mean
    "let this one through". This is the 500s-then-success probe for the
    client's retry/backoff path."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    backing = store if store is not None else InMemoryStore()
    fault_queue = faults if faults is not None else []

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence per-request stderr noise
            pass

        def _key(self) -> str:
            return urllib.parse.unquote(
                urllib.parse.urlsplit(self.path).path.lstrip("/")
            )

        def _inject_fault(self) -> bool:
            if not fault_queue:
                return False
            code = fault_queue.pop(0)
            if not code:
                return False
            self.send_response(code)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return True

        def do_GET(self):
            if self._inject_fault():
                return
            split = urllib.parse.urlsplit(self.path)
            if split.path in ("", "/"):  # list
                prefix = urllib.parse.parse_qs(split.query).get(
                    "prefix", [""]
                )[0]
                body = json.dumps(backing.list(prefix)).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            key = self._key()
            if not backing.exists(key):
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            rng = self.headers.get("Range")
            if rng:
                spec = rng.split("=", 1)[1]
                s, e = spec.split("-", 1)
                start = int(s)
                length = -1 if e == "" else int(e) - start + 1
                body = backing.get(key, start, length)
                self.send_response(206)
            else:
                body = backing.get(key)
                self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_HEAD(self):
            if self._inject_fault():
                return
            self.send_response(200 if backing.exists(self._key()) else 404)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_PUT(self):
            n = int(self.headers.get("Content-Length", "0"))
            if self._inject_fault():
                self.rfile.read(n)  # drain so keep-alive stays in sync
                return
            backing.put(self._key(), self.rfile.read(n))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    endpoint = f"http://127.0.0.1:{httpd.server_port}"

    def shutdown():
        httpd.shutdown()
        httpd.server_close()

    return endpoint, backing, shutdown


def store_from_properties(props: dict, default_root: "str | None" = None):
    """Client injection from connector properties, mirroring
    ``GCS.gcsclient`` (GCS.java:18-48): a non-empty ``gcs.endpoint``
    selects the HTTP transport (the fake-GCS / endpoint-override path),
    otherwise POSIX under ``gcs.bucket`` (or ``default_root``).
    ``projectId`` is accepted for config parity; the HTTP dialect needs
    no project scoping so it only namespaces the endpoint path.
    ``gcs.error.backoff`` (milliseconds, default 1000 — the reference's
    GCSSourceTask.java:40) and ``gcs.error.retries`` (default 3) tune the
    HTTP transport's retry loop."""
    endpoint = props.get("gcs.endpoint") or ""
    if endpoint:
        project = props.get("projectId") or ""
        if project:
            endpoint = endpoint.rstrip("/") + "/" + urllib.parse.quote(project)
        return HttpStore(
            endpoint,
            retries=int(props.get("gcs.error.retries", 3)),
            backoff_s=float(props.get("gcs.error.backoff", 1000)) / 1000.0,
        )
    root = props.get("gcs.bucket") or default_root
    if not root:
        raise ValueError(
            "no store configured: set gcs.endpoint (HTTP) or gcs.bucket "
            "(POSIX root)"
        )
    return PosixStore(root)


def as_store(root_or_store) -> ObjectStore:
    """Archive functions accept a POSIX root string (back-compat) or any
    :class:`ObjectStore`; normalize to a store."""
    if isinstance(root_or_store, ObjectStore):
        return root_or_store
    return PosixStore(str(root_or_store))
