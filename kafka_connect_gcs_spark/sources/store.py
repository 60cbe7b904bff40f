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


class HttpStore(ObjectStore):
    """Object-store client over plain HTTP — the injected-endpoint path
    (``gcs.endpoint``, GCS.java:32-37). Speaks the minimal REST dialect
    :func:`serve_fake_store` serves (GET with Range / PUT / list via
    ``?prefix=``), which is the subset the archive layer needs of any
    real bucket API. Holds only the endpoint string → picklable; one
    request per call → no connection state to ship."""

    def __init__(self, endpoint: str):
        self.endpoint = endpoint.rstrip("/")

    def _url(self, key: str) -> str:
        return self.endpoint + "/" + urllib.parse.quote(key)

    def get(self, key: str, start: int = 0, length: int = -1) -> bytes:
        req = urllib.request.Request(self._url(key))
        if start or length >= 0:
            end = "" if length < 0 else str(start + length - 1)
            req.add_header("Range", f"bytes={start}-{end}")
        with urllib.request.urlopen(req) as resp:
            return resp.read()

    def put(self, key: str, data: bytes) -> None:
        req = urllib.request.Request(self._url(key), data=data, method="PUT")
        with urllib.request.urlopen(req) as resp:
            resp.read()

    def list(self, prefix: str = "") -> "list[str]":
        q = urllib.parse.urlencode({"prefix": prefix})
        with urllib.request.urlopen(self.endpoint + "/?" + q) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def exists(self, key: str) -> bool:
        req = urllib.request.Request(self._url(key), method="HEAD")
        try:
            with urllib.request.urlopen(req):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            raise


def serve_fake_store(store: "InMemoryStore | None" = None):
    """Stand up a loopback HTTP object store over an :class:`InMemoryStore`
    — the engine's FakeGCS (FakeGCS.java:22-47 runs fake-gcs-server and
    points the production client at its endpoint; this does the same with
    stdlib so the sandbox needs no containers). Returns
    ``(endpoint, store, shutdown)``; tests build ``HttpStore(endpoint)``
    and hand it to the archive functions unchanged."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    backing = store if store is not None else InMemoryStore()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence per-request stderr noise
            pass

        def _key(self) -> str:
            return urllib.parse.unquote(
                urllib.parse.urlsplit(self.path).path.lstrip("/")
            )

        def do_GET(self):
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
            self.send_response(200 if backing.exists(self._key()) else 404)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_PUT(self):
            n = int(self.headers.get("Content-Length", "0"))
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
    no project scoping so it only namespaces the endpoint path."""
    endpoint = props.get("gcs.endpoint") or ""
    if endpoint:
        project = props.get("projectId") or ""
        if project:
            endpoint = endpoint.rstrip("/") + "/" + urllib.parse.quote(project)
        return HttpStore(endpoint)
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
