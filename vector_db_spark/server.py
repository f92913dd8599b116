"""HTTP transport over ``VectorDatabaseApi`` — the last literal surface
delta vs the reference, which is an axum JSON-over-HTTP service (handlers
assembled per-route in its tests, /root/reference/src/router/mod.rs:1-7;
e.g. src/router/handle/search_index_handle.rs:119-121).

Thin by design: every semantic — validation, enum wire values, response
shapes, status mapping — lives in ``api.py`` (where it is oracle-tested);
this layer only speaks sockets and JSON:

- ``POST /create | /insert | /upsert | /search | /query`` — the
  reference's five handlers; ``POST /search_batch`` — the engine's batch
  extension (one distributed job per target collection);
  ``POST /range_search`` — the faiss range contract (threshold instead
  of k, unbounded result) over the same wire shape;
  ``POST /batch_range_search`` — the batch shape with ``threshold``
  (faiss range_search's native n-query signature).
- success → 200 with the handler's dict (``code: 0`` payloads,
  src/models/response/*.rs);
- ``ApiError`` → its ``.status`` with the reference's error body shape
  ``{"code": -1, "error_msg": ...}`` (src/error/app_error.rs:47-52);
- malformed JSON / non-object payloads → 400 (axum's Json extractor
  rejects these before the handler runs);
- unknown route → 404.

Driver-process serving model: handlers run Spark jobs, so the server
lives in the driver. ``ThreadingHTTPServer`` accepts concurrently;
dispatch locking is PER COLLECTION — the reference's granularity (one
mutex per index, src/core/index/faiss_index.rs:19-21): requests against
different collections run in parallel (Spark's scheduler interleaves
their jobs), while operations on the SAME collection serialize (insert/
upsert/search share read-modify-write state: the snapshot version chain
and the lazy index rebuild). Catalog-level mutations (/create) and the
shared document store (/query, /upsert's doc write) serialize on their
own global keys. Scale-out serving is N driver replicas behind a load
balancer over the same parquet root (immutable-version snapshot reads
make replicas coherent), not threads in one driver.
"""

from __future__ import annotations

import json
import threading
from contextlib import ExitStack
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from vector_db_spark.api import ApiError, VectorDatabaseApi

_ROUTES = {
    "/create": "create_index",
    "/insert": "insert",
    "/upsert": "upsert",
    "/search": "search",
    "/query": "query",
    "/search_batch": "search_batch",
    "/range_search": "range_search",
    "/batch_range_search": "range_search_batch",
}
# routes whose payload is a JSON list of requests (everything else is an
# object); shared by the payload-shape check and the lock-set derivation
_BATCH_METHODS = ("search_batch", "range_search_batch")

# reserved lock keys (collection names never collide: catalog names are
# "{type}_{dim}_{metric}")
_CATALOG_KEY = "::catalog"
_DOCS_KEY = "::docs"


class _LockRegistry:
    """Named locks, created on first use — ≅ the reference's per-index
    ``Arc<Mutex>`` map (src/core/index_factory.rs:70-72). The registry
    only ever grows by one entry per collection name; entries are a
    threading.Lock each, so unbounded growth is not a concern at any
    realistic collection count."""

    def __init__(self) -> None:
        self._meta = threading.Lock()
        self._locks: dict[str, threading.Lock] = {}

    def get(self, key: str) -> threading.Lock:
        with self._meta:
            return self._locks.setdefault(key, threading.Lock())


def _lock_keys(api, method: str, payload) -> list[str]:
    """The lock set a request must hold, SORTED — every handler acquires
    in sorted order, so overlapping sets cannot deadlock."""
    if method == "create_index":
        return [_CATALOG_KEY]
    if method == "query":
        return [_DOCS_KEY]
    if method in _BATCH_METHODS:
        keys = {
            api.collection_key(r.get("index_key")) or _CATALOG_KEY
            for r in payload
            if isinstance(r, dict)
        }
        return sorted(keys) or [_CATALOG_KEY]
    coll = api.collection_key(payload.get("index_key")) or _CATALOG_KEY
    if method == "upsert":
        # collection row + shared doc store; sorted with the other keys
        return sorted({coll, _DOCS_KEY})
    return [coll]


def _make_handler(api: VectorDatabaseApi, locks: _LockRegistry):
    class Handler(BaseHTTPRequestHandler):
        # silence per-request stderr logging (the reference logs via
        # env_logger; a test server must not spam pytest output)
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, status: int, body: dict | list) -> None:
            data = json.dumps(body).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _err(self, status: int, msg: str) -> None:
            # the reference's error body (app_error.rs:47-52)
            self._reply(status, {"code": -1, "error_msg": msg})

        def do_GET(self) -> None:  # noqa: N802
            if self.path == "/health":
                self._reply(200, {"code": 0})
            else:
                self._err(404, f"no route {self.path}")

        def do_POST(self) -> None:  # noqa: N802
            method = _ROUTES.get(self.path)
            if method is None:
                self._err(404, f"no route {self.path}")
                return
            try:
                n = int(self.headers.get("Content-Length") or 0)
                payload = json.loads(self.rfile.read(n) or b"null")
            except (ValueError, TypeError):
                self._err(400, "malformed JSON body")
                return
            want = list if method in _BATCH_METHODS else dict
            if not isinstance(payload, want):
                self._err(400, f"payload must be a JSON {want.__name__}")
                return
            try:
                with ExitStack() as stack:
                    for key in _lock_keys(api, method, payload):
                        stack.enter_context(locks.get(key))
                    out = getattr(api, method)(payload)
            except ApiError as exc:
                self._err(exc.status, str(exc))
            except Exception as exc:  # noqa: BLE001 — 500, never a hang
                self._err(500, str(exc))
            else:
                self._reply(200, out)

    return Handler


class VectorDbHttpServer:
    """A live socket over one ``VectorDatabaseApi``; ``port=0`` binds an
    ephemeral port (read it back from ``.port``)."""

    def __init__(
        self, api: VectorDatabaseApi, host: str = "127.0.0.1", port: int = 0
    ):
        self._locks = _LockRegistry()
        self.httpd = ThreadingHTTPServer(
            (host, port), _make_handler(api, self._locks)
        )
        self.host = host
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "VectorDbHttpServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="vector-db-http", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)


def serve(spark, root: str, host: str = "127.0.0.1", port: int = 8080) -> None:
    """Blocking entrypoint: ``python -m vector_db_spark.server`` analogue
    of the reference's ``main`` (which, as shipped, only initializes
    logging — src/main.rs:10-13 — and assembles routers in tests; this
    actually listens)."""
    srv = VectorDbHttpServer(VectorDatabaseApi(spark, root), host, port)
    print(f"vector_db_spark serving on http://{srv.host}:{srv.port}")
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    import sys

    from vector_db_spark.session import get_spark

    _root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vector_db_spark_http"
    _port = int(sys.argv[2]) if len(sys.argv) > 2 else 8080
    serve(get_spark("vector-db-http"), _root, port=_port)
