"""Socket-level e2e for the HTTP transport (vector_db_spark/server.py).

Drives a LIVE port with the reference's own rstest payloads:

- search case table — src/router/handle/search_index_handle.rs:139-142:
  (valid vec, missing index) → 404; (UNKNOWN index type) → 404;
  (empty vectors) → 400.
- create case table — src/router/handle/create_index_handle.rs:119-127 +
  the HNSW/max_elements rules (src/models/request/create.rs:24-47).
- insert → search → upsert → query round-trip over the wire
  (insert_index_handle.rs / upsert_handle.rs / query_handle.rs tests).
- transport-only concerns: malformed JSON → 400, unknown route → 404,
  error body shape {"code": -1, "error_msg": ...} (app_error.rs:47-52).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

KEY_FLAT = {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from vector_db_spark.api import VectorDatabaseApi
    from vector_db_spark.server import VectorDbHttpServer

    api = VectorDatabaseApi(
        spark, str(tmp_path_factory.mktemp("http_root"))
    )
    srv = VectorDbHttpServer(api).start()
    yield srv
    srv.stop()


def _post(server, path: str, payload, raw: bytes | None = None):
    """POST json (or raw bytes) → (status, parsed body)."""
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{path}",
        data=raw if raw is not None else json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    with urllib.request.urlopen(
        f"http://{server.host}:{server.port}/health", timeout=30
    ) as resp:
        assert resp.status == 200
        assert json.loads(resp.read()) == {"code": 0}


def test_create_case_table(server):
    # create_index_handle.rs:119-127 — FLAT dims at both metrics → OK
    for dim, metric in [(128, "L2"), (256, "L2"), (10, "InnerProduct")]:
        status, body = _post(
            server,
            "/create",
            {"index_type": "FLAT", "dim": dim, "metric_type": metric},
        )
        assert status == 200
        assert body["code"] == 0
        assert body["index_key"]["dim"] == dim
    # HNSW requires max_elements (create.rs:24-35)
    status, body = _post(
        server, "/create", {"index_type": "HNSW", "dim": 3, "metric_type": "L2"}
    )
    assert status == 400 and body["code"] == -1
    status, _ = _post(
        server,
        "/create",
        {"index_type": "HNSW", "dim": 8, "metric_type": "L2",
         "max_elements": 1000},
    )
    assert status == 200


def test_search_rstest_case_table(server):
    # search_index_handle.rs:140 — valid vector, index never created → 404
    missing = {"index_type": "FLAT", "dim": 7, "metric_type": "L2"}
    status, body = _post(
        server, "/search", {"vectors": [1.0] * 7, "k": 3, "index_key": missing}
    )
    assert status == 404 and body["code"] == -1 and "error_msg" in body
    # :141 — UNKNOWN index type → 404 (UnsupportedIndexType mapping)
    status, body = _post(
        server,
        "/search",
        {"vectors": [0.5, 1.5, 2.5], "k": 3,
         "index_key": {"index_type": "UNKNOWN", "dim": 3, "metric_type": "L2"}},
    )
    assert status == 404 and body["code"] == -1
    # :142 — empty vectors → 400
    status, body = _post(
        server, "/search", {"vectors": [], "k": 1, "index_key": KEY_FLAT}
    )
    assert status == 400 and body["code"] == -1


def test_insert_search_upsert_query_roundtrip(server):
    status, _ = _post(server, "/create", KEY_FLAT)
    assert status == 200
    for rid, vec in [(1, [1.0, 2.0, 3.0]), (2, [10.0, 10.0, 10.0])]:
        status, body = _post(
            server, "/insert",
            {"id": rid, "vectors": vec, "index_key": KEY_FLAT},
        )
        assert status == 200 and body == {"code": 0}

    status, body = _post(
        server, "/search",
        {"vectors": [1.0, 2.0, 3.0], "k": 2, "index_key": KEY_FLAT},
    )
    assert status == 200
    assert body["code"] == 0
    assert body["labels"] == [1, 2]
    assert body["distances"][0] == pytest.approx(0.0)
    # squared L2 (backend-native, SURVEY §2.7): (9²+8²+7²)
    assert body["distances"][1] == pytest.approx(81 + 64 + 49)

    # upsert replaces the vector AND stores the JSON doc (MERGE semantics)
    status, body = _post(
        server, "/upsert",
        {"id": 2, "vectors": [1.0, 2.0, 4.0], "index_key": KEY_FLAT,
         "data": {"tag": "fresh"}},
    )
    assert status == 200 and body == {"code": 0}
    status, body = _post(
        server, "/search",
        {"vectors": [1.0, 2.0, 3.0], "k": 2, "index_key": KEY_FLAT},
    )
    assert body["labels"] == [1, 2]
    assert body["distances"][1] == pytest.approx(1.0)

    # /query returns the stored doc with vectors folded in
    # (upsert_handle.rs:23-32)
    status, body = _post(server, "/query", {"id": 2})
    assert status == 200
    assert body["code"] == 0
    assert body["data"]["tag"] == "fresh"
    assert body["data"]["vectors"] == [1.0, 2.0, 4.0]
    # missing doc → 500 (query_handle.rs:26)
    status, body = _post(server, "/query", {"id": 424242})
    assert status == 500 and body["code"] == -1


def test_search_batch_over_the_wire(server):
    _post(server, "/create", KEY_FLAT)
    reqs = [
        {"vectors": [1.0, 2.0, 3.0], "k": 1, "index_key": KEY_FLAT},
        {"vectors": [], "k": 1, "index_key": KEY_FLAT},  # errors in place
        {"vectors": [1.0, 2.0, 4.0], "k": 2, "index_key": KEY_FLAT},
    ]
    status, body = _post(server, "/search_batch", reqs)
    assert status == 200
    assert body[0]["code"] == 0 and body[0]["labels"][0] == 1
    assert body[1]["code"] == 400
    assert body[2]["code"] == 0 and len(body[2]["labels"]) == 2


def test_transport_rejections(server):
    # malformed JSON → 400 (axum Json-extractor behavior)
    status, body = _post(server, "/search", None, raw=b"{not json")
    assert status == 400 and body["code"] == -1
    # object route given a list / list route given an object → 400
    status, _ = _post(server, "/search", [1, 2, 3])
    assert status == 400
    status, _ = _post(server, "/search_batch", {"vectors": []})
    assert status == 400
    # unknown route → 404 on both verbs
    status, _ = _post(server, "/nope", {})
    assert status == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            f"http://{server.host}:{server.port}/nope", timeout=30
        )
    assert e.value.code == 404


# ---------------------------------------------------------------------------
# Per-collection dispatch locking (reference granularity: one mutex per
# index, src/core/index/faiss_index.rs:19-21). A stub API with a slow
# search observes true handler concurrency — no Spark timing flakiness.
# ---------------------------------------------------------------------------


class _ConcurrencyProbeApi:
    """Duck-typed VectorDatabaseApi: search() sleeps and records, per
    collection key and globally, how many handlers were inside it at
    once."""

    def __init__(self):
        import threading

        self._mu = threading.Lock()
        self._active: dict = {}
        self.max_per_key: dict = {}
        self._total = 0
        self.max_total = 0
        # when set, handlers inside search() rendezvous here instead of
        # relying on a sleep window — parallel requests PROVE overlap by
        # meeting at the barrier, however slowly the host spawns threads
        # (ADVICE r8: sleep-window overlap flakes on loaded CI machines)
        self.barrier = None

    def collection_key(self, index_key):
        return (index_key or {}).get("name")

    def search(self, req):
        import threading
        import time

        key = req["index_key"]["name"]
        with self._mu:
            self._active[key] = self._active.get(key, 0) + 1
            self._total += 1
            self.max_per_key[key] = max(
                self.max_per_key.get(key, 0), self._active[key]
            )
            self.max_total = max(self.max_total, self._total)
        bar = self.barrier
        if bar is not None:
            try:
                bar.wait(timeout=30)
            except threading.BrokenBarrierError:
                pass  # serialized — the max_total assertion reports it
        else:
            time.sleep(0.4)
        with self._mu:
            self._active[key] -= 1
            self._total -= 1
        return {"code": 0, "labels": [], "distances": []}


def test_per_collection_locking_allows_cross_collection_parallelism():
    """Two searches against DIFFERENT collections must overlap in time
    (max global concurrency 2); two against the SAME collection must
    serialize (max per-key concurrency 1)."""
    import json as _json
    import threading
    import urllib.request as _rq

    from vector_db_spark.server import VectorDbHttpServer

    api = _ConcurrencyProbeApi()
    srv = VectorDbHttpServer(api).start()
    try:
        def post_search(name):
            req = _rq.Request(
                f"http://{srv.host}:{srv.port}/search",
                data=_json.dumps(
                    {"vectors": [0.0], "k": 1, "index_key": {"name": name}}
                ).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with _rq.urlopen(req, timeout=30) as resp:
                assert _json.loads(resp.read())["code"] == 0

        # phase 1: different collections in parallel -> must overlap.
        # Both handlers rendezvous at a barrier INSIDE search(), so the
        # overlap proof is positive synchronization, not a sleep window.
        api.barrier = threading.Barrier(2)
        ts = [threading.Thread(target=post_search, args=(n,)) for n in ("a", "b")]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert api.max_total == 2, "searches on different collections serialized"
        assert api.max_per_key["a"] == 1 and api.max_per_key["b"] == 1

        # phase 2: same collection twice -> must serialize (a barrier
        # would deadlock here — that serialization IS the assertion)
        api.barrier = None
        ts = [threading.Thread(target=post_search, args=("c",)) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert api.max_per_key["c"] == 1, "same-collection searches overlapped"
    finally:
        srv.stop()


def test_lock_keys_are_sorted_and_deduped():
    """Deadlock-freedom invariant: every handler acquires its lock set in
    sorted order, upsert folds in the shared doc-store key, batch dedups
    across requests, and unparseable keys fall back to the catalog key."""
    from vector_db_spark.server import _CATALOG_KEY, _DOCS_KEY, _lock_keys

    api = _ConcurrencyProbeApi()
    assert _lock_keys(api, "create_index", {}) == [_CATALOG_KEY]
    assert _lock_keys(api, "query", {"id": 1}) == [_DOCS_KEY]
    assert _lock_keys(api, "search", {"index_key": {"name": "x"}}) == ["x"]
    got = _lock_keys(api, "upsert", {"index_key": {"name": "x"}})
    assert got == sorted({_DOCS_KEY, "x"}) and len(got) == 2
    batch = [
        {"index_key": {"name": "b"}},
        {"index_key": {"name": "a"}},
        {"index_key": {"name": "b"}},
        "not-a-dict",
    ]
    assert _lock_keys(api, "search_batch", batch) == ["a", "b"]
    assert _lock_keys(api, "search", {"index_key": None}) == [_CATALOG_KEY]


def test_range_search_over_the_wire(server):
    """POST /range_search: same wire shape as /search with `threshold`
    in place of `k`; all ids within squared-L2 <= t, metric-then-id
    order, unbounded by design. Validation: missing/non-numeric
    threshold -> 400; missing collection -> 404."""
    key = {"index_type": "FLAT", "dim": 4, "metric_type": "L2"}
    _post(server, "/create", key)
    for rid, vec in [(1, [1.0, 2.0, 3.0, 0.0]), (2, [1.0, 2.0, 4.0, 0.0]),
                     (3, [10.0, 10.0, 10.0, 0.0])]:
        _post(server, "/insert", {"id": rid, "vectors": vec, "index_key": key})
    status, body = _post(
        server, "/range_search",
        {"vectors": [1.0, 2.0, 3.0, 0.0], "threshold": 1.5, "index_key": key},
    )
    assert status == 200 and body["code"] == 0
    assert body["labels"] == [1, 2]  # id 3 is far outside the radius
    assert body["distances"][0] == pytest.approx(0.0)
    assert body["distances"][1] == pytest.approx(1.0)
    # unbounded: a huge radius returns everything
    status, body = _post(
        server, "/range_search",
        {"vectors": [1.0, 2.0, 3.0, 0.0], "threshold": 1e6, "index_key": key},
    )
    assert body["labels"] == [1, 2, 3]
    # limit caps the wire response at the closest n (metric order)
    status, body = _post(
        server, "/range_search",
        {"vectors": [1.0, 2.0, 3.0, 0.0], "threshold": 1e6, "index_key": key,
         "limit": 2},
    )
    assert status == 200 and body["labels"] == [1, 2]
    status, body = _post(
        server, "/range_search",
        {"vectors": [1.0, 2.0, 3.0, 0.0], "threshold": 1e6, "index_key": key,
         "limit": 0},
    )
    assert status == 400 and "limit" in body["error_msg"]
    # validation table
    status, body = _post(
        server, "/range_search",
        {"vectors": [1.0, 2.0, 3.0, 0.0], "index_key": key},
    )
    assert status == 400 and "threshold" in body["error_msg"]
    status, body = _post(
        server, "/range_search",
        {"vectors": [1.0, 2.0, 3.0, 0.0], "threshold": True, "index_key": key},
    )
    assert status == 400
    missing = {"index_type": "FLAT", "dim": 9, "metric_type": "L2"}
    status, body = _post(
        server, "/range_search",
        {"vectors": [0.0] * 9, "threshold": 1.0, "index_key": missing},
    )
    assert status == 404 and body["code"] == -1


def test_range_search_lazy_builds_index_backed_family(server):
    """/range_search on an index-backed family (HNSW -> graph): the lazy
    (re)build contract mirrors /search — first call builds, results at a
    generous beam equal the exact L2 range over the inserted rows, and a
    mutation is served fresh after the automatic rebuild."""
    key = {"index_type": "HNSW", "dim": 3, "metric_type": "L2",
           "max_elements": 100}
    _post(server, "/create", key)
    rows = {1: [0.0, 0.0, 0.0], 2: [1.0, 0.0, 0.0],
            3: [0.0, 2.0, 0.0], 4: [5.0, 5.0, 5.0]}
    for rid, vec in rows.items():
        _post(server, "/insert", {"id": rid, "vectors": vec, "index_key": key})
    status, body = _post(
        server, "/range_search",
        {"vectors": [0.0, 0.0, 0.0], "threshold": 4.5, "index_key": key,
         "params": {"ef_search": 1000, "nprobe": 2}},
    )
    assert status == 200 and body["code"] == 0
    assert body["labels"] == [1, 2, 3]  # sq-L2: 0, 1, 4 <= 4.5; id 4 = 75
    assert body["distances"] == pytest.approx([0.0, 1.0, 4.0])
    # mutation -> lazy rebuild serves the fresh snapshot
    _post(server, "/upsert",
          {"id": 2, "vectors": [9.0, 9.0, 9.0], "index_key": key})
    status, body = _post(
        server, "/range_search",
        {"vectors": [0.0, 0.0, 0.0], "threshold": 4.5, "index_key": key,
         "params": {"ef_search": 1000, "nprobe": 2}},
    )
    assert status == 200 and body["labels"] == [1, 3]


def test_batch_range_search_over_the_wire(server):
    """POST /batch_range_search: the /search_batch wire shape with
    `threshold` in place of `k` (faiss range_search's native n-query
    signature). Per-request results equal sequential /range_search
    calls; invalid requests error in place; per-request limit caps
    the metric-ordered rows; mixed thresholds land in separate groups
    but one batch call still answers them all."""
    key = {"index_type": "FLAT", "dim": 6, "metric_type": "L2"}
    _post(server, "/create", key)
    for rid, vec in [(1, [1.0, 2.0, 3.0, 0.0, 0.0, 0.0]), (2, [1.0, 2.0, 4.0, 0.0, 0.0, 0.0]),
                     (3, [10.0, 10.0, 10.0, 0.0, 0.0, 0.0])]:
        _post(server, "/insert", {"id": rid, "vectors": vec, "index_key": key})
    reqs = [
        {"vectors": [1.0, 2.0, 3.0, 0.0, 0.0, 0.0], "threshold": 1.5, "index_key": key},
        {"vectors": [10.0, 10.0, 10.0, 0.0, 0.0, 0.0], "threshold": 1.5, "index_key": key},
        {"vectors": [1.0, 2.0, 3.0, 0.0, 0.0, 0.0], "threshold": 1e6, "index_key": key,
         "limit": 2},
        {"vectors": [1.0, 2.0, 3.0, 0.0, 0.0, 0.0], "index_key": key},          # no threshold
        {"vectors": [1.0, 2.0, 3.0, 0.0, 0.0, 0.0], "threshold": float("nan"),
         "index_key": key},                                            # non-finite
    ]
    status, body = _post(server, "/batch_range_search", reqs)
    assert status == 200 and isinstance(body, list) and len(body) == 5
    # each ok entry equals the sequential single route
    for i in (0, 1, 2):
        st, single = _post(server, "/range_search", reqs[i])
        assert st == 200
        assert body[i]["code"] == 0
        assert body[i]["labels"] == single["labels"], i
        assert body[i]["distances"] == pytest.approx(single["distances"]), i
    assert body[0]["labels"] == [1, 2]
    assert body[1]["labels"] == [3]
    assert body[2]["labels"] == [1, 2]  # limit=2 of 3 matches
    assert body[3]["code"] == 400 and "threshold" in body[3]["error_msg"]
    assert body[4]["code"] == 400 and "finite" in body[4]["error_msg"]
    # payload must be a list
    status, body = _post(server, "/batch_range_search", {"vectors": []})
    assert status == 400


def test_batch_range_search_lazy_builds_index_backed_family(server):
    """/batch_range_search on HNSW: the lazy (re)build contract mirrors
    /search_batch — one group, one distributed range job, results at a
    generous beam equal the exact L2 range per request."""
    key = {"index_type": "HNSW", "dim": 5, "metric_type": "L2",
           "max_elements": 100}
    _post(server, "/create", key)
    rows = {1: [0.0, 0.0, 0.0, 0.0, 0.0], 2: [1.0, 0.0, 0.0, 0.0, 0.0],
            3: [0.0, 2.0, 0.0, 0.0, 0.0], 4: [5.0, 5.0, 5.0, 0.0, 0.0]}
    for rid, vec in rows.items():
        _post(server, "/insert", {"id": rid, "vectors": vec, "index_key": key})
    reqs = [
        {"vectors": [0.0, 0.0, 0.0, 0.0, 0.0], "threshold": 4.5,
         "index_key": key, "params": {"ef_search": 1000, "nprobe": 2}},
        {"vectors": [5.0, 5.0, 5.0, 0.0, 0.0], "threshold": 4.5,
         "index_key": key, "params": {"ef_search": 1000, "nprobe": 2}},
    ]
    status, body = _post(server, "/batch_range_search", reqs)
    assert status == 200
    assert body[0]["code"] == 0 and body[0]["labels"] == [1, 2, 3]
    assert body[0]["distances"] == pytest.approx([0.0, 1.0, 4.0])
    assert body[1]["code"] == 0 and body[1]["labels"] == [4]
