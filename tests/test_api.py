"""Request-facade parity tests (vector_db_spark/api.py) — mirrors the
reference's rstest handler cases (create_index_handle.rs:119-175,
insert_index_handle.rs:98-137, search_index_handle.rs:139-222,
upsert_handle.rs:86-119, query_handle.rs:70-90): same payload shapes,
same validation outcomes, status codes as ApiError.status."""

from __future__ import annotations

import pytest

from vector_db_spark.api import ApiError, VectorDatabaseApi

KEY_FLAT = {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}


@pytest.fixture()
def api(spark, tmp_path):
    return VectorDatabaseApi(spark, str(tmp_path))


def _status(fn, *a):
    with pytest.raises(ApiError) as e:
        fn(*a)
    return e.value.status


def test_create_validation_matrix(api):
    """≅ create_index_handle.rs:119-175 case table."""
    ok = api.create_index({"index_type": "FLAT", "dim": 3, "metric_type": "L2"})
    assert ok["code"] == 0 and ok["index_key"]["index_type"] == "FLAT"
    # numeric wire enums accepted (FLAT=0, L2=1)
    assert api.create_index({"index_type": 0, "dim": 3, "metric_type": 1})["code"] == 0
    assert _status(api.create_index, {"dim": 3, "metric_type": "L2"}) == 400
    assert _status(api.create_index, {"index_type": "FLAT", "metric_type": "L2"}) == 400
    assert _status(api.create_index, {"index_type": "FLAT", "dim": 0, "metric_type": "L2"}) == 400
    # unknown index type -> error (index_factory.rs:157-161)
    assert _status(api.create_index, {"index_type": "HNSW9000", "dim": 3, "metric_type": "L2"}) == 400
    # HNSW requires max_elements; non-HNSW forbids it (create.rs:24-47)
    assert _status(api.create_index, {"index_type": "HNSW", "dim": 3, "metric_type": "L2"}) == 400
    assert _status(api.create_index, {"index_type": "FLAT", "dim": 3, "metric_type": "L2", "max_elements": 10}) == 400
    assert api.create_index(
        {"index_type": "HNSW", "dim": 3, "metric_type": "L2", "max_elements": 100}
    )["code"] == 0


def test_insert_validation_and_flow(api):
    api.create_index(KEY_FLAT)
    assert api.insert({"vectors": [1.0, 2.0, 3.0], "id": 1, "index_key": KEY_FLAT})["code"] == 0
    # empty vector -> 400 (insert.rs:10)
    assert _status(api.insert, {"vectors": [], "id": 2, "index_key": KEY_FLAT}) == 400
    # id must be >= 1 (insert.rs:12-14)
    assert _status(api.insert, {"vectors": [1.0, 2.0, 3.0], "id": 0, "index_key": KEY_FLAT}) == 400
    # missing index -> 404 (app_error.rs:38-44)
    other = {"index_type": "FLAT", "dim": 5, "metric_type": "L2"}
    assert _status(api.insert, {"vectors": [1.0] * 5, "id": 3, "index_key": other}) == 404
    # STRICT dim enforcement (divergence from search_index_handle.rs:201-215)
    assert _status(api.insert, {"vectors": [1.0] * 6, "id": 4, "index_key": KEY_FLAT}) == 400


def test_search_flat_happy_path_mirrors_reference_workflow(api):
    """≅ faiss workflow test (faiss_index.rs:156-190): two identical
    vectors + one distant; top-2 returns the identical pair at
    distance < 1e-3."""
    api.create_index(KEY_FLAT)
    for i, v in [(1, [1.0, 1.0, 1.0]), (2, [1.0, 1.0, 1.0]), (3, [9.0, 9.0, 9.0])]:
        api.insert({"vectors": v, "id": i, "index_key": KEY_FLAT})
    res = api.search({"vectors": [1.0, 1.0, 1.0], "k": 2, "index_key": KEY_FLAT})
    assert res["code"] == 0
    assert res["labels"] == [1, 2]
    assert all(d < 1e-3 for d in res["distances"])
    # k/vector validation (search.rs:6-17)
    assert _status(api.search, {"vectors": [1.0] * 3, "k": 0, "index_key": KEY_FLAT}) == 400
    assert _status(api.search, {"vectors": [], "k": 1, "index_key": KEY_FLAT}) == 400
    missing = {"index_type": "USEARCH", "dim": 3, "metric_type": "L2"}
    assert _status(api.search, {"vectors": [1.0] * 3, "k": 1, "index_key": missing}) == 404


def test_search_hnsw_and_usearch_backends(api):
    """Approximate backends build lazily and serve the same results as
    FLAT on this corpus (exhaustive-quality defaults)."""
    for key in (
        {"index_type": "HNSW", "dim": 3, "metric_type": "L2", "max_elements": 100},
        {"index_type": "USEARCH", "dim": 3, "metric_type": "L2"},
    ):
        req_key = {k: v for k, v in key.items() if k != "max_elements"}
        api.create_index(key)
        for i, v in [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.9, 0.1, 0.0])]:
            api.insert({"vectors": v, "id": i, "index_key": req_key})
        res = api.search({"vectors": [1.0, 0.0, 0.0], "k": 2, "index_key": req_key})
        assert res["labels"][0] == 1 and set(res["labels"]) == {1, 3}
        # mutation invalidates; next search rebuilds transparently
        api.insert({"vectors": [0.95, 0.05, 0.0], "id": 4, "index_key": req_key})
        res2 = api.search({"vectors": [1.0, 0.0, 0.0], "k": 2, "index_key": req_key})
        assert res2["labels"] == [1, 4]


def test_upsert_then_query_roundtrip(api):
    """≅ vector_database.rs:97-145: upsert (doc + vector), query returns
    the merged JSON incl. the folded vectors field; second upsert with
    the same id REPLACES (one live row; the stale-HNSW bug is fixed by
    design)."""
    api.create_index(KEY_FLAT)
    api.upsert(
        {
            "id": 1,
            "vectors": [1.0, 2.0, 3.0],
            "data": {"name": "sora", "age": 20},
            "index_key": KEY_FLAT,
        }
    )
    got = api.query({"id": 1})
    assert got["code"] == 0
    assert got["data"]["name"] == "sora" and got["data"]["age"] == 20
    assert got["data"]["vectors"] == [1.0, 2.0, 3.0]
    api.upsert(
        {
            "id": 1,
            "vectors": [4.0, 5.0, 6.0],
            "data": {"name": "sora2"},
            "index_key": KEY_FLAT,
        }
    )
    got2 = api.query({"id": 1})
    assert got2["data"]["name"] == "sora2"
    assert got2["data"]["vectors"] == [4.0, 5.0, 6.0]
    res = api.search({"vectors": [4.0, 5.0, 6.0], "k": 1, "index_key": KEY_FLAT})
    assert res["labels"] == [1] and res["distances"][0] < 1e-9
    # query validation + miss (query_handle.rs:15-26)
    assert _status(api.query, {"id": 0}) == 400
    assert _status(api.query, {"id": 999}) == 500


def test_search_batch_matches_sequential_one_job_per_collection(api):
    """N-request batch (engine extension): one Collection.search_batch
    invocation serves the whole group, responses identical to calling
    search() per request (VERDICT r4 residual #1)."""
    from vector_db_spark.operators import collections as colls

    key = {"index_type": "USEARCH", "dim": 4, "metric_type": "L2"}
    api.create_index(key)
    for i in range(1, 21):
        api.insert(
            {"vectors": [float(i), float(i % 5), 1.0, 0.0], "id": i,
             "index_key": key}
        )
    reqs = [
        {"vectors": [float(q), float(q % 5), 1.0, 0.0], "k": 3 + (q % 2),
         "index_key": key}
        for q in (2, 7, 11, 16, 19)
    ]
    seq = [api.search(r) for r in reqs]

    calls = {"n": 0}
    orig = colls.Collection.search_batch

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    colls.Collection.search_batch = counting
    try:
        got = api.search_batch(reqs)
    finally:
        colls.Collection.search_batch = orig
    assert calls["n"] == 1  # five requests, ONE distributed batch job
    assert got == seq


def test_search_batch_mixed_validity_and_empty_collection(api):
    key = {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}
    api.create_index(key)  # created, never inserted -> empty
    missing = {"index_type": "FLAT", "dim": 9, "metric_type": "L2"}
    got = api.search_batch(
        [
            {"vectors": [1.0, 2.0, 3.0], "k": 2, "index_key": key},
            {"vectors": [], "k": 2, "index_key": key},
            {"vectors": [1.0] * 9, "k": 2, "index_key": missing},
            {"vectors": [1.0, 2.0], "k": 2, "index_key": key},
            # malformed payloads must error in place, not crash the batch
            {"vectors": ["a", "b", "c"], "k": 2, "index_key": key},
            {"vectors": [1.0, 2.0, 3.0], "k": "abc", "index_key": key},
        ]
    )
    assert got[0] == {"code": 0, "labels": [], "distances": []}
    assert got[1]["code"] == 400
    assert got[2]["code"] == 404
    assert got[3]["code"] == 400 and "dimension" in got[3]["error"]
    assert got[4]["code"] == 400
    assert got[5]["code"] == 400


def test_search_params_validation_and_override(api):
    """Per-request serving knobs (engine extension; the reference wire
    has no knobs — search.rs:6-17): family-whitelisted, validated BEFORE
    the empty-collection early return, defaults untouched when absent."""
    key = {"index_type": "USEARCH", "dim": 3, "metric_type": "L2"}
    api.create_index(key)
    base = {"vectors": [1.0, 0.0, 0.0], "k": 1, "index_key": key}
    # a bad request is a 400 even while the collection is EMPTY
    assert _status(api.search, {**base, "params": {"bogus": 1}}) == 400
    # a knob that exists for ANOTHER family is still unknown here
    assert _status(api.search, {**base, "params": {"ef_search": 10}}) == 400
    assert _status(api.search, {**base, "params": {"nprobe": 0}}) == 400
    assert _status(api.search, {**base, "params": {"nprobe": "four"}}) == 400
    # strict integers: floats, bools, and numeric strings are 400s, not
    # coerced (nprobe=7.9 must not silently serve at nprobe=7)
    assert _status(api.search, {**base, "params": {"nprobe": 7.9}}) == 400
    assert _status(api.search, {**base, "params": {"nprobe": True}}) == 400
    assert _status(api.search, {**base, "params": {"nprobe": "4"}}) == 400
    assert _status(api.search, {**base, "params": [1, 2]}) == 400
    # FLAT takes no serving knobs at all
    api.create_index(KEY_FLAT)
    assert _status(
        api.search,
        {"vectors": [1.0, 0.0, 0.0], "k": 1, "index_key": KEY_FLAT,
         "params": {"nprobe": 2}},
    ) == 400
    # happy path: an explicit all-cells override serves exact results
    for i, v in [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
                 (3, [0.9, 0.1, 0.0])]:
        api.insert({"vectors": v, "id": i, "index_key": key})
    res = api.search({**base, "k": 2, "params": {"nprobe": 64}})
    assert res["code"] == 0 and res["labels"] == [1, 3]
    # omitting params still serves (family defaults)
    assert api.search({**base, "k": 2})["labels"] == [1, 3]


def test_search_batch_groups_by_serving_params(api):
    """Knob-overriding requests land in their own batch group (one job
    per (collection, params) signature); a bad knob errors in place."""
    from vector_db_spark.operators import collections as colls

    key = {"index_type": "USEARCH", "dim": 3, "metric_type": "L2"}
    api.create_index(key)
    for i, v in [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
                 (3, [0.9, 0.1, 0.0])]:
        api.insert({"vectors": v, "id": i, "index_key": key})
    reqs = [
        {"vectors": [1.0, 0.0, 0.0], "k": 2, "index_key": key},
        {"vectors": [1.0, 0.0, 0.0], "k": 2, "index_key": key,
         "params": {"nprobe": 64}},
        {"vectors": [0.0, 1.0, 0.0], "k": 1, "index_key": key,
         "params": {"nprobe": 64}},
        {"vectors": [1.0, 0.0, 0.0], "k": 2, "index_key": key,
         "params": {"nprobe": "x"}},
    ]
    calls = {"n": 0}
    orig = colls.Collection.search_batch

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    colls.Collection.search_batch = counting
    try:
        got = api.search_batch(reqs)
    finally:
        colls.Collection.search_batch = orig
    # default group + nprobe-64 group; the bad knob never reaches a job
    assert calls["n"] == 2
    assert got[0]["code"] == 0 and got[0]["labels"] == [1, 3]
    assert got[1] == got[0]
    assert got[2]["code"] == 0 and got[2]["labels"] == [2]
    assert got[3]["code"] == 400 and "nprobe" in got[3]["error"]


# ---------------------------------------------------------------------------
# Multi-vector (MaxSim) engine-extension wire types (MAXSIM=4,
# MAXSIM_PQ=5): `vectors` is a LIST of token vectors, scores are exact
# MaxSim under the default full-probe serving params.
# ---------------------------------------------------------------------------

KEY_MS = {"index_type": "MAXSIM", "dim": 3, "metric_type": "InnerProduct"}


def test_maxsim_create_validation(api):
    # metric must be InnerProduct (MaxSim IS an inner-product score)
    assert _status(
        api.create_index,
        {"index_type": "MAXSIM", "dim": 3, "metric_type": "L2"},
    ) == 400
    assert _status(
        api.create_index,
        {"index_type": "MAXSIM_PQ", "dim": 3, "metric_type": "L2"},
    ) == 400
    # numeric wire values accepted (engine extension: 4 / 5)
    out = api.create_index({"index_type": 4, "dim": 3, "metric_type": 0})
    assert out["code"] == 0 and out["index_key"]["index_type"] == "MAXSIM"
    out = api.create_index({"index_type": 5, "dim": 3, "metric_type": 0})
    assert out["code"] == 0 and out["index_key"]["index_type"] == "MAXSIM_PQ"
    # max_elements stays HNSW-only
    assert _status(
        api.create_index,
        {"index_type": "MAXSIM", "dim": 3, "metric_type": "InnerProduct",
         "max_elements": 10},
    ) == 400


def test_maxsim_insert_search_exact(api):
    api.create_index(KEY_MS)
    docs = {
        1: [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        2: [[0.0, 0.0, 1.0]],
        3: [[0.5, 0.5, 0.0], [0.0, 0.0, -1.0], [1.0, 1.0, 1.0]],
    }
    for rid, toks in docs.items():
        assert api.insert(
            {"id": rid, "vectors": toks, "index_key": KEY_MS}
        )["code"] == 0
    # flat (single-vector) payload against a multi-vector collection -> 400
    assert _status(
        api.insert, {"id": 9, "vectors": [1.0, 2.0, 3.0], "index_key": KEY_MS}
    ) == 400
    # token dim mismatch -> 400
    assert _status(
        api.insert, {"id": 9, "vectors": [[1.0, 2.0]], "index_key": KEY_MS}
    ) == 400

    q = [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    out = api.search({"vectors": q, "k": 3, "index_key": KEY_MS})
    assert out["code"] == 0
    # exact MaxSim by hand: sum over query tokens of per-doc max dot
    want = {
        d: sum(max(sum(a * b for a, b in zip(t, tok)) for tok in toks)
               for t in q)
        for d, toks in docs.items()
    }
    order = sorted(want, key=lambda d: (-want[d], d))
    assert out["labels"] == order
    for lab, score in zip(out["labels"], out["distances"]):
        assert score == pytest.approx(want[lab], abs=1e-6)

    # batch: one valid + one dim-mismatch + one non-dict, error in place
    res = api.search_batch([
        {"vectors": q, "k": 2, "index_key": KEY_MS},
        {"vectors": [[1.0]], "k": 2, "index_key": KEY_MS},
        "nope",
    ])
    assert res[0]["code"] == 0 and res[0]["labels"] == order[:2]
    assert res[1]["code"] == 400
    assert res[2]["code"] == 400


def test_maxsim_api_default_nprobe_follows_built_nlist(spark, tmp_path):
    """'API-served MaxSim scores are exact' must survive a library-side
    build with nlist above the wire default: the knob-less serving
    default derives full probe from the RECORDED build nlist instead of
    the static constant (ADVICE r9)."""
    from vector_db_spark.api import VectorDatabaseApi, _serving_params

    api = VectorDatabaseApi(spark, str(tmp_path))
    key = {"index_type": "MAXSIM", "dim": 4, "metric_type": "InnerProduct"}
    api.create_index(key)
    docs = {
        i: [[float(i == j) for j in range(4)], [0.1 * i, 0.2, 0.0, 0.3]]
        for i in range(1, 13)
    }
    for rid, toks in docs.items():
        api.insert({"id": rid, "vectors": toks, "index_key": key})
    coll = api._collection(key)
    coll.build_index(nlist=8, max_iter=3)  # library config > wire default 4
    assert _serving_params({}, coll)["nprobe"] == 8  # full probe derived
    q = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    out = api.search({"vectors": q, "k": 12, "index_key": key})
    assert out["code"] == 0
    want = {
        d: sum(max(sum(a * b for a, b in zip(t, tok)) for tok in toks)
               for t in q)
        for d, toks in docs.items()
    }
    for lab, score in zip(out["labels"], out["distances"]):
        assert score == pytest.approx(want[lab], abs=1e-5)
    # an explicitly persisted operating point still wins over the default
    coll.set_serving_params(nprobe=2)
    assert _serving_params({}, coll)["nprobe"] == 2


def test_ensure_index_respects_recorded_build_params(spark, tmp_path):
    """An API-triggered lazy rebuild reuses the knobs recorded with the
    last build instead of resetting to the wire defaults: a collection
    configured through the library keeps its configuration."""
    from vector_db_spark.operators.ann import IvfIndex

    api = VectorDatabaseApi(spark, str(tmp_path))
    key = {"index_type": "USEARCH", "dim": 4, "metric_type": "L2"}
    api.create_index(key)
    for i in range(1, 33):
        api.insert({"vectors": [float(i), float(i % 7), 1.0, 0.0],
                    "id": i, "index_key": key})
    coll = api._collection(key)
    coll.build_index(nlist=8, max_iter=4)  # library-side config
    # a mutation staleness-invalidates; the next API search lazily
    # rebuilds — with the RECORDED nlist=8, not the wire default 4
    api.insert({"vectors": [99.0, 0.0, 1.0, 0.0], "id": 99, "index_key": key})
    res = api.search({"vectors": [1.0, 1.0, 1.0, 0.0], "k": 2, "index_key": key})
    assert res["code"] == 0
    idx = IvfIndex.load(spark, api._collection(key)._index_dir())
    assert len(idx.centroids) == 8


def test_wire_type_strictness_400_not_500(api):
    """Malformed wire values must be THIS request's 400, never a naked
    ValueError/TypeError escaping as a transport 500: string k, boolean
    enums (True==1 in Python!), fractional dims, list-valued index_type,
    non-object data (round-10 review)."""
    key = {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}
    api.create_index(key)
    api.insert({"id": 1, "vectors": [1.0, 2.0, 3.0], "index_key": key})
    # string k
    assert _status(api.search, {"vectors": [1.0, 2.0, 3.0], "k": "ten",
                                "index_key": key}) == 400
    # boolean dim / enum values would hash-match 1 and 0
    assert _status(api.create_index, {"index_type": True, "dim": 3,
                                      "metric_type": "L2",
                                      "max_elements": 10}) == 400
    assert _status(api.create_index, {"index_type": "FLAT", "dim": True,
                                      "metric_type": "L2"}) == 400
    # fractional dim must not silently truncate
    assert _status(api.create_index, {"index_type": "FLAT", "dim": 3.9,
                                      "metric_type": "L2"}) == 400
    # unhashable index_type must not TypeError out of the dict probe
    assert _status(api.create_index, {"index_type": [1], "dim": 3,
                                      "metric_type": "L2"}) == 400
    # list-valued upsert data must not crash dict()
    assert _status(api.upsert, {"id": 1, "data": [1, 2],
                                "index_key": key}) == 400
    # string id
    assert _status(api.insert, {"id": "one", "vectors": [1.0, 2.0, 3.0],
                                "index_key": key}) == 400
    # integral float k is a JSON-codec artifact and stays accepted
    out = api.search({"vectors": [1.0, 2.0, 3.0], "k": 1.0, "index_key": key})
    assert out["code"] == 0 and len(out["labels"]) == 1


def test_count_cache_survives_drop_recreate(spark, tmp_path):
    """The lazy-rebuild row-count cache keys on the collection's creation
    nonce: a drop()+re-create of the same name must not serve the old
    incarnation's count (which mis-clamped nlist)."""
    from vector_db_spark.api import VectorDatabaseApi
    from vector_db_spark.operators.collections import CollectionCatalog

    api = VectorDatabaseApi(spark, str(tmp_path))
    key = {"index_type": "USEARCH", "dim": 4, "metric_type": "L2"}
    api.create_index(key)
    for i in range(1, 11):
        api.insert({"vectors": [float(i), 0.0, 1.0, 0.0], "id": i,
                    "index_key": key})
    assert api.search({"vectors": [1.0, 0.0, 1.0, 0.0], "k": 2,
                       "index_key": key})["code"] == 0
    name = api._collection(key).info.name
    cat = CollectionCatalog(spark, str(tmp_path) + "/collections")
    cat.drop(name)
    api.create_index(key)
    api.insert({"vectors": [9.0, 0.0, 1.0, 0.0], "id": 1, "index_key": key})
    # one row: nlist must clamp to 1 from the NEW incarnation's count
    out = api.search({"vectors": [9.0, 0.0, 1.0, 0.0], "k": 1, "index_key": key})
    assert out["code"] == 0 and out["labels"] == [1]


def test_range_search_nan_threshold_is_400(api):
    """ADVICE r11: NaN is a float, so it passed the numeric type check,
    and every metric comparison against NaN is false — the route
    returned a silently empty result instead of a 400."""
    api.create_index(KEY_FLAT)
    api.insert({"index_key": KEY_FLAT, "id": 1, "vectors": [1.0, 0.0, 0.0]})
    for bad in (float("nan"), float("inf"), float("-inf")):
        assert _status(
            api.range_search,
            {"index_key": KEY_FLAT, "vectors": [1.0, 0.0, 0.0],
             "threshold": bad},
        ) == 400


def test_range_routes_reject_topk_only_knobs_every_family(api):
    """No-silent-drop on range, generalized past the maxsim case (round
    13): families whose range serves value-exactly via lossless pruning
    (exact/ivf/compressed) have NO range serving knobs — an explicit
    top-k knob the whitelist would accept on /search is this request's
    400 on the range routes, never silently ignored; coverage-knobbed
    families keep exactly their coverage knobs."""
    ivf_key = {"index_type": "USEARCH", "dim": 3, "metric_type": "L2"}
    api.create_index(ivf_key)
    for i, v in [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])]:
        api.insert({"vectors": v, "id": i, "index_key": ivf_key})
    # nprobe is whitelisted for /search on the ivf family...
    ok = api.search({"vectors": [1.0, 0.0, 0.0], "k": 1,
                     "index_key": ivf_key, "params": {"nprobe": 1}})
    assert ok["code"] == 0
    # ...but ivf range is a lossless prune with no serving knobs -> 400
    assert _status(
        api.range_search,
        {"vectors": [1.0, 0.0, 0.0], "threshold": 0.5,
         "index_key": ivf_key, "params": {"nprobe": 1}},
    ) == 400
    # knob-less range serves fine
    out = api.range_search(
        {"vectors": [1.0, 0.0, 0.0], "threshold": 0.5, "index_key": ivf_key}
    )
    assert out["code"] == 0 and out["labels"] == [1]
    # a coverage-knobbed family keeps its coverage knob on range
    hnsw = {"index_type": "HNSW", "dim": 3, "metric_type": "L2",
            "max_elements": 100}
    req_key = {k: v for k, v in hnsw.items() if k != "max_elements"}
    api.create_index(hnsw)
    for i, v in [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])]:
        api.insert({"vectors": v, "id": i, "index_key": req_key})
    out = api.range_search(
        {"vectors": [1.0, 0.0, 0.0], "threshold": 0.5, "index_key": req_key,
         "params": {"ef_search": 64}}
    )
    assert out["code"] == 0 and out["labels"] == [1]


def test_maxsim_range_search_over_the_wire(api):
    """/range_search and /batch_range_search on multi-vector collections
    (round 12): threshold is a MaxSim score floor; served from the
    lazily-built probed index at the default full-probe serving params,
    so returned sets equal the exact operator's."""
    key = {"index_type": "MAXSIM", "dim": 3, "metric_type": "InnerProduct"}
    api.create_index(key)
    docs = {
        1: [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        2: [[0.0, 0.0, 1.0]],
        3: [[0.5, 0.5, 0.0], [0.0, 0.0, -1.0], [1.0, 1.0, 1.0]],
    }
    for rid, toks in docs.items():
        api.insert({"id": rid, "vectors": toks, "index_key": key})
    q = [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    want = {
        d: sum(max(sum(a * b for a, b in zip(t, tok)) for tok in toks)
               for t in q)
        for d, toks in docs.items()
    }  # 1: 1.0, 2: 1.0, 3: 2.0
    out = api.range_search({"vectors": q, "threshold": 1.5, "index_key": key})
    assert out["code"] == 0 and out["labels"] == [3]
    assert out["distances"][0] == pytest.approx(want[3], abs=1e-6)
    out = api.range_search({"vectors": q, "threshold": 0.5, "index_key": key})
    assert out["labels"] == [3, 1, 2]  # score desc, id asc on ties
    # limit caps the score-ordered rows
    out = api.range_search(
        {"vectors": q, "threshold": 0.5, "index_key": key, "limit": 2}
    )
    assert out["labels"] == [3, 1]
    # flat payload on a multi-vector collection is still a 400
    assert _status(
        api.range_search,
        {"vectors": [1.0, 0.0, 0.0], "threshold": 0.5, "index_key": key},
    ) == 400
    # batch: two thresholds -> two groups, one job each; error in place
    res = api.range_search_batch([
        {"vectors": q, "threshold": 1.5, "index_key": key},
        {"vectors": q, "threshold": 0.5, "index_key": key},
        {"vectors": q, "threshold": float("nan"), "index_key": key},
    ])
    assert res[0]["code"] == 0 and res[0]["labels"] == [3]
    assert res[1]["code"] == 0 and res[1]["labels"] == [3, 1, 2]
    assert res[2]["code"] == 400 and "finite" in res[2]["error_msg"]
    # 'shortlist' is a top-k rerank knob the knob whitelist accepts for
    # the maxsim families, but range has no rerank stage: an EXPLICIT
    # request shortlist is this request's 400, never a silent drop
    # (ADVICE r12) — on both routes
    assert _status(
        api.range_search,
        {"vectors": q, "threshold": 0.5, "index_key": key,
         "params": {"shortlist": 8}},
    ) == 400
    res = api.range_search_batch([
        {"vectors": q, "threshold": 0.5, "index_key": key,
         "params": {"shortlist": 8}},
        {"vectors": q, "threshold": 0.5, "index_key": key},
    ])
    assert res[0]["code"] == 400 and "shortlist" in res[0]["error_msg"]
    assert res[1]["code"] == 0 and res[1]["labels"] == [3, 1, 2]
    # ... while a PERSISTED shortlist (a legitimate top-k operating
    # point) is stripped before dispatch, not an error
    coll = api._collection(key)
    coll.set_serving_params(shortlist=4)
    out = api.range_search({"vectors": q, "threshold": 0.5, "index_key": key})
    assert out["code"] == 0 and out["labels"] == [3, 1, 2]


# ---------------------------------------------------------------------------
# Reference conformance sweep (VERDICT r12 #7): ONE parametrized test that
# replays EVERY #[case(...)] row and every inline #[tokio::test] scenario
# from the reference's five handler test modules, so wire drift against the
# reference contract fails a named case instead of waiting for a roundtrip
# test to notice. Each entry carries its reference cite and the expected
# status UNDER THIS REPO'S DOCUMENTED CONTRACT; where the repo deliberately
# diverges, the entry's note names the divergence and the reference status.
# ---------------------------------------------------------------------------

_REF_CASES = [
    # -- create_index_handle.rs:119-123 rstest table ------------------------
    ("create_flat_128_l2",
     "create_index_handle.rs:120 — FLAT/128/L2 → OK",
     {"route": "create", "req": {"index_type": "FLAT", "dim": 128, "metric_type": "L2"}, "status": 0}),
    ("create_flat_256_l2",
     "create_index_handle.rs:121 — FLAT/256/L2 → OK",
     {"route": "create", "req": {"index_type": "FLAT", "dim": 256, "metric_type": "L2"}, "status": 0}),
    ("create_flat_10_ip",
     "create_index_handle.rs:122 — FLAT/10/InnerProduct → OK",
     {"route": "create", "req": {"index_type": "FLAT", "dim": 10, "metric_type": "InnerProduct"}, "status": 0}),
    ("create_unknown_128_l2",
     "create_index_handle.rs:123-129 — UNKNOWN/128/L2 → reference 500 "
     "(InitIndexError); repo 400: an unknown enum in a CREATE payload is "
     "request validation, not an engine fault (LOOKUP paths keep the "
     "reference's 404, see search_unknown below)",
     {"route": "create", "req": {"index_type": "UNKNOWN", "dim": 128, "metric_type": "L2"}, "status": 400}),
    # -- create_index_handle.rs:157-175 inline HNSW test --------------------
    ("create_hnsw_128_l2_cap",
     "create_index_handle.rs:157-175 — HNSW/128/L2/max_elements=1000 → OK",
     {"route": "create", "req": {"index_type": "HNSW", "dim": 128, "metric_type": "L2", "max_elements": 1000}, "status": 0}),
    # -- insert_index_handle.rs:98-99 rstest table ---------------------------
    ("insert_flat_ok",
     "insert_index_handle.rs:98 — FLAT/3/L2 [1,2,3] id=1 → OK",
     {"route": "insert", "setup": [("create", {"index_type": "FLAT", "dim": 3, "metric_type": "L2"})],
      "req": {"vectors": [1.0, 2.0, 3.0], "id": 1,
              "index_key": {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}},
      "status": 0}),
    ("insert_unknown_404",
     "insert_index_handle.rs:99 — UNKNOWN key → NOT_FOUND (app_error.rs:40)",
     {"route": "insert",
      "req": {"vectors": [1.0, 2.0, 3.0], "id": 1,
              "index_key": {"index_type": "UNKNOWN", "dim": 3, "metric_type": "L2"}},
      "status": 404}),
    # -- search_index_handle.rs:139-142 rstest table -------------------------
    ("search_empty_index",
     "search_index_handle.rs:140 — valid query, created-but-empty FLAT/3/L2 "
     "→ reference NOT_FOUND (faiss errors on an empty index); repo code 0 "
     "with empty labels — an existing-but-empty collection is a valid "
     "empty result set, not a missing index (SURVEY hardening row)",
     {"route": "search", "setup": [("create", {"index_type": "FLAT", "dim": 3, "metric_type": "L2"})],
      "req": {"vectors": [1.0, 2.0, 3.0], "k": 3,
              "index_key": {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}},
      "status": 0, "labels": []}),
    ("search_unknown_404",
     "search_index_handle.rs:141 — UNKNOWN key → NOT_FOUND "
     "(UnsupportedIndexType, app_error.rs:40)",
     {"route": "search",
      "req": {"vectors": [0.5, 1.5, 2.5], "k": 3,
              "index_key": {"index_type": "UNKNOWN", "dim": 3, "metric_type": "L2"}},
      "status": 404}),
    ("search_empty_vector_400",
     "search_index_handle.rs:142 — empty vectors → BAD_REQUEST (search.rs:6-11)",
     {"route": "search", "setup": [("create", {"index_type": "FLAT", "dim": 3, "metric_type": "L2"})],
      "req": {"vectors": [], "k": 1,
              "index_key": {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}},
      "status": 400}),
    # -- search_index_handle.rs:177-222 inline success test ------------------
    ("search_hnsw_success",
     "search_index_handle.rs:177-222 — HNSW insert [1,2,3] id=1 then search "
     "→ OK; the reference posts TWO stacked queries in one flat array "
     "(n·dim concat); the repo's /search is single-query with STRICT dim "
     "(documented divergence, insert_index_handle strictness row) so the "
     "replay searches one query and checks the inserted id ranks first",
     {"route": "search",
      "setup": [("create", {"index_type": "HNSW", "dim": 3, "metric_type": "L2", "max_elements": 1000}),
                ("insert", {"vectors": [1.0, 2.0, 3.0], "id": 1,
                            "index_key": {"index_type": "HNSW", "dim": 3, "metric_type": "L2"}})],
      "req": {"vectors": [1.0, 2.0, 3.0], "k": 2,
              "index_key": {"index_type": "HNSW", "dim": 3, "metric_type": "L2"}},
      "status": 0, "labels": [1]}),
    # -- upsert_handle.rs:86-119 inline test ---------------------------------
    ("upsert_flat_ok",
     "upsert_handle.rs:86-119 — FLAT/3/L2 upsert [1,2,3] id=1 → OK",
     {"route": "upsert", "setup": [("create", {"index_type": "FLAT", "dim": 3, "metric_type": "L2"})],
      "req": {"vectors": [1.0, 2.0, 3.0], "id": 1, "data": {"k": "v"},
              "index_key": {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}},
      "status": 0}),
    # -- query_handle.rs:70-90 inline test ------------------------------------
    ("query_present_ok",
     "query_handle.rs:70-90 — query id=1 → OK (the reference test reads a "
     "pre-populated store; the replay upserts first, the reference flow)",
     {"route": "query",
      "setup": [("create", {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}),
                ("upsert", {"vectors": [1.0, 2.0, 3.0], "id": 1, "data": {"name": "sora"},
                            "index_key": {"index_type": "FLAT", "dim": 3, "metric_type": "L2"}})],
      "req": {"id": 1}, "status": 0}),
    ("query_missing_500",
     "query_handle.rs:24-26 — scalar miss → QueryError → 500 (app_error.rs:42)",
     {"route": "query", "req": {"id": 77}, "status": 500}),
]


@pytest.mark.parametrize(
    "case_id,cite,spec", _REF_CASES, ids=[c[0] for c in _REF_CASES]
)
def test_reference_conformance_sweep(api, case_id, cite, spec):
    for step, payload in spec.get("setup", ()):
        getattr(api, {"create": "create_index"}.get(step, step))(payload)
    route = {"create": "create_index"}.get(spec["route"], spec["route"])
    fn = getattr(api, route)
    if spec["status"] == 0:
        out = fn(spec["req"])
        assert out["code"] == 0, cite
        if "labels" in spec:
            assert out["labels"] == spec["labels"], cite
    else:
        assert _status(fn, spec["req"]) == spec["status"], cite
