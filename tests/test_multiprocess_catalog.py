"""Multi-PROCESS catalog stress gate (VERDICT r12 #5).

The reference's only concurrency artifact is a 10-thread in-process test
(/root/reference/src/core/index/faiss_index.rs:241-287); the repo matched
it per-process (the flock + 8-thread race pin in test_collections.py).
This gate goes past the single process: TWO independent
`VectorDatabaseApi` processes — separate JVMs, separate SparkSessions —
interleave upsert / lazy-index-build / search against ONE shared catalog
directory, and the parent asserts

- **version-chain linearity**: the final collection version equals the
  seed version plus the TOTAL number of successful mutations across both
  processes (no lost allocation), and every version in the chain exists
  as a readable version dir with a manifest (no torn publish);
- **search-serves-committed**: each worker read-its-own-writes through
  the lazily rebuilt index immediately after every commit (asserted
  inside the worker, on ids no other process touches);
- **no artifact corruption**: the final scan holds exactly one live row
  per id, each disjoint id carrying its owner's LAST value, and the
  deliberately contended shared id carrying one of the two final-writer
  candidates.

The workers run tiny local[4] sessions; the whole gate is two JVM
startups plus ~20 small jobs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

cat_dir, wid, n_ops = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = (
    SparkSession.builder.master("local[4]")
    .appName(f"mp_worker_{{wid}}")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from vector_db_spark.api import VectorDatabaseApi

api = VectorDatabaseApi(spark, cat_dir)
KEY = {{"index_type": "USEARCH", "dim": 4, "metric_type": "L2"}}
api.create_index(KEY)  # idempotent across processes

own = {{}}
shared_last = None
for i in range(n_ops):
    rid = 100 * wid + i + 1  # disjoint per worker
    vec = [float(wid), float(i), float(rid), 1.0]
    api.upsert({{"id": rid, "vectors": vec,
                 "data": {{"w": wid, "i": i}}, "index_key": KEY}})
    own[rid] = vec
    # read-your-writes THROUGH the lazily rebuilt index: the searched id
    # is ours alone, so whatever the other process commits in between,
    # this exact vector must come back at distance ~0 (search triggers
    # _ensure_index -> concurrent builds contend on the catalog lock)
    res = api.search({{"vectors": vec, "k": 1, "index_key": KEY}})
    assert res["code"] == 0 and res["labels"] == [rid], (wid, i, res)
    assert res["distances"][0] < 1e-9, (wid, i, res)
    if i % 2 == 1:
        # deliberately contended id — no read-back assertion
        sv = [9.0, 9.0, float(wid), float(i)]
        api.upsert({{"id": 7, "vectors": sv,
                     "data": {{"w": wid}}, "index_key": KEY}})
        shared_last = sv

coll = api._collection(KEY)
print(json.dumps({{
    "wid": wid,
    "mutations": n_ops + n_ops // 2,  # own upserts + shared upserts
    "own": {{str(k): v for k, v in own.items()}},
    "shared_last": shared_last,
}}))
spark.stop()
"""


def test_two_process_interleaved_upsert_build_search(spark, tmp_path):
    cat_dir = str(tmp_path / "shared_catalog")
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER.format(repo=REPO))

    n_ops = 4
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), cat_dir, str(wid), str(n_ops)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for wid in (1, 2)
    ]
    reports = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        reports.append(json.loads(out.strip().splitlines()[-1]))

    from vector_db_spark.api import VectorDatabaseApi

    api = VectorDatabaseApi(spark, cat_dir)
    key = {"index_type": "USEARCH", "dim": 4, "metric_type": "L2"}
    coll = api._collection(key)

    # -- version-chain linearity: every mutation got its OWN version ----
    total_mutations = sum(r["mutations"] for r in reports)
    assert coll.info.version == total_mutations, (
        coll.info.version, total_mutations
    )
    # ...and the chain has no torn publishes: versions 1..N all readable
    for v in range(1, coll.info.version + 1):
        assert coll._manifest(v) is not None, f"version {v} has no manifest"

    # -- no artifact corruption: one live row per id, last-writer values -
    rows = {int(r[0]): [float(x) for x in r[1]]
            for r in coll.scan().select(coll.info.id_col,
                                        coll.info.vec_col).collect()}
    expected_ids = {7} | {
        int(k) for r in reports for k in r["own"]
    }
    assert set(rows) == expected_ids
    for r in reports:
        for rid, vec in r["own"].items():
            assert rows[int(rid)] == vec, (rid, rows[int(rid)], vec)
    shared_candidates = [r["shared_last"] for r in reports if r["shared_last"]]
    assert rows[7] in shared_candidates

    # -- search-serves-committed from a THIRD process (this one) --------
    probe = reports[0]["shared_last"]
    res = api.search({"vectors": rows[7], "k": 1, "index_key": key})
    assert res["labels"] == [7] and res["distances"][0] < 1e-9
    assert probe is not None  # the contended path actually ran
