"""Per-query Spark JOB counts for the persisted-index (ann_search_suite)
and 768-d (highdim_suite) bench entries — the twin of job_profile.py,
which covers the HEADLINE registry queries only (r16: the maxsim/ANN
families were the largest never-job-profiled block of the bench).

Also prints a per-family wall/job profile of the ann_index_build pool
(each family timed standalone, sequentially) so the pool's critical path
is attributable.

Usage: python tools/job_profile_ann.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf annotations resolve lazily)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ann_search_suite, highdim_suite  # noqa: E402
from vector_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark("job_profile_ann")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    t0 = time.perf_counter()
    build_sec, searches, _subs = ann_search_suite(
        spark, sf_dir, "/tmp/spark_graft_profile_ann"
    )
    print(f"ann_index_build wall={build_sec:.3f}", flush=True)
    hd_build, hd_searches = highdim_suite(
        spark, sf_dir, "/tmp/spark_graft_profile_768"
    )
    print(f"ann768_ivf_build wall={hd_build:.3f}", flush=True)
    searches = {**searches, **hd_searches}

    out = {}
    for name, thunk in searches.items():
        if only and name not in only:
            continue
        thunk().write.format("noop").mode("overwrite").save()  # warm
        group = f"profile_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        thunk().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("idle", "idle")
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        out[name] = {"n_jobs": len(jobs), "wall_sec": round(wall, 3)}
        print(f"{name:35s} jobs={len(jobs):3d} wall={wall:7.3f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
