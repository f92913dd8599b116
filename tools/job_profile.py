"""Per-query Spark JOB counts for the bench headline.

On a host whose per-job dispatch latency is the dominant cost of small
queries (the canary_job probe has read 2-2.5x the healthy band on every
boot since r12), wall-clock deltas are noisy but JOB COUNTS are exact:
each sequential job pays the dispatch tax once, so "n_jobs" ranks the
dispatch-bound entries and verifies that a claimed job-elimination
actually eliminated jobs.

Usage: python tools/job_profile.py [sf_dir] [query ...]
Prints one line per query: name, n_jobs, wall seconds (1 warmed run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf annotations resolve lazily)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from vector_db_spark.queries import QUERIES  # noqa: E402
from vector_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark("job_profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = [n for n in HEADLINE if not only or n in only]
    out = {}
    for name in names:
        fn = QUERIES[name]
        # warm (codegen/planning)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        group = f"profile_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("idle", "idle")
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        out[name] = {"n_jobs": len(jobs), "wall_sec": round(wall, 3)}
        print(f"{name:35s} jobs={len(jobs):3d} wall={wall:7.3f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
