"""EXPLAINS.md drift guard (VERDICT r12 #8).

EXPLAINS.md records the formatted physical plan of every bench headline
query — the performance contract SURVEY.md §9 commits to. It is
regenerated manually (tools/explain_audit.py), so through r12 a plan
regression could land silently and only surface as a bench anomaly a
round later. This test regenerates every plan and diffs the operator-
tree SKELETON (tools/explain_audit.skeleton: tree structure + operator
names, no literals/ids/paths) against the committed file — a new
exchange, a lost TakeOrderedAndProject, or a broadcast join degrading to
a shuffle join fails CI by query name.

Plans are COMPILED, never executed, so the sweep costs analysis time
only — except index builds (the ann_* entries probe PERSISTED artifacts,
so the suite builds them once, the bench's own split) and the handful of
queries that run bounded driver-side fits while CONSTRUCTING their
DataFrame.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
EXPLAINS = os.path.join(REPO, "EXPLAINS.md")


def _committed() -> tuple[str, dict[str, str]]:
    """(sf_dir the file was generated against, {query: skeleton})."""
    from tools.explain_audit import skeleton

    with open(EXPLAINS) as f:
        text = f.read()
    m = re.search(r"against `([^`]+)`", text)
    assert m, "EXPLAINS.md header lost its sf_dir line"
    out = {}
    for sec in re.split(r"^## ", text, flags=re.M)[1:]:
        name = sec.splitlines()[0].strip()
        block = re.search(r"```\n(.*?)\n```", sec, re.S)
        assert block, f"EXPLAINS.md section {name} has no plan block"
        out[name] = skeleton(block.group(1))
    return m.group(1), out


def test_explains_skeletons_match_current_plans(spark):
    from bench import HEADLINE, ann_search_suite
    from tools.explain_audit import skeleton
    from vector_db_spark.plans.inspect import explain_str
    from vector_db_spark.queries import QUERIES

    sf_dir, committed = _committed()
    if not os.path.isdir(sf_dir):
        pytest.skip(f"EXPLAINS.md was generated against missing {sf_dir}")

    # same plan set as tools/explain_audit.main
    from bench import highdim_suite

    _, searches, _ = ann_search_suite(
        spark, sf_dir, "/tmp/spark_graft_explain_drift_ann"
    )
    _, hd_searches = highdim_suite(
        spark, sf_dir, "/tmp/spark_graft_explain_drift_768"
    )
    searches = {**searches, **hd_searches}
    plans = (
        [(n, QUERIES[n]) for n in HEADLINE]
        + [(n, (lambda s, d, t=thunk: t())) for n, thunk in searches.items()]
        + [("delta_roundtrip", QUERIES["delta_roundtrip"])]
    )
    current_names = [n for n, _ in plans]
    assert sorted(current_names) == sorted(committed), (
        "EXPLAINS.md section set drifted from the headline set — "
        "regenerate with tools/explain_audit.py"
    )

    # compile plans from a small thread pool (r16 — plan compilation is
    # JVM-side Catalyst work; threads overlap the per-query py4j round
    # trips; same plan set, same skeleton comparison)
    from concurrent.futures import ThreadPoolExecutor

    def _one(item):
        name, fn = item
        return name, skeleton(explain_str(fn(spark, sf_dir), "formatted"))

    drifted = []
    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, cur in pool.map(_one, plans):
            if cur != committed[name]:
                drifted.append(f"--- {name} ---\ncommitted:\n"
                               f"{committed[name]}\ncurrent:\n{cur}")
    assert not drifted, (
        f"{len(drifted)} plan skeleton(s) drifted from EXPLAINS.md "
        "(regenerate with tools/explain_audit.py ONLY if the change is "
        "intentional):\n" + "\n".join(drifted[:5])
    )
