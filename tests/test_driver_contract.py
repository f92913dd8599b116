"""Repo-side replica of the driver's attestation contract.

The driver canonicalizes every query's output with a pandas
``sort_values`` over all columns followed by a value hash; a container
column (``array<...>`` / ``map<...>``) is unhashable there and turns the
whole row red regardless of engine correctness (CORRECTNESS_r05:
``sketch_stats_orders``, ``TypeError: unhashable type: 'list'``).

These tests catch that class of regression before a driver round burns a
window slot (VERDICT r5 "Next round" #8):

* every registered query at sf0.001 must produce a schema free of
  Array/Map top-level columns (the exact shapes pandas' lexsort cannot
  hash), and
* the one previously-red query (``sketch_stats_orders``) additionally
  gets an engine-side error-bound assertion vs exact percentiles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


def _container_cols(schema: T.StructType) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType))
    ]


def test_all_registered_queries_canonicalizable(spark):
    """Driver-canonicalizer contract: no Array/Map output columns anywhere.

    Building each DataFrame is lazy for pure-declarative queries and runs
    the bounded eager prep (index fits, stream drains) for the rest — the
    same work the driver does, at the smallest fixture.
    """
    from concurrent.futures import ThreadPoolExecutor

    from vector_db_spark.queries import QUERIES

    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}

    def _check(item):
        name, fn = item
        try:
            return name, _container_cols(fn(spark, SF).schema), None
        except Exception as e:  # noqa: BLE001 - collect all failures
            return name, None, f"{type(e).__name__}: {e}"

    # Build the ~255 DataFrames from a small driver thread pool (r16,
    # VERDICT r15 next #1 — the serial sweep was 251 s of the suite's
    # wall, dominated by per-query bounded eager prep waiting on
    # sequential Spark jobs; concurrent driver threads overlap them,
    # guide §2.6). Same queries, same assertions, same failure
    # reporting — only the submission order changes, and query builders
    # are independent (each reads fixtures / its own artifacts).
    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, cols, err in pool.map(_check, sorted(QUERIES.items())):
            if err is not None:
                errs[name] = err
            elif cols:
                bad[name] = cols
    assert not errs, f"queries that failed to build at sf0.001: {errs}"
    assert not bad, f"container-typed output columns (driver-red): {bad}"


def test_oracles_are_subset_of_queries():
    from vector_db_spark.queries import ORACLES, QUERIES

    extra = set(ORACLES) - set(QUERIES)
    assert not extra, f"oracle entries without a query: {sorted(extra)}"


def test_sketch_stats_orders_error_bounds(spark):
    """The engine answer must sit within the sketches' stated error bounds
    of the exact values (HLL relative error ~2.3% at default p; KLL/GK
    percentile_approx with accuracy=10000 → rank error ≤ 1e-4·n)."""
    from vector_db_spark.queries import QUERIES
    from vector_db_spark.sources.fixtures import load_table

    got = QUERIES["sketch_stats_orders"](spark, SF).head()
    assert set(got.asDict()) == {
        "exact_custkeys", "p50_exact", "p90_exact", "p99_exact",
        "acd_ok", "p50_ok", "p90_ok", "p99_ok",
    }
    # every bound boolean must hold (this is what the oracle hash pins)
    for q in ("acd_ok", "p50_ok", "p90_ok", "p99_ok"):
        assert got[q] is True, q

    orders = load_table(spark, SF, "orders")
    exact = orders.agg(
        F.countDistinct("o_custkey").alias("nd"),
        F.expr("round(percentile(o_totalprice, 0.5), 6)").alias("p50"),
        F.expr("round(percentile(o_totalprice, 0.9), 6)").alias("p90"),
        F.expr("round(percentile(o_totalprice, 0.99), 6)").alias("p99"),
    ).head()
    assert got.exact_custkeys == exact.nd
    for got_col, ex_col in (
        ("p50_exact", "p50"), ("p90_exact", "p90"), ("p99_exact", "p99")
    ):
        assert got[got_col] == exact[ex_col], got_col


def _test_sources():
    """Concatenated source text of every test module (the hygiene
    corpus the rows-only pin check greps)."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    chunks = []
    for fn in sorted(os.listdir(here)):
        if fn.startswith("test_") and fn.endswith(".py"):
            with open(os.path.join(here, fn)) as f:
                chunks.append(f.read())
    return "\n".join(chunks)


def _unpinned(rows_only_names, corpus):
    """Rows-only gate names that no test references by name."""
    return [n for n in rows_only_names if n not in corpus]


# Rows-only gates whose pin lives under the OPERATOR's name rather than
# the gate name: gate -> the test function that pins the underlying
# operator's correctness claim (containment / recall / identity). A new
# rows-only gate must either be referenced by name in some test or added
# here pointing at a real pin — the meta-test verifies the target exists.
_ROWS_ONLY_PINS = {
    "ann_graph_nsw": "test_recall_at_reference_regime",
    "ann_ivf_probe": "test_ivf_recall_at_tuned_probe",
    "ann_ivf_batch_probe": "test_ivf_batch_reduced_probe_recall",
    "ann_lsh_filtered": "test_lsh_filtered_subset_of_exact_filtered",
    # bpe_vocab_docs, bpe_tokenize_docs, mmr_rerank_diverse,
    # quality_classifier_score and rocchio_expanded_search graduated to
    # hash-exact oracles in round 13 (VERDICT r12 #4) and left this map
    "opq_adc_knn": "test_opq_improves_on_pq_at_equal_budget",
    "pq_adc_knn": "test_adc_equals_distance_to_reconstruction",
    # pca_shortlist_search graduated to a hash-exact frozen-rotation
    # oracle in round 13 and left this map
    "semantic_dedup_clustered": "test_semantic_dedup_blocking_recall",
    "text_w2v_embed_ann": "test_w2v_feeds_ann_lifecycle",
}


def test_rows_only_gates_are_pinned_by_some_test():
    """VERDICT r11 #8 (rows-only hygiene): every registry gate WITHOUT an
    oracle gets only the driver's weak rows-only check, so each one must
    be pinned by at least one test — by gate-name reference in tests/
    source (the capped-MinHash containment pattern, test_text_dedup.py),
    or through the explicit _ROWS_ONLY_PINS map when the pin speaks the
    operator's name instead (the mapped test must itself exist). A
    future rows-only gate cannot land unpinned."""
    from vector_db_spark.queries import ORACLES, QUERIES

    rows_only = sorted(set(QUERIES) - set(ORACLES))
    assert rows_only, "registry shape changed: no rows-only gates at all?"
    corpus = _test_sources()
    missing = []
    for name in _unpinned(rows_only, corpus):
        pin = _ROWS_ONLY_PINS.get(name)
        if pin is None or f"def {pin}(" not in corpus:
            missing.append(name)
    assert not missing, (
        f"rows-only gates with NO test pinning them: {missing} — add a "
        "containment/recall/property pin (or a _ROWS_ONLY_PINS entry "
        "naming one) before registering a gate the oracle cannot check"
    )
    # the detector itself works: a synthetic unpinned entry is flagged
    # (name assembled at runtime so this file's own source can't pin it)
    fake = "__synthetic_" + "unpinned_gate__"
    assert _unpinned([fake], corpus) == [fake]
    # ...and a stale map entry (pin test deleted/renamed) would be caught
    assert ("def __no_such_" + "test__(") not in corpus
