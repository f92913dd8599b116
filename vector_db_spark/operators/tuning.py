"""Recall-targeted knob tuning for the ANN families.

The reference HARDCODES its search effort — ``ef_search = 200`` baked
into the handler (/root/reference/src/router/handle/
search_index_handle.rs:80) — so every deployment pays the same probe
cost regardless of its recall needs. This module answers the question
the hardcode dodges: *which knob value do I deploy?*  Given a bounded
sample of real queries and a recall target, it finds the CHEAPEST
setting whose recall@k against the exact operator (over the same live
rows, same metric) meets the target.

Cost model: every evaluation is ONE distributed batch-search job over
the sample (the sample is the bounded side — identical contract to
`search_batch`), so tuning cost is (#evaluations) × (one probe job).
The search strategies keep #evaluations logarithmic:

- `tune_ivf` — recall is monotone in ``nprobe`` (more cells can only
  add candidates), so geometric ascent (1, 2, 4, …, nlist) finds a
  passing value, then binary search pins the MINIMAL passing nprobe.
- `tune_graph` — two knobs. Recall is monotone in ``nprobe`` but only
  empirically-monotone in ``ef_search`` (a wider beam explores more of
  each cell's NSW graph), so the tuner walks a cost-ordered ladder of
  (nprobe, ef) pairs (cost ≈ nprobe · ef, the number of beam
  expansions actually paid) and returns the first pair that passes —
  minimal in the ladder's cost order.

At 100 TB this runs on a sampled query log at deployment time (or on a
retrain cadence — quantizer drift moves the recall curve); the chosen
knobs then serve until the next `retrain`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import batch_knn


def _topk_sets(rows, query_id_col: str, id_col: str) -> dict:
    out: dict = {}
    for r in rows:
        out.setdefault(r[query_id_col], set()).add(r[id_col])
    return out


def _recall(exact: dict, approx: dict) -> float:
    per_q = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    return sum(per_q) / len(per_q) if per_q else 1.0


def _exact_sets(
    corpus: DataFrame,
    sample_queries: DataFrame,
    k: int,
    *,
    metric: str,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
) -> dict:
    rows = batch_knn(
        corpus,
        sample_queries,
        k,
        metric=metric,
        vec_col=vec_col,
        id_col=id_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    ).collect()
    return _topk_sets(rows, query_id_col, id_col)


def tune_ivf(
    index,
    sample_queries: DataFrame,
    k: int = 10,
    recall_target: float = 0.95,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> dict:
    """Minimal ``nprobe`` with recall@k ≥ ``recall_target`` on the
    sample, vs exact search over the index's live rows.

    Returns ``{"nprobe": n, "recall": r, "evals": m}``; if even a full
    probe misses the target (possible only when the sample's exact sets
    are tombstone-filtered differently — full probe is lossless by
    construction) the full-probe setting is returned with its recall.
    """
    if not 0.0 < recall_target <= 1.0:
        raise ValueError("recall_target must be in (0, 1]")
    from vector_db_spark.operators.ann import _CLUSTER_COL

    nlist = len(index.centroids)
    sample = sample_queries.localCheckpoint()
    exact = _exact_sets(
        index._live().drop(_CLUSTER_COL),
        sample,
        k,
        metric=index.metric,
        id_col=index.id_col,
        vec_col=index.vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    )

    evals = 0
    recalls: dict[int, float] = {}

    def measure(nprobe: int) -> float:
        nonlocal evals
        if nprobe not in recalls:
            evals += 1
            rows = index.search_batch(
                sample,
                k,
                nprobe=nprobe,
                query_id_col=query_id_col,
                query_vec_col=query_vec_col,
            ).collect()
            recalls[nprobe] = _recall(
                exact, _topk_sets(rows, query_id_col, index.id_col)
            )
        return recalls[nprobe]

    # geometric ascent to the first passing power of two
    lo, hi = 0, None
    n = 1
    while True:
        r = measure(min(n, nlist))
        if r >= recall_target:
            hi = min(n, nlist)
            break
        lo = min(n, nlist)
        if n >= nlist:
            return {"nprobe": nlist, "recall": r, "evals": evals}
        n *= 2
    # binary refine to the minimal passing nprobe (recall monotone)
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if measure(mid) >= recall_target:
            hi = mid
        else:
            lo = mid
    return {"nprobe": hi, "recall": recalls[hi], "evals": evals}


def _probe_ladder(nlist: int) -> list[int]:
    """Geometric probe rungs 1, 2, 4, ... capped at nlist (shared by
    tune_graph and the shortlist ladder walk — one definition)."""
    probes = []
    n = 1
    while n < nlist:
        probes.append(n)
        n *= 2
    probes.append(nlist)
    return probes


def tune_graph(
    index,
    sample_queries: DataFrame,
    k: int = 10,
    recall_target: float = 0.95,
    ef_ladder: tuple[int, ...] | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> dict:
    """Cheapest (nprobe, ef_search) on a cost-ordered ladder with
    recall@k ≥ ``recall_target`` on the sample.

    ``ef_ladder`` defaults to (2k, 4k, 8k, 16k) capped below by 16 —
    see the in-body note for why the k-floor rung was removed (r15).
    Returns ``{"nprobe": n, "ef_search": ef, "recall": r, "evals": m}``;
    falls back to the most expensive rung (with its recall) when nothing
    passes.
    """
    if not 0.0 < recall_target <= 1.0:
        raise ValueError("recall_target must be in (0, 1]")
    from vector_db_spark.operators.ann import _CLUSTER_COL
    from vector_db_spark.operators.tombstones import apply_tombstones

    # O(1) driver state — a distinct().count() here was a full scan +
    # shuffle of the corpus-sized graph table before tuning even started;
    # cells absent from the graph hold no rows, so probing them is a no-op
    nlist = len(index.centroids)
    sample = sample_queries.localCheckpoint()
    live_nodes = apply_tombstones(
        index.graph, index.id_col, index.tombstones
    ).select(index.id_col, index.vec_col)
    exact = _exact_sets(
        live_nodes,
        sample,
        k,
        metric=index.metric,
        id_col=index.id_col,
        vec_col=index.vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    )

    if ef_ladder is None:
        # floor 2k (was max(16, k)): the k-floor rung was the one tuned
        # point that failed to transfer across corpus scale — ef=16 at
        # k=10 measured 0.998 on the 2k-vector sf0.1 sample but 0.942 at
        # 200k vectors, while ef=2k=20 measured 0.954 there
        # (RECALL_sf10_r15.json). A beam narrower than 2k saves nothing
        # measurable on small corpora and is the first knob to break at
        # scale, so the ladder no longer offers it.
        ef_ladder = tuple(max(16, k * m) for m in (2, 4, 8, 16))
    probes = _probe_ladder(nlist)
    ladder = sorted(
        ((p, ef) for p in probes for ef in ef_ladder),
        key=lambda t: (t[0] * t[1], t[0]),
    )

    evals = 0
    last = None
    for nprobe, ef in ladder:
        evals += 1
        rows = index.search_batch(
            sample,
            k,
            nprobe=nprobe,
            ef_search=ef,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        ).collect()
        r = _recall(exact, _topk_sets(rows, query_id_col, index.id_col))
        last = {"nprobe": nprobe, "ef_search": ef, "recall": r, "evals": evals}
        if r >= recall_target:
            return last
    return last


def tune_lsh(
    index,
    sample_queries: DataFrame,
    k: int = 10,
    recall_target: float = 0.95,
    radius_ladder: tuple[int, ...] | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> dict:
    """Minimal ``probe_radius`` with recall@k ≥ ``recall_target`` —
    recall is monotone in the radius (a wider Hamming ball can only add
    candidate buckets; radius = n_bits probes everything), so the first
    passing rung of an ascending ladder is minimal. ``radius_ladder``
    defaults to (1, 2, 3) capped at n_bits; rungs whose probe set would
    blow the 2048-mask ceiling are skipped (that regime wants fewer bits
    at build time, not a wider probe). Exact sets are batch cosine kNN
    over the index's live rows. Returns
    ``{"probe_radius": r, "recall": x, "evals": m}``; the widest
    feasible rung (with its recall) when nothing passes."""
    from vector_db_spark.operators.ann import _PROBE_MASK_CAP, _probe_mask_count

    if not 0.0 < recall_target <= 1.0:
        raise ValueError("recall_target must be in (0, 1]")
    n_bits = index.planes.shape[1]
    if radius_ladder is None:
        radius_ladder = tuple(r for r in (1, 2, 3) if r <= n_bits) or (n_bits,)
    feasible = [
        r for r in radius_ladder if _probe_mask_count(n_bits, r) <= _PROBE_MASK_CAP
    ]
    if not feasible:
        raise ValueError(
            f"every rung of {radius_ladder} over n_bits={n_bits} exceeds "
            f"the {_PROBE_MASK_CAP}-mask probe ceiling; rebuild with fewer bits"
        )
    sample = sample_queries.localCheckpoint()
    corpus = (
        index._live()
        .select(
            F.col("id").alias(index.id_col), F.col("vec").alias(index.vec_col)
        )
        .dropDuplicates([index.id_col])
    )
    exact = _exact_sets(
        corpus,
        sample,
        k,
        metric="cosine",
        id_col=index.id_col,
        vec_col=index.vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    )
    evals = 0
    last = None
    for r in feasible:
        evals += 1
        rows = index.search_batch(
            sample,
            k,
            probe_radius=r,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        ).collect()
        rec = _recall(exact, _topk_sets(rows, query_id_col, index.id_col))
        last = {"probe_radius": r, "recall": rec, "evals": evals}
        if rec >= recall_target:
            return last
    return last


def _walk_shortlist_ladder(
    measure,
    nlist: int,
    n_rows,
    k: int,
    recall_target: float,
    shortlist_ladder: tuple[int, ...] | None,
) -> dict:
    """Shared (nprobe, shortlist) walk for every shortlist-rerank family
    (IVF-PQ/SQ/OPQ, both PLAID variants): cost-ordered ladder
    (cost ≈ nprobe · shortlist), first pass wins; on exhaustion the
    shortlist escalates geometrically at full probe, bounded by the
    population ``n_rows`` (a callable, paid only on escalation) — where
    full probe + full shortlist degenerates to exact rerank (recall 1.0),
    so it terminates. ``measure(nprobe, shortlist) -> recall``."""
    if shortlist_ladder is None:
        shortlist_ladder = tuple(k * m for m in (2, 4, 8, 16))
    probes = _probe_ladder(nlist)
    ladder = sorted(
        ((p, sl) for p in probes for sl in shortlist_ladder),
        key=lambda t: (t[0] * t[1], t[0]),
    )
    evals = 0
    last = None
    for nprobe, sl in ladder:
        evals += 1
        r = measure(nprobe, sl)
        last = {"nprobe": nprobe, "shortlist": sl, "recall": r, "evals": evals}
        if r >= recall_target:
            return last
    cap = n_rows()
    # seed from the LARGEST rung, not the last list element — the ladder
    # walk re-sorts by cost, so a caller-supplied unsorted ladder would
    # otherwise make the escalation re-measure rungs already evaluated
    sl = max(shortlist_ladder)
    while sl < cap:
        sl = min(2 * sl, cap)
        evals += 1
        r = measure(nlist, sl)
        last = {"nprobe": nlist, "shortlist": sl, "recall": r, "evals": evals}
        if r >= recall_target:
            return last
    return last


def tune_ivfpq(
    index,
    sample_queries: DataFrame,
    k: int = 10,
    recall_target: float = 0.95,
    shortlist_ladder: tuple[int, ...] | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> dict:
    """Cheapest (nprobe, shortlist) on a cost-ordered ladder with
    recall@k ≥ ``recall_target`` for the IVF-PQ family.

    Cost proxy = nprobe · shortlist: ADC scan bytes scale with nprobe,
    the exact-rerank join with shortlist — recall is monotone in both,
    so walking the ladder in cost order and stopping at the first pass
    is minimal in that order. ``shortlist_ladder`` defaults to
    (2k, 4k, 8k, 16k). Returns
    ``{"nprobe": n, "shortlist": L, "recall": r, "evals": m}``; the most
    expensive rung (with its recall) when nothing passes."""
    if not 0.0 < recall_target <= 1.0:
        raise ValueError("recall_target must be in (0, 1]")
    from vector_db_spark.operators.ann import _CLUSTER_COL

    nlist = len(index.ivf.centroids)
    sample = sample_queries.localCheckpoint()
    exact = _exact_sets(
        index._live().drop(_CLUSTER_COL, "pq_codes"),
        sample,
        k,
        metric="l2",
        id_col=index.id_col,
        vec_col=index.vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    )
    # Quantization error can crowd true neighbors out of a k-proportional
    # shortlist (observed at the 10× sf1 fixture: (32, 160) → 0.936) —
    # the shared walk's full-probe escalation covers that regime.
    def measure(nprobe: int, sl: int) -> float:
        rows = index.search_batch(
            sample,
            k,
            nprobe=nprobe,
            shortlist=sl,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        ).collect()
        return _recall(exact, _topk_sets(rows, query_id_col, index.id_col))

    return _walk_shortlist_ladder(
        measure,
        nlist,
        lambda: index._live().count(),
        k,
        recall_target,
        shortlist_ladder,
    )


def tune_maxsim(
    index,
    sample_queries: DataFrame,
    k: int = 10,
    recall_target: float = 0.95,
    shortlist_ladder: tuple[int, ...] | None = None,
    query_id_col: str = "query_id",
    token_vec_col: str = "token_vec",
    token_id_col: str = "token_id",
) -> dict:
    """Cheapest (nprobe, shortlist) for the PLAID MaxSim families —
    `MaxSimIvfIndex` (raw token store) and `MaxSimPqIndex` (residual-PQ
    codes) both expose the token-level coarse quantizer as ``.ivf``, so
    one tuner serves the whole multi-vector ladder — against the EXACT
    batch MaxSim operator over the index's live token rows. One
    distributed batch job per ladder rung (the sample is the bounded
    side). When the cost-ordered ladder exhausts below target (the
    compressed family's ADC-quality regime), the shortlist escalates
    geometrically at full probe, bounded by the doc population — where
    full probe + all-docs shortlist IS exact rerank (recall 1.0), so it
    terminates. Returns the same shape as ``tune_ivfpq``."""
    if not 0.0 < recall_target <= 1.0:
        raise ValueError("recall_target must be in (0, 1]")
    from vector_db_spark.operators.ann import _CLUSTER_COL
    from vector_db_spark.operators.late_interaction import maxsim_search_batch

    nlist = len(index.ivf.centroids)
    sample = sample_queries.localCheckpoint()
    exact_rows = maxsim_search_batch(
        index.ivf._live().drop(_CLUSTER_COL),
        sample,
        k,
        doc_col=index.doc_col,
        vec_col=index.vec_col,
        query_id_col=query_id_col,
        token_vec_col=token_vec_col,
        token_id_col=token_id_col,
    ).collect()
    exact = _topk_sets(exact_rows, query_id_col, index.doc_col)

    # Escalation ceiling is the DOC population (the shortlist bounds
    # docs): full probe + all-docs shortlist degenerates to the exact
    # operator, so the shared walk terminates at doc granularity too.
    def measure(nprobe: int, sl: int) -> float:
        rows = index.search_batch(
            sample,
            k,
            nprobe=nprobe,
            shortlist=sl,
            query_id_col=query_id_col,
            token_vec_col=token_vec_col,
            token_id_col=token_id_col,
        ).collect()
        return _recall(exact, _topk_sets(rows, query_id_col, index.doc_col))

    return _walk_shortlist_ladder(
        measure,
        nlist,
        lambda: index.ivf._live().select(index.doc_col).distinct().count(),
        k,
        recall_target,
        shortlist_ladder,
    )


def _exact_maxsim_range_sets(
    index,
    sample: DataFrame,
    threshold: float,
    query_id_col: str,
    token_vec_col: str,
    token_id_col: str,
) -> dict:
    """query_id -> TRUE in-range doc set for the MaxSim families: one
    exact batched range job over the index's live token rows (the
    coverage denominator; empty-true-set queries are vacuous, as in
    _exact_range_sets)."""
    from vector_db_spark.operators.ann import _CLUSTER_COL
    from vector_db_spark.operators.late_interaction import (
        maxsim_range_search_batch,
    )

    rows = maxsim_range_search_batch(
        index.ivf._live().drop(_CLUSTER_COL),
        sample,
        threshold,
        doc_col=index.doc_col,
        vec_col=index.vec_col,
        query_id_col=query_id_col,
        token_vec_col=token_vec_col,
        token_id_col=token_id_col,
    ).collect()
    return _topk_sets(rows, query_id_col, index.doc_col)


def tune_maxsim_range(
    index,
    sample_queries: DataFrame,
    threshold: float,
    coverage_target: float = 0.95,
    query_id_col: str = "query_id",
    token_vec_col: str = "token_vec",
    token_id_col: str = "token_id",
) -> dict:
    """Range twin of :func:`tune_maxsim` (both MaxSim families — the PQ
    family's range path verifies from the raw token rows its inner IVF
    retains, so one tuner serves both): minimal ``nprobe`` whose range
    COVERAGE against the exact batched MaxSim range meets
    ``coverage_target`` at the given score-floor threshold. Coverage is
    monotone in nprobe — probed cell sets grow into supersets, and a
    doc is a candidate as soon as ONE of its token rows lands in a
    probed cell — so the geometric ladder terminates at full probe
    (== exact). Returned rows are exact at every rung (full-token-set
    verify); coverage is the only quality axis, as with graph/lsh
    range. Returns ``{"nprobe": n, "coverage": c, "evals": m}``."""
    if not 0.0 < coverage_target <= 1.0:
        raise ValueError("coverage_target must be in (0, 1]")
    nlist = len(index.ivf.centroids)
    sample = sample_queries.localCheckpoint()
    exact = _exact_maxsim_range_sets(
        index, sample, threshold, query_id_col, token_vec_col, token_id_col
    )
    evals, last = 0, None
    for nprobe in _probe_ladder(nlist):
        evals += 1
        rows = index.range_search_batch(
            sample,
            threshold,
            nprobe=nprobe,
            query_id_col=query_id_col,
            token_vec_col=token_vec_col,
            token_id_col=token_id_col,
        ).collect()
        c = _recall(exact, _topk_sets(rows, query_id_col, index.doc_col))
        last = {"nprobe": nprobe, "coverage": c, "evals": evals}
        if c >= coverage_target:
            return last
    return last


def _exact_range_sets(
    corpus: DataFrame,
    sample_queries: DataFrame,
    threshold: float,
    *,
    metric: str,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
) -> dict:
    """query_id -> TRUE in-range id set (the coverage denominator), one
    batched exact range job. Queries with an empty true set don't appear
    and never count against coverage (coverage of nothing is vacuous)."""
    from vector_db_spark.operators.knn import batch_range_search

    rows = batch_range_search(
        corpus,
        sample_queries,
        threshold,
        metric=metric,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    ).collect()
    return _topk_sets(rows, query_id_col, id_col)


def tune_graph_range(
    index,
    sample_queries: DataFrame,
    threshold: float,
    coverage_target: float = 0.95,
    ef_ladder: tuple[int, ...] | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> dict:
    """Range twin of :func:`tune_graph` (VERDICT r11 #5): cheapest
    (nprobe, ef_search) whose range COVERAGE — |returned ∩ true|/|true|
    against the exact batched range scan — meets ``coverage_target`` at
    the given threshold. Every emitted row is exact by construction
    (graph range verifies per candidate), so coverage is the ONLY
    quality axis. ef is the STARTING beam width (per-cell saturation
    widens it), so coverage is far less ef-sensitive than top-k recall —
    nprobe dominates the ladder in practice. Returns ``{"nprobe": n,
    "ef_search": ef, "coverage": c, "evals": m}``; the most expensive
    rung when nothing passes."""
    if not 0.0 < coverage_target <= 1.0:
        raise ValueError("coverage_target must be in (0, 1]")
    from vector_db_spark.operators.tombstones import apply_tombstones

    nlist = len(index.centroids)
    sample = sample_queries.localCheckpoint()
    live_nodes = apply_tombstones(
        index.graph, index.id_col, index.tombstones
    ).select(index.id_col, index.vec_col)
    exact = _exact_range_sets(
        live_nodes, sample, threshold,
        metric=index.metric, id_col=index.id_col, vec_col=index.vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
    )
    if ef_ladder is None:
        ef_ladder = (16, 32, 64, 128, 256)
    ladder = sorted(
        ((p, ef) for p in _probe_ladder(nlist) for ef in ef_ladder),
        key=lambda t: (t[0] * t[1], t[0]),
    )
    evals, last = 0, None
    for nprobe, ef in ladder:
        evals += 1
        rows = index.range_search_batch(
            sample, threshold, nprobe=nprobe, ef_search=ef,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        ).collect()
        c = _recall(exact, _topk_sets(rows, query_id_col, index.id_col))
        last = {"nprobe": nprobe, "ef_search": ef, "coverage": c, "evals": evals}
        if c >= coverage_target:
            return last
    return last


def tune_lsh_range(
    index,
    sample_queries: DataFrame,
    threshold: float,
    coverage_target: float = 0.95,
    metric: str = "cosine",
    radius_ladder: tuple[int, ...] | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> dict:
    """Range twin of :func:`tune_lsh`: minimal ``probe_radius`` whose
    range coverage against the exact batched range scan meets
    ``coverage_target`` — coverage is monotone in the radius (a wider
    Hamming ball only adds candidate buckets). Same feasibility ceiling
    as tune_lsh. Returns ``{"probe_radius": r, "coverage": c,
    "evals": m}``; the widest feasible rung when nothing passes.

    The default ladder reaches one rung past tune_lsh's (radius 4):
    range coverage of a wide threshold needs more of the Hamming ball
    than top-k recall does — the true match set spans buckets a top-k
    frontier never touches (measured sf0.01, n_bits=8: radius 3 covered
    0.92 of the widest cosine threshold, radius 4 clears the target)."""
    from vector_db_spark.operators.ann import _PROBE_MASK_CAP, _probe_mask_count

    if not 0.0 < coverage_target <= 1.0:
        raise ValueError("coverage_target must be in (0, 1]")
    n_bits = index.planes.shape[1]
    if radius_ladder is None:
        radius_ladder = (
            tuple(r for r in (1, 2, 3, 4) if r <= n_bits) or (n_bits,)
        )
    feasible = [
        r for r in radius_ladder if _probe_mask_count(n_bits, r) <= _PROBE_MASK_CAP
    ]
    if not feasible:
        raise ValueError(
            f"every rung of {radius_ladder} over n_bits={n_bits} exceeds "
            f"the {_PROBE_MASK_CAP}-mask probe ceiling; rebuild with fewer bits"
        )
    sample = sample_queries.localCheckpoint()
    corpus = (
        index._live()
        .select(
            F.col("id").alias(index.id_col), F.col("vec").alias(index.vec_col)
        )
        .dropDuplicates([index.id_col])
    )
    exact = _exact_range_sets(
        corpus, sample, threshold,
        metric=metric, id_col=index.id_col, vec_col=index.vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
    )
    evals, last = 0, None
    for r in feasible:
        evals += 1
        rows = index.range_search_batch(
            sample, threshold, metric=metric, probe_radius=r,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        ).collect()
        c = _recall(exact, _topk_sets(rows, query_id_col, index.id_col))
        last = {"probe_radius": r, "coverage": c, "evals": evals}
        if c >= coverage_target:
            return last
    return last


def tune_collection(
    coll,
    sample_queries: DataFrame,
    k: int = 10,
    recall_target: float = 0.95,
    persist: bool = False,
    range_threshold: float | None = None,
    **tuner_kwargs,
) -> dict:
    """One-call tuning for a catalog collection: dispatch the family's
    tuner against the index the collection serves from, and (with
    ``persist=True``) write the chosen knobs back via
    ``set_serving_params`` so every subsequent library/HTTP search serves
    at the tuned operating point — the full tune → persist → serve loop
    the reference's baked-in ``ef_search = 200`` hardcode
    (search_index_handle.rs:80) has no answer to.

    ``sample_queries`` is ``(query_id, query_vec)`` for single-vector
    families and the long-format ``(query_id, token_id, token_vec)``
    frame for the MaxSim families. The IVF-SQ/OPQ families are measured
    through ``Collection.search_batch`` itself — their codes layouts
    drop raw vectors, so the served path's exact rerank against the
    collection's live scan is part of what is being tuned. Requires a
    current index (same staleness contract as ``search``). Returns the
    family tuner's dict; non-knob fields (recall, evals) are stripped
    before persisting."""
    itype = coll.info.index_type
    if itype == "exact":
        return {"recall": 1.0, "evals": 0}  # exact search: nothing to tune
    iv = coll._indexed_version()
    if iv is None:
        raise ValueError("no index built; call build_index() first")
    if iv != coll.info.version:
        raise ValueError(
            f"index built at v{iv} but collection is at "
            f"v{coll.info.version}; call build_index() to rebuild"
        )
    idx = coll._load_index()
    if itype == "ivf":
        out = tune_ivf(idx, sample_queries, k, recall_target, **tuner_kwargs)
    elif itype == "graph":
        out = tune_graph(idx, sample_queries, k, recall_target, **tuner_kwargs)
    elif itype == "ivfpq":
        out = tune_ivfpq(idx, sample_queries, k, recall_target, **tuner_kwargs)
    elif itype in ("maxsim", "maxsim_pq"):
        out = tune_maxsim(idx, sample_queries, k, recall_target, **tuner_kwargs)
    elif itype == "lsh":
        out = tune_lsh(idx, sample_queries, k, recall_target, **tuner_kwargs)
    else:  # ivfsq / ivfopq: measure the served path (rerank included)
        out = _tune_served_shortlist(
            coll, idx, sample_queries, k, recall_target, **tuner_kwargs
        )
    if range_threshold is not None and itype in ("maxsim", "maxsim_pq"):
        # Joint range target for the MaxSim families (round 12): the
        # persisted nprobe serves both search and range_search, so take
        # the per-knob max (coverage and recall are both monotone in
        # nprobe) and re-measure both axes at the merged point.
        rng = tune_maxsim_range(
            idx, sample_queries, range_threshold,
            coverage_target=recall_target,
        )
        merged_nprobe = max(out.get("nprobe", 1), rng["nprobe"])
        out["nprobe"] = merged_nprobe
        exact_rng = _exact_maxsim_range_sets(
            idx, sample_queries, range_threshold,
            "query_id", "token_vec", "token_id",
        )
        rng_rows = idx.range_search_batch(
            sample_queries, range_threshold, nprobe=merged_nprobe
        ).collect()
        out["range_coverage"] = _recall(
            exact_rng, _topk_sets(rng_rows, "query_id", idx.doc_col)
        )
        out["recall"] = _measure_maxsim_recall(
            idx, sample_queries, k,
            nprobe=merged_nprobe, shortlist=out.get("shortlist"),
        )
    if range_threshold is not None and itype in ("graph", "lsh"):
        # Joint range target (VERDICT r11 #5): the persisted knobs serve
        # BOTH Collection.search and Collection.range_search, so when a
        # range threshold is declared the operating point must also meet
        # range coverage at it. Tune range independently, take the
        # per-knob max (coverage/recall are monotone in nprobe and
        # probe_radius, empirically monotone in ef — tune_graph's own
        # caveat), then RE-MEASURE both axes at the merged point so the
        # reported numbers describe the knobs actually persisted.
        if itype == "graph":
            rng = tune_graph_range(
                idx, sample_queries, range_threshold,
                coverage_target=recall_target,
            )
        else:
            rng = tune_lsh_range(
                idx, sample_queries, range_threshold,
                coverage_target=recall_target, metric=coll.info.metric,
            )
        merged = {
            knob: max(out[knob], rng[knob])
            for knob in ("nprobe", "ef_search", "probe_radius")
            if knob in out and knob in rng
        }
        out.update(merged)
        out["range_coverage"] = _measure_range_coverage(
            coll, idx, sample_queries, range_threshold, merged
        )
        out["recall"] = _measure_topk_recall(
            coll, idx, sample_queries, k, merged
        )
    if persist:
        from vector_db_spark.operators.collections import SERVING_KNOBS

        knobs = {
            key: val
            for key, val in out.items()
            if key in SERVING_KNOBS.get(itype, ())
        }
        coll.set_serving_params(**knobs)
    return out


def _measure_range_coverage(
    coll, idx, sample_queries: DataFrame, threshold: float, knobs: dict
) -> float:
    """Range coverage of the index at the given knobs vs the exact
    batched range scan over the collection's live rows — one probe job
    plus one exact job (the final joint-tuning re-measure)."""
    info = coll.info
    exact = _exact_range_sets(
        coll.scan(), sample_queries, threshold,
        metric=info.metric, id_col=info.id_col, vec_col=info.vec_col,
        query_id_col="query_id", query_vec_col="query_vec",
    )
    if info.index_type == "lsh":
        rows = idx.range_search_batch(
            sample_queries, threshold, metric=info.metric, **knobs
        ).collect()
    else:
        rows = idx.range_search_batch(
            sample_queries, threshold, **knobs
        ).collect()
    return _recall(exact, _topk_sets(rows, "query_id", info.id_col))


def _measure_topk_recall(
    coll, idx, sample_queries: DataFrame, k: int, knobs: dict
) -> float:
    """Top-k recall of the index at the given knobs vs exact batch kNN
    over the collection's live rows (the final joint-tuning re-measure)."""
    info = coll.info
    exact = _exact_sets(
        coll.scan(), sample_queries, k,
        metric=info.metric, id_col=info.id_col, vec_col=info.vec_col,
        query_id_col="query_id", query_vec_col="query_vec",
    )
    rows = idx.search_batch(sample_queries, k, **knobs).collect()
    return _recall(exact, _topk_sets(rows, "query_id", info.id_col))


def _measure_maxsim_recall(
    idx, sample_queries: DataFrame, k: int, *, nprobe: int, shortlist
) -> float:
    """Top-k MaxSim recall at the given knobs vs the exact batch operator
    over the index's live token rows (the joint-tuning re-measure for the
    multi-vector families)."""
    from vector_db_spark.operators.ann import _CLUSTER_COL
    from vector_db_spark.operators.late_interaction import maxsim_search_batch

    exact_rows = maxsim_search_batch(
        idx.ivf._live().drop(_CLUSTER_COL),
        sample_queries,
        k,
        doc_col=idx.doc_col,
        vec_col=idx.vec_col,
    ).collect()
    exact = _topk_sets(exact_rows, "query_id", idx.doc_col)
    rows = idx.search_batch(
        sample_queries, k, nprobe=nprobe, shortlist=shortlist
    ).collect()
    return _recall(exact, _topk_sets(rows, "query_id", idx.doc_col))


def _tune_served_shortlist(
    coll,
    idx,
    sample_queries: DataFrame,
    k: int,
    recall_target: float,
    shortlist_ladder: tuple[int, ...] | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> dict:
    """(nprobe, shortlist) walk for the families whose codes layout drops
    raw vectors (IVF-SQ, IVF-OPQ): exact sets come from the collection's
    live scan and each rung is measured through ``Collection.search_batch``
    — the path that reranks against that scan — so the tuned knobs match
    serving exactly."""
    if not 0.0 < recall_target <= 1.0:
        raise ValueError("recall_target must be in (0, 1]")
    nlist = len(idx.ivf.centroids)
    sample = sample_queries.localCheckpoint()
    cur = coll.scan()
    exact = _exact_sets(
        cur,
        sample,
        k,
        metric=coll.info.metric,
        id_col=coll.info.id_col,
        vec_col=coll.info.vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    )

    def measure(nprobe: int, sl: int) -> float:
        rows = coll.search_batch(
            sample,
            k,
            nprobe=nprobe,
            shortlist=sl,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        ).collect()
        return _recall(exact, _topk_sets(rows, query_id_col, coll.info.id_col))

    return _walk_shortlist_ladder(
        measure, nlist, cur.count, k, recall_target, shortlist_ladder
    )
