"""Text-function and dedup-operator tests, incl. MinHash-LSH recall vs the
exact Jaccard operator (SURVEY.md §5 strategy item 3: the oracle-verified
exact op is the in-house ground truth)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    word_shingles,
)
from vector_db_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_neardup,
    minhash_signatures,
    simhash64,
    simhash_candidates,
)
from vector_db_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


def test_token_count_and_shingles(spark):
    df = spark.createDataFrame([("a b  c d",), ("x",)], "text string")
    rows = df.select(
        token_count(F.col("text")).alias("n"),
        word_shingles(F.col("text"), 3).alias("sh"),
    ).collect()
    assert rows[0].n == 4
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].n == 1
    assert rows[1].sh == []  # shorter than k -> empty, not null


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    res = {r.doc_id: (r.canonical_id, r.n_copies) for r in exact_dedup(df).collect()}
    assert res == {1: (1, 2), 2: (1, 2), 3: (3, 1)}


def test_jaccard_pairs_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5"),
            (2, "w1 w2 w3 w4 w5"),  # identical -> jaccard 1.0
            (3, "z1 z2 z3 z4 z5"),  # disjoint -> no pair
        ],
        "doc_id long, text string",
    )
    rows = jaccard_pairs(df, threshold=0.5).collect()
    assert [(r.a_id, r.b_id) for r in rows] == [(1, 2)]
    assert rows[0].jaccard == pytest.approx(1.0)


def test_minhash_identical_docs_always_collide(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "q r s t u v w")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(df, num_hashes=16)
    cands = lsh_candidate_pairs(sigs, num_hashes=16, bands=4).collect()
    assert (1, 2) in [(r.a_id, r.b_id) for r in cands]


def test_minhash_recall_vs_exact(spark):
    """LSH recall on real fixture data: at j >= 0.7 with 64 hashes / 16
    bands the s-curve gives ~1-(1-0.7^4)^16 ≈ 0.99 expected recall."""
    docs = load_table(spark, SF, "documents")
    exact = {
        (r.a_id, r.b_id)
        for r in jaccard_pairs(docs, threshold=0.7).collect()
    }
    assert len(exact) >= 3, "fixture should contain high-jaccard pairs"
    found = {
        (r.a_id, r.b_id)
        for r in minhash_neardup(docs, threshold=0.7).collect()
    }
    recall = len(found & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall} over {len(exact)} true pairs"
    assert found <= exact, "verification stage must kill false positives"


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # identical
            (3, "alpha beta gamma delta epsilon eta"),  # 1 word differs
            (4, "one two three four five six"),  # unrelated
        ],
        "doc_id long, text string",
    )
    hashes = simhash64(df)
    vals = {r.id: r.simhash for r in hashes.collect()}
    assert vals[1] == vals[2]
    # near-identical docs share most bits; unrelated docs differ in ~half
    ham_13 = bin((vals[1] ^ vals[3]) & (2**64 - 1)).count("1")
    ham_14 = bin((vals[1] ^ vals[4]) & (2**64 - 1)).count("1")
    assert 0 < ham_13 < ham_14
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_candidates(hashes, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0


def test_simhash_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_candidates(simhash64(df), max_hamming=4, chunks=4)


def test_lang_id_stopword_votes(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in that house"),
            (2, "der hund und die katze ist ein tier"),
            (3, "el perro y la casa de los gatos"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred for r in df.select(
        "doc_id", lang_id(F.col("text")).alias("pred")
    ).collect()}
    assert got == {1: "en", 2: "de", 3: "es"}


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    fps = [r.fp for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_quality_score_orders_sensibly(spark):
    df = spark.createDataFrame(
        [(1, "the cat is in the house and it is warm " * 5), (2, "@@ ## !!")],
        "doc_id long, text string",
    )
    rows = df.select("doc_id", quality_score(F.col("text")).alias("q")).collect()
    q = {r.doc_id: r.q for r in rows}
    assert q[1] > q[2]


def test_connected_components_transitive_chain(spark):
    from vector_db_spark.operators.dedup import connected_components, dedup_clusters

    # chain 1-2-3-4 plus isolated pair (10, 11): one component each
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    comp = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    clusters = {
        r.cluster_id: (r.n_members, list(r.member_ids))
        for r in dedup_clusters(pairs).collect()
    }
    assert clusters == {1: (4, [1, 2, 3, 4]), 10: (2, [10, 11])}


def test_connected_components_long_path_converges(spark):
    from vector_db_spark.operators.dedup import connected_components

    n = 30  # path graph: worst-case diameter for label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "a_id long, b_id long"
    )
    comp = connected_components(pairs, max_iter=40).collect()
    assert {r.cluster_id for r in comp} == {1}
    assert len(comp) == n


def test_star_contraction_matches_minlabel_on_random_graphs(spark):
    """The O(log n)-round large-star/small-star CC must agree with the
    independent min-label reference on arbitrary graphs (VERDICT r9 #4)."""
    import random

    from vector_db_spark.operators.dedup import (
        connected_components,
        connected_components_minlabel,
    )

    rng = random.Random(42)
    for _ in range(3):
        n = 50
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(35)
        ]
        pairs = [(a, b) for a, b in pairs if a != b] or [(0, 1)]
        df = spark.createDataFrame(pairs, "a_id long, b_id long")
        got = {r.id: r.cluster_id for r in connected_components(df).collect()}
        want = {
            r.id: r.cluster_id
            for r in connected_components_minlabel(df, max_iter=200).collect()
        }
        assert got == want


def test_star_contraction_chain_round_count(spark):
    """A 1000-node chain (worst case for propagation: diameter 1000) must
    converge in <= ceil(log2 n) + 3 alternating rounds."""
    import math

    from vector_db_spark.operators.dedup import _star_contract_rounds

    n = 1000
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(n)], "src long, dst long"
    )
    stars, rounds, converged = _star_contract_rounds(edges, max_iter=40)
    assert converged
    assert rounds <= math.ceil(math.log2(n + 1)) + 3, rounds
    # fixpoint is a star forest rooted at the component minimum (0)
    rows = stars.collect()
    assert {r.dst for r in rows} == {0}
    assert {r.src for r in rows} == set(range(1, n + 1))


def test_star_contraction_nonconvergence_warns_one_row_per_vertex(spark):
    """max_iter exhaustion must degrade SAFELY: a warning plus exactly
    one (id, cluster_id) row per vertex (min parent), never multiple
    contradictory labels from a non-forest edge set."""
    import warnings as _w

    from vector_db_spark.operators.dedup import connected_components

    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id long, b_id long"
    )
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        rows = connected_components(pairs, max_iter=1).collect()
    assert any("did not converge" in str(c.message) for c in caught)
    ids = [r.id for r in rows]
    assert len(ids) == len(set(ids)) == n + 1  # one row per vertex


def test_lsh_star_edges_span_buckets(spark):
    """Star edges connect exactly what the all-pairs candidates connect:
    same connected components, O(b) vs O(b^2) rows per bucket."""
    from vector_db_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        lsh_star_edges,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h"),
            (3, "a b c d e f g h"),
            (4, "q r s t u v w x"),
            (5, "q r s t u v w x"),
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(df, num_hashes=16)
    star = lsh_star_edges(sigs, num_hashes=16, bands=4)
    pairs = lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
    comp_star = {
        r.id: r.cluster_id for r in connected_components(star).collect()
    }
    comp_pairs = {
        r.id: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert comp_star == comp_pairs
    assert comp_star[2] == comp_star[1] and comp_star[5] == comp_star[4]
    # star emits strictly fewer rows for the 3-member bucket family
    assert star.count() <= pairs.count()


def test_lsh_candidate_pairs_max_bucket_cap(spark):
    """Beyond the cap a bucket emits its spanning star instead of all
    pairs: fewer rows, same components, capped output linear in bucket
    size."""
    from vector_db_spark.operators.dedup import connected_components

    docs = [(i, "same boilerplate text repeated verbatim here") for i in range(8)]
    docs.append((100, "completely different content words entirely"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = minhash_signatures(df, num_hashes=16)
    full = lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
    capped = lsh_candidate_pairs(sigs, num_hashes=16, bands=4, max_bucket=3)
    n_full, n_capped = full.count(), capped.count()
    assert n_full == 8 * 7 // 2  # identical docs: one 8-member bucket
    assert n_capped == 7  # star over the same bucket
    comp_f = {r.id: r.cluster_id for r in connected_components(full).collect()}
    comp_c = {r.id: r.cluster_id for r in connected_components(capped).collect()}
    assert comp_f == comp_c
    with pytest.raises(ValueError, match="max_bucket"):
        lsh_candidate_pairs(sigs, num_hashes=16, bands=4, max_bucket=1)


def test_dedup_clusters_lsh_contains_exact_clusters(spark):
    """Every exact-Jaccard cluster on the fixture must land inside ONE
    LSH cluster (the dedup_clusters_lsh containment contract)."""
    from vector_db_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
        lsh_star_edges,
    )

    docs = load_table(spark, SF, "documents")
    exact = connected_components(jaccard_pairs(docs, threshold=0.6))
    exact_comp = {r.id: r.cluster_id for r in exact.collect()}
    lsh = connected_components(lsh_star_edges(minhash_signatures(docs)))
    lsh_comp = {r.id: r.cluster_id for r in lsh.collect()}
    # group exact members by exact cluster; each group maps into a single
    # LSH cluster (LSH may merge more — that is the coarser-or-equal side)
    by_cluster: dict = {}
    for doc, c in exact_comp.items():
        by_cluster.setdefault(c, []).append(doc)
    for c, members in by_cluster.items():
        lsh_ids = {lsh_comp.get(m) for m in members}
        assert len(lsh_ids) == 1 and None not in lsh_ids, (c, members, lsh_ids)


def test_sampling_is_repartition_proof_and_disjoint(spark):
    from vector_db_spark.operators.sampling import (
        deterministic_sample,
        train_eval_split,
    )
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
    a = {r.doc_id for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), 0.3, "doc_id").collect()
    }
    assert a == b  # partitioning must not change membership
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n

    train, ev = train_eval_split(docs, "doc_id", eval_fraction=0.1)
    t = {r.doc_id for r in train.collect()}
    e = {r.doc_id for r in ev.collect()}
    assert t.isdisjoint(e) and len(t) + len(e) == n


def test_sampling_validation(spark):
    from vector_db_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
        train_eval_split,
    )
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(docs, 1.5, "doc_id")
    with pytest.raises(ValueError, match="fractions"):
        stratified_sample(docs, "lang", {"en": -0.1}, "doc_id")
    with pytest.raises(ValueError, match="eval_fraction"):
        train_eval_split(docs, "doc_id", eval_fraction=0.0)


def test_bm25_basic_ranking(spark):
    from vector_db_spark.operators.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),          # high tf of one term
            (2, "spark query"),                 # two matching terms
            (3, "nothing relevant here"),       # no match
            (4, "query query spark query"),     # high tf both
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, "spark query", 10).collect()
    got_ids = [r.id for r in rows]
    assert 3 not in got_ids            # non-matching doc never scored
    assert got_ids[0] == 4             # most matches of both terms wins
    assert all(rows[i].score >= rows[i + 1].score for i in range(len(rows) - 1))

    with pytest.raises(ValueError, match="token"):
        bm25_topk(docs, "  ", 5)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def test_ngram_contamination(spark):
    from vector_db_spark.operators.decontam import ngram_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps away"),  # leak
            (2, "totally unrelated words only here"),  # clean
            (3, "quick brown fox appears"),  # one shared gram
            (4, "too short"),  # < n words, no grams
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in ngram_contamination(corpus, bench, n=3).collect()
    }
    assert set(rows) == {1, 3}  # clean + gram-less docs omitted
    # doc 1: 7 distinct 3-grams, 3 of them benchmark grams
    assert rows[1].n_grams == 7 and rows[1].n_contaminated == 3
    assert rows[1].contaminated_frac == pytest.approx(3 / 7)
    assert rows[3].n_grams == 2 and rows[3].n_contaminated == 1


def test_ngram_contamination_validation(spark):
    from vector_db_spark.operators.decontam import ngram_contamination

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n must be"):
        ngram_contamination(df, df, n=0)


def test_chunk_dedup_drops_cross_doc_boilerplate(spark):
    from vector_db_spark.operators.dedup import chunk_dedup

    boiler = " ".join(f"b{i}" for i in range(4))
    uniq_a = " ".join(f"a{i}" for i in range(4))
    uniq_b = " ".join(f"c{i}" for i in range(4))
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq_a}"),   # first copy of boiler: kept
            (2, f"{boiler} {uniq_b}"),   # later copy: boiler dropped
            (3, boiler),                  # every chunk a dup: doc disappears
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in chunk_dedup(docs, chunk_words=4).collect()}
    assert out[1].clean_text == f"{boiler} {uniq_a}"
    assert out[1].n_dropped == 0
    assert out[2].clean_text == uniq_b
    assert out[2].n_dropped == 1
    assert out[2].n_chunks == 2
    assert 3 not in out


def test_chunk_dedup_within_doc_and_partial_tail(spark):
    from vector_db_spark.operators.dedup import chunk_dedup

    # same chunk twice within one doc + a short trailing chunk
    docs = spark.createDataFrame(
        [(1, "x y x y z")],
        "doc_id long, text string",
    )
    out = chunk_dedup(docs, chunk_words=2).collect()[0]
    # chunks: "x y", "x y", "z" -> second "x y" dropped
    assert out.clean_text == "x y z"
    assert out.n_chunks == 3 and out.n_dropped == 1


def test_chunk_dedup_validates(spark):
    import pytest as _pytest

    from vector_db_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="chunk_words"):
        chunk_dedup(docs, chunk_words=0)


def test_semantic_dedup_blocking_recall(spark):
    from pyspark.sql import functions as F

    from vector_db_spark.operators.dedup import semantic_dedup, semantic_pairs
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
    emb.count()
    exact = semantic_pairs(emb, n_clusters=1, threshold=0.4)
    blocked = semantic_pairs(emb, n_clusters=4, threshold=0.4)
    exact_set = {(r.a_id, r.b_id) for r in exact.collect()}
    blocked_set = {(r.a_id, r.b_id) for r in blocked.collect()}
    # blocking can only MISS pairs, never invent them
    assert blocked_set <= exact_set
    assert exact_set, "fixture must contain planted near-dup pairs"
    # the fixture's planted pairs are WEAKLY similar (cos 0.4-0.5 — below
    # SemDeDup's intended near-identical regime), so only a loose floor
    # holds here; the true-duplicate recall test below uses planted
    # cos≈0.99 pairs where the paper's co-clustering premise applies
    assert len(blocked_set) / len(exact_set) >= 0.6
    # verdict shape: every id present exactly once; canonical rows kept
    verdict = semantic_dedup(emb, n_clusters=4, threshold=0.4)
    assert verdict.count() == emb.count()
    kept = verdict.filter("keep")
    assert kept.filter(F.col("canonical_id") != F.col("vec_id")).count() == 0
    emb.unpersist()


def test_semantic_dedup_finds_true_near_dups_across_clusters(spark):
    import numpy as np

    from vector_db_spark.operators.dedup import semantic_dedup, semantic_pairs

    # 4 well-separated concept blobs; 10 docs get a near-identical twin
    # (cos ≈ 0.999). SemDeDup blocking must find EVERY twin pair, because
    # near-identical vectors cannot land in different KMeans cells.
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    vid = 0
    twins = []
    for b in range(4):
        for i in range(25):
            v = centers[b] + rng.standard_normal(16) * 0.3
            rows.append((vid, [float(x) for x in v]))
            if i < 10 and b == 0:
                rows.append((vid + 1000, [float(x) for x in v + rng.standard_normal(16) * 1e-3]))
                twins.append((vid, vid + 1000))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.a_id, r.b_id) for r in semantic_pairs(df, n_clusters=4, threshold=0.999).collect()}
    assert set(twins) <= got
    verdict = semantic_dedup(df, n_clusters=4, threshold=0.999)
    dropped = {r.vec_id for r in verdict.filter("NOT keep").collect()}
    assert {b for _, b in twins} <= dropped  # the twin (higher id) drops
    assert not dropped & {a for a, _ in twins}  # canonicals survive


def test_semdedup_nlist_bounds_cell_size_at_any_scale():
    """The k ∝ n recipe must keep EXPECTED rows/cell bounded as the
    corpus grows 10^2..10^9 — the property whose absence (a capped
    nlist) silently reverts the per-cell O(|cell|^2) gram to quadratic
    growth at scale (VERDICT r2 wrong-item #2)."""
    from vector_db_spark.operators.dedup import semdedup_nlist

    for n in (100, 10_000, 128_000, 1_000_000, 100_000_000, 10**9):
        nlist = semdedup_nlist(n)
        assert nlist >= 8
        assert n / nlist <= 512, (n, nlist)  # expected cell size bounded
    # monotone: more data never means fewer cells
    sizes = [semdedup_nlist(n) for n in (10**4, 10**5, 10**6, 10**7)]
    assert sizes == sorted(sizes)


def test_semantic_pairs_reuses_prebuilt_cosine_ivf(spark):
    """The faiss composition: SemDeDup blocked by a PRE-BUILT cosine IVF
    (same params) must emit exactly the pairs of the inline build, and a
    non-cosine index is refused."""
    import pytest as _pytest

    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.dedup import semantic_pairs
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    inline = sorted(
        (r.a_id, r.b_id, round(r.sim, 9))
        for r in semantic_pairs(emb, n_clusters=4, threshold=0.4).collect()
    )
    idx = IvfIndex.build(emb, nlist=4, seed=42, max_iter=5, metric="cosine")
    reused = sorted(
        (r.a_id, r.b_id, round(r.sim, 9))
        for r in semantic_pairs(emb, threshold=0.4, ivf=idx).collect()
    )
    assert inline == reused

    l2 = IvfIndex.build(emb, nlist=4, seed=42, max_iter=2, metric="l2")
    with _pytest.raises(ValueError, match="cosine"):
        semantic_pairs(emb, threshold=0.4, ivf=l2)


def test_substring_dedup_catches_any_alignment(spark):
    """The stride-1 window catches a duplicated passage at DIFFERENT
    offsets in different docs — the case fixed-chunk dedup misses."""
    from vector_db_spark.operators.dedup import substring_dedup

    passage = " ".join(f"p{i}" for i in range(25))
    a = "a1 a2 a3 a4 a5 " + passage + " a6 a7"
    b = "b1 b2 " + passage + " b3"          # different offset
    c = "c1 c2 c3 c4 c5 c6 c7 c8 c9"        # shorter than the window
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in substring_dedup(df, window=20).collect()}
    # doc 1 is the first occurrence: untouched
    assert out[1].clean_text == a and out[1].n_removed == 0
    # doc 2 loses exactly the 25 passage tokens, frame tokens survive
    assert out[2].clean_text == "b1 b2 b3"
    assert out[2].n_removed == 25
    # doc 3: no window fits, unchanged
    assert out[3].clean_text == c and out[3].n_removed == 0


def test_substring_dedup_within_doc_repeat(spark):
    """A passage repeated INSIDE one document: the first copy survives,
    the second dies."""
    from vector_db_spark.operators.dedup import substring_dedup

    passage = " ".join(f"q{i}" for i in range(20))
    text = passage + " mid1 mid2 mid3 " + passage
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = substring_dedup(df, window=20).head()
    assert r.clean_text == passage + " mid1 mid2 mid3"
    assert r.n_removed == 20


def test_substring_dedup_validation(spark):
    from vector_db_spark.operators.dedup import substring_dedup

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="window"):
        substring_dedup(df, window=1)


def test_semantic_contamination(spark):
    """Embedding-space decontam: flagged set matches brute-force max
    cosine >= threshold, best match ties break by smallest bench id,
    and the edges (empty benchmark, zero vector, bad threshold) raise."""
    import math

    import pytest

    from vector_db_spark.operators.decontam import semantic_contamination

    bench_rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),  # duplicate direction: tie -> bench_id 1
        (3, [0.0, 1.0, 0.0]),
    ]
    corpus_rows = [
        (10, [2.0, 0.0, 0.0]),      # cos 1.0 with bench 1 AND 2
        (11, [0.0, 0.5, 0.0]),      # cos 1.0 with bench 3
        (12, [1.0, 1.0, 0.0]),      # cos ~0.707 with all
        (13, [0.0, 0.0, 4.0]),      # orthogonal to every bench vector
    ]
    schema = "doc_id long, embedding array<float>"
    corpus = spark.createDataFrame(corpus_rows, schema)
    bench = spark.createDataFrame(bench_rows, schema)

    got = {
        r.doc_id: (r.bench_id, round(r.cosine, 6))
        for r in semantic_contamination(corpus, bench, threshold=0.9).collect()
    }
    assert got == {10: (1, 1.0), 11: (3, 1.0)}  # tie broke to bench 1

    # lower threshold admits the diagonal doc at cos(45 deg)
    got2 = {
        r.doc_id: r.bench_id
        for r in semantic_contamination(corpus, bench, threshold=0.7).collect()
    }
    assert got2 == {10: 1, 11: 3, 12: 1}
    c = [
        r.cosine
        for r in semantic_contamination(corpus, bench, threshold=0.7).collect()
        if r.doc_id == 12
    ]
    assert c[0] == pytest.approx(math.sqrt(0.5), abs=1e-9)

    with pytest.raises(ValueError, match="threshold"):
        semantic_contamination(corpus, bench, threshold=1.5)
    with pytest.raises(ValueError, match="empty"):
        semantic_contamination(corpus, bench.filter("doc_id > 99"))
    zero = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], schema)
    with pytest.raises(ValueError, match="zero"):
        semantic_contamination(corpus, zero)
    # a zero CORPUS vector scores explicit cosine 0.0 (similar to
    # nothing), not a silently-dropped NaN (ADVICE r9): invisible at a
    # positive threshold, reported as 0.0 when the threshold admits it
    mixed = spark.createDataFrame(
        corpus_rows + [(14, [0.0, 0.0, 0.0])], schema
    )
    pos = {
        r.doc_id for r in
        semantic_contamination(mixed, bench, threshold=0.5).collect()
    }
    assert 14 not in pos
    full = {
        r.doc_id: r.cosine for r in
        semantic_contamination(mixed, bench, threshold=-1.0).collect()
    }
    assert full[14] == 0.0 and full[14] is not None


def test_lsh_rejects_mismatched_num_hashes(spark):
    """A signature shorter than num_hashes must ERROR — the tail bands
    would slice to [] and hash the whole corpus into one bucket (silent
    O(n^2) blowup)."""
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
    )
    sigs = minhash_signatures(df, num_hashes=16)
    with pytest.raises(Exception, match="num_hashes"):
        lsh_candidate_pairs(sigs, num_hashes=64, bands=16).collect()


def test_exact_dedup_null_text_rows_are_not_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    res = {r.doc_id: (r.canonical_id, r.n_copies) for r in exact_dedup(df).collect()}
    assert res[1] == (1, 2) and res[2] == (1, 2)
    assert res[3] == (3, 1) and res[4] == (4, 1)  # null-text: own group each


def test_minlabel_cc_survives_snowflake_ids(spark):
    """Label sums over snowflake-scale ids must not overflow int64 under
    ANSI mode (the convergence probe now sums DECIMAL)."""
    from vector_db_spark.operators.dedup import connected_components_minlabel

    base = 9_100_000_000_000_000_000 // 10  # ~9.1e17 per id
    pairs = spark.createDataFrame(
        [(base + i, base + i + 1) for i in range(12)], "a_id long, b_id long"
    )
    comp = connected_components_minlabel(pairs, max_iter=30).collect()
    assert {r.cluster_id for r in comp} == {base}
    assert len(comp) == 13


def test_minhash_neardup_capped_subset_of_uncapped(spark):
    """minhash_lsh_neardup_capped contract (VERDICT r10 #2): max_bucket
    only shrinks the CANDIDATE set, so the verified output is a subset of
    the uncapped query's pairs, every emitted pair still meets the exact
    Jaccard threshold, and on the real fixture — where no bucket exceeds
    the production cap — the two are identical. On an adversarial
    boilerplate corpus the capped variant emits the spanning star's
    verified pairs: O(b) rows, same duplicate components."""
    from vector_db_spark.operators.dedup import connected_components

    docs = load_table(spark, SF, "documents")
    full = {
        (r.a_id, r.b_id) for r in minhash_neardup(docs, threshold=0.6).collect()
    }
    capped = {
        (r.a_id, r.b_id)
        for r in minhash_neardup(docs, threshold=0.6, max_bucket=64).collect()
    }
    assert capped == full  # fixture buckets all under the cap

    boiler = spark.createDataFrame(
        [(i, "same boilerplate text repeated verbatim here again") for i in range(9)]
        + [(100, "completely different content words entirely elsewhere")],
        "doc_id long, text string",
    )
    b_full = minhash_neardup(boiler, threshold=0.9, num_hashes=16, bands=4)
    b_capped = minhash_neardup(
        boiler, threshold=0.9, num_hashes=16, bands=4, max_bucket=4
    )
    fp = {(r.a_id, r.b_id, r.jaccard) for r in b_full.collect()}
    cp = {(r.a_id, r.b_id, r.jaccard) for r in b_capped.collect()}
    assert cp <= fp and len(fp) == 9 * 8 // 2 and len(cp) == 8  # star, O(b)
    assert all(j >= 0.9 for _, _, j in cp)  # still exact-verified
    comp_f = {
        r.id: r.cluster_id
        for r in connected_components(b_full.select("a_id", "b_id")).collect()
    }
    comp_c = {
        r.id: r.cluster_id
        for r in connected_components(b_capped.select("a_id", "b_id")).collect()
    }
    assert comp_f == comp_c  # the star spans the same duplicate component
