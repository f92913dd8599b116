"""Unit tests for the repetition filters, PII redaction, and sequence
packing (the oracle queries prove fixture-scale parity; these pin the edge
semantics on crafted rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.functions.text import (
    dup_ngram_frac,
    email_count,
    phone_count,
    redact_pii,
    top_word_frac,
)
from vector_db_spark.operators.packing import pack_sequences


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t string").select(
        col(F.col("t")).alias("v")
    ).head().v


def test_top_word_frac(spark):
    assert _one(spark, "", top_word_frac) == 0.0
    assert _one(spark, "hello", top_word_frac) == 1.0
    assert _one(spark, "a b a a", top_word_frac) == pytest.approx(0.75)
    # single-space split contract: double spaces yield no empty tokens
    assert _one(spark, "a  b", top_word_frac) == pytest.approx(0.5)


def test_dup_ngram_frac(spark):
    assert _one(spark, "", dup_ngram_frac) == 0.0
    assert _one(spark, "one two", dup_ngram_frac) == 0.0  # one gram, no dup
    # "a b a b" -> grams [a b, b a, a b]: "a b" occurs twice -> 2/3
    assert _one(spark, "a b a b", dup_ngram_frac) == pytest.approx(2 / 3)


def test_redact_pii_order_and_counts(spark):
    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@foo-bar.org now", 1, 0, "mail <EMAIL> now"),
            ("call +44-123-4567 ok", 0, 1, "call <PHONE> ok"),
            # phone-looking digits inside an address: counts are raw-text
            # scans (both fire), but redaction is order-aware — the string
            # redacts as ONE email, never a half-redacted phone
            ("x a1-555-1234@mail.com", 1, 1, "x <EMAIL>"),
            ("both a@b.io and 1-222-3333", 1, 1, "both <EMAIL> and <PHONE>"),
            ("clean text", 0, 0, "clean text"),
        ],
        "t string, ne int, np int, want string",
    )
    rows = df.select(
        email_count(F.col("t")).alias("ne2"),
        phone_count(F.col("t")).alias("np2"),
        redact_pii(F.col("t")).alias("got"),
        "ne", "np", "want",
    ).collect()
    for r in rows:
        assert (r.ne2, r.np2, r.got) == (r.ne, r.np, r.want)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range((i * 37) % 90 + 1))) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_is_cumsum_chunking(docs):
    out = pack_sequences(docs, max_tokens=100, buckets=4, salt="t").collect()
    by_bucket: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.bucket, r.doc_id)):
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        cum = 0
        for r in rows:
            assert r.pack_id == cum // 100
            assert r.start_off == cum % 100
            cum += r.n_tokens


def test_pack_sequences_repartition_proof(docs):
    a = sorted(
        map(tuple, pack_sequences(docs, 64, buckets=8, salt="t").collect())
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(docs.repartition(7), 64, buckets=8, salt="t").collect(),
        )
    )
    assert a == b


def test_pack_sequences_count_col_and_validation(docs):
    with_counts = docs.select("doc_id", F.lit("ignored").alias("text"),
                              F.lit(10).alias("n"))
    out = pack_sequences(with_counts, 25, buckets=1, count_col="n").collect()
    assert {r.n_tokens for r in out} == {10}
    # 10-token docs into 25-token packs: offsets cycle 0,10,20,5,15,0,...
    offs = [r.start_off for r in sorted(out, key=lambda r: r.doc_id)][:5]
    assert offs == [0, 10, 20, 5, 15]
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, 0)
    with pytest.raises(ValueError, match="buckets"):
        pack_sequences(docs, 10, buckets=0)


def test_with_repetition_signals_matches_direct(spark):
    from vector_db_spark.functions.text import (
        dup_ngram_frac,
        top_word_frac,
        with_repetition_signals,
    )

    df = spark.createDataFrame(
        [(1, "a b a a"), (2, "one two one two one"), (3, ""), (4, "x")],
        "id long, text string",
    )
    direct = {
        r.id: (round(r.t, 9), round(r.d, 9))
        for r in df.select(
            "id",
            top_word_frac(F.col("text")).alias("t"),
            dup_ngram_frac(F.col("text"), 2).alias("d"),
        ).collect()
    }
    staged = {
        r.id: (round(r.top_word_frac, 9), round(r.dup_ngram_frac, 9))
        for r in with_repetition_signals(df, "text", 2).collect()
    }
    assert staged == direct


def test_unigram_lm_train_and_score(spark):
    from vector_db_spark.operators.lm import UnigramLm, train_unigram, score_documents

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a zz"), (3, "")],
        "doc_id long, text string",
    )
    lm = train_unigram(df, top_v=2)
    # vocab = top-2 by (count desc, token asc): a(4), b(1) beats zz(1) on token order
    assert lm.vocab == {"a": 4, "b": 1}
    assert lm.total_tokens == 6
    rows = {r.doc_id: r for r in score_documents(df, lm).collect()}
    import math

    lq = lambda c: math.floor(math.log((c if c > 0 else 0.5) / 6) * 1_000_000)
    assert rows[1].n_tokens == 4 and rows[1].oov_count == 0
    assert rows[1].logq_micro_sum == 3 * lq(4) + lq(1)
    assert rows[2].oov_count == 1
    assert rows[2].logq_micro_sum == lq(4) + lq(0)
    assert rows[3].n_tokens == 0 and rows[3].lm_score is None
    # score is mean nats/token of the micro-nat sum (Spark rounds HALF_UP;
    # python's round() is HALF_EVEN, so compare with a half-ulp tolerance)
    assert abs(rows[1].lm_score - rows[1].logq_micro_sum / 4e6) < 1e-6
    with pytest.raises(ValueError, match="total_tokens"):
        UnigramLm({}, 0)


def test_perplexity_filter_keeps_typical_docs(spark):
    from vector_db_spark.operators.lm import (
        perplexity_filter,
        score_documents,
        train_unigram,
    )

    rows = [(i, "the cat sat on the mat") for i in range(20)] + [
        (100, "zq xv qq zz vv xx")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_unigram(df, top_v=6)
    scored = score_documents(df, lm)
    kept = perplexity_filter(scored, min_score=-3.0)
    ids = {r.doc_id for r in kept.collect()}
    assert 100 not in ids and 0 in ids


def test_c4_filter_verdicts_first_failure_order(spark):
    from vector_db_spark.operators.filtering import filter_verdicts

    df = spark.createDataFrame(
        [
            (1, "tiny doc"),                           # too_short
            (2, " ".join(f"w{i}" for i in range(60))), # kept
            (3, " ".join(["x"] * 60)),                 # top_word (not word_len: len 1 < 2 min triggers first? sum_len=60, 2*n=120 -> word_len)
        ],
        "doc_id long, text string",
    )
    v = {r.doc_id: r.verdict for r in filter_verdicts(df).collect()}
    assert v[1] == "too_short"
    assert v[2] == "kept"
    assert v[3] == "word_len"  # mean token length 1 < 2 fires before top_word


def test_c4_keep_documents_subset(spark):
    from vector_db_spark.operators.filtering import filter_verdicts, keep_documents

    df = spark.createDataFrame(
        [(i, " ".join(f"tok{j}{i}" for j in range(80))) for i in range(10)]
        + [(99, "short")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in keep_documents(df).collect()}
    verdicts = {r.doc_id: r.verdict for r in filter_verdicts(df).collect()}
    assert kept == {d for d, v in verdicts.items() if v == "kept"}
    assert 99 not in kept


def test_importance_sample_monotone_and_deterministic(spark):
    from vector_db_spark.operators.sampling import importance_sample

    df = spark.createDataFrame(
        [(i, float(i % 100) / 100.0) for i in range(2000)], "id long, w double"
    )
    s1 = {r.id for r in importance_sample(df, F.col("w"), "id", salt="t").collect()}
    s2 = {
        r.id
        for r in importance_sample(
            df.repartition(7), F.col("w"), "id", salt="t"
        ).collect()
    }
    assert s1 == s2  # repartition-proof
    # weight 0 never kept; weight ~1 nearly always kept
    zero_w = {r.id for r in df.filter(F.col("w") == 0.0).collect()}
    assert not (s1 & zero_w)
    high = [r.id for r in df.filter(F.col("w") >= 0.95).collect()]
    assert len(s1 & set(high)) > 0.8 * len(high)


def test_centroid_vectors_wide_form(spark):
    import numpy as np
    from vector_db_spark.operators.vector_stats import centroid_vectors, label_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
        "label int, embedding array<float>",
    )
    wide = {r.label: r for r in centroid_vectors(df).collect()}
    assert np.allclose(wide[0].centroid, [2.0, 3.0])
    assert np.allclose(wide[1].centroid, [10.0, 20.0])
    assert wide[0].n_vecs == 2
    long = {(r.label, r.pos): r for r in label_centroids(df).collect()}
    assert long[(0, 0)].centroid == 2.0
    assert abs(long[(0, 0)].variance - 1.0) < 1e-9


def test_mmr_lambda_one_is_pure_relevance(spark):
    import numpy as np

    from vector_db_spark.operators.hybrid import mmr_rerank
    from vector_db_spark.operators.knn import knn

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(rng.standard_normal((30, 8)))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in rng.standard_normal(8)]
    got = [r.vec_id for r in mmr_rerank(df, q, 5, shortlist=30, lam=1.0).collect()]
    want = [r.vec_id for r in knn(df, q, 5, metric="cosine").collect()]
    assert got == want


def test_mmr_demotes_duplicate_of_top_hit(spark):
    from vector_db_spark.operators.hybrid import mmr_rerank

    # ids 1 and 2 are identical vectors (both ≈ the query); id 3 is
    # nearly orthogonal (slightly relevant). Pure relevance would return
    # [1, 2]; MMR must interleave
    # the diverse id 3 before the duplicate.
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.1, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = [r.vec_id for r in mmr_rerank(df, [1.0, 0.0], 3, shortlist=3, lam=0.4).collect()]
    assert got == [1, 3, 2]
    # selection order is recorded
    ranks = [r.rank for r in mmr_rerank(df, [1.0, 0.0], 3, shortlist=3, lam=0.4).collect()]
    assert ranks == [1, 2, 3]


def test_mmr_validation(spark):
    import pytest as _pytest

    from vector_db_spark.operators.hybrid import mmr_rerank

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, [1.0, 0.0], 1, lam=1.5)
    with _pytest.raises(ValueError, match="shortlist"):
        mmr_rerank(df, [1.0, 0.0], 5, shortlist=2)


def test_bigram_lm_backoff_arithmetic(spark):
    import math

    from vector_db_spark.operators.lm import (
        LQ_BACKOFF,
        score_documents_bigram,
        train_bigram,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    lm = train_bigram(docs, top_v=10, top_b=10)
    # corpus tokens: a,b,a,b,a,b,c -> total 7; bigrams: ab,ba,ab + ab,bc
    assert lm.uni.vocab == {"a": 3, "b": 3, "c": 1}
    assert lm.uni.total_tokens == 7
    assert set(lm.bigram_lq) == {"a b", "b a", "b c"}
    # p(b|a) = 3/3 -> lq 0
    assert lm.bigram_lq["a b"] == 0
    # p(a|b) = 1/3 (b starts 3 bigrams: ba, bc... b appears as t1 in
    # "b a" and "b c" plus the second "a b" doc-1 pair's predecessor —
    # ctx(b) counts b-as-first: doc1 has "b a"; doc2 "b c"; so ctx(b)=2? no:
    # doc1 bigrams: "a b","b a","a b" -> b first once; doc2: "a b","b c" ->
    # b first once => ctx(b)=2, cnt("b a")=1 -> p=1/2
    assert lm.bigram_lq["b a"] == math.floor(math.log(1 / 2) * 1_000_000)
    got = {r.doc_id: r for r in score_documents_bigram(docs, lm).collect()}
    # doc 1: first token 'a' unigram + pairs ab(0), ba(ln .5), ab(0)
    uni_a = lm.uni.logq_micro(3)
    assert got[1].logq_micro_sum == uni_a + 0 + lm.bigram_lq["b a"] + 0
    assert got[1].bigram_hits == 3
    # doc 3 (empty): zero tokens, NULL score
    assert got[3].n_tokens == 0 and got[3].lm_score is None
    # backoff path: a doc with an unseen pair 'c a' scores LQ_BACKOFF + uni(a)
    probe = spark.createDataFrame([(9, "c a")], "doc_id long, text string")
    row = score_documents_bigram(probe, lm).collect()[0]
    assert row.logq_micro_sum == lm.uni.logq_micro(1) + LQ_BACKOFF + uni_a
    assert row.bigram_hits == 0


def test_bigram_pmi_prefers_exclusive_pairs(spark):
    from vector_db_spark.operators.lm import bigram_pmi

    # "x y" always co-occur exclusively (3 times); "a b" pair exists but a
    # and b are each frequent alone -> PMI(x y) > PMI(a b)
    docs = spark.createDataFrame(
        [(1, "x y a"), (2, "x y b"), (3, "x y a b a b a b")],
        "doc_id long, text string",
    )
    rows = bigram_pmi(docs, min_count=3, top_n=5).collect()
    by_bigram = {r.bigram: r for r in rows}
    assert "x y" in by_bigram and "a b" in by_bigram
    assert by_bigram["x y"].pmi_micro > by_bigram["a b"].pmi_micro
    assert by_bigram["x y"].n_pair == 3
    # ranking is (pmi DESC, bigram ASC)
    pmis = [r.pmi_micro for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_norm_extremes_flags_planted_outlier(spark):
    from vector_db_spark.operators.vector_stats import norm_extremes

    rows = [(i, [1.0] * 4) for i in range(20)]
    rows.append((99, [30.0] * 4))  # giant norm
    rows.append((98, [0.0] * 4))   # zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = norm_extremes(df, k=2).collect()
    assert [r.vec_id for r in got] == [99, 98]
    assert got[0].norm_sq == 3600.0


def test_bpe_learns_textbook_merges(spark):
    from vector_db_spark.operators.bpe import END_OF_WORD, train_bpe

    # 'ab' appears in every word (weight 5); after merging 'a b', the pair
    # ('ab', EOW) dominates (weight 3: ab, ab, ab-final words)
    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab abd")],
        "doc_id long, text string",
    )
    model = train_bpe(docs, n_merges=2)
    assert model.merges[0][:2] == ("a", "b")
    assert model.merges[0][2] == 5
    assert model.merges[1][:2] == ("ab", END_OF_WORD)
    assert model.merges[1][2] == 3


def test_bpe_merge_is_leftmost_nonoverlapping(spark):
    from vector_db_spark.operators.bpe import BpeModel, tokenize_bpe

    docs = spark.createDataFrame([(1, "aaaa aaa")], "doc_id long, text string")
    model = BpeModel(merges=[("a", "a", 0)])
    row = tokenize_bpe(docs, model).collect()[0]
    # 'aaaa' -> [aa, aa, EOW]; 'aaa' -> [aa, a, EOW] (greedy, no chaining)
    from vector_db_spark.operators.bpe import END_OF_WORD as W

    assert list(row.tokens) == ["aa", "aa", W, "aa", "a", W]


def test_bpe_train_is_deterministic_and_tokenize_roundtrips(spark):
    from vector_db_spark.operators.bpe import END_OF_WORD, tokenize_bpe, train_bpe
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    m1 = train_bpe(docs, n_merges=5)
    m2 = train_bpe(docs, n_merges=5)
    assert m1.merges == m2.merges
    assert len(m1.merges) == 5
    toks = tokenize_bpe(docs.limit(20), m1)
    rows = toks.collect()
    assert all(r.n_tokens > 0 for r in rows)
    # concatenating a doc's tokens and dropping EOW reconstructs its words
    doc = docs.limit(1).collect()[0]
    got = next(r for r in tokenize_bpe(docs.limit(1), m1).collect() if r.doc_id == doc.doc_id)
    rebuilt = "".join(t for t in got.tokens).replace(END_OF_WORD, " ").strip()
    assert rebuilt == " ".join(doc.text.split())


def test_skipgram_pairs_window_edges(spark):
    from vector_db_spark.operators.packing import skipgram_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = {(r.center, r.context): r.n for r in skipgram_pairs(docs, window=1).collect()}
    # window 1 on "a b c": (a,b),(b,a),(b,c),(c,b)
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1, ("c", "b"): 1}
    got2 = {(r.center, r.context): r.n for r in skipgram_pairs(docs, window=2).collect()}
    assert got2[("a", "c")] == 1 and got2[("c", "a")] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window"):
        skipgram_pairs(docs, window=0)


def test_value_histogram_edges_and_clamp(spark):
    from vector_db_spark.operators.vector_stats import value_histogram

    df = spark.createDataFrame([(float(i),) for i in range(11)], "v double")
    got = {r.bin: r for r in value_histogram(df, "v", bins=5).collect()}
    # lo=0, hi=10, width=2: bins 0..4; v=10 clamps into bin 4
    assert sorted(got) == [0, 1, 2, 3, 4]
    assert got[0].n == 2 and got[4].n == 3  # 8, 9, 10
    assert got[0].bin_lo == 0.0 and got[4].bin_hi == 10.0
    import pytest as _pytest

    # constant column degenerates to a single bin (round-3 contract; the
    # old ValueError made a common QA input an error — ADVICE r2)
    out = value_histogram(
        spark.createDataFrame([(1.0,)], "v double"), "v"
    ).collect()
    assert len(out) == 1 and out[0].bin == 0 and out[0].n == 1

    # inverted explicit bounds still refuse
    with _pytest.raises(ValueError, match="hi must be >= lo"):
        value_histogram(
            spark.createDataFrame([(1.0,)], "v double"), "v", lo=2.0, hi=1.0
        )


def test_correlation_matrix_known_values(spark):
    from vector_db_spark.operators.vector_stats import correlation_matrix

    # y = 2x exactly -> corr 1; z anti-correlated with x -> corr -1
    rows = [(float(x), float(2 * x), float(-x)) for x in range(1, 6)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r.col_x, r.col_y): r.corr for r in correlation_matrix(df, ["x", "y", "z"]).collect()}
    assert abs(got[("x", "y")] - 1.0) < 1e-12
    assert abs(got[("x", "z")] + 1.0) < 1e-12
    assert abs(got[("y", "z")] + 1.0) < 1e-12


def test_rocchio_pulls_in_cluster_members(spark):
    import numpy as np

    from vector_db_spark.operators.hybrid import rocchio_expand
    from vector_db_spark.operators.knn import knn

    # beta=0 degenerates to the plain search
    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(rng.standard_normal((40, 8)))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in rng.standard_normal(8)]
    plain = [r.vec_id for r in knn(df, q, 5, metric="cosine").collect()]
    degen = [r.vec_id for r in rocchio_expand(df, q, 5, k_rel=5, beta=0.0).collect()]
    assert degen == plain

    # a tight cluster near (but not exactly at) the query: feedback from
    # the nearest member must pull the expanded query INTO the cluster,
    # ranking cluster members above the lone decoy that the raw query
    # prefers
    center = np.array([3.0, 0.0, 0.0, 0.0])
    cluster = [center + rng.normal(0, 0.05, 4) for _ in range(6)]
    decoy = np.array([1.0, 2.0, 0.0, 0.0])
    rows2 = [(i, [float(x) for x in v]) for i, v in enumerate(cluster)]
    rows2.append((99, [float(x) for x in decoy]))
    df2 = spark.createDataFrame(rows2, "vec_id long, embedding array<float>")
    q2 = [1.0, 1.0, 0.0, 0.0]  # between decoy and cluster
    expanded = [r.vec_id for r in rocchio_expand(df2, q2, 6, k_rel=3, beta=2.0).collect()]
    assert 99 not in expanded  # cluster crowds out the decoy after feedback


def test_chunk_documents_overlap_and_coverage(spark):
    from vector_db_spark.operators.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text), (2, "a"), (3, "")], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    d1 = [r for r in rows if r.doc_id == 1]
    # step 2 over 10 tokens: ceil((10-4)/2)+1 = 4 chunks
    assert [r.chunk_text for r in d1] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9",
    ]
    # consecutive chunks share exactly `overlap` tokens; every token covered
    assert all(r.chunk_len == 4 for r in d1)
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "a" and d2[0].chunk_len == 1
    assert not [r for r in rows if r.doc_id == 3]  # empty doc: no chunks
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_cap_per_group_deterministic_and_bounded(spark):
    from vector_db_spark.operators.sampling import cap_per_group

    rows = [(i, "big" if i < 30 else "small") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept1 = {r.doc_id for r in cap_per_group(df, "source", 5).collect()}
    kept2 = {r.doc_id for r in cap_per_group(df.repartition(7), "source", 5).collect()}
    assert kept1 == kept2  # repartition-proof lottery
    by_src = cap_per_group(df, "source", 5).groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in by_src)


def test_quality_classifier_separates_clean_from_gibberish(spark):
    from vector_db_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    clean = [
        "the quick brown fox jumps over the lazy dog and runs to the big field "
        "of green grass where it finds a quiet place to rest for a while",
        "a small team of engineers built the data pipeline that reads the "
        "tables and writes the results to a new store for the training run",
    ]
    junk = [
        "zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz",
        "!!!! #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____ ++++ ==== ;;;; ::::",
    ]
    rows = []
    # variant chosen by i // 2 so BOTH variants land in both the even-id
    # train half and the odd-id test half (a variant correlated with the
    # split would test generalization to text the model never saw)
    for i in range(40):
        rows.append((i, clean[(i // 2) % 2] + f" extra word{i}", 1))
    for i in range(40, 80):
        rows.append((i, junk[(i // 2) % 2] + f" x{i}", 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    train = df.filter("doc_id % 2 = 0")
    test = df.filter("doc_id % 2 = 1")
    model = train_quality_classifier(train)
    scored = score_quality(test, model).join(test.select("doc_id", "label"), "doc_id")
    n = scored.count()
    correct = scored.filter(
        (F.col("keep") & (F.col("label") == 1)) | (~F.col("keep") & (F.col("label") == 0))
    ).count()
    assert correct / n >= 0.95  # separable corpus: near-perfect holdout


def test_quality_classifier_agrees_with_teacher_on_fixture(spark):
    from vector_db_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
        weak_labels,
    )
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    labeled = docs.withColumn("label", weak_labels(docs))
    train = labeled.filter("doc_id % 2 = 0")
    held = labeled.filter("doc_id % 2 = 1")
    model = train_quality_classifier(train)
    scored = score_quality(held, model).join(held.select("doc_id", "label"), "doc_id")
    agree = scored.filter(
        (F.col("keep") & (F.col("label") == 1)) | (~F.col("keep") & (F.col("label") == 0))
    ).count()
    assert agree / scored.count() >= 0.8  # classifier mimics its teacher


def test_frozen_quality_scorer_matches_its_fit_and_teacher(spark):
    """The FROZEN serving model (the hash-exact gate's scorer) must stay
    a faithful snapshot: (a) its keep verdicts agree with the weak-label
    teacher on the held-out fixture half at the same >= 0.8 bar as a
    fresh fit, and (b) its logits match an independent driver-side fold
    of the frozen coefficients over the SAME featurization to 1e-6 — so
    the codegen'd expression scorer computes the model it claims to."""
    from vector_db_spark.operators.classifier import (
        FROZEN_QUALITY_COEFS,
        FROZEN_QUALITY_INTERCEPT,
        featurize,
        score_quality_frozen,
        weak_labels,
    )
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    held = docs.filter("doc_id % 2 = 1")
    scored = score_quality_frozen(held)
    labeled = held.withColumn("label", weak_labels(held)).select("doc_id", "label")
    joined = scored.join(labeled, "doc_id")
    agree = joined.filter(
        (F.col("keep") & (F.col("label") == 1))
        | (~F.col("keep") & (F.col("label") == 0))
    ).count()
    assert agree / joined.count() >= 0.8

    import math

    feats = featurize(held).select("doc_id", "features").collect()
    by_id = {int(r.doc_id): r.features for r in feats}
    for r in scored.collect():
        z = FROZEN_QUALITY_INTERCEPT
        for w, x in zip(FROZEN_QUALITY_COEFS, by_id[int(r.doc_id)]):
            z += w * float(x)
        assert math.isclose(z, float(r.quality_logit), abs_tol=1e-6)
        assert bool(r.keep) == (z >= 0 or math.isclose(z, 0.0, abs_tol=1e-9))


def test_bpe_save_load_roundtrip(spark, tmp_path):
    from vector_db_spark.operators.bpe import load_bpe, save_bpe, tokenize_bpe, train_bpe

    docs = spark.createDataFrame([(1, "ab ab abc")], "doc_id long, text string")
    m = train_bpe(docs, n_merges=2)
    save_bpe(m, str(tmp_path / "bpe"))
    r = load_bpe(str(tmp_path / "bpe"))
    assert r.merges == m.merges
    a = tokenize_bpe(docs, m).collect()[0]
    b = tokenize_bpe(docs, r).collect()[0]
    assert list(a.tokens) == list(b.tokens)


def test_mixture_sample_hits_target_proportions(spark):
    from vector_db_spark.operators.sampling import mixture_sample
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # rebalance three sources to 50/30/20
    targets = {"src0": 500_000, "src1": 300_000, "src2": 200_000}
    out = mixture_sample(docs, "source", targets).cache()
    counts = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert set(counts) <= set(targets)
    total = sum(counts.values())
    assert total > 0
    # floor rounding: each group within 1 row of its exact share
    for g, ppm in targets.items():
        assert abs(counts.get(g, 0) - ppm * total / 1_000_000) <= 1
    # deterministic + repartition-proof
    again = mixture_sample(docs.repartition(7), "source", targets)
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )
    # maximal retention: at least one group is kept (nearly) whole —
    # the binding constraint group loses at most |targets| rows to floors
    src = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    binding = min(targets, key=lambda g: src[g] * 1_000_000 // targets[g])
    assert counts[binding] >= src[binding] - len(targets)
    out.unpersist()


def test_mixture_sample_validation(spark):
    from vector_db_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(df, "source", {})
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(df, "source", {"a": 0})
    with pytest.raises(ValueError, match="exceeds"):
        mixture_sample(df, "source", {"a": 900_000, "b": 200_000})
    with pytest.raises(ValueError, match="absent"):
        mixture_sample(df, "source", {"a": 500_000, "zz": 100_000})


def test_fusion_weighted_properties(spark):
    from vector_db_spark.operators.hybrid import fusion_weighted, hybrid_search
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    corpus = docs.join(emb, "doc_id").cache()
    qv = [float(x) for x in emb.filter(F.col("doc_id") == 0).head().embedding]

    rows = fusion_weighted(corpus, "spark query vector", qv, 10).collect()
    assert len(rows) == 10
    scores = [r.fused_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # norms live in [0,1]; fused in [0, w_text+w_vec]
    assert all(0.0 <= r.tnorm <= 1.0 and 0.0 <= r.vnorm <= 1.0 for r in rows)
    # w_text=0 degenerates to the pure-vector order (norm is monotone)
    pure = fusion_weighted(
        corpus, "spark query vector", qv, 5, w_text=0.0, w_vec=1.0
    ).collect()
    from vector_db_spark.operators.knn import knn

    want = knn(corpus, qv, 5, metric="cosine", id_col="doc_id").collect()
    assert [r.id for r in pure] == [r.doc_id for r in want]
    corpus.unpersist()


def test_fusion_weighted_constant_list_norms_to_one(spark):
    from vector_db_spark.operators.hybrid import fusion_weighted

    # every doc contains the single query token exactly once -> all tscores
    # equal -> tnorm must be 1.0 for every candidate (degenerate min==max)
    corpus = spark.createDataFrame(
        [(i, "common text", [float(i), 1.0]) for i in range(1, 6)],
        "doc_id long, text string, embedding array<double>",
    )
    rows = fusion_weighted(corpus, "common", [1.0, 0.0], 5).collect()
    assert all(r.tnorm == 1.0 for r in rows)


# ---------------------------------------------------------------------------
# TF-IDF (operators/tfidf.py)
# ---------------------------------------------------------------------------


def test_tfidf_scores_hand_computed(spark):
    import math

    from vector_db_spark.operators.tfidf import tfidf_scores

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b d")], ["doc_id", "text"]
    )
    rows = {
        (r.id, r.term): r
        for r in tfidf_scores(docs).collect()
    }
    # N=3; df: a->2, b->2, c->1, d->1
    idf = lambda df: math.log((3 + 1.0) / (df + 1.0)) + 1.0
    assert rows[(1, "a")].tf == 2 and rows[(1, "a")].df == 2
    assert rows[(1, "a")].score == pytest.approx(2 * idf(2))
    assert rows[(2, "c")].score == pytest.approx(1 * idf(1))
    assert rows[(3, "b")].score == pytest.approx(2 * idf(2))
    assert len(rows) == 6  # one row per distinct (doc, term)


def test_tfidf_top_terms_rank_and_tiebreak(spark):
    from vector_db_spark.operators.tfidf import tfidf_top_terms

    # doc 1: 'x' and 'y' both tf=1 df=1 -> tied score; term asc breaks it
    docs = spark.createDataFrame(
        [(1, "x y common"), (2, "common common z")], ["doc_id", "text"]
    )
    top = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r.id, []).append((r.rk, r.term))
    assert sorted(by_doc[1]) == [(1, "x"), (2, "y")]
    # doc 2: rarer 'z' (df=1) with tf=1 vs 'common' (df=2) tf=2 —
    # 2*idf(2) = 2*(ln(3/3)+1) = 2.0 > 1*idf(1) = ln(3/2)+1 ≈ 1.405
    assert by_doc[2][0] == (1, "common")


def test_copurchase_lift_hand_computed(spark):
    from vector_db_spark.operators.assoc import copurchase_lift

    # orders: o1={p1,p2}, o2={p1,p2}, o3={p1,p3}, o4={p2} -> N=4
    # counts: p1=3, p2=3, p3=1
    # (p1,p2): support 2, lift = 2*4/(3*3) = 8/9
    # (p1,p3): support 1, lift = 1*4/(3*1) = 4/3
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3), (4, 2), (4, 2)]
    baskets = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    got = {
        (r.part_a, r.part_b): (r.support, r.confidence_a_b, r.lift)
        for r in copurchase_lift(baskets).collect()
    }
    # confidence_a_b = support / count(a): part 1 is in 3 baskets
    assert got[(1, 2)] == (2, pytest.approx(2 / 3), pytest.approx(8 / 9))
    assert got[(1, 3)] == (1, pytest.approx(1 / 3), pytest.approx(4 / 3))
    assert set(got) == {(1, 2), (1, 3)}  # duplicate line-items collapse


def test_pagerank_hand_computed_and_mass_properties(spark):
    from vector_db_spark.operators.pagerank import INIT_MASS, pagerank

    # 3-cycle: every node has out_deg 1 and in_deg 1 -> mass stays uniform
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    nodes = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    out = {r.id: r.mass for r in pagerank(edges, nodes, iters=3).collect()}
    base = 15 * INIT_MASS // 100
    expect = INIT_MASS
    for _ in range(3):
        expect = base + (85 * expect) // 100
    assert out == {1: expect, 2: expect, 3: expect}

    # star: 1,2,3 all point at 4; 4 points at 1. After one round node 4
    # holds base + 85% of three full masses; sources hold base (+1's inflow)
    edges = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 1)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["id"])
    out = {r.id: r.mass for r in pagerank(edges, nodes, iters=1).collect()}
    assert out[4] == base + (85 * (3 * INIT_MASS)) // 100
    assert out[2] == base == out[3]
    assert out[1] == base + (85 * INIT_MASS) // 100
    # sink-free graph: mass only shrinks via integer floors
    assert sum(out.values()) <= 4 * INIT_MASS


def test_pagerank_validates_damping(spark):
    from vector_db_spark.operators.pagerank import pagerank

    nodes = spark.createDataFrame([(1,)], ["id"])
    edges = spark.createDataFrame([(1, 1)], ["src", "dst"])
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(edges, nodes, damping_pct=0)


def test_pagerank_auto_mass_survives_million_node_hub(spark):
    """Overflow property (VERDICT r4 #2): a 10^6-node star funnels ~all
    mass into one hub, maximizing the ``damping_pct · Σ`` product. The
    old caller-managed INIT_MASS=10^12 contract overflows int64 here
    (ANSI mode raises); auto-scaling must complete with conserved,
    non-negative mass and the hub on top."""
    from pyspark.sql import functions as F

    from vector_db_spark.operators.pagerank import auto_init_mass, pagerank

    n = 1_000_000
    # arithmetic bound holds at every scale, including the cap regime
    for m in (1, 10, 10**5, 10**6, 10**9, 10**12, 2**62):
        assert 100 * m * auto_init_mass(m) <= 2**63 - 1 or auto_init_mass(m) == 1
    assert auto_init_mass(2000) == 10**12  # gate graph resolution unchanged

    nodes = spark.range(n).select(F.col("id"))
    edges = (
        spark.range(1, n)
        .select(F.col("id").alias("src"), F.lit(0).alias("dst"))
        .union(spark.createDataFrame([(0, 1)], ["src", "dst"]))
    )
    init = auto_init_mass(n)
    out = pagerank(edges, nodes, iters=2)
    top = out.orderBy(F.col("mass").desc(), F.col("id")).limit(1).head()
    # round 1 funnels ~0.85·N·init into the hub; round 2 forwards it to
    # the hub's single out-neighbor (node 1), which then dominates
    assert top.id == 1
    agg = out.agg(
        F.sum("mass").alias("total"), F.min("mass").alias("lo")
    ).head()
    assert 0 <= agg.lo
    assert agg.total <= n * init

    # the un-scaled contract genuinely overflows on this graph (the
    # property the auto-scale exists to remove)
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        pagerank(edges, nodes, iters=1, init_mass=10**12).collect()


def test_mg_heavy_hitters_exact_under_adversarial_partitioning(spark):
    from vector_db_spark.operators.sketch import heavy_hitters

    # 'hot' = 30% of tokens but deliberately SPREAD across many rows and
    # partitions; tail tokens are unique. k=3 -> report above 1/3.
    rows = [(i, "hot tail%d" % i) for i in range(60)] + [
        (100 + i, "hot hot unique%d" % i) for i in range(15)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(16)
    # totals: 60*2 + 15*3 = 165 tokens; hot = 60 + 30 = 90 > 165/3
    got = {r.token: r.n for r in heavy_hitters(docs, 3).collect()}
    assert got == {"hot": 90}
    # tighter threshold admits nothing else (tail is all-unique)
    assert {r.token for r in heavy_hitters(docs, 100).collect()} == {"hot"}


def test_mg_summary_bounded_per_partition():
    import pandas as pd

    from vector_db_spark.operators.sketch import _mg_partition

    # one partition fed 3 batches of mostly-distinct tokens: the summary
    # must never exceed k rows even though thousands of tokens stream by
    fn = _mg_partition(8)
    batches = (
        pd.DataFrame({"token": [f"t{j}_{i}" for j in range(1000)] + ["HH"] * 600})
        for i in range(3)
    )
    out = pd.concat(list(fn(batches)))
    assert len(out) <= 8
    assert "HH" in set(out["token"])  # 1800/4800 >> n/(k+1): must survive


def test_mg_heavy_hitters_validates_k(spark):
    from vector_db_spark.operators.sketch import heavy_hitters

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(docs, 0)


def test_label_propagation_two_cliques(spark):
    from vector_db_spark.operators.labelprop import label_propagation

    # two directed triangles (cliques) joined by nothing: every node must
    # adopt its clique's minimum id
    tri = lambda a, b, c: [
        (a, b), (b, a), (b, c), (c, b), (a, c), (c, a)
    ]
    edges = spark.createDataFrame(tri(1, 2, 3) + tri(10, 11, 12), ["src", "dst"])
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 12)], ["id"])
    out = {r.id: r.label for r in label_propagation(edges, nodes, iters=3).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_label_propagation_isolated_node_keeps_label(spark):
    from vector_db_spark.operators.labelprop import label_propagation

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    nodes = spark.createDataFrame([(1,), (2,), (99,)], ["id"])
    out = {r.id: r.label for r in label_propagation(edges, nodes, iters=2).collect()}
    assert out[99] == 99  # no in-edges -> label never changes
    assert out[2] == 1    # adopts its only in-neighbor
    assert out[1] == 1    # no in-edges either

    with pytest.raises(ValueError, match="iters"):
        label_propagation(edges, nodes, iters=0)


def test_triangles_hand_computed(spark):
    from vector_db_spark.operators.triangles import (
        triangle_participation,
        triangles,
    )

    # K4 on {1,2,3,4} (4 triangles) + pendant edge (4,5); input directed,
    # duplicated, and with a self-loop — all must be normalized away
    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a != b]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 4), (3, 3)], ["src", "dst"]
    )
    tri = {tuple(r) for r in triangles(edges).collect()}
    assert tri == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}
    part = {r.id: r.n_triangles for r in triangle_participation(edges).collect()}
    assert part == {1: 3, 2: 3, 3: 3, 4: 3}  # node 5 in no triangle


def test_c4_null_text_is_dropped_not_kept(spark):
    """A NULL-text document must fail the filter (too_short), not sail
    through as 'kept' on NULL rule conditions."""
    from vector_db_spark.operators.filtering import filter_verdicts, keep_documents

    good = " ".join(f"word{i} and{i % 7} the{i % 3}" for i in range(25))
    df = spark.createDataFrame(
        [(1, good), (2, None), (3, "")], "doc_id long, text string"
    )
    v = {r.doc_id: r.verdict for r in filter_verdicts(df).collect()}
    assert v[1] == "kept" and v[2] == "too_short" and v[3] == "too_short"
    assert [r.doc_id for r in keep_documents(df).collect()] == [1]


def test_split_keeps_null_keys_and_rounds_cut(spark):
    """NULL keys land in exactly one side (train ∪ eval == df), and the
    cut rounds half-up: eval_fraction=0.57 keeps bucket < 5700, not 5699;
    a sub-resolution fraction rounds to one bucket instead of silently
    zero."""
    from vector_db_spark.operators.sampling import (
        BUCKETS,
        _cut,
        train_eval_split,
    )

    assert _cut(0.57) == 5700 and _cut(0.69) == 6900
    assert _cut(0.00005) == 1  # not 0: eval never silently empty
    rows = [(i, f"d{i}") for i in range(1, 50)] + [(None, "dnull")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train, ev = train_eval_split(df, "doc_id", 0.2)
    assert train.count() + ev.count() == df.count()  # nothing vanishes
    assert BUCKETS == 10000


def test_global_shuffle_duplicate_keys_stable(spark):
    from vector_db_spark.operators.sampling import global_shuffle

    rows = [(i % 5, f"p{i}") for i in range(40)]  # heavy key duplication
    df = spark.createDataFrame(rows, "k long, payload string")
    a = [(r.k, r.payload) for r in global_shuffle(df, "k").collect()]
    b = [(r.k, r.payload) for r in global_shuffle(df.repartition(7), "k").collect()]
    assert sorted(a) == sorted(b)
    # total order on (shuffle_key, k) is partition-layout independent
    assert [x[0] for x in a] == [x[0] for x in b]


def test_tokenize_bpe_keeps_empty_documents(spark):
    from vector_db_spark.operators.bpe import tokenize_bpe, train_bpe

    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, ""), (3, "low low")],
        "doc_id long, text string",
    )
    model = train_bpe(df.filter("doc_id != 2"), n_merges=4)
    out = {r.doc_id: r.n_tokens for r in tokenize_bpe(df, model).collect()}
    assert set(out) == {1, 2, 3} and out[2] == 0  # empty doc kept, 0 tokens


def test_train_unigram_empty_corpus_clear_error(spark):
    from vector_db_spark.operators.lm import train_unigram

    df = spark.createDataFrame([(1, " "), (2, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        train_unigram(df)


def test_hash_bucket_null_key_distinct_from_literal_null_string(spark):
    """ADVICE r10: NULL keys used to coalesce to the literal '<null>',
    welding keys whose string value IS '<null>' to NULL rows' bucket fate
    across every salt and split. The sentinel is now NUL-framed (outside
    any plausible key domain); non-NULL hash inputs are byte-identical to
    before, pinned by the concrete md5-derived bucket values."""
    from pyspark.sql import functions as F

    from vector_db_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame([("<null>",), (None,)], "k string")
    got = {
        r.k: r.b
        for r in df.select("k", hash_bucket(F.col("k")).alias("b")).collect()
    }
    assert got["<null>"] == 8043  # unchanged non-NULL hash
    assert got[None] == 46
    got2 = {
        r.k: r.b
        for r in df.select("k", hash_bucket(F.col("k"), "s1").alias("b")).collect()
    }
    assert got2["<null>"] == 8805 and got2[None] == 2438


def test_copurchase_lift_size_gated_materialization(spark):
    """VERDICT r13 minor #3: corpus-scale inputs must skip the
    localCheckpoint (no RDD checkpoint scan in the plan) while small
    inputs keep it — and both paths return identical values."""
    from vector_db_spark.operators.assoc import copurchase_lift

    import tempfile

    path = tempfile.mkdtemp(prefix="copurchase_") + "/baskets"
    spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (2, 30), (3, 10)],
        "l_orderkey long, l_partkey long",
    ).write.parquet(path)
    baskets = spark.read.parquet(path)
    got_ck = sorted(map(tuple, copurchase_lift(baskets, materialize=True).collect()))
    got_re = sorted(map(tuple, copurchase_lift(baskets, materialize=False).collect()))
    assert got_ck == got_re and len(got_ck) == 3
    # a parquet source: the checkpointed plan scans an RDD block relation,
    # the reuse plan scans only parquet
    plan_re = (
        copurchase_lift(baskets, materialize=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    plan_ck = (
        copurchase_lift(baskets, materialize=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ExistingRDD" not in plan_re
    assert "ExistingRDD" in plan_ck
