"""Feature-hashing text embedder (operators/embedder.py): NumPy parity
for the full pipeline incl. normalization, determinism contracts, and
the end-to-end text -> embed -> ANN loop the operator exists for."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.embedder import text_hash_embed
from vector_db_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


def _ref_embed(text: str, dim: int, salt: str = "fh", normalize: bool = True):
    v = np.zeros(dim)
    for t in text.lower().split(" "):
        if not t:
            continue
        h = hashlib.md5((t + salt).encode()).hexdigest()
        b = int(h[:8], 16) % dim
        s = 1 if int(h[8], 16) % 2 == 0 else -1
        v[b] += s
    n = np.linalg.norm(v)
    return v / n if normalize and n > 0 else v


@pytest.fixture(scope="module")
def docs(spark):
    df = (
        load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .limit(100)
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def test_matches_numpy_reference(docs):
    rows = text_hash_embed(docs, dim=24).orderBy("doc_id").head(30)
    texts = {r.doc_id: r.text for r in docs.orderBy("doc_id").head(30)}
    for r in rows:
        want = _ref_embed(texts[r.doc_id], 24)
        np.testing.assert_allclose(np.asarray(r.embedding), want, atol=1e-12)


def test_unnormalized_counts_are_integers(docs):
    rows = text_hash_embed(docs, dim=16, normalize=False).head(20)
    for r in rows:
        assert all(float(x) == int(x) for x in r.embedding)


def test_empty_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello world")],
        "doc_id long, text string",
    )
    out = {r.doc_id: list(r.embedding) for r in text_hash_embed(df, dim=8).collect()}
    assert out[1] == [0.0] * 8
    assert out[2] == [0.0] * 8  # single-space split leaves empties, filtered
    assert np.isclose(np.linalg.norm(out[3]), 1.0)


def test_validation(docs):
    with pytest.raises(ValueError, match="dim"):
        text_hash_embed(docs, dim=0)


def test_end_to_end_text_to_ann(docs, spark):
    """The operator's purpose: text -> vectors -> persisted IVF -> the
    nearest doc to a query text's own vector is itself (full probe ==
    exact, cosine over unit vectors)."""
    from vector_db_spark.operators.ann import IvfIndex

    emb = text_hash_embed(docs, dim=32).select("doc_id", "embedding")
    idx = IvfIndex.build(
        emb, nlist=4, seed=42, max_iter=5, id_col="doc_id", metric="cosine"
    )
    qrow = docs.filter(F.col("doc_id") == 7).head()
    qv = _ref_embed(qrow.text, 32)
    top = idx.search(list(qv), 1, nprobe=4).head()
    assert top.doc_id == 7


def _ref_char_embed(text: str, dim: int, n: int = 3, salt: str = "fh"):
    v = np.zeros(dim)
    s = text.lower()
    for i in range(max(0, len(s) - n + 1)):
        g = s[i : i + n]
        h = hashlib.md5((g + salt).encode()).hexdigest()
        b = int(h[:8], 16) % dim
        v[b] += 1 if int(h[8], 16) % 2 == 0 else -1
    nn = np.linalg.norm(v)
    return v / nn if nn > 0 else v


def test_char_analyzer_matches_numpy_reference(docs):
    rows = (
        text_hash_embed(docs, dim=24, analyzer="char", ngram=3)
        .orderBy("doc_id")
        .head(15)
    )
    texts = {r.doc_id: r.text for r in docs.orderBy("doc_id").head(15)}
    for r in rows:
        want = _ref_char_embed(texts[r.doc_id], 24)
        np.testing.assert_allclose(np.asarray(r.embedding), want, atol=1e-12)


def test_char_analyzer_short_text_is_zero(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "abc")], "doc_id long, text string")
    out = {
        r.doc_id: list(r.embedding)
        for r in text_hash_embed(
            df, dim=8, analyzer="char", ngram=3, normalize=False
        ).collect()
    }
    assert out[1] == [0.0] * 8  # shorter than the gram width
    assert sum(abs(x) for x in out[2]) == 1.0  # exactly one trigram


def test_analyzer_validation(docs):
    with pytest.raises(ValueError, match="analyzer"):
        text_hash_embed(docs, analyzer="bpe")
    with pytest.raises(ValueError, match="ngram"):
        text_hash_embed(docs, analyzer="char", ngram=0)


def test_duplicate_rows_survive(spark):
    """Append-a-column contract: one output row per input row even when
    the payload is identical (code-review r5 finding)."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (1, "hello world")],
        "doc_id long, text string",
    )
    rows = text_hash_embed(df, dim=8, normalize=False).collect()
    assert len(rows) == 3
    dup = [list(r.embedding) for r in rows if r.doc_id == 1]
    assert len(dup) == 2 and dup[0] == dup[1]
    assert sum(abs(x) for x in dup[0]) == 2  # two tokens, counted once


# --- learned rung: MLlib Word2Vec doc vectors (fit_word2vec/word2vec_embed) ---


def test_w2v_deterministic_across_fits(docs):
    """Single-partition + fixed seed ⇒ two independent fits produce
    bit-identical doc vectors (the rows-only gate and recall pins depend
    on this)."""
    from vector_db_spark.operators.embedder import fit_word2vec, word2vec_embed

    a = word2vec_embed(docs, fit_word2vec(docs, dim=16)).collect()
    b = word2vec_embed(docs, fit_word2vec(docs, dim=16)).collect()
    va = {r.doc_id: list(r.embedding) for r in a}
    vb = {r.doc_id: list(r.embedding) for r in b}
    assert va == vb


def test_w2v_mean_pooling_matches_vocab_table(spark):
    """A doc's vector is the sum of its in-vocab tokens' word vectors
    divided by the TOTAL token count (Word2VecModel.transform's combiner
    — OOV tokens contribute zero but still count in the denominator);
    token-less docs get the zero vector."""
    from vector_db_spark.operators.embedder import fit_word2vec, word2vec_embed

    corpus = spark.createDataFrame(
        [(i, "red blue green red blue red") for i in range(20)]
        + [(100 + i, "cat dog bird cat dog cat") for i in range(20)],
        "doc_id long, text string",
    )
    model = fit_word2vec(corpus, dim=8, min_count=1)
    vocab = {
        r.word: np.array(r.vector.toArray())
        for r in model.getVectors().collect()
    }
    probe = spark.createDataFrame(
        [(1, "red dog"), (2, "zzz-oov red"), (3, ""), (4, "qqq-oov")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: np.array(r.embedding)
        for r in word2vec_embed(probe, model).collect()
    }
    np.testing.assert_allclose(
        out[1], (vocab["red"] + vocab["dog"]) / 2, rtol=1e-6
    )
    # OOV contributes a zero vector but counts toward the divisor
    np.testing.assert_allclose(out[2], vocab["red"] / 2, rtol=1e-6)
    assert np.all(out[3] == 0.0) and np.all(out[4] == 0.0)
    assert all(len(v) == 8 for v in out.values())


def test_w2v_feeds_ann_lifecycle(docs, spark):
    """Learned vectors drive the standard IVF lifecycle: full-probe IVF
    over w2v doc vectors ≡ brute-force cosine kNN, bit-for-bit — the
    lossless-configuration standard every vector source must meet."""
    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.embedder import fit_word2vec, word2vec_embed
    from vector_db_spark.operators.knn import knn

    model = fit_word2vec(docs, dim=16)
    emb = word2vec_embed(docs, model).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    norm_sq = F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x)
    emb = emb.filter(norm_sq > 0).cache()
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    idx = IvfIndex.build(emb, nlist=4, metric="cosine", max_iter=5)
    got = [
        (r.vec_id, round(r.score, 8))
        for r in idx.search(qv, 5, nprobe=4).collect()
    ]
    want = [
        (r.vec_id, round(r.score, 8))
        for r in knn(emb, qv, 5, metric="cosine").collect()
    ]
    emb.unpersist()
    assert got == want


def test_w2v_fit_input_cap_binds(docs, spark):
    """`fit_word2vec`'s single deterministic fit partition must never see
    the whole corpus: `_bounded_fit_input` caps the fit frame at
    max_fit_rows with the shared seeded-sample policy (the round-7
    defect was an uncapped repartition(1))."""
    from vector_db_spark.operators.embedder import (
        _bounded_fit_input,
        fit_word2vec,
    )

    capped = _bounded_fit_input(docs, "text", max_fit_rows=10, seed=42)
    assert capped.count() <= 10
    # under the cap the frame passes through complete
    small = _bounded_fit_input(docs.limit(5), "text", max_fit_rows=10, seed=42)
    assert small.count() == 5
    # the cap is seed-deterministic: same seed, same surviving rows
    a = sorted(r["__toks"] for r in capped.collect())
    b = sorted(
        r["__toks"]
        for r in _bounded_fit_input(docs, "text", max_fit_rows=10, seed=42).collect()
    )
    assert a == b
    # a capped fit still yields a usable deterministic model
    m1 = fit_word2vec(docs, dim=8, max_fit_rows=20)
    m2 = fit_word2vec(docs, dim=8, max_fit_rows=20)
    v1 = {r.word: list(r.vector.toArray()) for r in m1.getVectors().collect()}
    v2 = {r.word: list(r.vector.toArray()) for r in m2.getVectors().collect()}
    assert v1 == v2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_fit_rows"):
        fit_word2vec(docs, dim=8, max_fit_rows=0)


def test_fit_threshold_never_zero_and_never_undershoots():
    """Regression (round-9 review): int() truncation of the hash
    threshold hit 0 once n exceeded (1.2·cap+1000)·2²⁰ — an EMPTY fit
    sample in exactly the huge-corpus regime the bound exists for — and
    a thresh of 1-2 truncated from 2−ε halved expected survivors below
    the cap. Pin the ceiling form: thresh >= 1 always, and expected
    survivors n·thresh/2²⁰ >= min(n, cap) across the full range, huge-n
    corners included."""
    from vector_db_spark.operators.embedder import _FIT_HASH_DENOM, _fit_threshold

    for cap in (1, 100, 10_000, 100_000):
        for n in (
            cap + 1,
            10 * cap,
            int((1.2 * cap + 1000) * _FIT_HASH_DENOM) - 1,
            int((1.2 * cap + 1000) * _FIT_HASH_DENOM) + 1,
            6_800_000_000,
            10**12,
            10**15,
        ):
            t = _fit_threshold(n, cap)
            assert 1 <= t <= _FIT_HASH_DENOM, (n, cap, t)
            expected = n * t / _FIT_HASH_DENOM
            assert expected >= min(n, cap), (n, cap, t, expected)
