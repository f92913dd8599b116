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
