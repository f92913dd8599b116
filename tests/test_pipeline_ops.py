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
