"""Fuzzy join (operators/fuzzy.py): q-gram blocking must be LOSSLESS —
identical to the naive cross-join formulation — across typo shapes,
short strings (below the gram-guarantee cutoff), and both the self- and
two-table variants."""

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.fuzzy import fuzzy_join, fuzzy_self_join

WORDS = [
    "red widget", "red widgett", "rd widget", "red widgie",
    "blue bolt", "blue boltt", "bolt", "blu", "b", "",
    "chartreuse gizmo", "chartreuse gismo", "chartruese gizmo",
    "anodized steel casing", "anodised steel casing",
    "x" * 30, "x" * 29 + "y",
]


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id long, s string"
    )


def _naive_self(df, d):
    a = df.select(F.col("id").alias("a_id"), F.col("s").alias("a_s"))
    b = df.select(F.col("id").alias("b_id"), F.col("s").alias("b_s"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("dist", F.levenshtein("a_s", "b_s"))
        .filter(F.col("dist") <= d)
        .select("a_id", "b_id", "dist")
    )


@pytest.mark.parametrize(
    "d,k",
    [
        # smoke tier keeps the d=1 default-shaped case; the other
        # (d, k) corners are the heavy tier (r16 — each runs a full
        # naive O(n²) cross-check, ~15 s apiece)
        pytest.param(0, 2, marks=pytest.mark.heavy),
        (1, 2),
        pytest.param(2, 2, marks=pytest.mark.heavy),
        pytest.param(3, 2, marks=pytest.mark.heavy),
        pytest.param(2, 3, marks=pytest.mark.heavy),
    ],
)
def test_fuzzy_self_join_equals_naive(spark, words_df, d, k):
    got = sorted(
        (r.a_id, r.b_id, r.dist)
        for r in fuzzy_self_join(words_df, "s", "id", max_dist=d, k=k).collect()
    )
    want = sorted(
        (r.a_id, r.b_id, r.dist) for r in _naive_self(words_df, d).collect()
    )
    assert got == want
    if d >= 1:
        assert len(got) > 0  # the typo pairs really match


def test_fuzzy_two_table_equals_naive(spark, words_df):
    left = words_df.filter(F.col("id") % 2 == 0)
    right = words_df.filter(F.col("id") % 2 == 1)
    got = sorted(
        (r.a_id, r.b_id, r.dist)
        for r in fuzzy_join(
            left, right, "s", "s", "id", "id", max_dist=2
        ).collect()
    )
    want = sorted(
        (r.a_id, r.b_id, r.dist)
        for r in left.select(F.col("id").alias("a_id"), F.col("s").alias("a_s"))
        .crossJoin(
            right.select(F.col("id").alias("b_id"), F.col("s").alias("b_s"))
        )
        .withColumn("dist", F.levenshtein("a_s", "b_s"))
        .filter(F.col("dist") <= 2)
        .select("a_id", "b_id", "dist")
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_fuzzy_short_strings_all_caught(spark):
    """Every string below the k(1+d) gram-guarantee cutoff — including
    empty and single-char — routes through the short block; nothing is
    silently dropped."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["a", "ab", "b", "ba", "", "abc"])],
        "id long, s string",
    )
    got = sorted(
        (r.a_id, r.b_id, r.dist)
        for r in fuzzy_self_join(df, "s", "id", max_dist=1).collect()
    )
    want = sorted(
        (r.a_id, r.b_id, r.dist) for r in _naive_self(df, 1).collect()
    )
    assert got == want


def test_fuzzy_rejects_bad_params(spark, words_df):
    with pytest.raises(ValueError):
        fuzzy_self_join(words_df, "s", "id", max_dist=-1)
    with pytest.raises(ValueError):
        fuzzy_self_join(words_df, "s", "id", k=0)


def test_fuzzy_match_best_picks_closest(spark):
    """Each dirty row resolves to its nearest reference entity; ties go
    to the smaller reference id; out-of-threshold rows are absent."""
    ref = spark.createDataFrame(
        [(1, "red widget"), (2, "blue bolt"), (3, "chartreuse gizmo")],
        "rid long, name string",
    )
    dirty = spark.createDataFrame(
        [
            (10, "red widgett"),      # 1 edit from ref 1
            (11, "blue boltt"),       # 1 edit from ref 2
            (12, "chartruese gizmo"), # 2 edits from ref 3
            (13, "zzzzzzzz"),         # matches nothing
        ],
        "did long, name string",
    )
    from vector_db_spark.operators.fuzzy import fuzzy_match_best

    got = {
        r.a_id: (r.b_id, r.dist)
        for r in fuzzy_match_best(
            dirty, ref, "name", "name", "did", "rid", max_dist=2
        ).collect()
    }
    assert got == {10: (1, 1), 11: (2, 1), 12: (3, 2)}


def test_count_bound_prunes_hot_gram_candidates(spark):
    """The Gravano count filter must cut candidate volume on a hot-gram
    corpus (many strings sharing one common bigram, few true pairs) while
    leaving the RESULT identical — the round-4 scale fix: without the
    bound, every pair inside a hot gram's block reaches Levenshtein."""
    from vector_db_spark.operators.fuzzy import (
        _gram_edges,
        _long_candidates,
    )

    # 40 strings all containing "er", pairwise edit distance far above 2
    words = [f"{c}er{c}{i:02d}xx{c}{i:02d}" for i, c in enumerate("abcdefghij" * 4)]
    words += ["terminal one", "terminal onee"]  # one true pair
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id long, s string"
    )
    base = df.select(F.col("id").alias("a_id"), F.col("s").alias("a_s"))
    edges = _gram_edges(base, "a_id", "a_s", 2)
    gb = edges.select(
        F.col("a_id").alias("b_id"),
        F.col("a_s").alias("b_s"),
        "g",
        F.col("a_id_cnt").alias("b_id_cnt"),
    )
    n_bound = _long_candidates(
        edges, gb, 2, 2, 6, self_pair=True, count_bound=True
    ).count()
    n_free = _long_candidates(
        edges, gb, 2, 2, 6, self_pair=True, count_bound=False
    ).count()
    assert n_bound < n_free / 5  # the hot-gram block collapses
    # and the full join is still lossless
    got = sorted(
        (r.a_id, r.b_id, r.dist)
        for r in fuzzy_self_join(df, "s", "id", max_dist=2).collect()
    )
    want = sorted(
        (r.a_id, r.b_id, r.dist) for r in _naive_self(df, 2).collect()
    )
    assert got == want


def test_short_block_quadratic_over_values_not_rows(spark):
    """A corpus with many REPEATED short strings: the all-pairs step runs
    over distinct values only (here 3), so the value cross join is 9 rows
    regardless of row count — and results still match the naive join."""
    rows = [(i, ["ab", "ac", "zz"][i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        (r.a_id, r.b_id, r.dist)
        for r in fuzzy_self_join(df, "s", "id", max_dist=1).collect()
    )
    want = sorted(
        (r.a_id, r.b_id, r.dist) for r in _naive_self(df, 1).collect()
    )
    assert got == want
