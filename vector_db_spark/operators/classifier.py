"""Model-based document quality classification, Spark-first.

The production LLM-pipeline pattern behind LLaMA/RedPajama/CCNet quality
filtering: heuristics bootstrap weak labels, a cheap linear classifier
generalizes them, and the CLASSIFIER (not the heuristics) gates the
corpus — it smooths the hard rule edges and transfers to text the rules
were never tuned on. (fastText is the usual implementation; the Spark
-native equivalent is MLlib logistic regression over engineered signals.)

Spark decomposition:

- **Features are codegen'd expressions**, not a Python featurizer: every
  signal comes from functions/text.py (token stats, punctuation/stopword
  ratios, repetition fractions) — row-local, zero shuffle, shareable with
  the rule pipeline in operators/filtering.py.
- **Training is MLlib LogisticRegression** (distributed L-BFGS: one
  treeAggregate pass per iteration — gradient traffic is O(n_features),
  never corpus rows to the driver).
- **Scoring is model.transform** — a broadcast of the coefficient vector
  into a narrow projection; filters on the probability are pushable.

Float caveat: L-BFGS aggregation order varies with partitioning, so
coefficients are deterministic only to ~1e-12 — scores are NOT
oracle-hash-material (the registered query is rows-only); behavioral
guarantees (separable-corpus accuracy, teacher agreement) are pinned in
tests/test_pipeline_ops.py instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_spark.functions.text import (
    avg_token_len,
    dup_ngram_frac,
    punct_ratio,
    stopword_ratio,
    token_count,
    top_word_frac,
)

FEATURE_COL = "features"
_FEATURES = [
    ("f_log_tokens", lambda t: F.log1p(token_count(t))),
    ("f_avg_tok_len", avg_token_len),
    ("f_punct_ratio", punct_ratio),
    ("f_stop_ratio", stopword_ratio),
    ("f_top_word", top_word_frac),
    ("f_dup_gram", dup_ngram_frac),
]


def _with_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Attach the six engineered quality signals as double columns. All
    row-local expression work; nulls (empty docs) impute to 0."""
    from vector_db_spark.operators.util import fan_out

    t = F.col(text_col)
    out = fan_out(df)
    for name, fn in _FEATURES:
        out = out.withColumn(name, F.coalesce(fn(t).cast("double"), F.lit(0.0)))
    return out


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the engineered quality signals + an MLlib feature vector."""
    from pyspark.ml.functions import array_to_vector

    out = _with_signals(df, text_col)
    arr = F.array(*[F.col(name) for name, _ in _FEATURES])
    return out.withColumn(FEATURE_COL, array_to_vector(arr))


# Frozen serving coefficients (VERDICT r12 #4): one pinned
# train_quality_classifier fit over the even-doc_id half of the sf0.01
# fixture (seed-42 synthetic corpus, deterministic content), coefficients
# rounded to 6 decimals and FROZEN as the serving model — the production
# pattern anyway (fastText-style quality gates ship a trained artifact;
# nobody refits the classifier inside the scoring job). Scoring becomes a
# pure left-associated float64 expression a DuckDB oracle reproduces
# bit-exactly, so the registered gate is hash-exact instead of rows-only
# (L-BFGS aggregation order perturbs FRESH fits at ~1e-12). Order matches
# _FEATURES.
FROZEN_QUALITY_COEFS = (
    3.558651,   # f_log_tokens
    -0.59196,   # f_avg_tok_len
    0.0,        # f_punct_ratio (regularized out on the fixture corpus)
    24.350507,  # f_stop_ratio
    -23.679702, # f_top_word
    14.62058,   # f_dup_gram
)
FROZEN_QUALITY_INTERCEPT = -15.492292


def score_quality_frozen(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    coefs=FROZEN_QUALITY_COEFS,
    intercept: float = FROZEN_QUALITY_INTERCEPT,
) -> DataFrame:
    """(id, quality_logit, keep) under the FROZEN linear model: the logit
    is the left-associated fold b + w0·f0 + w1·f1 + … (one rounding per
    operation, same order a SQL `+` chain produces) and keep is the
    sign test logit >= 0 — the 0.5-probability threshold without
    computing the sigmoid, because exp() is not bit-portable across
    engines while multiply/add/divide are. quality_logit is rounded to
    6 decimals (the repo-wide float-gate policy; absorbs the last-ulp
    log1p divergence between Java fdlibm and C libm)."""
    feats = _with_signals(df, text_col)
    z = F.lit(float(intercept))
    for (name, _), w in zip(_FEATURES, coefs):
        z = z + F.lit(float(w)) * F.col(name)
    return feats.select(
        F.col(id_col),
        F.round(z, 6).alias("quality_logit"),
        (z >= 0).alias("keep"),
    )


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit the linear quality model on a weakly-labeled frame (0/1
    ``label_col``). Returns the fitted MLlib model; driver state is the
    coefficient vector (O(n_features))."""
    from pyspark.ml.classification import LogisticRegression

    feats = featurize(labeled, text_col)
    lr = LogisticRegression(
        featuresCol=FEATURE_COL,
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    return lr.fit(feats)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, quality_prob, keep) for every document: probability of the
    'good' class and the 0.5-threshold verdict. The model broadcast is a
    handful of doubles; the plan is featurize-projection → vector dot."""
    from pyspark.ml.functions import vector_to_array

    feats = featurize(df, text_col)
    scored = model.transform(feats)
    prob = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        F.col(id_col),
        prob.alias("quality_prob"),
        (prob >= 0.5).alias("keep"),
    )


def weak_labels(df: DataFrame, text_col: str = "text") -> Column:
    """Bootstrap labels from the heuristic teacher (quality_score >= 0.5)
    — the standard weak-supervision seed when no human labels exist."""
    from vector_db_spark.functions.text import quality_score

    return (quality_score(F.col(text_col)) >= 0.5).cast("int")
