"""LLM-data-pipeline query family (SURVEY.md §7.1 M5, BASELINE.json
north star): dedup (exact + fuzzy), text analysis, language-ID,
fingerprinting, and embedding near-dup — over the `documents` /
`embeddings` fixtures, oracle-verified wherever SQL-expressible.

Tokenization parity contract with DuckDB: single-space split, empties
dropped; every ratio is integer-arithmetic-then-one-divide; md5 on both
engines returns lowercase hex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.functions.text import (
    avg_token_len,
    bpe_token_count,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from vector_db_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_neardup,
    simhash64,
    simhash_candidates,
)
from vector_db_spark.operators.knn import (
    pairwise_similarity,
    pairwise_similarity_blocked,
)
from vector_db_spark.oracle import cosine_sim_sql
from vector_db_spark.queries.registry import query
from vector_db_spark.sources.fixtures import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# Exact dedup (hash-groupBy). The fixtures have no exact duplicates, so the
# query injects them deterministically (re-insert the first 100 docs under
# shifted ids) — the operator must find exactly those groups.
# --------------------------------------------------------------------------

_DEDUP_ORACLE = """
WITH maxid AS (SELECT max(doc_id) AS m FROM documents),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT d.doc_id + x.m + 1 AS doc_id, d.text
  FROM documents d, maxid x WHERE d.doc_id < 100
),
hashed AS (SELECT doc_id, md5(text) AS content_hash FROM corpus),
grouped AS (
  SELECT doc_id, content_hash,
         min(doc_id) OVER (PARTITION BY content_hash) AS canonical_id,
         count(*) OVER (PARTITION BY content_hash) AS n_copies
  FROM hashed
)
SELECT doc_id, canonical_id, n_copies FROM grouped WHERE n_copies > 1
"""


@query("dedup_exact", oracle=_DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).head()[0]
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 100).select(
            (F.col("doc_id") + max_id + 1).alias("doc_id"), "text"
        )
    )
    return (
        exact_dedup(corpus, "text", "doc_id")
        .filter(F.col("n_copies") > 1)
        .select("doc_id", "canonical_id", "n_copies")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination — word-3-gram overlap vs a held-out eval set
# --------------------------------------------------------------------------

_DECONTAM_ORACLE = """
WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
maxid AS (SELECT max(doc_id) AS m FROM documents),
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT b.doc_id + x.m + 1 AS doc_id, 'leak marker ' || b.text AS text
  FROM bench b, maxid x
),
btoks AS (SELECT list_filter(string_split(text, ' '), t -> t <> '') AS t
          FROM bench),
bgrams AS (
  SELECT DISTINCT unnest(list_transform(
    generate_series(1, greatest(len(t) - 2, 0)),
    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
  FROM btoks
),
ctoks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
          FROM corpus),
cgrams AS (
  SELECT doc_id, len(list_distinct(list_transform(
           generate_series(1, greatest(len(t) - 2, 0)),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS n_grams,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(t) - 2, 0)),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
  FROM ctoks
)
SELECT c.doc_id,
       CAST(c.n_grams AS INT) AS n_grams,
       CAST(count(*) AS INT) AS n_contaminated,
       round(CAST(count(*) AS DOUBLE) / c.n_grams, 6) AS contaminated_frac
FROM cgrams c JOIN bgrams b ON c.gram = b.gram
GROUP BY c.doc_id, c.n_grams
"""


@query("decontamination", oracle=_DECONTAM_ORACLE)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing any word 3-gram with a benchmark set
    (every-97th doc plays the eval suite; its texts are re-injected under
    shifted ids as known leaks). Benchmark grams broadcast; corpus is
    scanned once — the standard pre-training decontamination sweep."""
    from vector_db_spark.operators.decontam import ngram_contamination

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    max_id = docs.agg(F.max("doc_id")).head()[0]
    corpus = docs.filter(F.col("doc_id") % 97 != 0).unionByName(
        bench.select(
            (F.col("doc_id") + max_id + 1).alias("doc_id"),
            F.concat(F.lit("leak marker "), F.col("text")).alias("text"),
        )
    )
    res = ngram_contamination(corpus, bench, n=3)
    return res.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        F.round("contaminated_frac", 6).alias("contaminated_frac"),
    )


# --------------------------------------------------------------------------
# Exact n-gram (3-word shingle) Jaccard near-dup — inverted-index join
# --------------------------------------------------------------------------

_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, greatest(len(t) - 2, 0)),
    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
  ))) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter p JOIN sizes sa ON p.a_id = sa.doc_id
JOIN sizes sb ON p.b_id = sb.doc_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.6
"""


@query("neardup_jaccard", oracle=_JACCARD_ORACLE)
def neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = jaccard_pairs(_docs(spark, sf_dir), threshold=0.6)
    return pairs.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


# --------------------------------------------------------------------------
# Text quality features
# --------------------------------------------------------------------------

_EN = "'the','a','of','and','to','in','is','it','that','for'"

_QUALITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
  len(toks) AS n_tokens,
  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks), 6) AS avg_tok_len,
  round(CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
        / length(text), 6) AS punct_ratio,
  round(CAST(len(list_filter(toks, t -> t IN ({_EN}))) AS DOUBLE) / len(toks), 6)
    AS stop_ratio,
  round(CAST(len(list_filter(toks, t -> t IN ({_EN}))) AS DOUBLE) / len(toks) * 0.5
        + least(len(toks) / 100.0, 1.0) * 0.3
        + (1.0 - CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text)) * 0.2, 6) AS quality
FROM base
"""


@query("text_quality", oracle=_QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        F.round(avg_token_len(t), 6).alias("avg_tok_len"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t, "en"), 6).alias("stop_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
    )


# --------------------------------------------------------------------------
# Language-ID (stopword-vote heuristic, deterministic tie-break)
# --------------------------------------------------------------------------


def _hits_sql(words: tuple[str, ...]) -> str:
    lst = ",".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, t -> t IN ({lst})))"


from vector_db_spark.functions.text import STOPWORDS  # noqa: E402

_H = {lang: _hits_sql(words) for lang, words in STOPWORDS.items()}

_LANG_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         {_H['en']} AS h_en, {_H['de']} AS h_de, {_H['es']} AS h_es,
         {_H['fr']} AS h_fr, {_H['zh']} AS h_zh
  FROM base
)
SELECT doc_id, lang,
  CASE
    WHEN h_en >= greatest(h_de, h_es, h_fr, h_zh) THEN 'en'
    WHEN h_de >= greatest(h_es, h_fr, h_zh) THEN 'de'
    WHEN h_es >= greatest(h_fr, h_zh) THEN 'es'
    WHEN h_fr >= h_zh THEN 'fr'
    ELSE 'zh'
  END AS lang_pred
FROM scored
"""


@query("lang_id_predict", oracle=_LANG_ORACLE)
def lang_id_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", "lang", lang_id(F.col("text")).alias("lang_pred"))


# --------------------------------------------------------------------------
# Document fingerprint (normalized md5)
# --------------------------------------------------------------------------

_FP_ORACLE = """
SELECT doc_id,
       md5(trim(regexp_replace(
         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         ' +', ' ', 'g'))) AS fp
FROM documents WHERE doc_id < 100
"""


@query("doc_fingerprint", oracle=_FP_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


# --------------------------------------------------------------------------
# Corpus token statistics
# --------------------------------------------------------------------------

_TOKSTATS_ORACLE = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
)
SELECT (SELECT count(*) FROM documents) AS n_docs,
       count(*) AS total_tokens,
       count(DISTINCT token) AS vocab_size
FROM tok
"""


@query("token_stats", oracle=_TOKSTATS_ORACLE)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()
    tok = docs.select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("token")
    )
    return tok.agg(
        F.lit(n_docs).cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("token").alias("vocab_size"),
    )


# --------------------------------------------------------------------------
# BPE-ish token counting (vs whitespace) — LLM cost estimation primitive
# --------------------------------------------------------------------------

_BPE_ORACLE = """
SELECT doc_id,
  len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS n_bpe,
  len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_ws,
  round(CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS DOUBLE)
        / len(list_filter(string_split(text, ' '), t -> t <> '')), 6) AS bpe_per_word
FROM documents WHERE doc_id < 200
"""


@query("bpe_token_stats", oracle=_BPE_ORACLE)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    t = F.col("text")
    return docs.select(
        "doc_id",
        bpe_token_count(t).alias("n_bpe"),
        token_count(t).alias("n_ws"),
        F.round(
            bpe_token_count(t).cast("double") / token_count(t), 6
        ).alias("bpe_per_word"),
    )


# --------------------------------------------------------------------------
# Semantic decontamination — embedding cosine vs a benchmark vector set
# --------------------------------------------------------------------------

_SEM_DECONTAM_ORACLE = f"""
WITH scored AS (
  SELECT c.vec_id AS doc_id, b.vec_id AS bench_id,
         {cosine_sim_sql('c.embedding', 'b.embedding')} AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY c.vec_id
           ORDER BY {cosine_sim_sql('c.embedding', 'b.embedding')} DESC,
                    b.vec_id
         ) AS rn
  FROM embeddings c JOIN embeddings b
    ON b.vec_id < 20 AND c.vec_id >= 20
)
SELECT doc_id, bench_id, round(cos, 6) AS cosine
FROM scored WHERE rn = 1 AND cos >= 0.30
"""


@query("semantic_decontamination", oracle=_SEM_DECONTAM_ORACLE)
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n-gram sweep's semantic complement: flag corpus vectors
    cosine-0.30-close to any benchmark vector (the first 20 embeddings
    play the eval suite), reporting each flagged doc's best benchmark
    match. The benchmark side collapses to one broadcast L2-normalized
    matrix; the corpus is scanned once with a per-Arrow-batch GEMM and
    no shuffle — the formulation that survives 100 TB. Engine GEMM vs
    the oracle's float64 fold agree to ~1e-12, inside the 6-decimal
    rounding (the embedding_neardup precedent)."""
    from vector_db_spark.operators.decontam import semantic_contamination

    emb = load_table(spark, sf_dir, "embeddings")
    res = semantic_contamination(
        emb.filter(F.col("vec_id") >= 20),
        emb.filter(F.col("vec_id") < 20),
        threshold=0.30,
        id_col="vec_id",
        vec_col="embedding",
    )
    return res.select(
        F.col("vec_id").alias("doc_id"),
        "bench_id",
        F.round("cosine", 6).alias("cosine"),
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup (exact pairwise over the vector corpus)
# --------------------------------------------------------------------------

_EMB_ORACLE = f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round({cosine_sim_sql('a.embedding', 'b.embedding')}, 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cosine_sim_sql('a.embedding', 'b.embedding')} >= 0.4
"""


@query("embedding_neardup", oracle=_EMB_ORACLE)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = pairwise_similarity(emb, metric="cosine", threshold=0.4)
    return pairs.select("a_id", "b_id", F.round("score", 6).alias("score"))


@query("embedding_neardup_blocked", oracle=_EMB_ORACLE)
def embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as embedding_neardup via the grid-blocked BLAS path —
    the formulation that survives 100 TB (bounded per-task memory,
    B(B+1)/2-way parallel, vectorized). Scores agree with the fold-based
    oracle to ~1e-12, far inside the 6-decimal rounding."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = pairwise_similarity_blocked(
        emb, metric="cosine", threshold=0.4, n_blocks=16
    )
    return pairs.select("a_id", "b_id", F.round("score", 6).alias("score"))


# --------------------------------------------------------------------------
# MinHash-LSH and SimHash near-dup: not expressible in portable SQL (engine
# hash functions differ) → rows-only driver check; recall against the exact
# operator is asserted in tests/test_dedup.py.
# --------------------------------------------------------------------------


@query("minhash_lsh_neardup")
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = minhash_neardup(_docs(spark, sf_dir), threshold=0.6)
    return res.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


@query("minhash_lsh_neardup_capped")
def minhash_lsh_neardup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of minhash_lsh_neardup (VERDICT r10 #2): identical
    pipeline with max_bucket=64, so a boilerplate-heavy corpus's hottest
    LSH bucket emits its O(b) spanning star as candidates instead of the
    O(b²) all-pairs enumeration — the one skew exposure the uncapped
    default carried at 100×. Output ⊆ the uncapped query's output (the
    cap only shrinks the candidate set; every emitted pair is still
    exact-Jaccard ≥ threshold, pinned in tests/test_text_dedup.py), and
    clustering consumers lose nothing because a star spans the same
    component. Rows-only gate like the uncapped anchor: the xxhash64
    MinHash family has no DuckDB twin."""
    res = minhash_neardup(_docs(spark, sf_dir), threshold=0.6, max_bucket=64)
    return res.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


@query("simhash_neardup")
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    hashes = simhash64(_docs(spark, sf_dir))
    return simhash_candidates(hashes, max_hamming=3)


# --------------------------------------------------------------------------
# Duplicate clusters: near-dup pairs → connected components → canonical id.
# Oracle: recursive CTE computing min reachable id over the same pair set.
# --------------------------------------------------------------------------

_CLUSTERS_ORACLE = f"""
WITH RECURSIVE
pairs AS (
  SELECT a_id, b_id FROM ({_JACCARD_ORACLE.replace('round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard', 'CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard')})
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION ALL
  SELECT b_id AS s, a_id AS d FROM pairs
),
verts AS (SELECT DISTINCT s AS id FROM edges),
reach(id, label) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
)
SELECT id AS doc_id, min(label) AS cluster_id
FROM reach GROUP BY id
"""


@query("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the exact-Jaccard pair graph via iterative
    min-label propagation (operators/dedup.connected_components): A~B and
    B~C collapse into one cluster even when A~C was never emitted. The
    oracle walks the same edges with a recursive CTE."""
    from vector_db_spark.operators.dedup import connected_components

    pairs = jaccard_pairs(_docs(spark, sf_dir), threshold=0.6)
    comp = connected_components(pairs)
    return comp.select(F.col("id").alias("doc_id"), "cluster_id")


@query("dedup_clusters_lsh")
def dedup_clusters_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe duplicate clustering (VERDICT r9 #3): MinHash-LSH bucket
    candidates as in-bucket STAR edges (member → bucket-min, O(b) per
    bucket — dedup.lsh_star_edges) → large-star/small-star connected
    components. Same components as all-pairs bucket edges (a star spans
    the bucket), without the O(b²) residue that made the exact-pair
    variant (dedup_clusters, kept as the oracle twin) the slowest sf1
    query. Rows-only gate: the xxhash64 MinHash family has no DuckDB
    equivalent; tests/test_text_dedup.py pins exact-cluster containment
    (every exact-Jaccard cluster lands inside one LSH cluster) and the
    recall tests govern the band s-curve."""
    from vector_db_spark.operators.dedup import (
        connected_components,
        lsh_star_edges,
        minhash_signatures,
    )

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs)
    comp = connected_components(lsh_star_edges(sigs))
    return comp.select(F.col("id").alias("doc_id"), "cluster_id")


# --------------------------------------------------------------------------
# Deterministic stratified sampling (md5 hash-bucket — the one hash both
# engines share, so sampling itself is oracle-verified)
# --------------------------------------------------------------------------

_SAMPLE_ORACLE = """
WITH bucketed AS (
  SELECT doc_id, lang,
         CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 8)) AS BIGINT)
           % 10000 AS b
  FROM documents
)
SELECT doc_id, lang FROM bucketed
WHERE b < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000 ELSE 1000 END
"""


@query("stratified_sample_docs", oracle=_SAMPLE_ORACLE)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repartition-proof per-language sampling: keep 50% of en, 20% of de,
    10% elsewhere, decided purely by md5(doc_id, salt)."""
    from vector_db_spark.operators.sampling import stratified_sample

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return stratified_sample(
        docs,
        strata_col="lang",
        fractions={"en": 0.5, "de": 0.2},
        default_fraction=0.1,
        key_col="doc_id",
        salt="s1",
    )


# --------------------------------------------------------------------------
# Hash-disjoint train/eval split + deterministic global shuffle: the two
# bookends of corpus preparation. Split membership is a property of the key
# (new ingests can never leak eval keys into train); shuffle order is
# md5-derived, so it is reproducible across runs/clusters/engines and needs
# no single-task global window.
# --------------------------------------------------------------------------

_SPLIT_ORACLE = """
SELECT doc_id,
       CASE WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8)) AS BIGINT)
                 % 10000 < 200 THEN 'eval' ELSE 'train' END AS split
FROM documents
"""


@query("train_eval_split_docs", oracle=_SPLIT_ORACLE)
def train_eval_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc split label from the hash-disjoint 2% eval split."""
    from vector_db_spark.operators.sampling import train_eval_split

    docs = _docs(spark, sf_dir).select("doc_id")
    train, eval_ = train_eval_split(docs, key_col="doc_id", eval_fraction=0.02)
    return train.withColumn("split", F.lit("train")).unionByName(
        eval_.withColumn("split", F.lit("eval"))
    )


_SHUFFLE_ORACLE = """
SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || 'shuffle') AS shuffle_key
FROM documents
"""


@query("training_shuffle_docs", oracle=_SHUFFLE_ORACLE)
def training_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: range-partitioned total order on an
    md5 shuffle key (never ORDER BY rand(), never a global row_number —
    see operators.sampling.global_shuffle). The total-order property is
    asserted in tests/test_pipeline_ops.py; the oracle verifies the key."""
    from vector_db_spark.operators.sampling import global_shuffle

    docs = _docs(spark, sf_dir).select("doc_id")
    return global_shuffle(docs, key_col="doc_id", n_partitions=8)


# --------------------------------------------------------------------------
# Char 5-gram Jaccard near-dup — the tokenizer-free variant (CJK-safe)
# --------------------------------------------------------------------------

_CHAR_JACCARD_ORACLE = """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, greatest(length(text) - 4, 0)),
    i -> substr(text, i, 5)
  ))) AS shingle
  FROM documents WHERE doc_id < 300
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter p JOIN sizes sa ON p.a_id = sa.doc_id
JOIN sizes sb ON p.b_id = sb.doc_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
"""


@query("neardup_char_jaccard", oracle=_CHAR_JACCARD_ORACLE)
def neardup_char_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 5-gram Jaccard (unit='char'): no tokenizer assumption, so
    it works on whitespace-free scripts; same inverted-index join shape."""
    pairs = jaccard_pairs(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 300),
        threshold=0.5,
        k=5,
        unit="char",
    )
    return pairs.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


# --------------------------------------------------------------------------
# Fuzzy (edit-distance) join: entity resolution via lossless q-gram
# blocking (Gravano et al. VLDB'01) — typo-level matching that Jaccard
# bands and MinHash buckets can't express; never a corpus cross join.
# --------------------------------------------------------------------------

_FUZZY_ORACLE = """
WITH n AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS a_name, b.p_name AS b_name,
       levenshtein(a.p_name, b.p_name) AS dist
FROM n a JOIN n b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


@query("fuzzy_name_pairs", oracle=_FUZZY_ORACLE)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All distinct part-name pairs within Levenshtein 3 — the catalog-
    cleaning primitive ("anodised" vs "anodized"). Blocking is an
    equi-join on shared 2-grams (the same shuffle shape as the MinHash
    band join) plus one bounded broadcast short-block; the q-gram count
    bound makes the union provably complete, so the result equals the
    naive cross join the oracle runs (pinned across typo/short/empty
    shapes in tests/test_fuzzy.py). Levenshtein itself is JVM codegen
    with identical unit-cost semantics in DuckDB."""
    from vector_db_spark.operators.fuzzy import fuzzy_self_join

    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    pairs = fuzzy_self_join(names, "p_name", "p_name", max_dist=3, k=2)
    return pairs.select(
        F.col("a_id").alias("a_name"),
        F.col("b_id").alias("b_name"),
        "dist",
    )


_FUZZY_CANON_ORACLE = """
WITH RECURSIVE
n AS (SELECT p_name, MIN(p_partkey) AS name_id FROM part GROUP BY p_name),
pairs AS (
  SELECT a.name_id AS a_id, b.name_id AS b_id
  FROM n a JOIN n b ON a.name_id < b.name_id
  WHERE levenshtein(a.p_name, b.p_name) <= 3
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION ALL
  SELECT b_id AS s, a_id AS d FROM pairs
),
verts AS (SELECT name_id AS id FROM n),
reach(id, label) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
),
lab AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id)
SELECT n.p_name, c.p_name AS canonical_name
FROM n JOIN lab ON n.name_id = lab.id
JOIN n c ON c.name_id = lab.cluster_id
"""


@query("fuzzy_entity_canonical", oracle=_FUZZY_CANON_ORACLE)
def fuzzy_entity_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity canonicalization: fuzzy pairs (lossless q-gram
    blocking) → transitive closure (min-label connected components, the
    dedup machinery) → every catalog name mapped to its cluster's
    canonical spelling ("red widgett" and "rd widget" both normalize to
    whatever the minimum-keyed member spells). Isolated names (no fuzzy
    neighbor) canonicalize to themselves via the coalesce, so the output
    is total over DISTINCT names. The oracle replays the same edges with
    a recursive CTE."""
    from vector_db_spark.operators.dedup import connected_components
    from vector_db_spark.operators.fuzzy import fuzzy_self_join

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("name_id"))
    pairs = fuzzy_self_join(names, "p_name", "name_id", max_dist=3)
    comp = connected_components(pairs.select("a_id", "b_id"))
    lab = (
        names.join(comp.withColumnRenamed("id", "name_id"), "name_id", "left")
        .select(
            "p_name",
            F.coalesce("cluster_id", "name_id").alias("cid"),
        )
    )
    canon = names.select(
        F.col("name_id").alias("cid"), F.col("p_name").alias("canonical_name")
    )
    return lab.join(canon, "cid").select("p_name", "canonical_name")


# --------------------------------------------------------------------------
# Hybrid search: keyword + vector with reciprocal-rank fusion
# --------------------------------------------------------------------------

_HQUERY_TEXT = "spark query vector join fast"
_HQ_TOKS = "['spark','query','vector','join','fast']"

_HYBRID_ORACLE = f"""
WITH corpus AS (
  SELECT d.doc_id AS id, d.text, e.embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
tc AS (
  SELECT id,
         len(list_intersect(
           list_distinct(list_filter(string_split(text, ' '), t -> t <> '')),
           {_HQ_TOKS})) AS tscore
  FROM corpus
),
ttop AS (
  SELECT id, row_number() OVER (ORDER BY tscore DESC, id) AS text_rank
  FROM (SELECT * FROM tc WHERE tscore > 0 ORDER BY tscore DESC, id LIMIT 100)
),
vc AS (
  SELECT c.id, {cosine_sim_sql('c.embedding', 'q.qv')} AS vscore
  FROM corpus c, q
),
vtop AS (
  SELECT id, row_number() OVER (ORDER BY vscore DESC, id) AS vec_rank
  FROM (SELECT * FROM vc ORDER BY vscore DESC, id LIMIT 100)
),
fused AS (
  SELECT COALESCE(t.id, v.id) AS id, t.text_rank, v.vec_rank,
         COALESCE(CAST(1.0 AS DOUBLE)/(60 + t.text_rank), 0.0)
         + COALESCE(CAST(1.0 AS DOUBLE)/(60 + v.vec_rank), 0.0) AS rrf_score
  FROM ttop t FULL OUTER JOIN vtop v ON t.id = v.id
)
SELECT id, text_rank, vec_rank, round(rrf_score, 6) AS rrf_score
FROM fused ORDER BY rrf_score DESC, id LIMIT 10
"""


@query("hybrid_search_rrf", oracle=_HYBRID_ORACLE)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword + vector retrieval fused with RRF (operators/hybrid.py):
    each modality takes its top-100 via TakeOrderedAndProject, ranks are
    assigned inside the candidate lists only, and a full outer join fuses
    them — the corpus is never globally sorted."""
    from vector_db_spark.operators.hybrid import hybrid_search
    from vector_db_spark.queries.vector_queries import _qvec

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    corpus = docs.join(emb, "doc_id")
    res = hybrid_search(
        corpus, _HQUERY_TEXT, _qvec(spark, sf_dir), 10, fetch=100
    )
    return res.select(
        "id", "text_rank", "vec_rank", F.round("rrf_score", 6).alias("rrf_score")
    )


# --------------------------------------------------------------------------
# BM25 keyword ranking (Okapi, Lucene idf form) — full arithmetic parity
# --------------------------------------------------------------------------

_BM25_ORACLE = """
WITH base AS (
  SELECT doc_id AS id,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
docs AS (SELECT id, toks, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM docs),
postings AS (
  SELECT d.id, d.dl, t.term,
         CAST(len(list_filter(d.toks, x -> x = t.term)) AS DOUBLE) AS tf
  FROM docs d
  CROSS JOIN (SELECT unnest(['fast', 'query', 'spark', 'vector']) AS term) t
  WHERE list_contains(d.toks, t.term)
),
dfs AS (SELECT term, count(DISTINCT id) AS df FROM postings GROUP BY term),
contribs AS (
  SELECT p.id, p.term,
         ln((CAST(s.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * p.tf * 2.2
           / (p.tf + 1.2 * (1.0 - 0.75 + (0.75 * p.dl) / s.avgdl)) AS contrib
  FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s
),
scored AS (
  SELECT id, SUM(contrib ORDER BY term) AS score FROM contribs GROUP BY id
),
top AS (SELECT id, score FROM scored ORDER BY score DESC, id LIMIT 20)
SELECT id, round(score, 6) AS score FROM top
"""


@query("bm25_topk_docs", oracle=_BM25_ORACLE)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed query (operators/bm25.py): postings
    restricted to query terms before any shuffle, df/avgdl as small
    aggregates, contributions folded in term order for bit parity."""
    from vector_db_spark.operators.bm25 import bm25_topk

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    res = bm25_topk(docs, "spark query vector fast", 20)
    return res.select("id", F.round("score", 6).alias("score"))


# --------------------------------------------------------------------------
# Heavy hitters: exact top-20 tokens by corpus frequency
# --------------------------------------------------------------------------

_HEAVY_ORACLE = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
)
SELECT token, COUNT(*) AS n
FROM tok GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


@query("heavy_hitter_tokens", oracle=_HEAVY_ORACLE)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters: explode → count → TakeOrdered(20).
    The map-side partial agg means the shuffle carries one row per
    (partition, token), not one per occurrence."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# End-to-end training-data preparation: quality gate → exact dedup →
# deterministic sample → per-language output stats. One composite plan.
# --------------------------------------------------------------------------

_PREP_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang, text,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
quality AS (
  SELECT doc_id, lang, text, len(toks) AS n_tokens,
         CAST(len(list_filter(toks,
           t -> t IN ('the','a','of','and','to','in','is','it','that','for')))
           AS DOUBLE) / len(toks) * 0.5
         + least(len(toks) / 100.0, 1.0) * 0.3
         + (1.0 - CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                  AS DOUBLE) / length(text)) * 0.2 AS q
  FROM scored
),
gated AS (SELECT * FROM quality WHERE q >= 0.3),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
),
sampled AS (
  SELECT * FROM deduped
  WHERE CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'prep'), 1, 8))
             AS BIGINT) % 10000 < 8000
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(q), 6) AS mean_quality
FROM sampled GROUP BY lang
"""


@query("pipeline_prepare_corpus", oracle=_PREP_ORACLE)
def pipeline_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite LLM-data flow as ONE declarative plan: quality gate →
    exact dedup (min-id survivor) → 80% deterministic sample → per-language
    stats. Catalyst pipelines the quality filter into the scan; dedup is
    the only shuffle before the final aggregate."""
    from vector_db_spark.operators.sampling import deterministic_sample

    docs = _docs(spark, sf_dir)
    q = quality_score(F.col("text"))
    gated = docs.select(
        "doc_id", "lang", "text",
        token_count(F.col("text")).alias("n_tokens"),
        q.alias("q"),
    ).filter(F.col("q") >= 0.3)
    deduped = (
        exact_dedup(gated, "text", "doc_id")
        .filter(F.col("doc_id") == F.col("canonical_id"))
    )
    sampled = deterministic_sample(deduped, 0.8, "doc_id", salt="prep")
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("q"), 6).alias("mean_quality"),
    )


# --------------------------------------------------------------------------
# Repetition quality filters (Gopher-style), PII redaction, sequence packing
# --------------------------------------------------------------------------

_REP_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents
), g AS (
  SELECT doc_id, toks,
    CASE WHEN len(toks) >= 2 THEN list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1])
         ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM t
)
SELECT doc_id,
  round(CASE WHEN len(toks) > 0 THEN CAST(list_max(list_transform(list_distinct(toks), d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE) / len(toks) ELSE 0 END, 6) AS top_word_frac,
  round(CASE WHEN len(grams) > 0 THEN CAST(list_sum(list_transform(list_distinct(grams), gg -> CASE WHEN len(list_filter(grams, y -> y = gg)) > 1 THEN len(list_filter(grams, y -> y = gg)) ELSE 0 END)) AS DOUBLE) / len(grams) ELSE 0 END, 6) AS dup_2gram_frac
FROM g
"""


@query("repetition_quality", oracle=_REP_ORACLE)
def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (top-word fraction, duplicate-2-gram
    fraction) computed row-local via nested higher-order functions — the
    repetition pre-filter never shuffles at any corpus size. Uses the
    two-projection formulation (functions/text.with_repetition_signals) so
    the token/gram arrays materialize once instead of re-splitting per
    reference."""
    from vector_db_spark.functions.text import with_repetition_signals

    return (
        with_repetition_signals(_docs(spark, sf_dir), "text", 2)
        .select(
            "doc_id",
            F.round(F.col("top_word_frac"), 6).alias("top_word_frac"),
            F.round(F.col("dup_ngram_frac"), 6).alias("dup_2gram_frac"),
        )
    )


_PII_ORACLE = """
WITH s AS (
  SELECT doc_id, concat('contact ', source, '.team@example.org or +1-555-',
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' :: ', text) AS s
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(s, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(s, '\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
  md5(regexp_replace(regexp_replace(s, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'), '\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
FROM s
"""


@query("pii_redaction", oracle=_PII_ORACLE)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over synthesized contact strings (the fixture corpus holds
    none, so the query plants a deterministic email+phone per doc from its
    own columns — both engines synthesize, detect, and redact identically).
    Patterns are pinned to the Java∩RE2 regex subset; emails redact before
    phones so digit runs inside addresses can't be half-redacted."""
    from vector_db_spark.functions.text import email_count, phone_count, redact_pii
    from vector_db_spark.operators.util import fan_out

    s = F.concat(
        F.lit("contact "), F.col("source"), F.lit(".team@example.org or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" :: "), F.col("text"),
    )
    # three regex passes per row are the dense stage — spread a narrow scan
    return fan_out(_docs(spark, sf_dir)).select(
        "doc_id",
        email_count(s).alias("n_emails"),
        phone_count(s).alias("n_phones"),
        F.md5(redact_pii(s)).alias("redacted_md5"),
    )


_PACK_ORACLE = """
WITH t AS (
  SELECT doc_id,
    CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'pk'), 1, 8)) AS BIGINT) % 8 AS bucket,
    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, bucket, n_tokens,
    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, n_tokens,
  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
  CAST((cum - n_tokens) % 512 AS BIGINT) AS start_off
FROM c
"""


@query("pack_sequences_docs", oracle=_PACK_ORACLE)
def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: md5-bucketed doc streams, window
    cumsum, chunk cut at 512 tokens — one shuffle total (SURVEY.md §9)."""
    from vector_db_spark.operators.packing import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), max_tokens=512, buckets=8, salt="pk")


_LM_ORACLE = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM tok),
vocab AS (
  SELECT token, COUNT(*) AS cnt
  FROM tok GROUP BY token
  ORDER BY cnt DESC, token ASC
  LIMIT 16
),
logq AS (
  SELECT token, CAST(floor(ln(CAST(cnt AS DOUBLE) / total) * 1000000) AS BIGINT) AS lq
  FROM vocab, tot
),
dt AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
scored AS (
  SELECT dt.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN l.lq IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_count,
         CAST(SUM(COALESCE(l.lq,
              (SELECT CAST(floor(ln(0.5 / total) * 1000000) AS BIGINT) FROM tot)
         )) AS BIGINT) AS logq_micro_sum
  FROM dt LEFT JOIN logq l ON dt.token = l.token
  GROUP BY dt.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.oov_count, 0) AS oov_count,
       COALESCE(s.logq_micro_sum, 0) AS logq_micro_sum,
       CASE WHEN s.n_tokens > 0 THEN
         floor(CAST(s.logq_micro_sum AS DOUBLE)
               / CAST(s.n_tokens AS DOUBLE) + 0.5) / 1000000.0
       END AS lm_score
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


@query("unigram_lm_score", oracle=_LM_ORACLE)
def unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM quality score: train token frequencies with
    ONE corpus shuffle + a bounded driver collect (top-16 vocabulary so
    the OOV floor is exercised on the fixture's 31-token vocabulary),
    then score every document row-locally — the vocabulary rides into
    codegen as a literal map and log-probs sum as integer micro-nats, so
    the scoring stage adds zero exchanges and is bit-reproducible across
    engines (integer sums are order-free; float folds are not)."""
    from vector_db_spark.operators.lm import score_documents, train_unigram
    from vector_db_spark.operators.util import fan_out

    docs = _docs(spark, sf_dir)
    lm = train_unigram(docs, top_v=16)
    return score_documents(fan_out(docs), lm)


_C4_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id, toks,
    CASE WHEN len(toks) >= 2 THEN list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1])
         ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM t
), m AS (
  SELECT doc_id,
    len(toks) AS n,
    COALESCE(list_sum(list_transform(toks, x -> len(x))), 0) AS sum_len,
    COALESCE(list_max(list_transform(list_distinct(toks), d -> len(list_filter(toks, x -> x = d)))), 0) AS max_run,
    len(grams) AS n_grams,
    COALESCE(list_sum(list_transform(list_distinct(grams), gg ->
      CASE WHEN len(list_filter(grams, y -> y = gg)) > 1
           THEN len(list_filter(grams, y -> y = gg)) ELSE 0 END)), 0) AS dup_occ
  FROM g
)
SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_docs FROM (
  SELECT CASE WHEN n < 50 THEN 'too_short'
              WHEN n > 2000 THEN 'too_long'
              WHEN sum_len < 2 * n OR sum_len > 10 * n THEN 'word_len'
              WHEN max_run * 100 > 30 * n THEN 'top_word'
              WHEN dup_occ * 100 > 20 * n_grams THEN 'dup_gram'
              ELSE 'kept' END AS verdict
  FROM m
)
GROUP BY verdict
"""


@query("c4_filter_summary", oracle=_C4_ORACLE)
def c4_filter_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style keep/drop stage as ONE row-local CASE projection +
    a tiny verdict groupBy: every document gets its first-failing rule
    (length bounds, mean word length, top-word share, duplicate-2-gram
    mass). All rules are integer comparisons, so verdicts are bit-exact
    across engines — a float fraction threshold would make keep/drop
    rounding-dependent."""
    from vector_db_spark.operators.filtering import filter_summary

    return filter_summary(_docs(spark, sf_dir))


_IMPORTANCE_ORACLE = """
WITH t AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
    CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'imp'), 1, 8)) AS BIGINT)
      % 10000 AS b
  FROM documents
)
SELECT doc_id, n_tokens FROM t
WHERE b < least(CAST(10000 AS BIGINT),
                greatest(CAST(0 AS BIGINT),
                         CAST((CAST(n_tokens AS DOUBLE) / 400.0) * 10000 AS BIGINT)))
"""


@query("importance_sample_docs", oracle=_IMPORTANCE_ORACLE)
def importance_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling: keep probability rises linearly with
    document length (p = n_tokens/400, capped at 1), decided purely by
    content hash — longer documents survive proportionally more often and
    the sample never re-rolls under repartitioning. A pushable filter:
    zero shuffle at any corpus size."""
    from vector_db_spark.functions.text import token_count
    from vector_db_spark.operators.sampling import importance_sample

    docs = _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return importance_sample(
        docs,
        weight=F.col("n_tokens").cast("double") / 400.0,
        key_col="doc_id",
        salt="imp",
    )


_SOURCE_PROFILE_ORACLE = """
WITH f AS (
  SELECT source, lang, n_chars,
         md5(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
           ' +', ' ', 'g'))) AS fp
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
       round(1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6) AS dup_rate
FROM f
GROUP BY source
"""


@query("source_profile", oracle=_SOURCE_PROFILE_ORACLE)
def source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health profile (doc volume, language spread,
    char mass, near-dup rate via content fingerprint) — the dashboard a
    curation run reads before choosing per-source mixing weights. One
    shuffle on the source key; the fingerprint is row-local."""
    from vector_db_spark.functions.text import fingerprint

    docs = _docs(spark, sf_dir).select(
        "source", "lang", "n_chars", fingerprint(F.col("text")).alias("fp")
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("fp").alias("n_unique"),
        F.round(
            1.0 - F.countDistinct("fp").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


_CHUNK_DEDUP_ORACLE = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS words
  FROM documents
),
e AS (SELECT doc_id, unnest(words) AS word, unnest(range(1, len(words)+1)) AS ord FROM w),
ch AS (
  SELECT doc_id, CAST((ord - 1) // 20 AS INT) AS chunk_idx,
         string_agg(word, ' ' ORDER BY ord) AS chunk
  FROM e GROUP BY doc_id, (ord - 1) // 20
),
ranked AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn,
         CAST(count(*) OVER (PARTITION BY doc_id) AS INT) AS n_chunks
  FROM ch
)
SELECT doc_id,
       string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text,
       n_chunks,
       CAST(n_chunks - count(*) AS INT) AS n_dropped
FROM ranked WHERE rn = 1
GROUP BY doc_id, n_chunks
"""


@query("chunk_dedup_docs", oracle=_CHUNK_DEDUP_ORACLE)
def chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup at 20-word-chunk granularity (operators/dedup.py
    chunk_dedup) — the CCNet line-dedup recipe: cross-document boilerplate
    chunks are dropped (globally-first copy survives), unique prose stays,
    and the cleaned text reassembles in position order."""
    from vector_db_spark.operators.dedup import chunk_dedup

    return chunk_dedup(_docs(spark, sf_dir).select("doc_id", "text"))


from vector_db_spark.operators.lm import LQ_BACKOFF  # noqa: E402

_BIGRAM_ORACLE = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
dt AS (
  SELECT doc_id, unnest(toks) AS token, unnest(range(1, len(toks)+1)) AS ord
  FROM w
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM dt),
vocab AS (
  SELECT token, COUNT(*) AS cnt FROM dt GROUP BY token
  ORDER BY cnt DESC, token ASC LIMIT 16
),
uni AS (
  SELECT token, CAST(floor(ln(CAST(cnt AS DOUBLE) / total) * 1000000) AS BIGINT) AS lq
  FROM vocab, tot
),
oovq AS (SELECT CAST(floor(ln(0.5 / total) * 1000000) AS BIGINT) AS lq FROM tot),
bg AS (
  SELECT a.doc_id, a.ord, a.token || ' ' || b.token AS bigram
  FROM dt a JOIN dt b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
),
ctx AS (SELECT split_part(bigram, ' ', 1) AS t1, COUNT(*) AS ctx_cnt FROM bg GROUP BY 1),
topb AS (
  SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram
  ORDER BY cnt DESC, bigram ASC LIMIT 32
),
bq AS (
  SELECT t.bigram,
         CAST(floor(ln(CAST(t.cnt AS DOUBLE) / c.ctx_cnt) * 1000000) AS BIGINT) AS lq
  FROM topb t JOIN ctx c ON split_part(t.bigram, ' ', 1) = c.t1
),
scored_tok AS (
  SELECT d.doc_id,
         CASE WHEN d.ord = 1 THEN COALESCE(u.lq, (SELECT lq FROM oovq))
              ELSE COALESCE(b2.lq, {LQ_BACKOFF} + COALESCE(u.lq, (SELECT lq FROM oovq)))
         END AS lq,
         CASE WHEN d.ord > 1 AND b2.lq IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM dt d
  LEFT JOIN bg g ON g.doc_id = d.doc_id AND g.ord = d.ord - 1
  LEFT JOIN bq b2 ON b2.bigram = g.bigram
  LEFT JOIN uni u ON d.token = u.token
),
scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(hit) AS BIGINT) AS bigram_hits,
         CAST(SUM(lq) AS BIGINT) AS logq_micro_sum
  FROM scored_tok GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.bigram_hits, 0) AS bigram_hits,
       COALESCE(s.logq_micro_sum, 0) AS logq_micro_sum,
       CASE WHEN s.n_tokens > 0 THEN
         floor(CAST(s.logq_micro_sum AS DOUBLE)
               / CAST(s.n_tokens AS DOUBLE) + 0.5) / 1000000.0
       END AS lm_score
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


@query("bigram_lm_score", oracle=_BIGRAM_ORACLE)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM with stupid backoff (operators/lm.py BigramLm) — the
    next rung above unigram scoring on the CCNet/KenLM ladder: adjacent-
    pair conditionals for the top-B bigrams, 0.4-penalty backoff to the
    unigram table otherwise. Training is two bounded-collect shuffles;
    scoring is zero-shuffle literal-map lookups with integer micro-nat
    sums, so the giant 5-CTE oracle reproduces every score bit-for-bit."""
    from vector_db_spark.operators.lm import score_documents_bigram, train_bigram
    from vector_db_spark.operators.util import fan_out

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    lm = train_bigram(docs, top_v=16, top_b=32)
    # the scoring operator is zero-shuffle by contract; parallelize the
    # few-file fixture here (no-op at real scale)
    return score_documents_bigram(fan_out(docs), lm)


_SEM_COS = cosine_sim_sql("a.embedding", "b.embedding")

_SEMDEDUP_ORACLE = f"""
WITH RECURSIVE
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_SEM_COS} >= 0.4
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION ALL
  SELECT b_id AS s, a_id AS d FROM pairs
),
verts AS (SELECT DISTINCT s AS id FROM edges),
reach(id, label) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
),
comp AS (SELECT id, min(label) AS canonical FROM reach GROUP BY id)
SELECT e.vec_id,
       COALESCE(c.canonical, e.vec_id) AS canonical_id,
       COALESCE(c.canonical, e.vec_id) = e.vec_id AS keep
FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
"""


@query("semantic_dedup_exhaustive", oracle=_SEMDEDUP_ORACLE)
def semantic_dedup_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup correctness gate (operators/dedup.semantic_dedup): with
    n_clusters=1 the cluster blocking degenerates to exact all-pairs
    cosine, so the cluster-assign → per-cell BLAS pairs → min-label
    components → keep-canonical pipeline must reproduce the recursive-CTE
    oracle exactly."""
    from vector_db_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_clusters=1, threshold=0.4)


def _semdedup_clustered_oracle() -> str:
    """The exhaustive oracle's recursive-components tail with the pair
    space restricted to the FROZEN cosine cells: assignment = argmin
    over the frozen centroid literals of squared-L2 on the NORMALIZED
    coordinates (sqrt-of-dot-fold + per-element divide — the exact
    arithmetic of functions.vector.normalize + ann._l2_to_literal)."""
    import json as _json
    import os as _os

    from vector_db_spark.operators.ann import FROZEN_DOC_SEMDEDUP_CELLS_PATH

    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        FROZEN_DOC_SEMDEDUP_CELLS_PATH,
    )
    with open(path) as f:
        art = _json.load(f)
    cents = art["centroids"]
    nlist, dim = len(cents), len(cents[0])
    cols = ", ".join(f"c{d}" for d in range(dim))
    rows = ",\n".join(
        f"({j}, " + ", ".join(repr(float(x)) for x in cents[j]) + ")"
        for j in range(nlist)
    )
    nrm = (
        "sqrt("
        + " + ".join(
            f"(e.embedding[{d + 1}]::DOUBLE * e.embedding[{d + 1}]::DOUBLE)"
            for d in range(dim)
        )
        + ")"
    )
    unit = ", ".join(
        f"CASE WHEN nrm != 0.0 THEN e.embedding[{d + 1}]::DOUBLE / nrm "
        f"ELSE e.embedding[{d + 1}]::DOUBLE END"
        for d in range(dim)
    )
    cell_dist = " + ".join(
        f"(u.uv[{d + 1}] - c.c{d}) * (u.uv[{d + 1}] - c.c{d})"
        for d in range(dim)
    )
    return f"""
WITH RECURSIVE
cb (j, {cols}) AS (VALUES
{rows}
),
usrc AS (
  SELECT vec_id, [{unit}] AS uv
  FROM (SELECT e.vec_id, e.embedding, {nrm} AS nrm FROM embeddings e) e
),
assign AS (
  SELECT vec_id, j AS cell FROM (
    SELECT u.vec_id, c.j,
           row_number() OVER (
             PARTITION BY u.vec_id ORDER BY {cell_dist} ASC, c.j ASC
           ) AS rn
    FROM usrc u CROSS JOIN cb c
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM embeddings a
  JOIN assign aa ON aa.vec_id = a.vec_id
  JOIN embeddings b ON a.vec_id < b.vec_id
  JOIN assign ab ON ab.vec_id = b.vec_id AND ab.cell = aa.cell
  WHERE {_SEM_COS} >= 0.4
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION ALL
  SELECT b_id AS s, a_id AS d FROM pairs
),
verts AS (SELECT DISTINCT s AS id FROM edges),
reach(id, label) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.id
),
comp AS (SELECT id, min(label) AS canonical FROM reach GROUP BY id)
SELECT e.vec_id,
       COALESCE(c.canonical, e.vec_id) AS canonical_id,
       COALESCE(c.canonical, e.vec_id) = e.vec_id AS keep
FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
"""


@query("semantic_dedup_clustered", oracle=_semdedup_clustered_oracle())
def semantic_dedup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production SemDeDup path: pairs only within cosine-KMeans
    cells — served from the FROZEN cell centroids
    (ann.load_frozen_doc_cosine_cells; one pinned sf0.01 fit at the
    k ∝ n recipe's own nlist).

    Hash-exact as of round 14 (rows-only → converted): the cell
    partition is a codegen argmin over normalized coordinates the
    oracle replays bit-exactly, and the verdict columns are integers/
    booleans downstream of the same threshold test the exhaustive gate
    already hash-matches — so the blocked pipeline (cell-restricted
    pairs → min-label components → keep-canonical) replays as the
    exhaustive recursive-CTE oracle with a cell-equality join. The
    UNCAPPED k ∝ n production recipe (Arrow GEMM assignment at any
    nlist — VERDICT r2 wrong-item #2) stays exercised by the bench
    serving index, the sf10 scale probe, and the blocking-recall pins
    in tests/test_text_dedup.py."""
    from vector_db_spark.operators.ann import load_frozen_doc_cosine_cells
    from vector_db_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.4, ivf=load_frozen_doc_cosine_cells(emb))


_PMI_ORACLE = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
dt AS (
  SELECT doc_id, unnest(toks) AS token, unnest(range(1, len(toks)+1)) AS ord
  FROM w
),
bg AS (
  SELECT a.token || ' ' || b.token AS bigram
  FROM dt a JOIN dt b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
),
tot AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM dt) AS t,
         (SELECT CAST(COUNT(*) AS DOUBLE) FROM bg) AS p
),
bcnt AS (SELECT bigram, COUNT(*) AS n_pair FROM bg GROUP BY bigram),
tcnt AS (SELECT token, COUNT(*) AS n_tok FROM dt GROUP BY token),
scored AS (
  SELECT b.bigram, b.n_pair, f.n_tok AS n_first, s.n_tok AS n_second,
         CAST(floor(ln(
           ((((CAST(b.n_pair AS DOUBLE) * tot.t) / tot.p) * tot.t)
             / CAST(f.n_tok AS DOUBLE)) / CAST(s.n_tok AS DOUBLE)
         ) * 1000000) AS BIGINT) AS pmi_micro
  FROM bcnt b, tot
  JOIN tcnt f ON f.token = split_part(b.bigram, ' ', 1)
  JOIN tcnt s ON s.token = split_part(b.bigram, ' ', 2)
  WHERE b.n_pair >= 3
)
SELECT bigram, n_pair, n_first, n_second, pmi_micro,
       round(CAST(pmi_micro AS DOUBLE) / 1000000.0, 6) AS pmi
FROM scored
ORDER BY pmi_micro DESC, bigram ASC
LIMIT 20
"""


@query("bigram_pmi_collocations", oracle=_PMI_ORACLE)
def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (operators/lm.py
    bigram_pmi): fully-distributed count joins, a pinned-operation-order
    PMI quotient, floor-micro-nat quantization and a TakeOrdered cut —
    the ranking and every score hash-match the SQL oracle."""
    from vector_db_spark.operators.lm import bigram_pmi

    return bigram_pmi(_docs(spark, sf_dir).select("doc_id", "text"), min_count=3, top_n=20)


def _bpe_vocab_oracle(n_merges: int = 12) -> str:
    """Replay the ENTIRE BPE learning loop in SQL: a 12-stage CTE chain
    where round i counts adjacent symbol pairs weighted by word count
    (p{i}), takes the deterministic (weight DESC, pair ASC) argmax
    (b{i}), and re-encodes the word table with that ONE merge via the
    same leftmost-nonoverlapping fold the apply oracle uses — the lambda
    captures the argmax row's columns, so the merge is DATA, not a
    literal. Every CTE is MATERIALIZED: the chain is referenced twice
    per level (next round + the final union) and DuckDB's default
    inlining re-evaluates it combinatorially (>120 s; 0.2 s
    materialized). Integer weights and strings only — no float surface.
    One deliberate divergence: train_bpe stops early when no pair occurs
    twice; the SQL always runs 12 rounds, so an early-stopping corpus
    fails the gate LOUDLY on row count instead of silently padding
    (the fixture's 12th weight is >1000)."""
    from vector_db_spark.operators.bpe import END_OF_WORD

    sep = "chr(31)"
    stages = [f"""wt AS MATERIALIZED (
  SELECT word, COUNT(*) AS cnt
  FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents)
  GROUP BY word
),
w0 AS MATERIALIZED (
  SELECT cnt, list_append(string_split(word, ''), '{END_OF_WORD}') AS syms FROM wt
)"""]
    for i in range(1, n_merges + 1):
        stages.append(f"""p{i} AS MATERIALIZED (
  SELECT u.pr.a AS a, u.pr.b AS b, SUM(cnt) AS w
  FROM w{i - 1}, unnest(CASE WHEN len(syms) >= 2
      THEN list_transform(generate_series(1, len(syms) - 1),
                          j -> {{'a': syms[j], 'b': syms[j+1]}})
      ELSE CAST([] AS STRUCT(a VARCHAR, b VARCHAR)[]) END) u(pr)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT a, b, CAST(w AS BIGINT) AS w FROM p{i}
  ORDER BY w DESC, a ASC, b ASC LIMIT 1
),
w{i} AS MATERIALIZED (
  SELECT cnt, string_split(list_reduce(syms, (acc, x) -> CASE
      WHEN (acc = b{i}.a OR ends_with(acc, {sep} || b{i}.a)) AND x = b{i}.b
      THEN left(acc, length(acc) - length(b{i}.a)) || b{i}.a || b{i}.b
      ELSE acc || {sep} || x END), {sep}) AS syms
  FROM w{i - 1}, b{i}
)""")
    union = "\nUNION ALL\n".join(
        f'SELECT {i} AS merge_rank, a AS "left", b AS "right", '
        f"a || b AS new_symbol, w AS weight FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",\n".join(stages)
        + "\nSELECT * FROM (\n" + union + "\n) ORDER BY merge_rank"
    )


@query("bpe_vocab_docs", oracle=_bpe_vocab_oracle())
def bpe_vocab_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-table induction (operators/bpe.train_bpe): 12 merge
    rounds over the corpus word table, one pair-count shuffle per round,
    deterministic (weight DESC, pair ASC) argmax.

    Hash-exact as of round 13 (VERDICT r12 #4): "inherently iterative"
    turned out not to mean "not SQL" — the loop is bounded (12 rounds)
    and every round's state is integers and strings, so a MATERIALIZED
    CTE chain replays the whole fit (see _bpe_vocab_oracle). The
    textbook merge sequence, greedy merge order, determinism and
    tokenize round-trip stay pinned in tests/test_pipeline_ops.py."""
    from vector_db_spark.operators.bpe import train_bpe

    model = train_bpe(_docs(spark, sf_dir).select("doc_id", "text"), n_merges=12)
    rows = [
        (i + 1, a, b, a + b, w) for i, (a, b, w) in enumerate(model.merges)
    ]
    return spark.createDataFrame(
        rows, "merge_rank int, left string, right string, new_symbol string, weight long"
    )


_SKIPGRAM_ORACLE = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
dt AS (
  SELECT doc_id, unnest(toks) AS token, unnest(range(1, len(toks)+1)) AS ord
  FROM w
)
SELECT a.token AS center, b.token AS context, CAST(COUNT(*) AS BIGINT) AS n
FROM dt a
JOIN dt b ON b.doc_id = a.doc_id
        AND b.ord BETWEEN a.ord - 2 AND a.ord + 2
        AND b.ord <> a.ord
GROUP BY 1, 2
"""


@query("skipgram_pairs_docs", oracle=_SKIPGRAM_ORACLE)
def skipgram_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2vec training-pair extraction (operators/packing.skipgram_pairs):
    window-2 (center, context) counts, pair generation row-local, one
    counting shuffle. The oracle forms the same pairs with a positional
    self-join."""
    from vector_db_spark.operators.packing import skipgram_pairs

    return skipgram_pairs(_docs(spark, sf_dir).select("doc_id", "text"), window=2)


_RAG_CHUNK_ORACLE = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
starts AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) AS INT) + 1)) AS chunk_id
  FROM w WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text,
       CAST(len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS INT) AS chunk_len
FROM starts
"""


@query("rag_chunk_docs", oracle=_RAG_CHUNK_ORACLE)
def rag_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG corpus prep (operators/packing.chunk_documents): 64-token
    windows with 16-token overlap, zero-shuffle row-local expansion. The
    oracle slices the same windows with DuckDB list slicing."""
    from vector_db_spark.operators.packing import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir).select("doc_id", "text"), chunk_tokens=64, overlap=16
    )


_SOURCE_CAP_ORACLE = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || 'cap') ASC, doc_id ASC
         ) AS rn
  FROM documents
)
SELECT doc_id, source FROM ranked WHERE rn <= 10
"""


@query("source_cap_docs", oracle=_SOURCE_CAP_ORACLE)
def source_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dominance cap (operators/sampling.cap_per_group): at
    most 10 docs per source (the fixture has 25/source, so the cap
    provably BITES — 10 kept, 15 dropped per source), chosen by a deterministic md5 lottery (the
    one hash both engines share) — reproducible and repartition-proof."""
    from vector_db_spark.operators.sampling import cap_per_group

    res = cap_per_group(
        _docs(spark, sf_dir).select("doc_id", "source"), "source", max_rows=10
    )
    return res.select("doc_id", "source")


_PREP2_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id, toks,
    CASE WHEN len(toks) >= 2 THEN list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1])
         ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM t
), m AS (
  SELECT doc_id,
    len(toks) AS n,
    COALESCE(list_sum(list_transform(toks, x -> len(x))), 0) AS sum_len,
    COALESCE(list_max(list_transform(list_distinct(toks), d -> len(list_filter(toks, x -> x = d)))), 0) AS max_run,
    len(grams) AS n_grams,
    COALESCE(list_sum(list_transform(list_distinct(grams), gg ->
      CASE WHEN len(list_filter(grams, y -> y = gg)) > 1
           THEN len(list_filter(grams, y -> y = gg)) ELSE 0 END)), 0) AS dup_occ
  FROM g
), kept AS (
  SELECT doc_id FROM m
  WHERE NOT (n < 50 OR n > 2000 OR sum_len < 2 * n OR sum_len > 10 * n
             OR max_run * 100 > 30 * n OR dup_occ * 100 > 20 * n_grams)
), kw AS (
  SELECT d.doc_id, list_filter(string_split(d.text, ' '), x -> x <> '') AS words
  FROM documents d JOIN kept k ON d.doc_id = k.doc_id
), e AS (
  SELECT doc_id, unnest(words) AS word, unnest(range(1, len(words)+1)) AS ord FROM kw
), ch AS (
  SELECT doc_id, CAST((ord - 1) // 20 AS INT) AS chunk_idx,
         string_agg(word, ' ' ORDER BY ord) AS chunk
  FROM e GROUP BY doc_id, (ord - 1) // 20
), ranked AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn,
         CAST(count(*) OVER (PARTITION BY doc_id) AS INT) AS n_chunks
  FROM ch
), cleaned AS (
  SELECT doc_id,
         string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text,
         n_chunks,
         CAST(n_chunks - count(*) AS INT) AS n_dropped
  FROM ranked WHERE rn = 1
  GROUP BY doc_id, n_chunks
), capped AS (
  SELECT c.doc_id, d.source, c.clean_text, c.n_dropped,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(c.doc_id AS VARCHAR) || 'prep2') ASC, c.doc_id ASC
         ) AS rn
  FROM cleaned c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(list_filter(string_split(clean_text, ' '), x -> x <> ''))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_dropped) AS BIGINT) AS chunks_dropped
FROM capped WHERE rn <= 10
GROUP BY source
"""


@query("pipeline_prepare_corpus_v2", oracle=_PREP2_ORACLE)
def pipeline_prepare_corpus_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-2 curation flow composed end-to-end as ONE verified
    pipeline: C4/Gopher rule gate (row-local CASE) → chunk-granular
    boilerplate dedup (global first-occurrence) → per-source dominance cap
    (md5 lottery) → per-source corpus stats. Every stage is individually
    oracle-backed; this query proves they COMPOSE value-exactly — the
    whole pipeline hash-matches one giant DuckDB CTE."""
    from vector_db_spark.operators.dedup import chunk_dedup
    from vector_db_spark.operators.filtering import filter_verdicts
    from vector_db_spark.operators.sampling import cap_per_group

    docs = _docs(spark, sf_dir)
    kept = (
        filter_verdicts(docs.select("doc_id", "source", "text"))
        .filter(F.col("verdict") == "kept")
    )
    cleaned = chunk_dedup(kept.select("doc_id", "text"))
    capped = cap_per_group(
        cleaned.join(kept.select("doc_id", "source"), "doc_id"),
        "source",
        max_rows=10,
        salt="prep2",
    )
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("clean_text"))).cast("bigint").alias("total_tokens"),
        F.sum("n_dropped").cast("bigint").alias("chunks_dropped"),
    )


def _classifier_oracle() -> str:
    """Frozen-model oracle: the six signals in DuckDB (each already
    proven portable by the text_quality / repetition_quality gates) and
    the identical left-associated logit fold over the frozen
    coefficients. Coefficient literals come from repr() of the SAME
    Python floats the Spark side folds, so both engines parse the same
    doubles."""
    from vector_db_spark.operators.classifier import (
        FROZEN_QUALITY_COEFS,
        FROZEN_QUALITY_INTERCEPT,
    )

    w = [repr(float(c)) for c in FROZEN_QUALITY_COEFS]
    b = repr(float(FROZEN_QUALITY_INTERCEPT))
    logit = (
        f"{b} + ({w[0]}) * f_log_tokens + ({w[1]}) * f_avg_tok_len"
        f" + ({w[2]}) * f_punct_ratio + ({w[3]}) * f_stop_ratio"
        f" + ({w[4]}) * f_top_word + ({w[5]}) * f_dup_gram"
    )
    return f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE doc_id % 2 = 1
),
g AS (
  SELECT doc_id, text, toks,
    CASE WHEN len(toks) >= 2 THEN list_transform(
           generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])
         ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM base
),
f AS (
  SELECT doc_id,
    ln(1.0 + len(toks)) AS f_log_tokens,
    CASE WHEN len(toks) > 0
         THEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS f_avg_tok_len,
    CASE WHEN length(text) > 0
         THEN CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
              / length(text)
         ELSE 0.0 END AS f_punct_ratio,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_filter(toks, t -> t IN ({_EN}))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS f_stop_ratio,
    CASE WHEN len(toks) > 0
         THEN CAST(list_max(list_transform(list_distinct(toks),
                d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS f_top_word,
    CASE WHEN len(grams) > 0
         THEN CAST(list_sum(list_transform(list_distinct(grams),
                gg -> CASE WHEN len(list_filter(grams, y -> y = gg)) > 1
                           THEN len(list_filter(grams, y -> y = gg))
                           ELSE 0 END)) AS DOUBLE) / len(grams)
         ELSE 0.0 END AS f_dup_gram
  FROM g
)
SELECT doc_id,
       round({logit}, 6) AS quality_logit,
       ({logit}) >= 0 AS keep
FROM f
"""


@query("quality_classifier_score", oracle=_classifier_oracle())
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate (operators/classifier.py), FROZEN-model
    serving form: the pinned coefficient vector scores the held-out
    (odd-doc_id) half as one codegen'd expression — the production shape
    anyway (quality classifiers ship as trained artifacts; the fit is an
    offline step, here train_quality_classifier, still exercised and
    accuracy-pinned in tests/test_pipeline_ops.py).

    Hash-exact as of round 13 (VERDICT r12 #4, rows-only → converted):
    fresh L-BFGS fits are deterministic only to ~1e-12 so the TRAINING
    composition can never be hash material, but frozen-coefficient
    scoring is a pure left-associated float64 fold DuckDB reproduces
    bit-exactly. keep gates on the logit's sign (== probability 0.5)
    because exp() is not bit-portable across engines."""
    from vector_db_spark.operators.classifier import score_quality_frozen

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return score_quality_frozen(docs.filter(F.col("doc_id") % 2 == 1))


def _bpe_tokenize_oracle() -> str:
    """Frozen-tokenizer oracle: replay the 12 FROZEN merges as chained
    leftmost-nonoverlapping folds over each distinct word's symbol list.
    DuckDB's list_reduce accumulator must share the element type, so the
    symbol list folds through a VARCHAR accumulator — segments joined by
    an \\x1f unit separator (never in fixture text): a merge strips the
    tail segment when it equals the merge's left symbol and the incoming
    element equals the right, exactly operators/bpe._merge_fold. Only
    INTEGER counts leave the fold — no float surface at all."""
    from vector_db_spark.operators.bpe import END_OF_WORD, FROZEN_DOC_MERGES

    sep = "'\x1f'"

    def q(s: str) -> str:
        return s.replace("'", "''")

    lst = f"list_append(string_split(word, ''), '{q(END_OF_WORD)}')"
    for a, b in FROZEN_DOC_MERGES.merge_pairs:
        fold = (
            f"list_reduce({lst}, (acc, x) -> CASE "
            f"WHEN (acc = '{q(a)}' OR ends_with(acc, {sep} || '{q(a)}')) "
            f"AND x = '{q(b)}' "
            f"THEN left(acc, length(acc) - {len(a)}) || '{q(a + b)}' "
            f"ELSE acc || {sep} || x END)"
        )
        lst = f"string_split({fold}, {sep})"
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
  FROM documents
),
w AS (SELECT DISTINCT unnest(ws) AS word FROM toks),
enc AS (SELECT word, len({lst}) AS n FROM w),
docw AS (SELECT doc_id, unnest(ws) AS word FROM toks),
cnt AS (
  SELECT d.doc_id, SUM(e.n) AS n_tokens
  FROM docw d JOIN enc e USING (word) GROUP BY d.doc_id
)
SELECT t.doc_id, CAST(COALESCE(c.n_tokens, 0) AS INT) AS n_tokens
FROM toks t LEFT JOIN cnt c ON t.doc_id = c.doc_id
"""


@query("bpe_tokenize_docs", oracle=_bpe_tokenize_oracle())
def bpe_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply side of the BPE lifecycle (operators/bpe.tokenize_bpe) with
    the FROZEN shipped tokenizer (bpe.FROZEN_DOC_MERGES): the merges
    encode the distinct-WORD table once, the corpus joins word → token
    array.

    Hash-exact as of round 13 (VERDICT r12 #4, rows-only → converted):
    merges are DATA and the apply is a deterministic integer-count fold,
    so freezing the learned table (the production shape — tokenizers
    train once and ship) makes the gate oracle-replayable. The LEARNING
    loop stays iterative and rows-only (bpe_vocab_docs); compression
    behavior and round-trip identity remain pinned in
    tests/test_pipeline_ops.py."""
    from vector_db_spark.operators.bpe import FROZEN_DOC_MERGES, tokenize_bpe

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return tokenize_bpe(docs, FROZEN_DOC_MERGES).select("doc_id", "n_tokens")


# --------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. 2022 ExactSubstr, sliding-window form)
# --------------------------------------------------------------------------

_BOILER = "terms of service apply all rights reserved contact the site admin for removal requests and review the policy before reuse"

_SUBSTR_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id < 20 THEN text || ' {_BOILER}' ELSE text END AS text
  FROM documents
),
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM corpus
),
pos_exploded AS (
  SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 20)) AS pos
  FROM toks WHERE len(toks) >= 20
),
wins AS (
  SELECT doc_id, pos,
         md5(array_to_string(toks[pos+1:pos+20], ' ')) AS whash
  FROM pos_exploded
),
occ AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY whash ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY whash) AS cnt
  FROM wins
),
dups AS (
  SELECT doc_id, list(pos ORDER BY pos) AS dups
  FROM occ WHERE cnt > 1 AND rn > 1 GROUP BY doc_id
),
joined AS (
  SELECT t.doc_id, t.toks, COALESCE(d.dups, []) AS dups
  FROM toks t LEFT JOIN dups d USING (doc_id)
),
kept AS (
  SELECT doc_id, toks,
         list_filter(
           list_transform(generate_series(1, len(toks)),
                          j -> struct_pack(t := toks[j], i := j - 1)),
           s -> NOT len(list_filter(dups, q -> q <= s.i AND s.i < q + 20)) > 0
         ) AS ks
  FROM joined
)
SELECT doc_id,
       COALESCE(array_to_string(list_transform(ks, s -> s.t), ' '), '') AS clean_text,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(toks) - COALESCE(len(ks), 0) AS INT) AS n_removed
FROM kept
"""


@query("substring_dedup_docs", oracle=_SUBSTR_ORACLE)
def substring_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window exact-substring dedup (operators/dedup.
    substring_dedup): a 21-token boilerplate tail is planted on 20 docs;
    every 20-token window of it that recurs must vanish from all but the
    globally first occurrence, at ANY alignment. One window-hash
    shuffle; span removal is row-local HOFs. Value-exact: md5 window
    hashes and identical keep-first ranking on both engines."""
    from vector_db_spark.operators.dedup import substring_dedup

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") < 20, F.concat(F.col("text"), F.lit(" " + _BOILER))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return substring_dedup(docs, window=20)


# --------------------------------------------------------------------------
# Composite curation pipeline v3 (round-4 capstone): exact-substring dedup
# -> min-length rule -> target-proportion mixture rebalance, ONE plan
# --------------------------------------------------------------------------

_V3_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, source,
         CASE WHEN doc_id < 20 THEN text || ' {_BOILER}' ELSE text END AS text
  FROM documents
),
toks AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM corpus
),
pos_exploded AS (
  SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 20)) AS pos
  FROM toks WHERE len(toks) >= 20
),
wins AS (
  SELECT doc_id, pos,
         md5(array_to_string(toks[pos+1:pos+20], ' ')) AS whash
  FROM pos_exploded
),
occ AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY whash ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY whash) AS cnt
  FROM wins
),
dups AS (
  SELECT doc_id, list(pos ORDER BY pos) AS dups
  FROM occ WHERE cnt > 1 AND rn > 1 GROUP BY doc_id
),
cleaned AS (
  SELECT t.doc_id, t.source,
         CAST(len(t.toks) AS INT) AS n_tokens,
         CAST(len(t.toks) - COALESCE(len(list_filter(
           list_transform(generate_series(1, len(t.toks)),
                          j -> struct_pack(t := t.toks[j], i := j - 1)),
           s -> NOT len(list_filter(COALESCE(d.dups, []),
                                    q -> q <= s.i AND s.i < q + 20)) > 0
         )), 0) AS INT) AS n_removed
  FROM toks t LEFT JOIN dups d USING (doc_id)
),
survivors AS (
  SELECT doc_id, source, n_tokens, n_removed FROM cleaned
  WHERE n_tokens - n_removed >= 5
),
t(source, ppm) AS (VALUES ('src0', 500000), ('src1', 300000), ('src2', 200000)),
counts AS (
  SELECT source, count(*) AS n FROM survivors
  WHERE source IN ('src0', 'src1', 'src2') GROUP BY source
),
k AS (
  SELECT min(c.n * 1000000 // t.ppm) AS k_total
  FROM counts c JOIN t ON c.source = t.source
),
kept AS (SELECT t.source, t.ppm * k.k_total // 1000000 AS n_keep FROM t, k),
ranked AS (
  SELECT doc_id, source, n_tokens, n_removed,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || 'mix') ASC, doc_id ASC
         ) AS rn
  FROM survivors WHERE source IN ('src0', 'src1', 'src2')
)
SELECT r.doc_id, r.source, r.n_tokens, r.n_removed
FROM ranked r JOIN kept ON r.source = kept.source
WHERE r.rn <= kept.n_keep
"""


@query("pipeline_prepare_corpus_v3", oracle=_V3_ORACLE)
def pipeline_prepare_corpus_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 capstone: the new curation stages COMPOSE value-exactly in
    one plan — stride-1 exact-substring dedup (boilerplate planted on 20
    docs), a clean-token minimum rule, then target-proportion mixture
    rebalancing of the survivors to 50/30/20. Every stage's arithmetic
    is engine-portable (md5 hashes, integer counts, integer ppm), so the
    whole pipeline hash-matches one 12-CTE DuckDB oracle."""
    from vector_db_spark.operators.dedup import substring_dedup
    from vector_db_spark.operators.sampling import mixture_sample

    base = load_table(spark, sf_dir, "documents")
    docs = base.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") < 20, F.concat(F.col("text"), F.lit(" " + _BOILER))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    cleaned = substring_dedup(docs, window=20, keep_cols=("source",))
    survivors = cleaned.filter(
        F.col("n_tokens") - F.col("n_removed") >= 5
    ).select("doc_id", "source", "n_tokens", "n_removed")
    return mixture_sample(
        survivors,
        "source",
        {"src0": 500_000, "src1": 300_000, "src2": 200_000},
    ).select("doc_id", "source", "n_tokens", "n_removed")


# --------------------------------------------------------------------------
# TF-IDF keyword extraction: corpus-statistics term weighting
# (operators/tfidf.py). Corpus df/N come from ALL documents; the output is
# restricted to the first 200 doc ids to keep the gate compact.
# --------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term,
         t.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0) AS score
  FROM tf t JOIN df d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term
         ) AS rk
  FROM scored
)
SELECT doc_id, term, round(score, 6) AS score, rk
FROM ranked WHERE rk <= 3 AND doc_id < 200
"""


@query("tfidf_top_terms", oracle=_TFIDF_ORACLE)
def tfidf_top_terms_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed sklearn idf). Plan: tf
    is one (doc,term) shuffle with map-side partial agg, df re-reduces
    those rows by term, idf joins back as a vocabulary equi-join, and
    the per-doc top-k is a single row_number window. The doc_id < 200
    restriction applies to the OUTPUT only — df/N stay corpus-wide."""
    from vector_db_spark.operators.tfidf import tfidf_top_terms

    docs = _docs(spark, sf_dir)
    res = tfidf_top_terms(docs, k=3)
    return res.filter(F.col("id") < 200).select(
        F.col("id").alias("doc_id"),
        "term",
        F.round("score", 6).alias("score"),
        "rk",
    )


# --------------------------------------------------------------------------
# Scalable exact heavy hitters (operators/sketch.py): two-pass Misra-Gries
# candidates + exact verify — the 100 TB form of heavy_hitter_tokens, whose
# full-vocabulary shuffle this replaces with bounded summaries. Same final
# answer, so the gate is exact.
# --------------------------------------------------------------------------

_MG_K = 100

_MG_ORACLE = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
n AS (SELECT COUNT(*) AS total FROM tok),
c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
SELECT c.token, c.n
FROM c CROSS JOIN n
WHERE c.n * {_MG_K} > n.total
ORDER BY c.n DESC, c.token
"""


@query("heavy_hitters_mg", oracle=_MG_ORACLE)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens above 1% corpus frequency via MG-candidates + exact-verify.
    The answer is identical to the brute-force oracle for ANY input
    partitioning (candidates have no false negatives; pass 2 is exact),
    but no shuffle ever carries the full vocabulary."""
    from vector_db_spark.operators.sketch import heavy_hitters

    docs = _docs(spark, sf_dir)
    res = heavy_hitters(docs, _MG_K)
    return res.orderBy(F.col("n").desc(), F.col("token").asc())


# --------------------------------------------------------------------------
# Feature-hashing text embedder (operators/embedder.py): text -> dense
# signed-count vector, md5-portable across engines. The gate posexplodes
# the assembled array against a DuckDB doc x position grid, so bucket
# hashing, sign parity, the (doc, bucket) partial-sum shuffle, AND the
# dense-array assembly (including zero fill) are all value-checked.
# --------------------------------------------------------------------------

_EMBED_DIM = 32
_EMBED_DOCS = 200

_EMBED_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_EMBED_DOCS}
),
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS token
  FROM docs
),
fb AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(md5(token || 'fh'), 1, 8)) AS BIGINT)
           % {_EMBED_DIM} AS bucket,
         CASE WHEN CAST(CONCAT('0x', substr(md5(token || 'fh'), 9, 1)) AS BIGINT)
                   % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM tok
),
bsum AS (SELECT doc_id, bucket, SUM(s) AS v FROM fb GROUP BY doc_id, bucket),
grid AS (
  SELECT d.doc_id, r.range AS pos FROM docs d CROSS JOIN range(0, {_EMBED_DIM}) r
)
SELECT g.doc_id, CAST(g.pos AS INT) AS pos,
       CAST(COALESCE(b.v, 0) AS DOUBLE) AS val
FROM grid g LEFT JOIN bsum b ON g.doc_id = b.doc_id AND g.pos = b.bucket
ORDER BY g.doc_id, pos
"""


@query("text_hash_embed_docs", oracle=_EMBED_ORACLE)
def text_hash_embed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed signed token-count vectors for the first 200 documents,
    posexploded to (doc_id, pos, val) rows — unnormalized integer counts,
    so the cross-engine compare is bit-exact."""
    from vector_db_spark.operators.embedder import text_hash_embed

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _EMBED_DOCS)
        .select("doc_id", "text")
    )
    emb = text_hash_embed(docs, dim=_EMBED_DIM, normalize=False)
    return (
        emb.select("doc_id", F.posexplode("embedding").alias("pos", "val"))
        .orderBy("doc_id", "pos")
    )


_EMBED_STATS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS token
  FROM documents
),
fb AS (
  SELECT doc_id, source,
         CAST(CONCAT('0x', substr(md5(token || 'fh'), 1, 8)) AS BIGINT)
           % {_EMBED_DIM} AS bucket,
         CASE WHEN CAST(CONCAT('0x', substr(md5(token || 'fh'), 9, 1)) AS BIGINT)
                   % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM tok
),
bsum AS (
  SELECT doc_id, source, bucket, SUM(s) AS v
  FROM fb GROUP BY doc_id, source, bucket
)
SELECT source, CAST(SUM(ABS(v)) AS BIGINT) AS l1_mass,
       COUNT(DISTINCT doc_id) AS n_docs
FROM bsum GROUP BY source ORDER BY source
"""


@query("text_embed_corpus_stats", oracle=_EMBED_STATS_ORACLE)
def text_embed_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale embedder gate + bench entry: hash-embed EVERY
    document (unnormalized signed counts) and reduce to per-source L1
    mass — integer arithmetic end-to-end, so the full tokenize → hash →
    (doc, bucket) shuffle → assembly pipeline is value-checked at corpus
    size, not a 200-doc sample. Docs with no tokens contribute 0 mass
    but still count (zero-vector contract)."""
    from vector_db_spark.operators.embedder import text_hash_embed

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    emb = text_hash_embed(docs, dim=_EMBED_DIM, normalize=False)
    l1 = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("long"),
        lambda a, x: a + F.abs(x).cast("long"),
    )
    return (
        emb.select("source", "doc_id", l1.alias("__l1"))
        .groupBy("source")
        .agg(
            F.sum("__l1").alias("l1_mass"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("source")
    )


@query("text_w2v_embed_ann")
def text_w2v_embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-embedding rung (VERDICT r5 #7; rows-only — Word2Vec's SGD
    fit is not expressible in DuckDB): fit a deterministic single-
    partition skip-gram over the documents corpus, mean-pool doc vectors
    (operators/embedder.fit_word2vec/word2vec_embed), and feed the
    STANDARD IVF lifecycle — build a cosine IVF over the learned
    vectors, full-probe search for doc 0's vector. The in-row gate
    refuses to return unless full probe equals brute-force cosine kNN
    over the same vectors bit-for-bit (the lossless-configuration
    standard every vector source must meet before the ANN families can
    serve it). Retrieval-quality comparison vs the hash embedder is
    recorded by tools/embedder_compare.py (EMBEDDER_r06.json)."""
    from vector_db_spark.operators.ann import IvfIndex
    from vector_db_spark.operators.embedder import fit_word2vec, word2vec_embed
    from vector_db_spark.operators.knn import knn

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", "text")
    )
    model = fit_word2vec(docs, dim=32, max_iter=2)
    emb = word2vec_embed(docs, model).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    # cosine needs a direction: token-less docs embed to the zero vector
    norm_sq = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x
    )
    emb = emb.filter(norm_sq > 0).cache()
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]

    idx = IvfIndex.build(emb, nlist=8, metric="cosine", max_iter=5)
    res = idx.search(qv, 10, nprobe=8).select(
        "vec_id", F.round("score", 6).alias("score")
    )
    got = [(r.vec_id, r.score) for r in res.collect()]
    want = [
        (r.vec_id, r.score)
        for r in knn(emb, qv, 10, metric="cosine")
        .select("vec_id", F.round("score", 6).alias("score"))
        .collect()
    ]
    emb.unpersist()
    if got != want:
        raise AssertionError(
            f"text_w2v_embed_ann: full-probe IVF != exact kNN over the "
            f"learned vectors: {got} vs {want}"
        )
    return res
