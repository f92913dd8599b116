"""Embedder retrieval-quality comparison on the planted near-dup fixture
(VERDICT r5 #7's "recorded comparison line").

Ground truth: exact word-shingle Jaccard >= 0.6 pairs over `documents`
(operators/dedup.jaccard_pairs — the oracle-verified near-dup relation).
Metric: partner-recall@K — for each (a, b) ground-truth pair, does b
appear in a's top-K cosine neighbors under the embedding (and vice
versa)?  Higher = the embedding's neighborhood structure preserves the
corpus's true duplicate structure.

Compared embedders (same 64-dim budget):
- hash-word   — signed token-count hashing (text_hash_embed, word)
- hash-char3  — signed char-3-gram hashing (typo-robust lexical)
- w2v         — MLlib skip-gram, mean-pooled doc vectors (learned rung)

The driver fixture's planted duplicates are all STRONG (Jaccard >= 0.6);
the weak band (0.25 <= J < 0.6) — where embedding quality actually
separates — is empty at every sf (EMBEDDER_r06 ``weak_pairs: 0``). When
that happens this tool PLANTS partner documents: for a bounded sample of
docs, a partner = ~60% of the doc's word prefix + ~50% of another doc's
word suffix, which lands word-3-shingle Jaccard ≈ 0.3-0.5 against its
source. Ground truth stays the MEASURED jaccard_pairs relation over the
augmented corpus (planted pairs that drift out of the band tier
themselves correctly), and partners inherit lang/source so the purity
metrics stay meaningful.

Usage: python tools/embedder_compare.py [sf_dir] — prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_spark.operators.dedup import jaccard_pairs  # noqa: E402
from vector_db_spark.operators.embedder import (  # noqa: E402
    fit_word2vec,
    text_hash_embed,
    word2vec_embed,
)
from vector_db_spark.operators.knn import batch_knn  # noqa: E402
from vector_db_spark.session import get_spark  # noqa: E402
from vector_db_spark.sources.fixtures import load_table  # noqa: E402

K = 10
DIM = 64
THRESHOLD = 0.6
WEAK_THRESHOLD = 0.25


def partner_recall(emb, pairs: list[tuple[int, int]], k: int = K) -> float:
    """Fraction of directed ground-truth (a -> b) links with b in a's
    top-k cosine neighbors (self excluded)."""
    member_ids = sorted({x for p in pairs for x in p})
    queries = emb.filter(F.col("vec_id").isin(member_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = batch_knn(
        emb, queries, k + 1, metric="cosine"
    )  # +1: self is always rank 1
    neigh: dict[int, set[int]] = {}
    for r in top.collect():
        if r.vec_id != r.query_id:
            neigh.setdefault(r.query_id, set()).add(r.vec_id)
    links = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    hit = sum(1 for a, b in links if b in neigh.get(a, set()))
    return hit / len(links)


def neighborhood_purity(
    emb, meta, attr_col: str, n_sample: int = 200, k: int = K
) -> float:
    """Mean fraction of a doc's top-k cosine neighbors sharing its
    ``attr_col`` value (lang/source) — a structure-preservation measure
    that does not depend on planted duplicates."""
    queries = (
        emb.filter(F.col("vec_id") < n_sample)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    top = batch_knn(emb, queries, k + 1, metric="cosine")
    attr = {int(r.doc_id): r[attr_col] for r in meta.collect()}
    per_doc: dict[int, list[bool]] = {}
    for r in top.collect():
        if r.vec_id != r.query_id:
            per_doc.setdefault(r.query_id, []).append(
                attr[int(r.vec_id)] == attr[int(r.query_id)]
            )
    vals = [sum(v) / len(v) for v in per_doc.values() if v]
    return sum(vals) / len(vals)


N_PLANT = 128
PLANT_OFFSET = 10_000_000


def plant_weak_partners(spark, full) -> "object":
    """A bounded frame of planted weak-band partner docs: partner i =
    60% word-prefix of sampled doc i + 50% word-suffix of sampled doc
    i+1 (cyclic), lang/source inherited from the source doc. Driver-side
    over N_PLANT collected rows — measurement tooling, not an engine op."""
    rows = (
        full.select("doc_id", "text", "lang", "source")
        .filter(F.size(F.split(F.col("text"), " ")) >= 24)
        .orderBy("doc_id")
        .limit(N_PLANT)
        .collect()
    )
    planted = []
    for i, r in enumerate(rows):
        a = r.text.split()
        d = rows[(i + 1) % len(rows)].text.split()
        take_a = max(1, int(0.6 * len(a)))
        take_d = max(1, int(0.5 * len(d)))
        planted.append(
            (
                PLANT_OFFSET + int(r.doc_id),
                " ".join(a[:take_a] + d[-take_d:]),
                r.lang,
                r.source,
            )
        )
    return spark.createDataFrame(
        planted, "doc_id long, text string, lang string, source string"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.01")
    spark = get_spark("embedder_compare")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    n_planted = 0
    probe = {
        (int(r.a_id), int(r.b_id)): float(r.jaccard)
        for r in jaccard_pairs(base, threshold=WEAK_THRESHOLD).collect()
    }
    if not any(j < THRESHOLD for j in probe.values()):
        planted_df = plant_weak_partners(spark, base)
        n_planted = planted_df.count()
        full = base.unionByName(planted_df).cache()
        full.count()
        all_pairs = {
            (int(r.a_id), int(r.b_id)): float(r.jaccard)
            for r in jaccard_pairs(full, threshold=WEAK_THRESHOLD).collect()
        }
    else:
        full = base.cache()
        full.count()
        all_pairs = probe
    docs = full.select("doc_id", "text")
    meta = full.select("doc_id", "lang", "source")
    strong = [p for p, j in all_pairs.items() if j >= THRESHOLD]
    weak = [p for p, j in all_pairs.items() if j < THRESHOLD]
    if not strong:
        raise SystemExit("no ground-truth near-dup pairs at this sf")

    hash_word = text_hash_embed(docs, dim=DIM).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    hash_char = text_hash_embed(docs, dim=DIM, analyzer="char", ngram=3).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    model = fit_word2vec(docs, dim=DIM, max_iter=2)
    w2v = word2vec_embed(docs, model).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )

    out = {
        "metric": f"neardup_partner_recall@{K}",
        "dim": DIM,
        # strong tier (jaccard >= 0.6): true near-dups — every embedder
        # should saturate here; a miss is a geometry bug, not a taste gap
        "strong_pairs": len(strong),
        "strong": {
            "hash_word": round(partner_recall(hash_word, strong), 4),
            "hash_char3": round(partner_recall(hash_char, strong), 4),
            "w2v": round(partner_recall(w2v, strong), 4),
        },
        # weak tier (0.25 <= jaccard < 0.6): partially-overlapping docs —
        # the discriminative band where embedding quality separates
        # (planted partner docs when the fixture ships none, see module
        # docstring; ground truth is the measured jaccard either way)
        "weak_pairs": len(weak),
        "planted_docs": n_planted,
        "weak": {
            "hash_word": round(partner_recall(hash_word, weak), 4) if weak else None,
            "hash_char3": round(partner_recall(hash_char, weak), 4) if weak else None,
            "w2v": round(partner_recall(w2v, weak), 4) if weak else None,
        },
        # structure preservation beyond duplicates: do a doc's nearest
        # neighbors share its language / source? (lang is the strong
        # signal — vocabularies are disjoint; source is the subtle one)
        "lang_purity": {
            "hash_word": round(neighborhood_purity(hash_word, meta, "lang"), 4),
            "hash_char3": round(neighborhood_purity(hash_char, meta, "lang"), 4),
            "w2v": round(neighborhood_purity(w2v, meta, "lang"), 4),
        },
        "source_purity": {
            "hash_word": round(neighborhood_purity(hash_word, meta, "source"), 4),
            "hash_char3": round(neighborhood_purity(hash_char, meta, "source"), 4),
            "w2v": round(neighborhood_purity(w2v, meta, "source"), 4),
        },
        "sf": sf,
    }
    if weak:
        ranked = sorted(out["weak"].items(), key=lambda kv: -kv[1])
        (best, best_r), (second, second_r) = ranked[0], ranked[1]
        # the verdict must follow the MEASUREMENT (round-9 review): only
        # claim the lexical-task conclusion when a hash tier actually won
        verdict = (
            "Near-dup retrieval is a LEXICAL task here: signed hash "
            "embeddings encode token overlap directly, while mean-pooled "
            "skip-gram vectors blur partial overlap into topic space - "
            "keep hash embeddings on the dedup path and reserve the w2v "
            "rung for semantic (topic/lang) grouping."
            if best != "w2v"
            else "The learned rung beat lexical hashing on this corpus - "
            "re-examine before keeping hash embeddings on the dedup path."
        )
        out["conclusion"] = (
            f"weak-band (0.25<=J<0.6) partner-recall@{K}: {best} wins at "
            f"{best_r:.3f} (runner-up {second} {second_r:.3f}, w2v "
            f"{out['weak']['w2v']:.3f}). " + verdict
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
