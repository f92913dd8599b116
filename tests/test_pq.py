"""Product-quantization tests: codec determinism (ADC distance equals the
exact distance to the reconstruction), recall vs the oracle-verified exact
operator, rerank refinement, and the binary-codes storage contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import knn
from vector_db_spark.operators.pq import ProductQuantizer
from vector_db_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"
QIDS = [0, 7, 21, 100, 333]


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def pq(emb):
    return ProductQuantizer.fit(emb, m=16, ksub=64, seed=42, iters=8)


@pytest.fixture(scope="module")
def encoded(emb, pq):
    df = pq.encode(emb).select("vec_id", "pq_codes").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def qvecs(emb):
    rows = emb.filter(F.col("vec_id").isin(QIDS)).collect()
    return {r.vec_id: [float(x) for x in r.embedding] for r in rows}


def test_codes_are_m_bytes(encoded, pq):
    rows = encoded.limit(5).collect()
    assert all(isinstance(r.pq_codes, (bytes, bytearray)) for r in rows)
    assert all(len(r.pq_codes) == pq.m for r in rows)


def test_adc_equals_distance_to_reconstruction(emb, encoded, pq, qvecs):
    """The codec's defining identity: ADC(q, codes(x)) == ||q - recon(x)||²."""
    qv = np.asarray(qvecs[0])
    got = {
        r.vec_id: r.distance
        for r in pq.search(encoded, list(qv), 5).collect()
    }
    codes = {
        r.vec_id: r.pq_codes
        for r in encoded.filter(F.col("vec_id").isin(list(got))).collect()
    }
    for vid, dist in got.items():
        recon = pq.reconstruct(codes[vid])
        assert dist == pytest.approx(float(((qv - recon) ** 2).sum()), rel=1e-9)


def test_fit_is_deterministic(emb):
    a = ProductQuantizer.fit(emb, m=4, ksub=16, seed=7, iters=3)
    b = ProductQuantizer.fit(emb, m=4, ksub=16, seed=7, iters=3)
    assert np.array_equal(a.codebooks, b.codebooks)


def test_adc_recall(emb, encoded, pq, qvecs):
    recalls = []
    for qv in qvecs.values():
        exact = {r.vec_id for r in knn(emb, qv, 10).collect()}
        approx = {r.vec_id for r in pq.search(encoded, qv, 10).collect()}
        recalls.append(len(exact & approx) / 10)
    mean = sum(recalls) / len(recalls)
    # Uniform-random 64-d vectors are PQ's worst case (distance
    # concentration): raw ADC ranking is noisy by construction and the
    # rerank path below is the accuracy story. Floor pins non-degeneracy.
    assert mean >= 0.4, f"raw ADC recall@10 {mean} (measured ~0.6 at build)"


def test_rerank_beats_raw_adc(emb, encoded, pq, qvecs):
    raw, rr = [], []
    for qv in qvecs.values():
        exact = {r.vec_id for r in knn(emb, qv, 10).collect()}
        a = {r.vec_id for r in pq.search(encoded, qv, 10).collect()}
        b = {
            r.vec_id
            for r in pq.search(encoded, qv, 10, rerank=emb, shortlist=50).collect()
        }
        raw.append(len(exact & a) / 10)
        rr.append(len(exact & b) / 10)
    assert sum(rr) >= sum(raw)
    assert sum(rr) / len(rr) >= 0.8, f"reranked recall@10 {sum(rr)/len(rr)}"


def test_rerank_distances_are_exact(emb, encoded, pq, qvecs):
    qv = qvecs[7]
    res = pq.search(encoded, qv, 5, rerank=emb, shortlist=100).collect()
    exact = {r.vec_id: r.distance for r in knn(emb, qv, 200).collect()}
    for r in res:
        assert r.distance == pytest.approx(exact[r.vec_id], rel=1e-6)


def test_validation(emb, encoded, pq):
    with pytest.raises(ValueError, match="divisible"):
        ProductQuantizer.fit(emb, m=7)
    with pytest.raises(ValueError, match="ksub"):
        ProductQuantizer.fit(emb, m=8, ksub=512)
    with pytest.raises(ValueError, match="k must be"):
        pq.search(encoded, [0.0] * 64, 0)
    with pytest.raises(ValueError, match="dimension mismatch"):
        pq.adc_table([1.0, 2.0])
    with pytest.raises(ValueError, match="shortlist"):
        pq.search(encoded, [0.0] * 64, 10, rerank=emb, shortlist=5)


# ---------------------------------------------------------------------------
# IVF-PQ composition
# ---------------------------------------------------------------------------

from vector_db_spark.operators.ivfpq import IvfPqIndex  # noqa: E402


@pytest.fixture(scope="module")
def ivfpq(emb):
    idx = IvfPqIndex.build(emb, nlist=8, m=16, ksub=64, seed=42, max_iter=5)
    idx.encoded.cache().count()
    return idx


def test_ivfpq_full_probe_full_shortlist_is_exact(emb, ivfpq, qvecs):
    qv = qvecs[0]
    exact = [(r.vec_id, round(r.distance, 6)) for r in knn(emb, qv, 10).collect()]
    got = [
        (r.vec_id, round(r.distance, 6))
        for r in ivfpq.search(qv, 10, nprobe=8, shortlist=10_000_000).collect()
    ]
    assert got == exact


def test_ivfpq_tuned_recall(emb, ivfpq, qvecs):
    recalls = []
    for qv in qvecs.values():
        exact = {r.vec_id for r in knn(emb, qv, 10).collect()}
        approx = {
            r.vec_id
            for r in ivfpq.search(qv, 10, nprobe=6, shortlist=100).collect()
        }
        recalls.append(len(exact & approx) / 10)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.75, f"IVF-PQ recall@10 {mean} (measured ~0.9 at build)"


def test_ivfpq_residual_adc_identity(emb, ivfpq, qvecs):
    """ADC distance == ||q − (centroid + recon(residual codes))||²."""
    import numpy as np

    qv = np.asarray(qvecs[7])
    got = {r.vec_id: r.distance for r in ivfpq.search(qv.tolist(), 5, nprobe=8).collect()}
    rows = ivfpq.encoded.filter(F.col("vec_id").isin(list(got))).collect()
    cents = np.asarray(ivfpq.ivf.centroids)
    for r in rows:
        resid_q = qv - cents[r.cluster_id]
        recon = ivfpq.pq.reconstruct(r.pq_codes)
        want = float(((resid_q - recon) ** 2).sum())
        assert got[r.vec_id] == pytest.approx(want, rel=1e-9)


def test_ivfpq_save_load_prunes_partitions(emb, ivfpq, qvecs, tmp_path_factory, spark):
    path = str(tmp_path_factory.mktemp("ivfpq"))
    ivfpq.save(path)
    loaded = IvfPqIndex.load(spark, path)
    res = loaded.search(qvecs[21], 5, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan
    assert len(res.collect()) == 5
    # loaded index reproduces the in-memory index's results
    a = [r.vec_id for r in ivfpq.search(qvecs[21], 5, nprobe=8, shortlist=50).collect()]
    b = [r.vec_id for r in loaded.search(qvecs[21], 5, nprobe=8, shortlist=50).collect()]
    assert a == b


def test_ivfpq_validation(ivfpq):
    with pytest.raises(ValueError, match="k must be"):
        ivfpq.search([0.0] * 64, 0)
    with pytest.raises(ValueError, match="nprobe"):
        ivfpq.search([0.0] * 64, 5, nprobe=0)
    with pytest.raises(ValueError, match="dimension mismatch"):
        ivfpq.search([0.0] * 3, 5)


def test_ivfpq_probe_registered_params_recall(emb, ivfpq, qvecs):
    # Pin recall at EXACTLY the registered ivfpq_probe query's parameters
    # (queries/ann_queries.py: nprobe=4 of nlist=8, shortlist=100) so the
    # driver-visible approximate path can't silently degrade.
    recalls = []
    for qv in qvecs.values():
        exact = {r.vec_id for r in knn(emb, qv, 10).collect()}
        approx = {
            r.vec_id
            for r in ivfpq.search(qv, 10, nprobe=4, shortlist=100).collect()
        }
        recalls.append(len(exact & approx) / 10)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.6, f"ivfpq_probe-params recall@10 {mean} (measured ~0.8 at build)"


def test_pca_full_rank_shortlist_equals_exact(spark):
    from pyspark.sql import functions as F

    from vector_db_spark.operators.knn import knn
    from vector_db_spark.operators.pca import fit_pca, pca_shortlist_rerank
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head().embedding]
    model = fit_pca(emb, k=64)
    got = [
        (r.vec_id, round(r.distance, 6))
        for r in pca_shortlist_rerank(emb, model, qv, 10, shortlist=50).collect()
    ]
    want = [(r.vec_id, round(r.distance, 6)) for r in knn(emb, qv, 10).collect()]
    # full-rank rotation preserves L2: shortlist ranking == exact ranking
    assert got == want


def test_pca_reduced_rank_recall(spark):
    from pyspark.sql import functions as F

    from vector_db_spark.operators.knn import knn
    from vector_db_spark.operators.pca import fit_pca, pca_shortlist_rerank
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
    emb.count()
    # the fixture corpus is near-ISOTROPIC (worst case for PCA — no
    # low-variance directions to discard), so k=24 of 64 is the honest
    # compression point; structured real embeddings compress far harder
    model = fit_pca(emb, k=24)
    hits = total = 0
    for qid in (0, 21, 100):
        qv = [float(x) for x in emb.filter(F.col("vec_id") == qid).head().embedding]
        got = {r.vec_id for r in pca_shortlist_rerank(emb, model, qv, 10, shortlist=100).collect()}
        want = {r.vec_id for r in knn(emb, qv, 10).collect()}
        hits += len(got & want)
        total += len(want)
    emb.unpersist()
    assert hits / total >= 0.9  # 2.7x compression, 100-row shortlist


def test_pca_validates(spark):
    import pytest as _pytest

    from vector_db_spark.operators.pca import fit_pca

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="k must be"):
        fit_pca(df, k=3)


def test_pca_save_load_roundtrip(spark, tmp_path):
    import numpy as np
    from pyspark.sql import functions as F

    from vector_db_spark.operators.pca import fit_pca, load_pca, save_pca
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    m = fit_pca(emb, k=8)
    save_pca(m, str(tmp_path / "pca"))
    r = load_pca(str(tmp_path / "pca"))
    assert np.array_equal(r.mean, m.mean)
    assert np.array_equal(r.components, m.components)


def test_ivfpq_batch_matches_per_query_single(emb, ivfpq, qvecs):
    """Cogrouped batch ADC + shortlist + rerank at tuned params must
    equal a per-query loop of single search."""
    from pyspark.sql import functions as F

    qids = sorted(qvecs)
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = ivfpq.search_batch(queries, 10, nprobe=4, shortlist=100).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append(
            (r.rank, r.vec_id, round(r.distance, 6))
        )
    for qid in qids:
        single = ivfpq.search(qvecs[qid], 10, nprobe=4, shortlist=100).collect()
        want = [(i + 1, r.vec_id, round(r.distance, 6)) for i, r in enumerate(single)]
        assert sorted(by_q[qid]) == want, qid


# ---------------------------------------------------------------------------
# OPQ (operators/opq.py): learned rotation in front of PQ.
# ---------------------------------------------------------------------------


def test_opq_rotation_orthonormal_and_roundtrip(spark, emb, tmp_path):
    import numpy as np

    from vector_db_spark.operators.opq import OpqQuantizer

    oq = OpqQuantizer.fit(emb, m=8, ksub=16, seed=42, iters=4, opq_iters=3)
    r = oq.rotation
    assert np.allclose(r @ r.T, np.eye(r.shape[0]), atol=1e-9)
    oq.save(str(tmp_path / "opq"))
    back = OpqQuantizer.load(str(tmp_path / "opq"))
    assert np.array_equal(back.rotation, r)
    assert np.array_equal(back.pq.codebooks, oq.pq.codebooks)
    with pytest.raises(ValueError, match="dimension mismatch"):
        oq.search(oq.encode(emb), [1.0, 2.0], 3)


def test_pq_offload_fit_bit_identical(spark, emb):
    """Same pin for the plain-PQ Lloyd fit (see the OPQ twin below)."""
    a = ProductQuantizer.fit(emb, m=8, ksub=16, seed=42, iters=4)
    b = ProductQuantizer.fit(
        emb, m=8, ksub=16, seed=42, iters=4, offload_fit=True
    )
    assert np.array_equal(a.codebooks, b.codebooks)


def test_opq_offload_fit_bit_identical(spark, emb):
    """offload_fit=True ships the alternating NumPy loop to an executor
    task instead of the driver thread (r16, guide §5). Same function,
    same sample, same NumPy stack — the artifact must be BIT-equal, not
    just close: the frozen opq_adc_knn probe gate depends on it."""
    from vector_db_spark.operators.opq import OpqQuantizer

    a = OpqQuantizer.fit(emb, m=8, ksub=16, seed=42, iters=4, opq_iters=3)
    b = OpqQuantizer.fit(
        emb, m=8, ksub=16, seed=42, iters=4, opq_iters=3, offload_fit=True
    )
    assert np.array_equal(a.rotation, b.rotation)
    assert np.array_equal(a.pq.codebooks, b.pq.codebooks)


def test_opq_rerank_full_equals_exact(spark, emb):
    from vector_db_spark.operators.knn import knn
    from vector_db_spark.operators.opq import OpqQuantizer

    oq = OpqQuantizer.fit(emb, m=16, ksub=16, seed=42, iters=4, opq_iters=3)
    enc = oq.encode(emb).select("vec_id", "opq_codes")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head().embedding]
    got = oq.search(enc, qv, 10, rerank=emb, shortlist=10**7).collect()
    want = knn(emb, qv, 10).collect()
    assert [(r.vec_id, r.distance) for r in got] == [
        (r.vec_id, r.distance) for r in want
    ]


def test_opq_improves_on_pq_at_equal_budget(spark, emb):
    """The rung's reason to exist: at identical (m, ksub) code bytes the
    learned rotation must cut training reconstruction error (guaranteed
    by construction — iteration 0 IS plain PQ) and not lose search
    recall. Measured on this fixture: MSE 0.31 -> 0.26, recall@10
    0.47 -> 0.51 (m=16, ksub=16, 30 queries)."""
    import numpy as np

    from vector_db_spark.operators.knn import knn
    from vector_db_spark.operators.opq import (
        OpqQuantizer,
        _encode_np,
        _reconstruct_np,
    )
    from vector_db_spark.operators.pq import ProductQuantizer

    m, ksub = 16, 16
    pq = ProductQuantizer.fit(emb, m=m, ksub=ksub, seed=42, iters=8)
    oq = OpqQuantizer.fit(emb, m=m, ksub=ksub, seed=42, iters=8, opq_iters=6)

    pts = np.asarray(
        [r.embedding for r in emb.limit(1024).collect()], dtype=np.float64
    )
    pq_mse = float(
        (
            (pts - _reconstruct_np(_encode_np(pts, pq.codebooks), pq.codebooks))
            ** 2
        )
        .sum(axis=1)
        .mean()
    )
    assert oq.train_mse(pts) < pq_mse

    enc_p = pq.encode(emb).select("vec_id", "pq_codes")
    enc_o = oq.encode(emb).select("vec_id", "opq_codes")
    qs = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 30).collect()
    ]
    rp = ro = 0.0
    for qv in qs:
        exact = {r.vec_id for r in knn(emb, qv, 10).collect()}
        rp += len(exact & {r.vec_id for r in pq.search(enc_p, qv, 10).collect()})
        ro += len(exact & {r.vec_id for r in oq.search(enc_o, qv, 10).collect()})
    assert ro >= rp  # equal-budget recall never worse, typically better


def test_ivfopq_exhaustive_and_lifecycle(spark, emb, tmp_path):
    """IVF-OPQ composition: full probe + full shortlist == exact kNN;
    append rotates against the frozen geometry; deletes tombstone; the
    artifact round-trips with its rotation."""
    from vector_db_spark.operators.knn import knn
    from vector_db_spark.operators.opq import IvfOpqIndex

    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = IvfOpqIndex.build(
        half, nlist=4, m=16, ksub=16, seed=42, max_iter=3, pq_iters=4,
        opq_iters=3,
    )
    path = str(tmp_path / "ivfopq")
    idx.save(path)
    loaded = IvfOpqIndex.load(spark, path)
    loaded.append(rest, path=path)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head().embedding]
    got = loaded.search(qv, 10, nprobe=4, shortlist=10**7, rerank=emb).collect()
    want = knn(emb, qv, 10).collect()
    assert [(r.vec_id, r.distance) for r in got] == [
        (r.vec_id, r.distance) for r in want
    ]

    # tombstone the top hit; it must vanish and results equal exact-minus
    top = got[0].vec_id
    loaded.delete([int(top)], path=path)
    after = loaded.search(qv, 10, nprobe=4, shortlist=10**7, rerank=emb).collect()
    want2 = knn(emb, qv, 10, predicate=F.col("vec_id") != int(top)).collect()
    assert [(r.vec_id, r.distance) for r in after] == [
        (r.vec_id, r.distance) for r in want2
    ]

    # contract: shortlist rerank without the raw frame is refused
    with pytest.raises(ValueError, match="raw corpus"):
        loaded.search(qv, 5, shortlist=50)


def test_ivfopq_batch_exhaustive_equals_exact(spark, emb):
    from vector_db_spark.operators.knn import batch_knn
    from vector_db_spark.operators.opq import IvfOpqIndex

    idx = IvfOpqIndex.build(
        emb, nlist=4, m=16, ksub=16, seed=42, max_iter=3, pq_iters=4,
        opq_iters=3,
    )
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = [
        (r.query_id, r.vec_id, r.distance, r.rank)
        for r in idx.search_batch(queries, 5, nprobe=4, shortlist=10**6, rerank=emb)
        .orderBy("query_id", "rank")
        .collect()
    ]
    want = [
        (r.query_id, r.vec_id, r.distance, r.rank)
        for r in batch_knn(emb, queries, 5).orderBy("query_id", "rank").collect()
    ]
    assert got == want
    with pytest.raises(ValueError, match="raw corpus"):
        idx.search_batch(queries, 5, shortlist=50)


def test_exact_fold_parity_and_frozen_loaders(spark, emb):
    """The round-14 freeze conversion's engine side: exact_fold (order-
    pinned left folds, no BLAS expansion) must agree with the default
    GEMM path to fp noise — identical top-k ids, distances within 1e-9 —
    and the frozen artifacts must load in exact_fold mode with the
    pinned geometry. Bit-exactness itself is pinned by the DuckDB
    oracles of pq_adc_knn/opq_adc_knn."""
    from vector_db_spark.operators.opq import load_frozen_doc_opq
    from vector_db_spark.operators.pq import load_frozen_doc_pq

    q = emb.filter(F.col("vec_id") == 0).head()[1]
    pq_d = ProductQuantizer.fit(emb, m=16, ksub=16, seed=7, iters=4)
    pq_e = ProductQuantizer(pq_d.codebooks, "vec_id", "embedding", exact_fold=True)
    got_d = pq_d.search(pq_d.encode(emb), q, 10).collect()
    got_e = pq_e.search(pq_e.encode(emb), q, 10).collect()
    assert [r.vec_id for r in got_d] == [r.vec_id for r in got_e]
    for a, b in zip(got_d, got_e):
        assert abs(a.distance - b.distance) <= 1e-9 * max(1.0, abs(a.distance))

    fz = load_frozen_doc_pq()
    assert (fz.m, fz.ksub, fz.dsub, fz.exact_fold) == (16, 64, 4, True)
    oz = load_frozen_doc_opq()
    assert oz.exact_fold and oz.rotation.shape == (64, 64)
    # frozen rotation is orthonormal (L2-preserving ADC space)
    assert np.allclose(oz.rotation @ oz.rotation.T, np.eye(64), atol=1e-9)
    res = oz.search(oz.encode(emb).select("vec_id", "opq_codes"), q, 5).collect()
    assert len(res) == 5
