"""Plan-shape pins for the flagship queries: these assert the physical
properties the 100 TB design depends on, so a change that silently
de-optimizes a plan (filter stops pushing, top-k becomes a global sort,
a dim table stops broadcasting) fails here instead of on the cluster."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.knn import knn
from vector_db_spark.plans import (
    has_broadcast_hash_join,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
    uses_whole_stage_codegen,
)
from vector_db_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_knn_is_take_ordered_not_global_sort(emb):
    res = knn(emb, [0.0] * 64, 10)
    assert has_take_ordered(res)
    assert "Exchange" not in res._jdf.queryExecution().executedPlan().toString().split(
        "TakeOrderedAndProject"
    )[0]


def test_filtered_knn_pushes_predicate_to_scan(emb):
    res = knn(emb, [0.0] * 64, 10, predicate=F.col("label") != 3)
    pushed = pushed_filters(res)
    assert any("Not(EqualTo(label,3))" in f for f in pushed), pushed


def test_scan_prunes_unused_columns(emb):
    # A projection of (vec_id, label) must not read the wide vector column.
    res = emb.filter(F.col("label") == 1).select("vec_id", "label")
    assert read_schema_columns(res) == {"vec_id", "label"}


def test_filtered_batch_ann_pushes_predicate_and_broadcasts_probes(emb, spark):
    """The round-3 filtered batch path: the corpus-side predicate must
    reach the scan (so at 100 TB it prunes row groups on top of the cell
    pruning) and the probed (query, cell) set must broadcast — the corpus
    never moves."""
    from vector_db_spark.operators.ann import IvfIndex

    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=2)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = idx.search_batch(queries, 5, nprobe=8, predicate=F.col("label") == 3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the label filter sits below the join on the corpus side (the Arrow
    # assignment stage caps pushdown into parquet, but the filter must at
    # least precede candidate materialization)
    before_join = plan.split("BroadcastHashJoin")[-1]
    assert "label" in before_join


def test_loaded_index_filtered_search_pushes_predicate(emb, spark, tmp_path):
    """After save()/load() the assignments are a plain parquet scan, so a
    search predicate must reach PushedFilters AND the probed cells must
    prune partitions — the two scan cuts compose on the 100 TB path.
    (On a freshly built index the Arrow assignment stage caps pushdown;
    persisted probes are the production path.)"""
    from vector_db_spark.operators.ann import IvfIndex

    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=2)
    idx.save(str(tmp_path / "ivf"))
    loaded = IvfIndex.load(spark, str(tmp_path / "ivf"))
    qv = [float(x) for x in emb.head().embedding]
    res = loaded.search(qv, 5, nprobe=2, predicate=F.col("label") == 3)
    assert any("EqualTo(label,3)" in f for f in pushed_filters(res))
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "cluster_id" in plan.split("PartitionFilters")[1][:200]


def test_batch_cogroup_paths_prune_partitions(emb, spark, tmp_path):
    """The cogrouped batch searches (graph, IVF-PQ) get no dynamic
    pruning from a broadcast join, so they must pre-filter the big side
    to the probed cells — on a loaded index that is parquet partition
    pruning (reduced nprobe ⇒ PartitionFilters on cluster_id)."""
    from vector_db_spark.operators.graph import GraphAnnIndex
    from vector_db_spark.operators.ivfpq import IvfPqIndex

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    gr = GraphAnnIndex.build(emb, nlist=4, m=8, ef_construction=50, seed=42, max_iter=2)
    gr.save(str(tmp_path / "g"))
    gplan = (
        GraphAnnIndex.load(spark, str(tmp_path / "g"))
        .search_batch(queries, 3, nprobe=1, ef_search=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert any(
        "cluster_id" in seg[:250] for seg in gplan.split("PartitionFilters")[1:]
    ), gplan[:500]

    pq = IvfPqIndex.build(emb, nlist=4, m=8, ksub=16, seed=42, max_iter=2)
    pq.save(str(tmp_path / "p"))
    pplan = (
        IvfPqIndex.load(spark, str(tmp_path / "p"))
        .search_batch(queries, 3, nprobe=1, shortlist=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # several scans exist (codes + raw-vector rerank); the CODES scan must
    # carry the cluster_id partition filter
    assert any(
        "cluster_id" in seg[:250] for seg in pplan.split("PartitionFilters")[1:]
    ), pplan[:500]


def test_ivf_batch_probe_dynamic_partition_pruning(emb, spark, tmp_path):
    """The probed-batch serving path (bench ann768_ivf_batch_search):
    the corpus side of the broadcast probe join must carry DYNAMIC
    partition pruning on cluster_id — at 100 TB the scan reads only the
    probed cells' partitions, discovered at runtime from the broadcast
    (query, cell) set, the batch twin of the single probe's static
    isin() PartitionFilters pin."""
    from vector_db_spark.operators.ann import IvfIndex

    idx = IvfIndex.build(emb, nlist=8, seed=42, max_iter=2)
    idx.save(str(tmp_path / "ivfb"))
    loaded = IvfIndex.load(spark, str(tmp_path / "ivfb"))
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = (
        loaded.search_batch(queries, 5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert any(
        "cluster_id" in seg[:250] and "dynamicpruning" in seg[:250]
        for seg in plan.split("PartitionFilters")[1:]
    ), plan[:800]


def test_small_dim_join_broadcasts(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name"
    )
    assert has_broadcast_hash_join(j)


def test_filter_stays_in_codegen(emb):
    res = emb.filter(F.col("label") != 3).select("vec_id")
    assert uses_whole_stage_codegen(res)


def test_batch_knn_broadcasts_query_side(spark, emb):
    from vector_db_spark.operators.knn import batch_knn

    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = batch_knn(emb, queries, 5)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_salted_agg_is_two_stage(spark):
    from vector_db_spark.operators.skew import salted_aggregate
    from vector_db_spark.sources.fixtures import load_table

    li = load_table(spark, SF, "lineitem")
    res = salted_aggregate(li, ["l_returnflag"], sum_cols=["l_extendedprice"])
    plan = res._jdf.queryExecution().executedPlan().toString()
    # two aggregation exchanges: (keys, salt) then keys
    assert plan.count("Exchange hashpartitioning") >= 2


def test_headline_neardup_plans_have_no_nested_loop_join(spark):
    # The bench's near-dup paths must all be bucketed/blocked equi-joins:
    # an O(n²) BroadcastNestedLoopJoin sneaking into a headline plan is the
    # one shape that cannot survive a 100× scale-up. (The unblocked
    # pairwise op still exists, but only as the oracle cross-check.)
    import bench
    from vector_db_spark.queries import QUERIES

    for name in [
        "minhash_lsh_neardup_capped",  # the benched twin since r11
        "simhash_neardup",
        "embedding_neardup_blocked",
        "dedup_clusters",
    ]:
        assert name in bench.HEADLINE
        plan = (
            QUERIES[name](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
    assert "embedding_neardup" not in bench.HEADLINE


def test_write_clustered_produces_disjoint_file_ranges(spark, tmp_path):
    import pyarrow.parquet as pq

    from vector_db_spark.sources.fixtures import load_table
    from vector_db_spark.sources.generic import write_clustered

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    path = str(tmp_path / "clustered")
    write_clustered(orders, path, ["o_orderkey"], n_files=8)

    import glob

    ranges = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "o_orderkey"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4
    # file key ranges must not overlap: footer stats alone can route a
    # point lookup to exactly one file
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges ({hi1} > {lo2})"


def test_bucketed_join_has_no_exchange(spark):
    from vector_db_spark.sources.fixtures import load_table
    from vector_db_spark.sources.generic import write_bucketed

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "pin_li", ["l_orderkey"], n_buckets=4)
    write_bucketed(orders, "pin_orders", ["o_orderkey"], n_buckets=4)
    li_b = spark.table("pin_li")
    o_b = spark.table("pin_orders")
    # Disable broadcast so the bucketed layout (not a tiny-SF broadcast)
    # carries the join; this is the 100 TB shape where neither side fits.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_global_shuffle_is_total_order_without_single_task(spark):
    from pyspark.sql import functions as F

    from vector_db_spark.operators.sampling import global_shuffle
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, SF, "documents").select("doc_id")
    out = global_shuffle(docs, key_col="doc_id", n_partitions=4)
    # no single-partition global sort/window in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    assert "SinglePartition" not in plan, plan
    # total order: per-partition (min, max) key ranges are disjoint and
    # each partition is locally sorted
    rows = out.select(
        F.spark_partition_id().alias("pid"), "shuffle_key"
    ).collect()
    by_pid: dict[int, list[str]] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r.shuffle_key)
    assert len(by_pid) >= 2
    bounds = []
    for pid, keys in by_pid.items():
        assert keys == sorted(keys), f"partition {pid} not locally sorted"
        bounds.append((keys[0], keys[-1]))
    bounds.sort()
    for (_, hi), (lo, _) in zip(bounds, bounds[1:]):
        assert hi <= lo, "partition key ranges overlap"
    # determinism: same input, same order
    again = [
        r.shuffle_key
        for r in global_shuffle(docs, key_col="doc_id", n_partitions=4)
        .select("shuffle_key")
        .collect()
    ]
    assert sorted(again) == sorted(k for ks in by_pid.values() for k in ks)


def test_salted_join_matches_plain_join_and_salts_the_key(spark):
    from vector_db_spark.operators.skew import salted_join

    large = spark.createDataFrame(
        [(1, i, float(i)) for i in range(40)] + [(2, 0, 5.0)],
        "k long, line int, v double",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unmatched")], "k long, tag string"
    )
    got = salted_join(large, small, ["k"], n_salts=8, salt_on=["k", "line"])
    plain = large.join(small, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    # the physical join key must include the salt column
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    # left join keeps unmatched large rows exactly like the plain left join
    lg = salted_join(
        large.unionByName(spark.createDataFrame([(9, 0, 0.0)], "k long, line int, v double")),
        small, ["k"], n_salts=4, how="left",
    )
    assert lg.filter("k = 9").count() == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(large, small, ["k"], how="full")


def test_lm_scoring_is_zero_shuffle(spark):
    # literal-map LM scoring (uni + bigram) must add NO exchange: the
    # whole scorer is row-local codegen over the scan
    from vector_db_spark.operators.lm import (
        BigramLm,
        UnigramLm,
        score_documents,
        score_documents_bigram,
    )
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    uni = UnigramLm({"a": 3, "the": 2}, 100)
    for res in (
        score_documents(docs, uni),
        score_documents_bigram(docs, BigramLm(uni, {"a the": -5})),
    ):
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_chunk_dedup_is_two_exchanges(spark):
    from vector_db_spark.operators.dedup import chunk_dedup
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = chunk_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    # window by chunk, regroup by doc — and nothing else
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_hamming_scan_reads_codes_not_vectors(spark):
    # the two-stage rerank's FIRST scan must prune the raw vector column:
    # reading 256B float vectors to compute 12B codes would defeat the op
    from vector_db_spark.operators.binary import binary_quantize, knn_hamming
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, SF, "embeddings")
    codes = binary_quantize(emb, dim=64).select("vec_id", "codes")
    import tempfile

    path = tempfile.mkdtemp(prefix="codes_") + "/codes.parquet"
    codes.write.mode("overwrite").parquet(path)
    saved = spark.read.parquet(path)
    plan = knn_hamming(saved, [0.5] * 64, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "embedding" not in plan  # column pruned at the scan


def test_write_sharded_bounds_every_file(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from vector_db_spark.sources.fixtures import load_table
    from vector_db_spark.sources.generic import write_sharded

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    n = docs.count()
    out = str(tmp_path / "shards")
    write_sharded(docs, out, max_records_per_file=64, n_tasks=2)
    files = glob.glob(out + "/*.parquet")
    sizes = [pq.read_metadata(f).num_rows for f in files]
    assert sum(sizes) == n
    assert max(sizes) <= 64
    assert len(files) >= n // 64


def test_maxsim_is_one_partial_agg_shuffle(spark):
    """MaxSim's plan contract (SURVEY §11): token dots row-local, ONE
    exchange for the doc-key max aggregation with a map-side partial
    agg before it, TakeOrderedAndProject for the top-k."""
    from pyspark.sql import functions as F

    from vector_db_spark.operators.late_interaction import maxsim_search
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, SF, "embeddings")
    toks = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 2).collect()
    ]
    plan = (
        maxsim_search(emb, toks, 5, doc_col="label")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2  # partial + final


def test_substring_dedup_shuffle_shape(spark):
    """Substring dedup's contract: ONE whash exchange feeds BOTH ranking
    windows (count + row_number share the partitioning), the dup-span
    regroup is its own hash aggregate, and the spans rejoin the docs —
    never a Cartesian, never a corpus broadcast of text."""
    from vector_db_spark.operators.dedup import substring_dedup
    from vector_db_spark.sources.fixtures import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = (
        substring_dedup(docs, window=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Window") == 2
    # exchanges: whash window partitioning + the per-doc regroup (the
    # dup-span map rejoins via broadcast)
    assert plan.count("Exchange (") <= 2 or plan.count("Exchange") <= 4


def test_tfidf_pushes_output_filter_to_tf_branch_only(spark):
    """The doc_id<200 OUTPUT restriction must reach the tf branch's scan
    (no tf work for non-output docs) while the df/N branches stay
    corpus-wide — pushing it there would silently shift idf."""
    from vector_db_spark.queries import QUERIES

    res = QUERIES["tfidf_top_terms"](spark, SF)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # exactly one of the three document scans carries the pushed filter
    assert plan.count("LessThan(doc_id,200)") == 1, plan
    # top-k per doc uses the rank-limit pushdown, not a full sort+filter
    assert "WindowGroupLimit" in plan, plan


def test_maxsim_ivf_candidate_scan_prunes_partitions(spark, tmp_path):
    """PLAID stage 1 on a LOADED token IVF: the candidate-generation
    scan must be parquet partition pruning on cluster_id (the sub-scan
    property the family exists for), and the exact rerank keeps the
    one-partial-agg-shuffle MaxSim shape downstream."""
    from vector_db_spark.operators.late_interaction import MaxSimIvfIndex
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, SF, "embeddings")
    toks = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 2).collect()
    ]
    idx = MaxSimIvfIndex.build(emb, nlist=4, doc_col="label", max_iter=2)
    idx.save(str(tmp_path / "ms"))
    loaded = MaxSimIvfIndex.load(spark, str(tmp_path / "ms"))
    plan = (
        loaded.search(toks, 3, nprobe=1, shortlist=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert any(
        "cluster_id" in seg[:250] for seg in plan.split("PartitionFilters")[1:]
    ), plan[:500]
    assert "TakeOrderedAndProject" in plan


def test_opq_adc_scan_reads_codes_not_vectors(spark):
    """OPQ's compressed-domain scan must read ONLY (id, codes) — same
    contract as plain PQ/Hamming: pulling the raw vector column would
    forfeit the 16x scan-byte cut the codec pays for."""
    import tempfile

    from vector_db_spark.operators.opq import OpqQuantizer
    from vector_db_spark.sources.fixtures import load_table

    emb = load_table(spark, SF, "embeddings")
    oq = OpqQuantizer.fit(emb, m=8, ksub=16, seed=42, iters=2, opq_iters=2)
    path = tempfile.mkdtemp(prefix="opq_") + "/codes.parquet"
    oq.encode(emb).select("vec_id", "opq_codes").write.mode("overwrite").parquet(path)
    saved = spark.read.parquet(path)
    qv = [0.0] * 64
    plan = (
        oq.search(saved, qv, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "embedding" not in plan
