"""Physical-plan regression guards for the 100 TB story: filters must reach
the parquet scan, dimension joins must broadcast, no row-at-a-time Python in
any registered query, and the fact writer must partition by date."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.queries import build_registry


@pytest.fixture(autouse=True)
def _hermetic_cache(spark):
    """Shuffle-budget and join-strategy assertions must not see another
    module's leftover cached frames: the cache manager substitutes cached
    sub-plans into matching lineage, and InMemoryRelation stats can flip a
    broadcast join to sort-merge (observed in round 6 via a test_pipeline
    leak)."""
    spark.catalog.clearCache()
    yield


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_incremental_filter_pushes_to_scan(spark, sf_dir):
    from wsspark import adapters, quality

    li = read_table(spark, sf_dir, "lineitem")
    mv = quality.incremental_filter(
        adapters.movements_from_lineitem(li), "1997-01-01 00:00:00"
    )
    plan = plan_of(mv)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan


def test_scan_prunes_columns(spark, sf_dir):
    """A 2-column projection must not read all 11 lineitem columns."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    plan = plan_of(li.groupBy("l_partkey").agg(F.sum("l_quantity")))
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_partkey" in schema_line and "l_quantity" in schema_line
    assert "l_extendedprice" not in schema_line and "l_shipdate" not in schema_line


def test_dimension_joins_broadcast(spark, sf_dir):
    # top_unshipped_orders / local_supplier_volume folded in the r16 swap;
    # their broadcast-dim plan discipline still holds
    from wsspark.queries.llm import FOLDED_QUERIES

    lookup = {**build_registry(), **{q.name: q for q in FOLDED_QUERIES}}
    for name in ("top_unshipped_orders", "local_supplier_volume", "reorder_report"):
        plan = plan_of(lookup[name].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"


@pytest.mark.parametrize(
    "name",
    [
        n
        for n in build_registry()
        # multimodal is intentionally Arrow-Python; streamq queries EXECUTE
        # their full stream on invocation and return a memory-sink table
        # whose plan is a vacuous LocalTableScan (the streaming plans are
        # asserted in tests/test_streaming.py)
        if n not in ("multimodal_features",)
        and not n.startswith("streaming_")
    ],
)
def test_no_python_udf_in_query_plans(spark, sf_dir, name):
    """Everything except the (intentionally Arrow-Python) multimodal path
    stays JVM-side — no BatchEvalPython / row-at-a-time UDFs anywhere."""
    plan = plan_of(build_registry()[name].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan, f"{name} fell back to row Python"


def test_multimodal_uses_arrow_not_row_python(spark, sf_dir):
    plan = plan_of(build_registry()["multimodal_features"].fn(spark, sf_dir))
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_tfidf_has_no_baked_in_count(spark, sf_dir):
    """tfidf_top_terms must be fully lazy at plan-build time: N(docs) rides
    in as a broadcast 1-row aggregate, not a driver-side count() (round-1 ran
    an extra full job per invocation). A raw job-count assertion is flaky —
    the parquet read itself fires a schema-inference job — so assert the
    plan shape: N flows through as the `_n_docs` column out of a broadcast
    aggregate, and no LOG(<numeric literal>) appears (the signature of a
    baked-in driver-side scalar)."""
    import re

    plan = plan_of(build_registry()["tfidf_top_terms"].fn(spark, sf_dir))
    assert "_n_docs" in plan, "N is not flowing as a broadcast aggregate column"
    assert not re.search(r"LOG\(\(?[0-9]", plan), "N baked in as a literal"


def test_fact_writer_partitions_by_date(spark, tmp_path):
    import os

    from wsspark.io import write_fact_partitioned

    df = spark.range(10).select(
        F.col("id").alias("product_id"),
        F.lit(1).alias("quantity"),
        F.expr("date_add(date '2024-01-01', CAST(id AS INT))").alias("movement_date"),
    )
    path = str(tmp_path / "fact")
    write_fact_partitioned(df, path)
    parts = [d for d in os.listdir(path) if d.startswith("_dt=")]
    assert len(parts) == 10  # one directory per day -> partition pruning works


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Same-bucketed tables must join shuffle-free — the scale posture for
    recurring co-located joins (movements x stock)."""
    from wsspark.io import write_bucketed_table

    mv = spark.range(1000).select(
        (F.col("id") % 50).alias("product_id"), F.lit(1).alias("quantity")
    )
    stock = spark.range(50).select(
        F.col("id").alias("product_id"), (F.col("id") * 10).alias("on_hand")
    )
    write_bucketed_table(mv, "bt_movements", ("product_id",), n_buckets=8)
    write_bucketed_table(stock, "bt_stock", ("product_id",), n_buckets=8)
    try:
        joined = (
            spark.table("bt_movements")
            .join(spark.table("bt_stock"), "product_id")
            .groupBy("product_id")
            .agg(F.sum("quantity"))
        )
        # disable broadcast so the join strategy is the bucketed SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = plan_of(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, "bucketed join still shuffles"
        rows = joined.collect()
        assert len(rows) == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_movements")
        spark.sql("DROP TABLE IF EXISTS bt_stock")


def test_dedup_survivors_anti_join_broadcasts(spark, sf_dir):
    """The corpus side of the survivors anti-join must never shuffle: the
    drop-list is cluster-sized and broadcast."""
    from wsspark.queries.llm import FOLDED_QUERIES

    q = next(q for q in FOLDED_QUERIES if q.name == "dedup_survivors")
    plan = plan_of(q.fn(spark, sf_dir))
    assert "BroadcastHashJoin LeftAnti" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    ), "survivors anti-join is not broadcast"


def test_asof_join_single_exchange(spark, sf_dir):
    """The as-of join's union + carry-forward shape must cost exactly one
    exchange (the user_id window shuffle) over the unioned input."""
    import re

    plan = plan_of(build_registry()["purchase_last_click_asof"].fn(spark, sf_dir))
    n_exchanges = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
    assert n_exchanges == 1, plan


def test_moving_avg_reuses_single_sort(spark, sf_dir):
    """Both window frames (ma7 + cumulative) share one orderBy — the plan
    must contain a single Window sort, not one per frame.
    moving_avg_trends retired to the folded tier in r14; the plan
    discipline still holds, so the query comes from FOLDED_QUERIES."""
    from wsspark.queries.llm import FOLDED_QUERIES

    q = {f.name: f for f in FOLDED_QUERIES}["moving_avg_trends"]
    plan = plan_of(q.fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    # singlepartition window: exactly one Exchange SinglePartition for both frames
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_salted_agg_plan_has_salt_stage(spark, sf_dir):
    """The registered salted aggregation must actually salt: stage 1
    exchanges on (product_id, _salt) so a hot key spreads over n_salts
    reducers, stage 2 exchanges on product_id alone carrying at most
    n_salts partial rows per key."""
    import re

    plan = plan_of(build_registry()["salted_product_totals"].fn(spark, sf_dir))
    assert "xxhash64" in plan, "salt derivation missing from plan"
    # formatted explain puts the partitioning on the Exchange's Arguments
    # line, not inline with the node name
    exchanges = re.findall(r"hashpartitioning\(([^)]+)\)", plan)
    assert any("_salt" in e for e in exchanges), "stage-1 salt exchange missing"
    assert any("product_id" in e and "_salt" not in e for e in exchanges), (
        "stage-2 merge exchange missing"
    )


def test_replicated_skew_join_plan_replicates_build(spark, sf_dir):
    """The skew join must replicate the build side (explode over the salt
    sequence) and join on (key, salt) — never a plain single-reducer-per-
    hot-key join on product_id alone."""
    plan = plan_of(build_registry()["skew_join_brand_revenue"].fn(spark, sf_dir))
    assert "explode" in plan.lower(), "build-side salt replication missing"
    assert "_salt" in plan, "join not keyed by salt"
    assert "BatchEvalPython" not in plan


def test_new_tpch_shapes_broadcast_dimensions(spark, sf_dir):
    """Q7/Q9/Q18 shapes must broadcast their small side: the only sort-merge
    /shuffle joins allowed are fact-to-fact (lineitem-orders)."""
    from wsspark.queries.llm import FOLDED_QUERIES

    reg = dict(build_registry())
    for q in FOLDED_QUERIES:  # nation_trade_volume folded in the r13 swap
        reg.setdefault(q.name, q)
    for name in ("nation_trade_volume", "nation_year_margin", "large_orders"):
        plan = plan_of(reg[name].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, f"{name}: small side not broadcast"
        assert "CartesianProduct" not in plan, f"{name}: cartesian fallback"


def _tree_nodes(plan: str):
    """(indent, name, id) triples from the formatted-explain tree section
    (the first paragraph after '== Physical Plan ==')."""
    import re

    tree = plan.split("\n\n", 1)[0]
    out = []
    for line in tree.splitlines():
        m = re.match(r"^([:+\-\s*]*)([A-Za-z][^(]*)\((\d+)\)\s*$", line)
        if m:
            out.append((len(m.group(1)), m.group(2).strip(), int(m.group(3))))
    return out


def _broadcast_subtrees(plan: str):
    """For each BroadcastExchange in the tree: (first non-Filter/Project
    descendant name, set of descendant node ids)."""
    nodes = _tree_nodes(plan)
    subtrees = []
    for i, (ind, name, _nid) in enumerate(nodes):
        if "BroadcastExchange" not in name:
            continue
        desc, child = set(), None
        for ind2, name2, nid2 in nodes[i + 1:]:
            if ind2 <= ind:
                break
            if child is None and name2 not in ("Filter", "Project"):
                child = name2
            desc.add(nid2)
        subtrees.append((child, desc))
    return subtrees


def _scan_ids_for(plan: str, table: str):
    """Node ids of parquet scans whose Location mentions <table>.parquet."""
    import re

    ids, cur = set(), None
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) Scan parquet", line)
        if m:
            cur = int(m.group(1))
            continue
        if cur is not None and "Location" in line:
            if f"{table}.parquet" in line:
                ids.add(cur)
            cur = None
    return ids


def test_large_orders_scale_safe_build_sides(spark, sf_dir):
    """Q18 at 100 TB: the HAVING set is ~20% of orders, so NO base table may
    ever be a broadcast build side. The fact collapses through the l_orderkey
    aggregate, shuffle-joins orders, and only the limit-bounded top-100 frame
    is broadcast into customer — i.e. (a) the customer scan is never inside a
    BroadcastExchange, and (b) any BroadcastExchange whose subtree touches a
    fact scan must be fed by TakeOrderedAndProject (the distributed top-k).

    Auto-broadcast is disabled while building the plan: at test SF Catalyst
    legitimately broadcasts small tables by stats; with it off, the only
    broadcasts left are the HINTED ones — exactly what survives at 100 TB."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        # large_orders retired to the folded tier in r15; the broadcast
        # discipline still holds, so the query comes from FOLDED_QUERIES.
        from wsspark.queries.llm import FOLDED_QUERIES

        q = {f.name: f for f in FOLDED_QUERIES}["large_orders"]
        plan = plan_of(q.fn(spark, sf_dir))
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("BroadcastHashJoin")
    assert agg_pos != -1 and join_pos != -1

    customer_ids = _scan_ids_for(plan, "customer")
    fact_ids = _scan_ids_for(plan, "orders") | _scan_ids_for(plan, "lineitem")
    assert customer_ids and fact_ids, "scan nodes not found in formatted plan"
    subtrees = _broadcast_subtrees(plan)
    assert subtrees, "no BroadcastExchange in plan"
    for child, desc in subtrees:
        assert not (customer_ids & desc), "customer is a broadcast build side"
        if fact_ids & desc:
            assert child == "TakeOrderedAndProject", (
                f"fact-scale broadcast not limit-bounded (child={child})"
            )


def test_bigram_lm_vocab_is_broadcast_not_collected(spark, sf_dir):
    """bigram_lm_scores must stay lazy: the vocabulary size V rides in as
    the `_V` column of a broadcast 1-row aggregate (the tfidf discipline),
    never as a driver-side count baked into the smoothing expression."""
    import re

    plan = plan_of(build_registry()["bigram_lm_scores"].fn(spark, sf_dir))
    assert "_V" in plan, "V is not flowing as a broadcast aggregate column"
    assert not re.search(r"/ \(_c1L?#\d+ \+ [0-9]", plan), "V baked in as literal"
    assert "BatchEvalPython" not in plan


def test_fuzzy_join_collapses_vocabulary_before_self_join(spark, sf_dir):
    """fuzzy_name_pairs must compare within the DISTINCT name vocabulary,
    never all-pairs over the fact: the plan needs (a) no cartesian product,
    (b) a HashAggregate BELOW the self-join on both sides (the vocabulary
    collapse), so the quadratic comparison is bounded by block sizes."""
    plan = plan_of(build_registry()["fuzzy_name_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # an equi hash join on the block key, with a grouping aggregate feeding
    # EACH side (4 HashAggregate operators: partial+final per input)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert plan.count("HashAggregate") >= 4, (
        "vocabulary aggregate missing from a join input"
    )


def test_approx_distinct_is_partition_invariant(spark, sf_dir):
    """The HLL++ estimate must not depend on shuffle layout (register-max
    merge is commutative), or the driver hash would flip between runs."""
    from wsspark.queries.tpch import q_approx_distinct_accuracy

    base = q_approx_distinct_accuracy(spark, sf_dir).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = q_approx_distinct_accuracy(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, base)) == sorted(map(tuple, alt))
    assert all(r.within_tol for r in base)


# Shuffle-budget tripwire: the measured exchange count (range/hash shuffles,
# NOT broadcasts) of each headline query at the suite's default SF. A future
# change that adds a shuffle — or flips a broadcast join to sort-merge — to a
# heavy path fails here before it costs anything at scale. Budgets are the
# CURRENT plans, not aspirations; lower them if a plan improves.
EXCHANGE_BUDGET = {
    "abc_analysis": 2,
    "dq_flag_summary": 1,
    "transfer_patterns": 3,
    "warehouse_io_pivot": 2,
    "snapshot_recompute": 1,
    "stock_valuation_all": 3,
    "pricing_summary": 1,
    "top_unshipped_orders": 1,
    "doc_stats": 0,
    "minhash_dedup_pairs": 3,
    "ann_cosine_topk": 1,
    "sessionize": 1,
    "nation_trade_volume": 1,
    "large_orders": 2,
    "salted_product_totals": 2,
    "fuzzy_name_pairs": 3,
    "doc_chunks": 1,  # presentation orderBy only; the operator itself is 0
    # per-(order,supplier) agg + orderkey window + per-supplier agg; the
    # fact subtree appears once (window rewrite, no Q21 self-joins)
    "late_sole_supplier": 3,
    # 2 operator exchanges (min/max gram dup agg + per-doc agg; the dup
    # join-back rides the gram agg's partitioning and the doc join-back
    # broadcasts at this SF) + the presentation orderBy
    "dup_ngram_profile": 3,
}


@pytest.mark.parametrize("name,budget", sorted(EXCHANGE_BUDGET.items()))
def test_headline_shuffle_budget(spark, sf_dir, name, budget):
    import re

    if not sf_dir.rstrip("/").endswith("sf0.001"):
        pytest.skip("budgets pinned against sf0.001 statistics")
    # budgets also guard folded queries (still live operators with a
    # pytest-side oracle) — resolve from either table
    from wsspark.queries.llm import FOLDED_QUERIES

    lookup = {**build_registry(), **{q.name: q for q in FOLDED_QUERIES}}
    plan = plan_of(lookup[name].fn(spark, sf_dir))
    got = len(re.findall(r"\(\d+\) Exchange", plan))
    assert got <= budget, (
        f"{name}: {got} shuffle exchanges (budget {budget}) — a shuffle "
        "crept into a headline plan; explain() it and either remove the "
        "exchange or consciously raise the budget here"
    )


def test_cache_substitution_is_reversible(spark, sf_dir):
    """Pin the caching contract discovered in round 6: while the pipeline's
    shared frames are cached, a registry query sharing their lineage
    substitutes InMemoryRelation sub-plans (cached-stat substitution can even
    flip join strategies); Reports.release() must fully restore the pure
    parquet plan. This makes the behavior an asserted feature instead of a
    hazard found via a flaky shuffle budget."""
    from wsspark import pipeline

    name = "stock_valuation_all"
    fn = build_registry()[name].fn

    baseline = plan_of(fn(spark, sf_dir))
    assert "InMemoryTableScan" not in baseline

    reports = pipeline.build_reports(spark, sf_dir)
    try:
        cached_plan = plan_of(fn(spark, sf_dir))
        assert "InMemoryTableScan" in cached_plan, (
            "pipeline caches no longer substitute into stock_valuation_all's "
            "lineage — the shared-scan reuse contract broke"
        )
    finally:
        reports.release()

    restored = plan_of(fn(spark, sf_dir))
    assert "InMemoryTableScan" not in restored, (
        "Reports.release() left cached sub-plans behind"
    )


def test_approx_distinct_one_scan_per_table(spark, sf_dir):
    """All of a table's columns certify off ONE scan (lineitem's three via
    a single Expand-based multi-distinct aggregate): 3 tables -> exactly 3
    FileScans, not one per certified column (5)."""
    df = build_registry()["approx_distinct_accuracy"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert plan.count("FileScan parquet") == 3, plan


def test_dq_expectations_single_scan(spark, sf_dir):
    """The expectations audit must evaluate every constraint in ONE pass:
    exactly one file scan in the plan, no per-constraint jobs. (The
    distinct-count constraint adds an Expand, not a second scan.)"""
    import re

    plan = plan_of(build_registry()["dq_expectations"].fn(spark, sf_dir))
    # count scan NODES (the "(n) Scan parquet" details entries), not tree
    # echoes of the same node
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "BatchEvalPython" not in plan


def test_semantic_survivors_anti_join_broadcasts(spark, sf_dir):
    """The SemDeDup keep-set's corpus-side anti-join must broadcast the
    dominated-id set (duplicates-only — tiny relative to the corpus), so
    the survivors step adds no shuffle on the corpus side."""
    import re

    from wsspark.io import read_table
    from wsspark.llmops import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    plan = plan_of(similarity.semantic_dedup_survivors(emb, threshold=0.4))
    assert "LeftAnti" in plan, plan
    # every LeftAnti in the tree section must be the broadcast form
    assert not re.search(r"(?<!Broadcast)HashJoin LeftAnti", plan), plan
    assert "BroadcastHashJoin LeftAnti" in plan, plan


def test_late_sole_supplier_scans_fact_once(spark, sf_dir):
    """The Q21-shape rewrite must not replicate the fact subtree: the
    naive EXISTS/NOT-EXISTS plan scans lineitem three times; the window
    form scans each table exactly once."""
    import re

    plan = plan_of(build_registry()["late_sole_supplier"].fn(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 3, plan
    assert "TakeOrderedAndProject" in plan


def test_cms_sketch_single_scan_single_shuffle(spark, sf_dir):
    """The CMS build is ONE combinable aggregation: one corpus scan, one
    exchange (the partial aggregate shrinks the shuffle to <= width x
    depth rows per partition), no Python anywhere."""
    from wsspark.llmops import cms

    toks = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    plan = cms.cms_sketch(toks, "token", width=256, depth=4)._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert "BatchEvalPython" not in plan


def test_bm25_scans_corpus_twice_and_broadcasts_query_side(spark, sf_dir):
    """bm25_search touches the corpus exactly twice: the N/avgdl stats
    pass (the one parquet scan visible in the final plan) and the
    postings build (inside the one-time localCheckpoint materialization
    of the query-vocabulary-pruned `matched` frame). Everything joined
    against postings-derived frames is broadcast; no cartesian, no
    Python."""
    from wsspark.llmops import retrieval

    docs = read_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [(1, "spark query join"), (2, "vector hash")],
        "query_id long, text string",
    )
    out = retrieval.bm25_search(docs, qs, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # stats pass only
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan or \
        "Scan rdd" in plan.lower()  # the checkpointed matched frame
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_srp_signature_projection_is_shuffle_free(spark, sf_dir):
    """The SRP signature is a pure projection: zero exchanges between the
    parquet scan and the output — at 100 TB it pipelines with the scan."""
    from wsspark.llmops import srp

    emb = read_table(spark, sf_dir, "embeddings")
    plan = srp.srp_signatures(emb, planes=srp.srp_hyperplanes(64))._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 0
    assert "BatchEvalPython" not in plan
