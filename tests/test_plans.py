"""Physical-plan assertions: the 100-TB posture checks.

Correctness says the answer is right; these tests pin the PLAN --
filters reach the parquet scan, projections prune columns, small dims
broadcast, hints pick the intended strategy, top-k never global-sorts,
and no row-at-a-time Python sneaks into a hot path."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from graphdb_cia_factbook_spark import registry
from graphdb_cia_factbook_spark.sources import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_scan_pushdown_and_pruning(spark, queries):
    plan = plan_of(queries["s2_typed_scan"](spark, SF))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThan(l_quantity" in plan
    # projection pruning: the 11-column lineitem scan must read only
    # the 3 selected + 2 filtered columns
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_small_dim_broadcasts(spark, queries):
    plan = plan_of(queries["j1_left_broadcast"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_join_hints_control_strategy(spark, queries):
    assert "SortMergeJoin" in plan_of(queries["j_merge_hint"](spark, SF))
    assert "ShuffledHashJoin" in plan_of(
        queries["j_shuffle_hash_hint"](spark, SF))


def test_topk_never_global_sorts(spark, queries):
    plan = plan_of(queries["o1_top50_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_agg_is_partial_then_final(spark, queries):
    plan = plan_of(queries["q1_pricing_summary"](spark, SF), "simple")
    # map-side combine: partial aggregate below the exchange, final
    # above -- 100 TB collapses to |groups| x |partitions| rows before
    # the shuffle
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_ann_brute_broadcasts_queries(spark, queries):
    plan = plan_of(queries["llm_ann_brute"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan


def test_no_python_row_udfs_in_catalyst_paths(spark, queries):
    """Everything except the explicitly-Arrow multimodal path must stay
    JVM-side: no BatchEvalPython (row-at-a-time Python) anywhere, and
    mapInPandas only in the mm_* queries."""
    # skip builders that EXECUTE on construction (power iteration and
    # the checkpointed dedup pipelines) -- they are pure Catalyst +
    # localCheckpoint by construction and cost minutes to build here
    eager = {"g1_pagerank", "g1_pagerank_weighted", "g2_articlerank",
             "llm_minhash_lsh", "llm_ngram_jaccard",
             "agg_skyline", "agg_equidepth_histogram"}
    for name, fn in queries.items():
        if name in eager:
            continue
        plan = plan_of(fn(spark, SF), "simple")
        assert "BatchEvalPython" not in plan, name
        # the Arrow whitelist: multimodal decode (mm_*) and the dense
        # exact-scoring kernels (similarity.brute_topk_arrow for
        # bitext, similarity.near_dup_pairs_arrow for embed near-dup
        # -- see their docstrings for why Catalyst cannot express a
        # billions-of-pairs GEMM without materializing the pairs)
        if not name.startswith("mm_") and name != "llm_bitext_mining":
            assert "MapInPandas" not in plan, name
        # udaf_weighted_median is the registered applyInPandas UDAF
        # surface (PLAN_BUDGET-pinned python: 1) -- it has always
        # planned as FlatMapGroupsInPandas, by design
        if name not in ("llm_embed_neardup", "udaf_weighted_median"):
            assert "FlatMapGroupsInPandas" not in plan, name
        # a true cartesian (non-broadcast cross product) is never the
        # plan you want at 100 TB -- every deliberate cross join in
        # this repo broadcasts a scalar/dim side (BroadcastNestedLoop)
        assert "CartesianProduct" not in plan, name


def test_approx_sketches_bounded_error(spark):
    orders = read_table(spark, SF, "orders")
    row = (orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx"),
        F.countDistinct("o_custkey").alias("exact")).first())
    assert abs(row.approx - row.exact) <= 0.05 * row.exact


def test_q3_topk_and_pushdown(spark, queries):
    plan = plan_of(queries["q3_shipping_priority"](spark, SF))
    assert "TakeOrderedAndProject" in plan      # top-10, no global sort
    assert "PushedFilters: [" in plan
    assert "CartesianProduct" not in plan


def test_q5_no_cartesian_and_pruned_scans(spark, queries):
    plan = plan_of(queries["q5_local_supplier_volume"](spark, SF))
    assert "CartesianProduct" not in plan
    # lineitem scan must not read unused wide columns
    rs = [ln for ln in plan.splitlines()
          if "ReadSchema" in ln and "l_orderkey" in ln][0]
    assert "l_comment" not in rs and "l_returnflag" not in rs


def test_quantized_topk_has_local_prune(spark, queries):
    """quantized_topk routes through the two-phase top-k: the local
    rank partitioned by (query, input partition) appears as a
    SPARK_PARTITION_ID window key -- the map-side prune that bounds
    the shuffle to Q * partitions * k rows instead of Q * N."""
    plan = plan_of(queries["llm_ann_quantized"](spark, SF), "simple")
    assert "SPARK_PARTITION_ID" in plan.upper()


def test_scrub_and_chunk_are_shuffle_free(spark, queries):
    """PII scrub and overlap chunking are embarrassingly parallel
    maps: no hash-partitioning exchange anywhere in the plan (only
    the read_parallel round-robin scan widener is allowed)."""
    for name in ("llm_pii_scrub", "llm_chunk_overlap"):
        plan = plan_of(queries[name](spark, SF), "simple")
        assert "Exchange hashpartitioning" not in plan, name


def test_png_meta_stays_jvm_side(spark, queries):
    """The PNG header decode is pure Catalyst: no Arrow hop, no Python
    -- unlike the codec-bound decode_media path, binary metadata
    extraction never leaves the JVM."""
    plan = plan_of(queries["mm_png_meta"](spark, SF), "simple")
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_q6_pure_scan_side_aggregation(spark, queries):
    """TPC-H Q6: all three predicates must reach the parquet scan and
    the plan must contain no join or window -- scan, filter, partial
    agg, one-row final agg only."""
    plan = plan_of(queries["q6_forecast_revenue"](spark, SF))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    assert "Join" not in plan and "Window" not in plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_returnflag" not in rs and "l_partkey" not in rs


def test_q10_topk_and_returnflag_pushdown(spark, queries):
    """TPC-H Q10: global top-20 via TakeOrderedAndProject (no full
    sort) and the returnflag filter pushed into the lineitem scan."""
    plan = plan_of(queries["q10_returned_items"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q22_anti_join_and_scalar_broadcast(spark, queries):
    """TPC-H Q22: NOT EXISTS must be a left-anti join; the scalar
    average must arrive via a broadcast, never a shuffle."""
    plan = plan_of(queries["q22_dormant_customers"](spark, SF))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q21_semi_anti_residual_joins(spark, queries):
    """TPC-H Q21: EXISTS/NOT EXISTS must compile to one LeftSemi and
    one LeftAnti equi-join (with the suppkey inequality as a residual
    condition), never a cartesian product."""
    plan = plan_of(queries["q21_waiting_suppliers"](spark, SF))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q13_outer_join_keeps_zero_order_customers(spark, queries):
    """TPC-H Q13: the customer-orders join must stay LeftOuter (a
    plain inner join silently drops zero-order customers) and the
    priority filter must push to the orders scan."""
    plan = plan_of(queries["q13_customer_distribution"](spark, SF))
    assert "LeftOuter" in plan
    assert "Not(EqualTo(o_orderpriority,5-LOW))" in plan


def test_q17_avg_join_back_broadcasts(spark, queries):
    """TPC-H Q17: the per-part average must join back as a broadcast
    (part-sized), so the fact table never self-joins through a
    shuffle."""
    plan = plan_of(queries["q17_small_quantity_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_link_prediction_no_cartesian(spark, queries):
    """Candidate pairs must come from the wedge equi-join on the
    shared middle vertex, never an all-pairs product."""
    plan = plan_of(queries["g_link_prediction"](spark, SF))
    assert "CartesianProduct" not in plan


def _data_shuffles(plan: str) -> int:
    """Count DATA shuffles: hash/range-partitioning exchanges.  The
    round-robin REPARTITION_BY_NUM that read_parallel injects to
    parallelize a single-file local scan is deliberately excluded --
    it disappears on a real multi-file table."""
    return (plan.count("Arguments: hashpartitioning")
            + plan.count("Arguments: rangepartitioning"))


def test_scan_side_llm_entries_have_no_data_shuffle(spark, queries):
    """The zero-shuffle claims in the round-4 docstrings are plan
    facts: ablation tiering and the tile manifest must compile to a
    scan-side codegen stage with no hash/range exchange."""
    for name in ("llm_ablation_subsets", "mm_tile_manifest"):
        plan = plan_of(queries[name](spark, SF))
        assert _data_shuffles(plan) == 0, f"{name} shuffles:\n{plan}"


def test_shard_manifest_single_shuffle(spark, queries):
    """The shard manifest is ONE hash shuffle (partial agg map-side,
    final agg after a single Exchange on the shard key)."""
    plan = plan_of(queries["llm_shard_manifest"](spark, SF))
    assert _data_shuffles(plan) == 1, plan
    assert "partial_count" in plan


def test_curation_pipeline_single_scan_single_shuffle(spark, queries):
    """The curation pipeline reads the corpus ONCE and shuffles ONCE
    (the fingerprint window): a groupBy+join-back shape would show a
    second parquet scan and a broadcast."""
    plan = plan_of(queries["llm_curation_pipeline"](spark, SF))
    assert plan.count("Scan parquet") == 2, plan   # tree + detail
    assert _data_shuffles(plan) == 1, plan


def test_incremental_dedup_single_scan_single_shuffle(spark, queries):
    """Incremental dedup computes BOTH signals (index membership,
    in-batch first) from one fingerprint window: ONE corpus scan, ONE
    shuffle.  The distinct+semi-join+groupBy+join-back alternative it
    replaced would show three scans and extra exchanges."""
    plan = plan_of(queries["llm_incremental_dedup"](spark, SF))
    assert plan.count("Scan parquet") == 2, plan   # tree + detail
    assert _data_shuffles(plan) == 1, plan
