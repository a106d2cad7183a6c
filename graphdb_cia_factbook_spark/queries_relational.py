"""CORE relational operator queries (SURVEY.md §2.1-2.7) with DuckDB
oracles.  Each query exercises one inventory row on the driver's
testdata tables; reference citations are in the operator library
(:mod:`.operators.relational`) docstrings.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.relational import (
    davg,
    dsum,
    filter_in_not_skipped,
    filter_rlike,
    group_collect_sorted,
    latest_per_key,
    left_broadcast_join,
    masked_update,
    multisort,
    rank_in_group,
    union_tagged,
)
from .registry import register
from .sources import read_table


# ---------------------------------------------------------------------------
# S: scans
# ---------------------------------------------------------------------------

@register("s2_typed_scan", """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_quantity > 40
""")
def s2_typed_scan(spark, sf):
    """S2: schema-enforced scan with predicate+projection pushdown --
    the plan must read only 3 columns and push both filters to parquet."""
    li = read_table(spark, sf, "lineitem")
    return (li.where((F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp"))
                     & (F.col("l_quantity") > 40))
            .select("l_orderkey", "l_linenumber", "l_quantity"))


# ---------------------------------------------------------------------------
# P: filters / projections
# ---------------------------------------------------------------------------

@register("p1_filter_in_skip", """
SELECT event_id, event_type, value
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
  AND event_type NOT IN ('view')
  AND props LIKE '%"k"%'
""")
def p1_filter_in_skip(spark, sf):
    """P1: membership + skip-list predicate (link filter,
    scrape_cia.py:53-55, 298-302)."""
    ev = read_table(spark, sf, "events")
    out = filter_in_not_skipped(ev, "event_type",
                                ["click", "view", "purchase"], ["view"])
    return (out.where(F.col("props").contains('"k"'))
            .select("event_id", "event_type", "value"))


@register("p2_regex_filter", """
SELECT doc_id, n_chars
FROM documents
WHERE regexp_matches(text, 'join \\w+ join')
""")
def p2_regex_filter(spark, sf):
    """P2: regex row filter (the `\\(\\d{4}.+\\)` gate, scrape_cia.py:60)."""
    docs = read_table(spark, sf, "documents")
    return filter_rlike(docs, "text", r"join \w+ join").select("doc_id", "n_chars")


@register("p8_masked_update", """
SELECT c_custkey,
       c_name AS name,
       CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS acctbal_clean,
       c_nationkey
FROM customer
""")
def p8_masked_update(spark, sf):
    """P5-P8: conditional masked update + rename + drop
    (pandas `.loc[mask, col] =` pattern, scrape_cia.py:66-80)."""
    cust = read_table(spark, sf, "customer")
    out = masked_update(cust, "c_acctbal", F.col("c_acctbal") < 0, F.lit(0.0))
    return (out.withColumnRenamed("c_name", "name")
            .withColumnRenamed("c_acctbal", "acctbal_clean")
            .drop("c_mktsegment")
            .select("c_custkey", "name", "acctbal_clean", "c_nationkey"))


# ---------------------------------------------------------------------------
# J: joins
# ---------------------------------------------------------------------------

@register("j1_left_broadcast", """
SELECT c_custkey, c_name, n.n_name AS nation_name
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
""")
def j1_left_broadcast(spark, sf):
    """J1: left equi-join with broadcast dimension
    (population->country, preprocess_upload_neo4j.py:121-122)."""
    cust = read_table(spark, sf, "customer")
    nation = read_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation_name"))
    return (left_broadcast_join(cust, nation, "c_nationkey")
            .select("c_custkey", "c_name", "nation_name"))


@register("j2_chained_dims", """
SELECT o_orderkey, o_totalprice, c.c_name, n.n_name AS nation, r.r_name AS region
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
""")
def j2_chained_dims(spark, sf):
    """J2: chained left dimension joins (the x5 indicator-join loop,
    preprocess_upload_neo4j.py:128-144)."""
    orders = read_table(spark, sf, "orders")
    cust = read_table(spark, sf, "customer")
    nation = read_table(spark, sf, "nation")
    region = read_table(spark, sf, "region")
    return (orders
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
            .select("o_orderkey", "o_totalprice", "c_name",
                    F.col("n_name").alias("nation"),
                    F.col("r_name").alias("region")))


@register("j4_derived_share", """
WITH totals AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)))
              AS DOUBLE) AS order_total
  FROM lineitem GROUP BY l_orderkey
)
SELECT l.l_orderkey, l.l_linenumber,
       l.l_extendedprice * (1 - l.l_discount) / t.order_total AS l_share
FROM lineitem l JOIN totals t ON l.l_orderkey = t.l_orderkey
""")
def j4_derived_share(spark, sf):
    """J4/F11: join partner share to total then derive amount
    (`amount = amount * percentage`, preprocess_upload_neo4j.py:162-171).
    Self-aggregate join: the fact table joins its own per-key totals."""
    li = read_table(spark, sf, "lineitem")
    totals = (li.groupBy("l_orderkey")
              .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .alias("order_total")))
    return (li.join(totals, "l_orderkey")
            .select("l_orderkey", "l_linenumber",
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))
                     / F.col("order_total")).alias("l_share")))


@register("j5_map_lookup", """
SELECT s_suppkey, n.n_name AS nation_name
FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
""")
def j5_map_lookup(spark, sf):
    """J5: dict-map lookup (`df["exports"].map(di_exp)`,
    preprocess_upload_neo4j.py:194-201) == broadcast hash lookup."""
    supp = read_table(spark, sf, "supplier")
    nation = read_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nation_name"))
    return (left_broadcast_join(supp, nation, "s_nationkey")
            .select("s_suppkey", "nation_name"))


@register("j7_semi_endpoints", """
SELECT l_orderkey, l_linenumber, l_partkey
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
  AND EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
""")
def j7_semi_endpoints(spark, sf):
    """J7: graph-pattern endpoint validation (Cypher MATCH-MATCH-MERGE,
    preprocess_upload_neo4j.py:291-293) as broadcast semi-joins."""
    li = read_table(spark, sf, "lineitem")
    part = read_table(spark, sf, "part")
    supp = read_table(spark, sf, "supplier")
    return (li.join(F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"))),
                    "l_partkey", "left_semi")
            .join(F.broadcast(supp.select(F.col("s_suppkey").alias("l_suppkey"))),
                  "l_suppkey", "left_semi")
            .select("l_orderkey", "l_linenumber", "l_partkey"))


@register("j_anti_no_orders", """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def j_anti_no_orders(spark, sf):
    """EXT join: anti-join (customers without orders) -- the 100-TB
    complement of J7's semi-join."""
    cust = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    return (cust.join(orders.select(F.col("o_custkey").alias("c_custkey")),
                      "c_custkey", "left_anti")
            .select("c_custkey", "c_name"))


# ---------------------------------------------------------------------------
# A: aggregations
# ---------------------------------------------------------------------------

@register("a1_latest_per_key", """
SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""")
def a1_latest_per_key(spark, sf):
    """A1/W3: latest-row-per-key argmax dedup -- the reference workhorse
    (sort_values + drop_duplicates keep-first x7,
    preprocess_upload_neo4j.py:139-140, 159-160, 167-168, 181-182)."""
    orders = read_table(spark, sf, "orders")
    return latest_per_key(
        orders, ["o_custkey"],
        [F.desc("o_orderdate"), F.desc("o_orderkey")],
    ).select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")


@register("a2_dedup_pairs", """
SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
""")
def a2_dedup_pairs(spark, sf):
    """A2: key dedup (`drop_duplicates(["regions","country"])`,
    preprocess_upload_neo4j.py:150-151) restricted to key columns =>
    order-independent."""
    li = read_table(spark, sf, "lineitem")
    return li.select("l_partkey", "l_suppkey").dropDuplicates()


@register("a3_distinct_values", """
SELECT DISTINCT c_mktsegment FROM customer
""")
def a3_distinct_values(spark, sf):
    """A3: distinct values (`df["regions"].unique()`,
    preprocess_upload_neo4j.py:309)."""
    return read_table(spark, sf, "customer").select("c_mktsegment").distinct()


@register("a4_group_collect", """
SELECT n_regionkey,
       array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations_csv
FROM nation GROUP BY n_regionkey
""")
def a4_group_collect(spark, sf):
    """A4: group-collect set->sorted list (sub-goods per mapped good,
    preprocess_upload_neo4j.py:204-208).  The gated output joins the
    sorted list to one string: the values are identical to the array
    form, and a scalar column survives any row-hash canonicalizer
    (list cells are unhashable in pandas-side sorts)."""
    nation = read_table(spark, sf, "nation")
    return (group_collect_sorted(nation, "n_regionkey", "n_name", "nations")
            .select("n_regionkey",
                    F.array_join("nations", ",").alias("nations_csv")))


@register("a5_count_distinct", """
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers
FROM customer GROUP BY c_mktsegment
""")
def a5_count_distinct(spark, sf):
    """A5/EXT: exact distinct aggregation (Catalyst expands to a
    two-stage partial/final plan automatically)."""
    cust = read_table(spark, sf, "customer")
    return (cust.groupBy("c_mktsegment")
            .agg(F.countDistinct("c_nationkey").alias("n_nations"),
                 F.count(F.lit(1)).alias("n_customers")))


@register("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE)
         / COUNT(l_quantity) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf):
    """TPC-H Q1 shape: the canonical wide aggregation; map-side partial
    agg collapses 100 TB to |groups| x |partitions| rows before the
    shuffle.  Decimal-exact sums (see dsum) keep it bit-stable."""
    li = read_table(spark, sf, "lineitem")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(dsum("l_quantity").alias("sum_qty"),
                 dsum("l_extendedprice").alias("sum_base_price"),
                 dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("sum_disc_price"),
                 davg("l_quantity").alias("avg_qty"),
                 F.count(F.lit(1)).alias("count_order")))


@register("q3_shipping_priority", """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def q3_shipping_priority(spark, sf):
    """TPC-H Q3 shape: segment-filtered customer keys reduce orders,
    orders reduce lineitem, decimal-exact revenue agg, global top-10
    via TakeOrderedAndProject (no full sort at any scale).  Filters
    sit on the scan side of every join so pushdown prunes before the
    shuffle; join strategies are left to AQE because customer and
    orders both scale with the data."""
    cust = read_table(spark, sf, "customer") \
        .where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = (read_table(spark, sf, "orders")
              .where(F.col("o_orderdate")
                     < F.lit("1998-03-15").cast("timestamp"))
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (read_table(spark, sf, "lineitem")
          .where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate",
                    "o_orderpriority")
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


@register("q5_local_supplier_volume", """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(27,4))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""")
def q5_local_supplier_volume(spark, sf):
    """TPC-H Q5 shape: local-supplier volume -- the customer and the
    supplier must share a nation inside one region.  Only the
    fixed-size nation/region dims get a broadcast HINT; customer and
    supplier scale with the data, so their join strategy is left to
    AQE (broadcast at small SF, shuffle when they outgrow the
    threshold).  The s_nationkey = c_nationkey equi-condition rides
    the supplier join, not a post-filter, so rows drop before the
    aggregate."""
    li = read_table(spark, sf, "lineitem") \
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    orders = (read_table(spark, sf, "orders")
              .where((F.col("o_orderdate")
                      >= F.lit("1996-01-01").cast("timestamp"))
                     & (F.col("o_orderdate")
                        < F.lit("1997-01-01").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    cust = read_table(spark, sf, "customer") \
        .select("c_custkey", "c_nationkey")
    supp = read_table(spark, sf, "supplier") \
        .select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf, "nation")
    region = read_table(spark, sf, "region") \
        .where(F.col("r_name") == "ASIA")
    local_nations = (nation.join(F.broadcast(region),
                                 nation.n_regionkey == region.r_regionkey)
                     .select("n_nationkey", "n_name"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(supp,
                  (li.l_suppkey == supp.s_suppkey)
                  & (supp.s_nationkey == cust.c_nationkey))
            .join(F.broadcast(local_nations),
                  supp.s_nationkey == local_nations.n_nationkey)
            .groupBy("n_name")
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue")))


@register("agg_cube", """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def agg_cube(spark, sf):
    """EXT agg: CUBE grouping sets (SURVEY §2.4 EXT row)."""
    li = read_table(spark, sf, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(dsum("l_quantity").alias("sum_qty"),
                 F.count(F.lit(1)).alias("n")))


@register("agg_rollup", """
SELECT o_orderpriority, o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""")
def agg_rollup(spark, sf):
    """EXT agg: ROLLUP hierarchy totals."""
    orders = read_table(spark, sf, "orders")
    return (orders.rollup("o_orderpriority", "o_orderstatus")
            .agg(dsum("o_totalprice").alias("total"),
                 F.count(F.lit(1)).alias("n")))


@register("agg_grouping_sets", """
SELECT o_orderpriority, o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
""")
def agg_grouping_sets(spark, sf):
    """EXT agg: explicit GROUPING SETS -- two independent group-bys in
    one pass (CUBE/ROLLUP's general form; one shuffle produces both
    marginal tables instead of two scans)."""
    orders = read_table(spark, sf, "orders")
    return (orders.groupingSets([["o_orderpriority"], ["o_orderstatus"]],
                                "o_orderpriority", "o_orderstatus")
            .agg(dsum("o_totalprice").alias("total"),
                 F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------------------
# W: windows
# ---------------------------------------------------------------------------

@register("w1_rank_min", """
SELECT s_suppkey, s_nationkey,
       RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)
         AS acctbal_rank
FROM supplier
""")
def w1_rank_min(spark, sf):
    """W1: grouped min-method rank == SQL RANK()
    (export/import_trade_rank, preprocess_upload_neo4j.py:184-185)."""
    supp = read_table(spark, sf, "supplier")
    return rank_in_group(supp, ["s_nationkey"], [F.desc("s_acctbal")],
                         "acctbal_rank").select(
        "s_suppkey", "s_nationkey", "acctbal_rank")


@register("w3_lag_lead", """
SELECT event_id, user_id,
       LAG(value) OVER w AS prev_value,
       LEAD(value) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def w3_lag_lead(spark, sf):
    """EXT window: lag/lead analytics over a total per-user order."""
    ev = read_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select("event_id", "user_id",
                     F.lag("value").over(w).alias("prev_value"),
                     F.lead("value").over(w).alias("next_value"))


@register("w4_moving_sum", """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value
FROM events
""")
def w4_moving_sum(spark, sf):
    """EXT window: running aggregate with an explicit rowsBetween frame
    (decimal-exact so the cumulative order is bit-stable)."""
    ev = read_table(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast("decimal(27,4)")).over(w)
        .cast("double").alias("running_value"))


@register("w_range_frame", """
WITH e AS (
  SELECT event_id, user_id, value,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s
  FROM events
)
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_10m,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER w AS DOUBLE)
         AS sum_last_10m
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
""")
def w_range_frame(spark, sf):
    """EXT window: VALUE-range frame (all events within the trailing
    10 minutes, however many rows that is) -- the complement of
    w4_moving_sum's row-count frame.  The frame bound is integer epoch
    seconds on both engines, so peer-row semantics (range frames
    include ALL rows with equal order value) are deterministic and
    engine-exact; the sum is decimal-exact."""
    ev = read_table(spark, sf, "events")
    ts_s = F.floor(F.col("ts").cast("timestamp").cast("double")) \
        .cast("long")
    w = (Window.partitionBy("user_id").orderBy(ts_s)
         .rangeBetween(-600, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_10m"),
        F.sum(F.col("value").cast("decimal(27,4)")).over(w)
        .cast("double").alias("sum_last_10m"))


@register("w5_topk_per_group", """
SELECT o_custkey, o_orderkey, rn
FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""")
def w5_topk_per_group(spark, sf):
    """W1+O3: top-k per group (top partner per country, README.md:21)."""
    orders = read_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "rn"))


# ---------------------------------------------------------------------------
# O/U: sorts, limits, set ops
# ---------------------------------------------------------------------------

@register("o1_top50_orders", """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""")
def o1_top50_orders(spark, sf):
    """O1-O3: multi-key sort + top-k limit; Spark compiles this to
    TakeOrderedAndProject (per-partition heap), never a global sort."""
    orders = read_table(spark, sf, "orders")
    return multisort(orders.select("o_orderkey", "o_totalprice"),
                     [F.desc("o_totalprice"), F.asc("o_orderkey")], limit=50)


@register("u1_union_tagged", """
SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS role
FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS role
FROM supplier WHERE s_acctbal > 1000
""")
def u1_union_tagged(spark, sf):
    """U1: concat of differently-sourced frames with a role tag
    (exports+imports merge, preprocess_upload_neo4j.py:176)."""
    cust = (read_table(spark, sf, "customer")
            .where(F.col("c_acctbal") > 9000)
            .select(F.col("c_name").alias("name"),
                    F.col("c_acctbal").alias("acctbal")))
    supp = (read_table(spark, sf, "supplier")
            .where(F.col("s_acctbal") > 1000)
            .select(F.col("s_name").alias("name"),
                    F.col("s_acctbal").alias("acctbal")))
    return union_tagged({"customer": cust, "supplier": supp}, "role")


@register("set_intersect", """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""")
def set_intersect(spark, sf):
    """EXT set op: INTERSECT (distinct semantics)."""
    orders = read_table(spark, sf, "orders")
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f)


@register("set_except_all", """
SELECT o_custkey FROM orders
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""")
def set_except_all(spark, sf):
    """EXT set op: EXCEPT ALL (multiset difference)."""
    orders = read_table(spark, sf, "orders")
    return (orders.select("o_custkey")
            .exceptAll(orders.where(F.col("o_orderstatus") == "F")
                       .select("o_custkey")))


@register("w6_ntile_percent_rank", """
SELECT s_suppkey, s_nationkey,
       NTILE(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
""")
def w6_ntile_percent_rank(spark, sf):
    """EXT analytic windows: quartile bucketing + relative standing
    (ntile / percent_rank / cume_dist) over a total per-group order."""
    supp = read_table(spark, sf, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey"))
    return supp.select(
        "s_suppkey", "s_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))


@register("f_levenshtein_names", """
SELECT a.n_name AS name_a, b.n_name AS name_b,
       levenshtein(a.n_name, b.n_name) AS edit_dist
FROM nation a JOIN nation b ON a.n_name < b.n_name
WHERE levenshtein(a.n_name, b.n_name) <= 3
""")
def f_levenshtein_names(spark, sf):
    """EXT string similarity: edit-distance pairs under a threshold --
    the fuzzy-matching primitive behind the reference's hand-curated
    country-name fixes (scrape_cia.py:304-309), automated."""
    nation = read_table(spark, sf, "nation")
    a = nation.select(F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_name").alias("name_b"))
    return (a.join(b, F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b",
                    F.levenshtein("name_a", "name_b").alias("edit_dist"))
            .where(F.col("edit_dist") <= 3))


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRI_COLS = {p: "p" + p[0] for p in _PRIORITIES}


@register("agg_pivot", """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
FROM orders GROUP BY o_orderstatus
""")
def agg_pivot(spark, sf):
    """EXT reshape: pivot (long -> wide).  With the pivot values
    declared, Catalyst compiles this to ONE pass of conditional
    aggregates -- no second job to discover distinct keys, the form
    that scales."""
    orders = read_table(spark, sf, "orders")
    out = (orders.groupBy("o_orderstatus")
           .pivot("o_orderpriority", _PRIORITIES)
           .count())
    for p, alias in _PRI_COLS.items():
        out = out.withColumnRenamed(p, alias)
    return out.na.fill(0)


@register("agg_unpivot", """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric,
       CAST(c_nationkey AS DOUBLE) AS value
FROM customer
""")
def agg_unpivot(spark, sf):
    """EXT reshape: unpivot/melt (wide -> long) via the native
    ``unpivot`` operator (a generate, not a shuffle)."""
    cust = read_table(spark, sf, "customer")
    return (cust.select("c_custkey", F.col("c_acctbal").alias("acctbal"),
                        F.col("c_nationkey").cast("double")
                        .alias("nationkey"))
            .unpivot("c_custkey", ["acctbal", "nationkey"],
                     "metric", "value"))


@register("agg_median_quartiles", """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.25), 6) AS q1,
       round(quantile_cont(o_totalprice, 0.50), 6) AS median,
       round(quantile_cont(o_totalprice, 0.75), 6) AS q3
FROM orders GROUP BY o_orderstatus
""")
def agg_median_quartiles(spark, sf):
    """EXT exact quantiles: interpolated percentile (both engines use
    rank = p*(n-1) linear interpolation).  Exact quantiles need a full
    sort per group -- at 100 TB prefer the approx sketch
    (agg_approx_sketches); this is the small-group exact form."""
    orders = read_table(spark, sf, "orders")
    return (orders.groupBy("o_orderstatus")
            .agg(F.round(F.percentile("o_totalprice", F.lit(0.25)), 6)
                 .alias("q1"),
                 F.round(F.percentile("o_totalprice", F.lit(0.50)), 6)
                 .alias("median"),
                 F.round(F.percentile("o_totalprice", F.lit(0.75)), 6)
                 .alias("q3")))


@register("agg_stats_corr", """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(stddev_samp(l_discount), 6) AS discount_sd,
       round(var_samp(l_tax), 6) AS tax_var,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
""")
def agg_stats_corr(spark, sf):
    """EXT statistical aggregates: correlation / stddev / variance via
    single-pass co-moment merge formulas on both engines (rounded to 6
    decimals; the merge-order float drift is ~1e-12 relative)."""
    li = read_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6)
                 .alias("qty_price_corr"),
                 F.round(F.stddev_samp("l_discount"), 6)
                 .alias("discount_sd"),
                 F.round(F.var_samp("l_tax"), 6).alias("tax_var"),
                 F.count(F.lit(1)).alias("n")))


@register("udaf_weighted_median", """
WITH ordered AS (
  SELECT l_returnflag, l_extendedprice, l_quantity,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice
                               ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS total
  FROM lineitem
),
hit AS (
  SELECT l_returnflag, l_extendedprice, total,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS rn
  FROM ordered WHERE cum >= total / 2
)
SELECT h.l_returnflag, h.l_extendedprice AS wmedian,
       h.total AS total_weight, c.n
FROM hit h JOIN (SELECT l_returnflag, COUNT(*) AS n
                 FROM lineitem GROUP BY l_returnflag) c
  ON h.l_returnflag = c.l_returnflag
WHERE h.rn = 1
""")
def udaf_weighted_median(spark, sf):
    """UDAF surface (§2.11): quantity-weighted median price per return
    flag through grouped applyInPandas (Arrow batches, vectorized
    pandas) -- the custom-aggregate shape built-ins can't express.
    Oracle = the same lower-weighted-median via window cumsum."""
    from .operators.relational import grouped_weighted_median
    li = read_table(spark, sf, "lineitem")
    return grouped_weighted_median(li, "l_returnflag",
                                   "l_extendedprice", "l_quantity")


@register("agg_winsorized", """
WITH cuts AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS p05,
         quantile_cont(l_extendedprice, 0.95) AS p95
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN l.l_extendedprice < c.p05
                     OR l.l_extendedprice > c.p95 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped,
       ROUND(CAST(SUM(CAST(
         CASE WHEN l.l_extendedprice < c.p05 THEN c.p05
              WHEN l.l_extendedprice > c.p95 THEN c.p95
              ELSE l.l_extendedprice END AS DECIMAL(27,6)))
         AS DOUBLE) / COUNT(*), 6) AS winsorized_mean
FROM lineitem l JOIN cuts c ON l.l_returnflag = c.l_returnflag
GROUP BY l.l_returnflag
""")
def agg_winsorized(spark, sf):
    """Winsorized mean per group: exact interpolated p05/p95 cuts
    (broadcast back as a tiny dim) clip the tails before a
    decimal-exact mean -- the outlier-robust aggregate monitoring
    pipelines use where a plain mean follows one corrupt row.  Two
    passes; the clip compares identical doubles on both engines.

    The mean rounds to 6 decimals (the anomaly_zscore posture): at the
    sf10 rung the clipped sum's SCALED decimal exceeds 2^53, where
    DuckDB's decimal->double cast converts through int128 and can land
    one ulp off Spark's correctly-rounded BigDecimal conversion
    (measured: 1061397464025.000000 -> 1061397464024.9999 vs ...25.0);
    rounding the quotient absorbs that sub-1e-6 divergence on both
    engines."""
    li = read_table(spark, sf, "lineitem").select("l_returnflag",
                                                  "l_extendedprice")
    cuts = (li.groupBy("l_returnflag")
            .agg(F.percentile("l_extendedprice", F.lit(0.05)).alias("p05"),
                 F.percentile("l_extendedprice", F.lit(0.95)).alias("p95")))
    clipped = (F.when(F.col("l_extendedprice") < F.col("p05"), F.col("p05"))
               .when(F.col("l_extendedprice") > F.col("p95"), F.col("p95"))
               .otherwise(F.col("l_extendedprice")))
    was_clipped = ((F.col("l_extendedprice") < F.col("p05"))
                   | (F.col("l_extendedprice") > F.col("p95")))
    return (li.join(F.broadcast(cuts), "l_returnflag")
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(was_clipped.cast("int")).alias("n_clipped"),
                 F.round(F.sum(clipped.cast("decimal(27,6)"))
                         .cast("double") / F.count(F.lit(1)), 6)
                 .alias("winsorized_mean")))


@register("s4_merge_into", """
WITH delta AS (
  SELECT c_custkey, c_name, c_acctbal + 1000.0 AS c_acctbal,
         c_nationkey, c_mktsegment
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey + 2000000, 'NEW#' || c_custkey, 0.0,
         c_nationkey, c_mktsegment
  FROM customer WHERE c_custkey % 100 = 0
)
SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
       COALESCE(t.c_name, s.c_name) AS c_name,
       CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
            ELSE t.c_acctbal END AS c_acctbal,
       COALESCE(t.c_nationkey, s.c_nationkey) AS c_nationkey,
       COALESCE(t.c_mktsegment, s.c_mktsegment) AS c_mktsegment,
       CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
            THEN 'update'
            WHEN s.c_custkey IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS merge_action
FROM customer t FULL OUTER JOIN delta s ON t.c_custkey = s.c_custkey
""")
def s4_merge_into(spark, sf):
    """S4 generalized to the MERGE INTO statement: a deterministic
    delta (every 5th customer re-priced, every 100th re-keyed as new)
    merges into the customer table -- matched rows update acctbal,
    unmatched source rows insert, the rest pass through, every row
    tagged with its action.  One full-outer key join; the lakehouse
    upsert the reference's per-row Cypher MERGE becomes at scale."""
    from .sources import merge_into
    cust = read_table(spark, sf, "customer")
    delta = (cust.where(F.col("c_custkey") % 5 == 0)
             .withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
             .unionByName(
                 cust.where(F.col("c_custkey") % 100 == 0)
                 .select((F.col("c_custkey") + 2_000_000)
                         .alias("c_custkey"),
                         F.concat(F.lit("NEW#"), F.col("c_custkey"))
                         .alias("c_name"),
                         F.lit(0.0).alias("c_acctbal"),
                         "c_nationkey", "c_mktsegment")))
    return merge_into(cust, delta, "c_custkey", ["c_acctbal"])


@register("agg_equidepth_histogram", """
WITH b AS (
  SELECT l_extendedprice,
         NTILE(8) OVER (ORDER BY l_extendedprice, l_orderkey,
                        l_linenumber) AS bucket
  FROM lineitem
)
SELECT bucket, COUNT(*) AS n,
       MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
FROM b GROUP BY bucket
""")
def agg_equidepth_histogram(spark, sf):
    """Equi-depth (equal-count) histogram -- exact NTILE semantics
    WITHOUT NTILE's single-partition global window (the round-6
    ``WindowExec: No Partition Defined`` straggler).  The
    histogram-quantile pattern (same as llm_curriculum_order):

    - bin rows by ``floor(l_extendedprice)`` -- cardinality bounded
      by the PRICE DOMAIN (~105k integer bins for TPC-H), constant in
      N, so every offset structure below is domain-bounded no matter
      the scale factor;
    - count-of-rows-below per bin via a TWO-LEVEL prefix sum with no
      global window anywhere (zero ``WindowExec: No Partition
      Defined``): within a coarse group (bin DIV 1024, <= ~103
      groups) a PARTITIONED cumulative window; across groups a tiny
      non-equi self-join on the <= ~103-row group-total table
      (broadcast nested-loop, no window);
    - rank WITHIN a bin with a partitioned window (partition size =
      N / bins, shrinks as bins fill out -- parallel);
    - global rank = offset + in-bin rank, then the exact NTILE(8)
      bucket formula in integer arithmetic: the first N%8 buckets
      take ceil(N/8) rows, the rest floor(N/8).  N comes from the
      bin histogram (no second fact scan).

    Order key (price, orderkey, linenumber) is a total order, so
    ranks -- and the oracle's NTILE -- are deterministic."""
    li = (read_table(spark, sf, "lineitem")
          .select("l_extendedprice", "l_orderkey", "l_linenumber")
          .withColumn("_bin", F.floor("l_extendedprice")))
    from .operators.dedup import _hold
    # the bin histogram is domain-bounded (~105k rows) but feeds four
    # consumers (gt, g_below, offs, n); checkpoint it so the fact is
    # scanned once for the histogram, once for the ranked join -- not
    # once per consumer.
    h = _hold(li.groupBy("_bin").agg(F.count(F.lit(1)).alias("_cnt"))
              .withColumn("_grp", F.expr("_bin DIV 1024")))
    gt = h.groupBy("_grp").agg(F.sum("_cnt").alias("_gtot"))
    ga, gb = gt.alias("ga"), gt.alias("gb")
    g_below = (ga.join(F.broadcast(gb),
                       F.col("gb._grp") < F.col("ga._grp"), "left")
               .groupBy(F.col("ga._grp").alias("_grp"))
               .agg(F.coalesce(F.sum("gb._gtot"), F.lit(0))
                    .alias("_gbelow")))
    wgrp = (Window.partitionBy("_grp").orderBy("_bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offs = (h.join(F.broadcast(g_below), "_grp")
            .select("_bin",
                    (F.col("_gbelow") + F.sum("_cnt").over(wgrp)
                     - F.col("_cnt")).cast("long").alias("_below")))
    n = gt.agg(F.sum("_gtot").alias("_total"))
    wbin = (Window.partitionBy("_bin")
            .orderBy("l_extendedprice", "l_orderkey", "l_linenumber"))
    ranked = (li.join(F.broadcast(offs), "_bin")
              .withColumn("_r", F.col("_below")
                          + F.row_number().over(wbin))
              .crossJoin(F.broadcast(n)))
    # exact NTILE(8): q = N DIV 8 rows per tail bucket, the first
    # N % 8 buckets take q+1.  (The q = 0 divisor is unreachable:
    # when N < 8 every rank satisfies the first branch.)
    bucket = F.expr(
        "CAST(IF(_r <= (_total % 8) * ((_total DIV 8) + 1), "
        "        (_r - 1) DIV ((_total DIV 8) + 1) + 1, "
        "        (_total % 8) + (_r - (_total % 8) * ((_total DIV 8) "
        "          + 1) - 1) DIV (_total DIV 8) + 1) AS INT)")
    return (ranked.select("l_extendedprice", bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("l_extendedprice").alias("lo"),
                 F.max("l_extendedprice").alias("hi")))


@register("agg_share_of_parent", """
WITH cust_rev AS (
  SELECT c.c_nationkey, n.n_regionkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
           AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_nationkey, n.n_regionkey
)
SELECT c_nationkey, n_regionkey, rev,
       rev / CAST(SUM(CAST(rev AS DECIMAL(27,4)))
                  OVER (PARTITION BY n_regionkey) AS DOUBLE)
         AS share_of_region,
       rev / CAST(SUM(CAST(rev AS DECIMAL(27,4))) OVER () AS DOUBLE)
         AS share_of_total
FROM cust_rev
""")
def agg_share_of_parent(spark, sf):
    """Hierarchical share-of-parent: each nation's revenue as a share
    of its region and of the world -- the drill-down ratio every OLAP
    browser computes.  The windows run over the AGGREGATED
    (nation-sized) table, so the global-frame window is
    dimension-sized, never fact-sized; fact rows shuffle once into the
    base aggregate."""
    orders = read_table(spark, sf, "orders").select("o_custkey",
                                                    "o_totalprice")
    cust = read_table(spark, sf, "customer").select("c_custkey",
                                                    "c_nationkey")
    nation = read_table(spark, sf, "nation").select("n_nationkey",
                                                    "n_regionkey")
    rev = (orders.join(F.broadcast(cust),
                       orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(nation),
                 cust.c_nationkey == nation.n_nationkey)
           .groupBy("c_nationkey", "n_regionkey")
           .agg(dsum("o_totalprice").alias("rev")))
    w_region = Window.partitionBy("n_regionkey")
    w_all = Window.partitionBy()
    dec = F.col("rev").cast("decimal(27,4)")
    return rev.select(
        "c_nationkey", "n_regionkey", "rev",
        (F.col("rev") / F.sum(dec).over(w_region).cast("double"))
        .alias("share_of_region"),
        (F.col("rev") / F.sum(dec).over(w_all).cast("double"))
        .alias("share_of_total"))


@register("agg_trend_slope", """
WITH x AS (
  SELECT event_type, value,
         (epoch_us(CAST(ts AS TIMESTAMP))
           - epoch_us(TIMESTAMP '2024-01-01')) / 86400000000.0 AS xs
  FROM events
)
SELECT event_type,
       round(regr_slope(value, xs), 6) AS slope,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
         - round(regr_slope(value, xs), 6)
           * (CAST(SUM(CAST(xs AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*))
         AS intercept,
       round(regr_r2(value, xs), 6) AS r2,
       COUNT(*) AS n
FROM x
GROUP BY event_type
""")
def agg_trend_slope(spark, sf):
    """Per-key linear trend: slope/intercept/R^2 of value against
    event time via the regression aggregates (single-pass co-moment
    merges, like corr) -- the drift detector behind metric monitoring.
    Time is centered at 2024-01-01 and measured in DAYS so the
    regressor's magnitude stays small; the intercept derives from
    the ROUNDED slope and decimal-exact means (mean_y - slope *
    mean_x), so it is bit-identical by construction -- regr_intercept
    itself sits too close to rounding boundaries under co-moment
    merge drift.  Slope and R^2 round to 6 decimals (the
    agg_stats_corr contract)."""
    ev = read_table(spark, sf, "events")
    epoch0 = F.unix_micros(F.lit("2024-01-01").cast("timestamp"))
    x = ((F.unix_micros(F.col("ts").cast("timestamp"))
          - epoch0).cast("double") / 86400000000.0)
    slope6 = F.round(F.regr_slope("y", "x"), 6)
    mean_y = (F.sum(F.col("y").cast("decimal(27,6)")).cast("double")
              / F.count(F.lit(1)))
    mean_x = (F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
              / F.count(F.lit(1)))
    return (ev.select("event_type", F.col("value").alias("y"),
                      x.alias("x"))
            .groupBy("event_type")
            .agg(slope6.alias("slope"),
                 (mean_y - slope6 * mean_x).alias("intercept"),
                 F.round(F.regr_r2("y", "x"), 6).alias("r2"),
                 F.count(F.lit(1)).alias("n")))


# engine-portable HyperLogLog built from first principles: md5 hash,
# 64 buckets (top 6 of 52 hash bits), rho = leading-zero rank of the
# low 46 bits.  The bucket sum is kept as EXACT integers
# (sum of 2^(46 - M_j) with the 46-bit scale factored out), so the
# only floats are the final alpha * m^2 / S division and the
# small-range ln correction -- bit-identical on any engine, unlike
# opaque built-in sketches.
_HLL_ALPHA64 = 0.709


@register("agg_hll_custom", f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13))::BIGINT
           AS hv
  FROM orders
),
parts AS (
  SELECT hv // 70368744177664 AS bucket,       -- top 6 bits (/ 2^46)
         hv % 70368744177664 AS w              -- low 46 bits
  FROM h
),
rho AS (
  SELECT bucket,
         MAX(CASE WHEN w = 0 THEN 47
                  ELSE 46 - length(bin(w)) + 1 END) AS m_j
  FROM parts GROUP BY bucket
),
s AS (
  SELECT CAST(SUM(CAST(2 AS BIGINT) ** (46 - m_j)) AS BIGINT)
           + (64 - COUNT(*)) * 70368744177664 AS ssum,
         64 - COUNT(*) AS v_empty
  FROM rho
),
est AS (
  SELECT CASE
    WHEN ({_HLL_ALPHA64!r} * 64.0 * 64.0 * 70368744177664)
         / CAST(ssum AS DOUBLE) <= 160.0 AND v_empty > 0
    THEN 64.0 * ln(64.0 / CAST(v_empty AS DOUBLE))
    ELSE ({_HLL_ALPHA64!r} * 64.0 * 64.0 * 70368744177664)
         / CAST(ssum AS DOUBLE) END AS e,
         v_empty
  FROM s
)
SELECT ROUND(e.e, 6) AS hll_estimate,
       (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS exact_distinct,
       abs(e.e - (SELECT COUNT(DISTINCT o_custkey) FROM orders))
       / (SELECT COUNT(DISTINCT o_custkey) FROM orders) <= 0.15
         AS within_15pct,
       e.v_empty
FROM est e
""")
def agg_hll_custom(spark, sf):
    """HyperLogLog from first principles (m = 64, md5-hashed, integer
    bucket sums): the estimate is the SAME double on every engine
    because the harmonic-mean denominator is carried as an exact
    integer (sum of 2^(46-M_j)) and only the final division/ln touch
    floats -- a mergeable sketch whose cross-engine hash-match proves
    the internals, unlike opaque built-ins (the built-in HLL++ path is
    agg_approx_sketches).  Map-side: 64-bucket max-agg; driver: one
    row."""
    orders = read_table(spark, sf, "orders")
    hv = F.conv(F.substring(
        F.md5(F.col("o_custkey").cast("string")), 1, 13), 16, 10) \
        .cast("long")
    scale = 70368744177664  # 2^46
    parts = orders.select((hv / scale).cast("long").alias("bucket"),
                          F.pmod(hv, F.lit(scale)).alias("w"))
    rho = (parts.groupBy("bucket")
           .agg(F.max(F.when(F.col("w") == 0, F.lit(47))
                      .otherwise(F.lit(46)
                                 - F.length(F.bin("w")) + 1))
                .alias("m_j")))
    s = rho.agg(
        (F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), "
                       "CAST(46 - m_j AS INT))"))
         + (F.lit(64) - F.count(F.lit(1))) * F.lit(scale))
        .alias("ssum"),
        (F.lit(64) - F.count(F.lit(1))).alias("v_empty"))
    raw = (F.lit(_HLL_ALPHA64) * 64.0 * 64.0 * float(scale)) \
        / F.col("ssum").cast("double")
    e = (F.when((raw <= 160.0) & (F.col("v_empty") > 0),
                F.lit(64.0) * F.log(F.lit(64.0)
                                    / F.col("v_empty").cast("double")))
         .otherwise(raw))
    exact = orders.agg(F.countDistinct("o_custkey").alias("x"))
    return (s.crossJoin(F.broadcast(exact))
            .select(F.round(e, 6).alias("hll_estimate"),
                    F.col("x").alias("exact_distinct"),
                    (F.abs(e - F.col("x"))
                     / F.col("x").cast("double") <= 0.15)
                    .alias("within_15pct"),
                    "v_empty"))


_BLOOM_M, _BLOOM_K = 4096, 3


@register("agg_bloom_custom", f"""
WITH members AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 400000
),
bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(m.k AS VARCHAR) || ':' || s.i), 1, 12))
           ::BIGINT % {_BLOOM_M} AS pos
  FROM members m, unnest(['s0', 's1', 's2']) AS s(i)
),
probes AS (SELECT c_custkey AS k FROM customer),
probe_pos AS (
  SELECT p.k,
         ('0x' || substr(md5(CAST(p.k AS VARCHAR) || ':' || s.i), 1, 12))
           ::BIGINT % {_BLOOM_M} AS pos
  FROM probes p, unnest(['s0', 's1', 's2']) AS s(i)
),
probe_hits AS (
  SELECT pp.k, COUNT(b.pos) AS n_hit
  FROM probe_pos pp LEFT JOIN bits b ON b.pos = pp.pos
  GROUP BY pp.k
),
flagged AS (
  SELECT k FROM probe_hits WHERE n_hit = {_BLOOM_K}
)
SELECT {_BLOOM_M} AS m_bits, {_BLOOM_K} AS k_hashes,
       (SELECT COUNT(*) FROM bits) AS n_set_bits,
       (SELECT COUNT(*) FROM members) AS n_members,
       (SELECT COUNT(*) FROM flagged) AS n_flagged,
       (SELECT COUNT(*) FROM flagged f
        LEFT JOIN members m ON m.k = f.k WHERE m.k IS NULL)
         AS n_false_positives,
       (SELECT COUNT(*) FROM members m
        LEFT JOIN flagged f ON f.k = m.k WHERE f.k IS NULL)
         AS n_false_negatives
FROM (SELECT 1)
""")
def agg_bloom_custom(spark, sf):
    """Bloom filter from first principles (m = 4096 bits, k = 3 md5
    salts) built over the big-spender customer set and probed with
    EVERY customer: zero false negatives by construction (the oracle
    row proves it), measured false positives at the expected ~(1 -
    e^(-kn/m))^k rate.  This is the engine-portable runtime-filter
    primitive (semi-join pruning, dedup pre-checks) with the bitset
    as plain data -- mergeable by union, shippable cross-engine."""
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    salts = F.array(*[F.lit(f"s{i}") for i in range(_BLOOM_K)])

    def pos(key_col):
        return F.conv(F.substring(
            F.md5(F.concat(key_col.cast("string"), F.lit(":"),
                           F.col("salt"))), 1, 12), 16, 10) \
            .cast("long") % _BLOOM_M

    members = (orders.where(F.col("o_totalprice") > 400000)
               .select(F.col("o_custkey").alias("k")).distinct()
               .localCheckpoint())
    bits = (members.select("k", F.explode(salts).alias("salt"))
            .select(pos(F.col("k")).alias("pos")).distinct()
            .localCheckpoint())
    probes = customer.select(F.col("c_custkey").alias("k"))
    ph = (probes.select("k", F.explode(salts).alias("salt"))
          .withColumn("pos", pos(F.col("k")))
          .join(bits.withColumn("__b", F.lit(1)), "pos", "left")
          .groupBy("k")
          .agg(F.count(F.col("__b")).alias("n_hit")))
    flagged = ph.where(F.col("n_hit") == _BLOOM_K).select("k") \
        .localCheckpoint()
    n_bits = bits.count()
    n_members = members.count()
    n_flagged = flagged.count()
    n_fp = flagged.join(members, "k", "left_anti").count()
    n_fn = members.join(flagged, "k", "left_anti").count()
    return spark.createDataFrame(
        [(_BLOOM_M, _BLOOM_K, n_bits, n_members, n_flagged, n_fp, n_fn)],
        "m_bits int, k_hashes int, n_set_bits long, n_members long, "
        "n_flagged long, n_false_positives long, n_false_negatives long")


@register("agg_mode", """
WITH c AS (
  SELECT n.n_name AS nation, l.l_returnflag AS flag,
         COUNT(*) AS cnt
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer cu ON cu.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = cu.c_nationkey
  GROUP BY 1, 2
)
SELECT nation, flag AS mode_returnflag, cnt AS mode_count
FROM (SELECT nation, flag, cnt,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY cnt DESC, flag) AS r
      FROM c) WHERE r = 1
""")
def agg_mode(spark, sf):
    """Grouped MODE (most frequent value): the most common return flag
    per customer nation -- the categorical argmax SQL's MODE()
    expresses, as a count + deterministic-tie-break window (the same
    two-step any engine-side mode compiles to; counts are map-side
    combinable so nothing category-squared shuffles)."""
    li = read_table(spark, sf, "lineitem").select("l_orderkey",
                                                  "l_returnflag")
    orders = read_table(spark, sf, "orders").select("o_orderkey",
                                                    "o_custkey")
    customer = read_table(spark, sf, "customer").select("c_custkey",
                                                        "c_nationkey")
    nation = read_table(spark, sf, "nation")
    c = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(customer),
               F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(nation),
               F.col("c_nationkey") == nation.n_nationkey)
         .groupBy(F.col("n_name").alias("nation"),
                  F.col("l_returnflag").alias("flag"))
         .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("nation").orderBy(F.desc("cnt"),
                                             F.asc("flag"))
    return (c.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") == 1)
            .select("nation", F.col("flag").alias("mode_returnflag"),
                    F.col("cnt").alias("mode_count")))


@register("agg_percentile_disc", """
WITH r AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus,
       MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                THEN o_totalprice END) AS median_disc,
       MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                THEN o_totalprice END) AS p90_disc
FROM r GROUP BY o_orderstatus
""")
def agg_percentile_disc(spark, sf):
    """DISCRETE percentiles (actual dataset values, no interpolation):
    the value at rank ceil(p*n) under a total order -- what SQL's
    PERCENTILE_DISC returns and what you want when the percentile must
    be a real observed value (price points, latencies).  Sibling of
    the interpolated agg_median_quartiles."""
    from pyspark.sql import Window as W
    orders = read_table(spark, sf, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice",
                                               "o_orderkey")
    wn = W.partitionBy("o_orderstatus")
    r = (orders.select("o_orderstatus", "o_totalprice", "o_orderkey")
         .withColumn("rn", F.row_number().over(w))
         .withColumn("n", F.count(F.lit(1)).over(wn)))
    return (r.groupBy("o_orderstatus")
            .agg(F.max(F.when(F.col("rn")
                              == F.ceil(0.5 * F.col("n")).cast("long"),
                              F.col("o_totalprice")))
                 .alias("median_disc"),
                 F.max(F.when(F.col("rn")
                              == F.ceil(0.9 * F.col("n")).cast("long"),
                              F.col("o_totalprice")))
                 .alias("p90_disc")))


@register("rel_fifo_match", """
WITH sup AS (
  SELECT l_partkey AS part, l_orderkey, l_linenumber,
         CAST(l_quantity AS DECIMAL(27,4)) AS qty,
         SUM(CAST(l_quantity AS DECIMAL(27,4))) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING) AS cum_end
  FROM lineitem WHERE l_returnflag = 'N' AND l_partkey < 50
),
dem AS (
  SELECT l_partkey AS part, l_orderkey, l_linenumber,
         CAST(l_quantity AS DECIMAL(27,4)) AS qty,
         SUM(CAST(l_quantity AS DECIMAL(27,4))) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING) AS cum_end
  FROM lineitem WHERE l_returnflag = 'R' AND l_partkey < 50
)
SELECT s.part,
       s.l_orderkey AS supply_order, s.l_linenumber AS supply_line,
       d.l_orderkey AS demand_order, d.l_linenumber AS demand_line,
       CAST(LEAST(s.cum_end, d.cum_end)
            - GREATEST(s.cum_end - s.qty, d.cum_end - d.qty)
            AS DOUBLE) AS matched_qty
FROM sup s JOIN dem d
  ON d.part = s.part
 AND s.cum_end - s.qty < d.cum_end
 AND d.cum_end - d.qty < s.cum_end
""")
def rel_fifo_match(spark, sf):
    """FIFO lot matching: returned units (flag R) consume shipped lots
    (flag N) of the same part in ship-date order -- the classic
    inventory/accounting allocation, solved set-wise by laying both
    sides on a cumulative-quantity axis and joining on INTERVAL
    OVERLAP (each match = the overlap length; no loops, no mutable
    ledger).  Decimal-exact running sums; the join is part-keyed and
    band-limited, never lot x lot."""
    from pyspark.sql import Window as W
    li = read_table(spark, sf, "lineitem")
    base = li.where(F.col("l_partkey") < 50)
    w = (W.partitionBy("l_partkey")
         .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
         .rowsBetween(W.unboundedPreceding, 0))
    qty = F.col("l_quantity").cast("decimal(27,4)")

    def side(flag, prefix):
        return (base.where(F.col("l_returnflag") == flag)
                .select(F.col("l_partkey").alias("part"),
                        F.col("l_orderkey").alias(f"{prefix}_order"),
                        F.col("l_linenumber").alias(f"{prefix}_line"),
                        qty.alias(f"{prefix}_qty"),
                        F.sum(qty).over(w).alias(f"{prefix}_end")))

    s, d = side("N", "supply"), side("R", "demand")
    return (s.join(d, "part")
            .where((F.col("supply_end") - F.col("supply_qty")
                    < F.col("demand_end"))
                   & (F.col("demand_end") - F.col("demand_qty")
                      < F.col("supply_end")))
            .select("part", "supply_order", "supply_line",
                    "demand_order", "demand_line",
                    (F.least("supply_end", "demand_end")
                     - F.greatest(F.col("supply_end")
                                  - F.col("supply_qty"),
                                  F.col("demand_end")
                                  - F.col("demand_qty")))
                    .cast("double").alias("matched_qty")))


@register("rel_date_spine", """
WITH bounds AS (
  SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders
),
spine AS (
  SELECT unnest(generate_series(CAST(lo AS DATE), CAST(hi AS DATE),
                                INTERVAL 1 DAY))::DATE AS d
  FROM bounds
),
daily AS (
  SELECT o_orderdate AS d, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1
)
SELECT CAST(s.d AS VARCHAR) AS day,
       CAST(EXTRACT(dow FROM s.d) AS INTEGER) AS day_of_week,
       EXTRACT(dow FROM s.d) IN (0, 6) AS is_weekend,
       COALESCE(dl.n_orders, 0) AS n_orders,
       ROUND(COALESCE(dl.revenue, 0.0), 4) AS revenue,
       dl.d IS NULL AS is_gap
FROM spine s LEFT JOIN daily dl ON dl.d = s.d
""")
def rel_date_spine(spark, sf):
    """Calendar date spine: a COMPLETE day dimension generated over
    the fact range (sequence + explode, never a physical calendar
    table to forget to extend), left-joined to daily revenue so gap
    days exist as zero rows -- the warehouse utility under every
    correct day-over-day comparison.  Spine is range-sized; facts
    aggregate once."""
    from .operators.relational import dsum
    orders = read_table(spark, sf, "orders")
    bounds = orders.agg(F.min("o_orderdate").alias("lo"),
                        F.max("o_orderdate").alias("hi"))
    spine = (bounds.select(F.explode(F.sequence(
        F.col("lo").cast("date"), F.col("hi").cast("date"),
        F.expr("INTERVAL 1 DAY"))).alias("d")))
    daily = (orders.groupBy(F.col("o_orderdate").alias("d"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  dsum(F.col("o_totalprice")).alias("revenue")))
    dow = F.dayofweek(F.col("d")) - 1  # Spark: Sun=1 -> DuckDB dow Sun=0
    return (spine.join(daily.withColumnRenamed("d", "dd"),
                       spine.d == F.col("dd"), "left")
            .select(F.col("d").cast("string").alias("day"),
                    dow.cast("int").alias("day_of_week"),
                    dow.isin(0, 6).alias("is_weekend"),
                    F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
                    F.round(F.coalesce("revenue", F.lit(0.0)), 4)
                    .alias("revenue"),
                    F.col("dd").isNull().alias("is_gap")))


@register("rel_abc_analysis", """
WITH rev AS (
  SELECT p.p_brand AS item,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(27,4))) AS DOUBLE) AS revenue
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
),
ranked AS (
  SELECT item, revenue,
         SUM(revenue) OVER (ORDER BY revenue DESC, item
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
         SUM(revenue) OVER () AS tot
  FROM rev
)
SELECT item, ROUND(revenue, 4) AS revenue,
       ROUND(cum_rev / tot, 8) AS cum_share,
       CASE WHEN cum_rev / tot <= 0.8 THEN 'A'
            WHEN cum_rev / tot <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
""")
def rel_abc_analysis(spark, sf):
    """ABC (Pareto) classification of brands by revenue: the running
    cumulative-share cut at 80%/95% -- the inventory-prioritization
    classic (A items get the attention; C items get automation).
    Decimal-exact revenue sums; the ranking window runs over the
    brand-sized aggregate, never fact rows."""
    from pyspark.sql import Window as W
    from .operators.relational import dsum
    li = read_table(spark, sf, "lineitem")
    part = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    rev = (li.join(F.broadcast(part),
                   li.l_partkey == part.p_partkey)
           .groupBy(F.col("p_brand").alias("item"))
           .agg(dsum(F.col("l_extendedprice")
                     * (1 - F.col("l_discount"))).alias("revenue")))
    w = (W.orderBy(F.desc("revenue"), F.asc("item"))
         .rowsBetween(W.unboundedPreceding, 0))
    wt = W.partitionBy()
    ranked = (rev.withColumn("cum_rev", F.sum("revenue").over(w))
              .withColumn("tot", F.sum("revenue").over(wt)))
    share = F.col("cum_rev") / F.col("tot")
    return ranked.select(
        "item", F.round("revenue", 4).alias("revenue"),
        F.round(share, 8).alias("cum_share"),
        F.when(share <= 0.8, "A").when(share <= 0.95, "B")
        .otherwise("C").alias("abc_class"))
