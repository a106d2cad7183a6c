"""Event-analytics and data-quality queries (EXT).

The reference validates its data by hand (README.md:30-33 documents
known quality issues; constraint checks at
preprocess_upload_neo4j.py:45-54).  A 100-TB engine needs that
validation as first-class, run-on-every-load operators: column
profiling, referential-integrity checks, and the standard
event-analytics shapes (funnel, cohort retention) a training-data
pipeline uses to understand its corpus before mixing it.

Determinism: counts and integer ratios only -- no floats except
single final divisions of exact integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .sources import read_table


@register("dq_profile", """
WITH s AS (
  SELECT
    COUNT(*) AS n_rows,
    COUNT(l_quantity) AS nn_quantity,
    COUNT(DISTINCT l_quantity) AS nd_quantity,
    COUNT(l_returnflag) AS nn_returnflag,
    COUNT(DISTINCT l_returnflag) AS nd_returnflag,
    COUNT(l_shipdate) AS nn_shipdate,
    COUNT(DISTINCT l_shipdate) AS nd_shipdate
  FROM lineitem
)
SELECT col, n_rows, n_nonnull, n_distinct,
       CAST(n_rows - n_nonnull AS DOUBLE) / n_rows AS null_frac
FROM (
  SELECT 'l_quantity' AS col, n_rows, nn_quantity AS n_nonnull,
         nd_quantity AS n_distinct FROM s
  UNION ALL
  SELECT 'l_returnflag', n_rows, nn_returnflag, nd_returnflag FROM s
  UNION ALL
  SELECT 'l_shipdate', n_rows, nn_shipdate, nd_shipdate FROM s
)
""")
def dq_profile(spark, sf):
    """Column profiling (the ANALYZE TABLE analog): null counts and
    distinct cardinalities for a column set in ONE scan -- every
    measure is an aggregate over the same pass, then unpivoted to a
    long stats table.  At 100 TB this is the load-time health check
    that runs before any query does; one scan, aggregate-sized
    output."""
    li = read_table(spark, sf, "lineitem")
    cols = ["l_quantity", "l_returnflag", "l_shipdate"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    s = li.agg(*aggs)
    rows = None
    for c in cols:
        row = s.select(F.lit(c).alias("col"), "n_rows",
                       F.col(f"nn_{c}").alias("n_nonnull"),
                       F.col(f"nd_{c}").alias("n_distinct"))
        rows = row if rows is None else rows.unionByName(row)
    return rows.withColumn(
        "null_frac",
        (F.col("n_rows") - F.col("n_nonnull")).cast("double")
        / F.col("n_rows").cast("double"))


@register("dq_referential", """
SELECT 'lineitem.l_orderkey -> orders' AS fk,
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
       (SELECT COUNT(*) FROM lineitem) AS n_rows
UNION ALL
SELECT 'orders.o_custkey -> customer',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'customer.c_nationkey -> nation',
       (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey)),
       (SELECT COUNT(*) FROM customer)
""")
def dq_referential(spark, sf):
    """Referential-integrity validation (S6 generalized): orphan-row
    counts for each foreign key via left-anti joins -- the bulk
    equivalent of the reference's per-row MERGE endpoint checks
    (preprocess_upload_neo4j.py:291-293 silently drops edges whose
    endpoints are missing; here the engine COUNTS what would drop).
    Anti joins carry only the key columns; dims broadcast."""
    li = read_table(spark, sf, "lineitem").select("l_orderkey")
    orders = read_table(spark, sf, "orders") \
        .select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf, "customer") \
        .select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf, "nation").select("n_nationkey")

    def check(name, child, parent, ckey, pkey):
        orphans = child.join(
            parent, child[ckey] == parent[pkey], "left_anti")
        return (orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
                .crossJoin(child.agg(F.count(F.lit(1)).alias("n_rows")))
                .select(F.lit(name).alias("fk"), "n_orphans", "n_rows"))

    return (check("lineitem.l_orderkey -> orders", li,
                  orders.select("o_orderkey"), "l_orderkey", "o_orderkey")
            .unionByName(check("orders.o_custkey -> customer",
                               orders.select("o_custkey"),
                               cust.select("c_custkey"),
                               "o_custkey", "c_custkey"))
            .unionByName(check("customer.c_nationkey -> nation",
                               cust.select("c_nationkey"), nation,
                               "c_nationkey", "n_nationkey")))


@register("funnel_conversion", """
WITH v AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND CAST(e.ts AS TIMESTAMP) > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_view_click_purchase,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
         / (SELECT COUNT(*) FROM v) AS conversion
""")
def funnel_conversion(spark, sf):
    """Ordered funnel (view -> click -> purchase): each stage keeps
    users whose stage event strictly follows their previous stage's
    FIRST event.  Three user-keyed min-aggregates chained by joins --
    every shuffle is user-sized, the event stream is read once per
    stage with the stage filter pushed to the scan."""
    ev = read_table(spark, sf, "events").select("user_id", "ts",
                                                "event_type")

    def stage(etype, prev=None, prev_t=None):
        e = ev.where(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").where(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(f"t_{etype}"))

    v = stage("view")
    c = stage("click", v, "t_view")
    p = stage("purchase", c, "t_click")
    counts = (v.agg(F.count(F.lit(1)).alias("n_view"))
              .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
              .crossJoin(p.agg(F.count(F.lit(1))
                               .alias("n_view_click_purchase"))))
    return counts.withColumn(
        "conversion",
        F.col("n_view_click_purchase").cast("double")
        / F.col("n_view").cast("double"))


@register("cohort_retention", """
WITH first_day AS (
  SELECT user_id,
         MIN(date_trunc('day', CAST(ts AS TIMESTAMP))) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         date_diff('day', f.cohort_day,
                   date_trunc('day', CAST(e.ts AS TIMESTAMP)))
           AS day_offset
  FROM events e JOIN first_day f ON e.user_id = f.user_id
)
SELECT cohort_day, day_offset, COUNT(*) AS n_users
FROM activity
WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
""")
def cohort_retention(spark, sf):
    """Cohort retention: users grouped by first-activity day, counted
    per (cohort, day-offset) for the first week.  One user-keyed MIN
    (the cohort assignment, broadcast-or-shuffle joined back) + one
    distinct + one count -- shuffles are user-sized and
    cohort-grid-sized, never event-sized after the distinct."""
    ev = read_table(spark, sf, "events").select("user_id", "ts")
    day = F.date_trunc("day", F.col("ts"))
    first_day = (ev.groupBy("user_id")
                 .agg(F.min(day).alias("cohort_day")))
    activity = (ev.join(first_day, "user_id")
                .select("user_id", "cohort_day",
                        F.datediff(day, F.col("cohort_day"))
                        .alias("day_offset"))
                .distinct())
    return (activity.where(F.col("day_offset") <= 7)
            .groupBy("cohort_day", "day_offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


@register("copurchase_pairs", """
WITH brands AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
       COUNT(*) AS n_orders
FROM brands a JOIN brands b
  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY a.p_brand, b.p_brand
HAVING COUNT(*) >= 50
""")
def copurchase_pairs(spark, sf):
    """Market-basket co-occurrence: brand pairs appearing in the same
    order, counted across orders.  The self-join runs on per-order
    DISTINCT brand sets (bounded by order width, never line-item
    width) with the a < b triangle filter inside the join condition,
    so the pair space per order is C(brands_in_order, 2) -- the
    frequent-itemset k=2 pass every recommender pipeline starts
    from."""
    li = read_table(spark, sf, "lineitem").select("l_orderkey",
                                                  "l_partkey")
    part = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    brands = (li.join(F.broadcast(part),
                      li.l_partkey == part.p_partkey)
              .select("l_orderkey", "p_brand").distinct())
    a = brands.select("l_orderkey", F.col("p_brand").alias("brand_a"))
    b = brands.select("l_orderkey", F.col("p_brand").alias("brand_b"))
    return (a.join(b, (a.l_orderkey == b.l_orderkey)
                   & (F.col("brand_a") < F.col("brand_b")))
            .groupBy("brand_a", "brand_b")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .where(F.col("n_orders") >= 50))


@register("agg_histogram", """
SELECT CAST(floor(value / 5.0) AS INTEGER) AS bucket,
       CAST(floor(value / 5.0) * 5 AS DOUBLE) AS bucket_lo,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""")
def agg_histogram(spark, sf):
    """Equal-width histogram of event values (width 5): bucket index
    from exact floor division -- the profiling companion to the
    percentile sketches; one map-side-combined aggregate, output sized
    by bucket count."""
    ev = read_table(spark, sf, "events")
    bucket = F.floor(F.col("value") / 5.0)
    from .operators.relational import dsum
    return (ev.groupBy(bucket.cast("int").alias("bucket"),
                       (bucket * 5).cast("double").alias("bucket_lo"))
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("value").alias("total_value")))


@register("anomaly_zscore", """
WITH stats AS (
  SELECT event_type,
         round(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE)
               / COUNT(value), 6) AS mean_v,
         round(stddev_samp(value), 6) AS sd_v
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN abs(round((e.value - s.mean_v) / s.sd_v, 6))
                     > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE s.sd_v > 0
GROUP BY e.event_type
""")
def anomaly_zscore(spark, sf):
    """Z-score outlier counts per event type: per-group mean (decimal
    exact) and stddev rounded to 6 decimals BEFORE the z computation,
    so both engines score from identical inputs and the |z| > 3 flag
    cannot flip on reduction-order noise.  Two passes over events
    (stats, then flag) -- the broadcast-dim shape of every streaming
    anomaly monitor."""
    ev = read_table(spark, sf, "events").select("event_type", "value")
    from .operators.relational import davg
    stats = (ev.groupBy("event_type")
             .agg(F.round(davg("value"), 6).alias("mean_v"),
                  F.round(F.stddev_samp("value"), 6).alias("sd_v"))
             .where(F.col("sd_v") > 0))
    z = F.round((F.col("value") - F.col("mean_v")) / F.col("sd_v"), 6)
    return (ev.join(F.broadcast(stats), "event_type")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(F.abs(z) > 3, 1).otherwise(0))
                 .alias("n_outliers")))


@register("er_golden_record", """
WITH RECURSIVE dirty AS (
  SELECT c_custkey AS rid, c_name AS name, c_acctbal AS acctbal
  FROM customer
  UNION ALL
  SELECT c_custkey + 10000000 AS rid, c_name || '~' AS name, 0.0
  FROM customer WHERE c_custkey % 10 = 0
),
blocked AS (SELECT rid, name, acctbal, substr(name, 10, 8) AS blk
            FROM dirty),
capped AS (
  -- mirrors the engine's max_block_size=10000 hot-block cap so the
  -- two sides agree BY CONSTRUCTION at any scale (every verified rung
  -- has blocks <= ~1100, where capped == uncapped)
  SELECT rid, name, blk FROM blocked
  QUALIFY COUNT(*) OVER (PARTITION BY blk) <= 10000
),
pairs AS (
  SELECT a.rid AS id_a, b.rid AS id_b
  FROM capped a JOIN capped b
    ON a.blk = b.blk AND a.rid < b.rid
  WHERE levenshtein(a.name, b.name) <= 1
    AND length(a.name) <> length(b.name)
),
bi AS (SELECT id_a AS a, id_b AS b FROM pairs
       UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
reach(a, b) AS (
  SELECT DISTINCT a, a FROM bi
  UNION
  SELECT r.a, bi.b FROM reach r JOIN bi ON r.b = bi.a
),
comp AS (SELECT a AS rid, MIN(b) AS cluster_id FROM reach GROUP BY a),
resolved AS (
  SELECT d.rid, d.name, d.acctbal,
         COALESCE(c.cluster_id, d.rid) AS cluster_id
  FROM dirty d LEFT JOIN comp c ON c.rid = d.rid
)
SELECT r.cluster_id,
       COUNT(*) AS n_members,
       MIN(CASE WHEN r.rid = r.cluster_id THEN r.name END)
         AS canonical_name,
       CAST(SUM(CAST(r.acctbal AS DECIMAL(27,4))) AS DOUBLE)
         AS total_acctbal
FROM resolved r
GROUP BY r.cluster_id
""")
def er_golden_record(spark, sf):
    """Entity resolution end to end: plant deterministic dirty
    variants (every 10th customer re-enters with a '~'-suffixed name),
    BLOCK on a name substring so the pair space is per-block bounded
    (never corpus x corpus, and hot blocks above ``max_block_size``
    are excluded from enumeration -- the repo-wide quadratic guard),
    match with edit-distance <= 1 plus a
    length-differs guard (so equally-long sibling customers never
    merge), resolve transitive clusters on the pair graph only
    (reusing the fuzzy-dedup component machinery), and emit one GOLDEN
    RECORD per cluster -- canonical (min-id) name with decimal-exact
    merged balances.  The master-data shape every warehouse dedup
    ships: blocking -> match -> cluster -> survivorship."""
    from .operators.dedup import dedup_clusters
    from .operators.relational import dsum
    cust = read_table(spark, sf, "customer")
    base = cust.select(F.col("c_custkey").alias("rid"),
                       F.col("c_name").alias("name"),
                       F.col("c_acctbal").alias("acctbal"))
    planted = (cust.where(F.col("c_custkey") % 10 == 0)
               .select((F.col("c_custkey") + 10_000_000).alias("rid"),
                       F.concat(F.col("c_name"), F.lit("~")).alias("name"),
                       F.lit(0.0).alias("acctbal")))
    dirty = base.unionByName(planted)
    blocked = dirty.withColumn("blk", F.substring("name", 10, 8))
    # In-block candidate pairs via ONE groupBy (the
    # lsh_candidate_pairs shape, operators/dedup.py): members collect
    # sorted by rid so enumeration emits each unordered pair once with
    # id_a < id_b, the cheap length-differs guard prunes INSIDE the
    # lambda (before any row exists), and only survivors pay the
    # levenshtein.  ``max_block_size`` is the hot-block cap every
    # other pair-generating op in the repo already carries: a block of
    # m members costs m^2/2 pair structs in one task, so blocks above
    # the cap are EXCLUDED from enumeration (a hot name-block at
    # customer-base scale is boilerplate -- route it to exact dedup
    # first, the documented LSH-cap contract).  The registered oracle
    # and the staged sf10 oracle MIRROR the cap (QUALIFY COUNT(*) OVER
    # (PARTITION BY blk) <= 10000), so engine and oracle agree by
    # construction at any scale; every verified rung
    # (sf0.01/sf0.1/sf1/sf10: block sizes <= ~1100) sits far under the
    # cap, so capped and uncapped results are identical there anyway.
    max_block_size = 10_000
    blocks = (blocked.groupBy("blk")
              .agg(F.array_sort(F.collect_list(
                   F.struct(F.col("rid"), F.col("name")))).alias("ms"))
              .where((F.size("ms") > 1)
                     & (F.size("ms") <= max_block_size)))
    cand = blocks.select(F.explode(F.expr(
        "flatten(transform(ms, (x, i) -> "
        "filter(transform(slice(ms, i + 2, size(ms)), y -> "
        "struct(x.rid AS id_a, y.rid AS id_b, "
        "x.name AS na, y.name AS nb)), "
        "p -> length(p.na) <> length(p.nb))))")).alias("p"))
    pairs = (cand.where(F.levenshtein(F.col("p.na"), F.col("p.nb")) <= 1)
             .select(F.col("p.id_a").alias("id_a"),
                     F.col("p.id_b").alias("id_b")))
    clusters = dedup_clusters(dirty.select(F.col("rid").alias("doc_id")),
                              pairs, id_col="doc_id")
    resolved = (dirty.join(clusters.select(F.col("doc_id").alias("rid"),
                                           "cluster_id"), "rid"))
    return (resolved.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.min(F.when(F.col("rid") == F.col("cluster_id"),
                              F.col("name"))).alias("canonical_name"),
                 dsum("acctbal").alias("total_acctbal")))


@register("dq_skew", """
WITH per_key AS (
  SELECT o_custkey AS key, COUNT(*) AS n
  FROM orders GROUP BY o_custkey
),
stats AS (
  SELECT COUNT(*) AS n_keys, SUM(n) AS n_rows, MAX(n) AS max_n
  FROM per_key
)
SELECT p.key, p.n,
       CAST(p.n AS DOUBLE) / s.n_rows AS share,
       CAST(p.n AS DOUBLE) * s.n_keys / s.n_rows AS skew_ratio
FROM per_key p, stats s
ORDER BY p.n DESC, p.key
LIMIT 10
""")
def dq_skew(spark, sf):
    """Join/groupBy skew audit: the top-10 heaviest keys with their
    share of rows and skew ratio (key size over the uniform
    expectation) -- the pre-flight check that decides whether a join
    needs salting or AQE skew split before it runs at 100 TB.  One
    map-side-combined count + a 1-row stats broadcast + a bounded
    top-k."""
    orders = read_table(spark, sf, "orders").select("o_custkey")
    per_key = (orders.groupBy(F.col("o_custkey").alias("key"))
               .agg(F.count(F.lit(1)).alias("n")))
    stats = per_key.agg(F.count(F.lit(1)).alias("n_keys"),
                        F.sum("n").alias("n_rows"))
    return (per_key.crossJoin(F.broadcast(stats))
            .select("key", "n",
                    (F.col("n").cast("double")
                     / F.col("n_rows").cast("double")).alias("share"),
                    (F.col("n").cast("double") * F.col("n_keys")
                     / F.col("n_rows").cast("double")).alias("skew_ratio"))
            .orderBy(F.desc("n"), F.asc("key"))
            .limit(10))


@register("attribution_last_touch", """
WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.event_id AS purchase_id,
         c.event_id AS click_id,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
               AND c.ts <= p.ts
               AND c.ts >= p.ts - INTERVAL 1 HOUR
)
SELECT p.event_id AS purchase_id, p.user_id,
       p.ts AS purchase_ts,
       j.click_id AS attributed_click_id,
       j.click_id IS NOT NULL AS attributed
FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
  ON p.event_id = j.purchase_id
""")
def attribution_last_touch(spark, sf):
    """Last-touch attribution: each purchase credits the user's most
    recent click within a 1-hour lookback.  Composes the scalable
    as-of join (union trick -- ONE key shuffle, no per-row range
    probe) with a lookback filter; purchases with no in-window click
    stay unattributed.  The oracle takes the O(pairs) range-join path
    -- same answer, the plan the as-of join exists to avoid."""
    from .operators.relational import asof_join
    ev = read_table(spark, sf, "events")
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", "ts",
                      F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id")))
    j = asof_join(purchases, clicks, "user_id", "ts",
                  ["click_ts", "click_id"])
    attributed = (F.col("asof_click_ts").isNotNull()
                  & (F.col("asof_click_ts")
                     >= F.col("ts") - F.expr("INTERVAL 1 HOUR")))
    return j.select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(attributed, F.col("asof_click_id"))
        .alias("attributed_click_id"),
        attributed.alias("attributed"))


@register("markov_transitions", """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
cnt AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT from_type, SUM(n) AS n_from FROM cnt GROUP BY 1)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       ROUND(CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE), 8) AS prob
FROM cnt c JOIN tot t ON t.from_type = c.from_type
""")
def markov_transitions(spark, sf):
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) -- the behavioral model
    behind next-action prediction and anomalous-flow detection.  One
    key-partitioned window for the successor, |types|^2 count rows,
    probabilities from exact integer counts (engine-identical).  At
    100 TB the window is the only event-sized op and it shuffles once
    on user_id."""
    ev = read_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type",
                    F.lead("event_type").over(w).alias("next_type"))
    cnt = (seq.where(F.col("next_type").isNotNull())
           .groupBy(F.col("event_type").alias("from_type"),
                    F.col("next_type").alias("to_type"))
           .agg(F.count(F.lit(1)).alias("n")))
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (cnt.join(F.broadcast(tot), "from_type")
            .select("from_type", "to_type", "n",
                    F.round(F.col("n").cast("double")
                            / F.col("n_from").cast("double"), 8)
                    .alias("prob")))


@register("ab_test_welch", """
WITH assigned AS (
  SELECT event_type, value, user_id % 2 AS variant FROM events
),
moments AS (
  SELECT event_type, variant, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(27,4))
                  * CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS s2
  FROM assigned GROUP BY 1, 2
),
stats AS (
  SELECT event_type, variant, n,
         s1 / n AS mean,
         (s2 - (s1 * s1) / n) / (n - 1) AS var
  FROM moments
)
SELECT a.event_type,
       a.n AS n_control, b.n AS n_treatment,
       ROUND(a.mean, 8) AS mean_control,
       ROUND(b.mean, 8) AS mean_treatment,
       ROUND((b.mean - a.mean)
             / sqrt(a.var / a.n + b.var / b.n), 8) AS welch_t
FROM stats a JOIN stats b ON a.event_type = b.event_type
WHERE a.variant = 0 AND b.variant = 1
""")
def ab_test_welch(spark, sf):
    """Experiment readout: deterministic 50/50 variant assignment
    (user_id parity -- the keyed-hash assignment discipline of the
    sampling module), per-metric means, and Welch's t-statistic for
    the treatment effect.  Sums and sums-of-squares go through exact
    decimals, so the derived means/variances/t are engine-identical;
    one map-side-combined aggregate per (metric, variant), nothing
    event-sized shuffles."""
    ev = read_table(spark, sf, "events")
    dec = F.col("value").cast("decimal(27,4)")
    moments = (ev.select("event_type", "value",
                         F.pmod(F.col("user_id"), F.lit(2)).alias("variant"))
               .groupBy("event_type", "variant")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(dec).cast("double").alias("s1"),
                    F.sum(dec * dec).cast("double").alias("s2")))
    stats = moments.select(
        "event_type", "variant", "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        ((F.col("s2") - (F.col("s1") * F.col("s1")) / F.col("n"))
         / (F.col("n") - 1)).alias("var"))
    a = stats.where("variant = 0").select(
        "event_type", F.col("n").alias("n_control"),
        F.col("mean").alias("__m0"), F.col("var").alias("__v0"))
    b = stats.where("variant = 1").select(
        "event_type", F.col("n").alias("n_treatment"),
        F.col("mean").alias("__m1"), F.col("var").alias("__v1"))
    return (a.join(b, "event_type")
            .select("event_type", "n_control", "n_treatment",
                    F.round("__m0", 8).alias("mean_control"),
                    F.round("__m1", 8).alias("mean_treatment"),
                    F.round((F.col("__m1") - F.col("__m0"))
                            / F.sqrt(F.col("__v0") / F.col("n_control")
                                     + F.col("__v1") / F.col("n_treatment")),
                            8).alias("welch_t")))


from .operators.sampling import POISSON1_THRESHOLDS  # noqa: E402

_BOOT_B = 40


def _boot_sql() -> str:
    u = ("(('0x' || substr(md5('boot' || CAST(event_id AS VARCHAR) "
         "|| ':' || CAST(b AS VARCHAR)), 1, 8))::BIGINT)")
    whens = " ".join(f"WHEN {u} < {t} THEN {k}"
                     for k, t in enumerate(POISSON1_THRESHOLDS))
    return f"""
WITH rep AS (
  SELECT event_id, value, unnest(range(0, {_BOOT_B})) AS b FROM events
),
weighted AS (
  SELECT b, value, CASE {whens} ELSE 9 END AS w FROM rep
),
means AS (
  SELECT b, CAST(SUM(CAST(value * w AS DECIMAL(18,6))) AS DOUBLE)
            / CAST(SUM(w) AS DOUBLE) AS m
  FROM weighted GROUP BY b
),
sorted AS (SELECT list(ROUND(m, 8) ORDER BY ROUND(m, 8)) AS ms FROM means),
overall AS (
  SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         / COUNT(value) AS mean
  FROM events
)
SELECT ROUND(o.mean, 8) AS mean, s.ms[2] AS ci_lo,
       s.ms[{_BOOT_B - 1}] AS ci_hi, {_BOOT_B} AS n_replicas
FROM sorted s, overall o
"""


@register("boot_mean_ci", _boot_sql())
def boot_mean_ci(spark, sf):
    """Poisson-bootstrap 95% CI for the mean event value: every row
    enters each of ``_BOOT_B`` replicas with hash-decided Poisson(1)
    multiplicity -- the coordination-free, replayable bootstrap that
    scales to 100 TB (one pass, no resampling shuffle).  See
    operators.sampling.poisson_bootstrap_mean_ci."""
    from .operators.sampling import poisson_bootstrap_mean_ci
    ev = read_table(spark, sf, "events")
    return poisson_bootstrap_mean_ci(ev, "value", "event_id",
                                     n_replicas=_BOOT_B)


@register("dq_benford", """
WITH d AS (
  SELECT SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                1, 1) AS digit
  FROM orders WHERE o_totalprice >= 1
),
obs AS (
  SELECT digit, COUNT(*) AS n FROM d GROUP BY 1
),
tot AS (SELECT SUM(n) AS t FROM obs)
SELECT CAST(o.digit AS INT) AS digit, o.n,
       ROUND(CAST(o.n AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE), 8)
         AS observed_share,
       ROUND(ln(1.0 + 1.0 / CAST(o.digit AS DOUBLE)) / ln(10.0), 8)
         AS benford_share
FROM obs o
""")
def dq_benford(spark, sf):
    """Benford's-law first-digit audit on order totals: the classic
    fabricated-data / unit-mixing detector for financial columns.
    The first significant digit comes from INTEGER string math
    (floor -> bigint -> first char) -- never from formatting a double,
    whose text form is engine-specific.  One scan + a 9-row aggregate;
    the expected share ln(1 + 1/d)/ln(10) is exact-input IEEE math on
    both engines."""
    orders = read_table(spark, sf, "orders")
    d = (orders.where(F.col("o_totalprice") >= 1)
         .select(F.substring(F.floor("o_totalprice").cast("bigint")
                             .cast("string"), 1, 1).alias("digit")))
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    return (obs.crossJoin(F.broadcast(tot))
            .select(F.col("digit").cast("int").alias("digit"), "n",
                    F.round(F.col("n").cast("double")
                            / F.col("t").cast("double"), 8)
                    .alias("observed_share"),
                    F.round(F.log(F.lit(1.0)
                                  + F.lit(1.0)
                                  / F.col("digit").cast("double"))
                            / F.log(F.lit(10.0)), 8)
                    .alias("benford_share")))


@register("hier_subtree_rollup", """
WITH RECURSIVE par AS (
  SELECT c_custkey AS node, c_custkey // 10 AS parent
  FROM customer WHERE c_custkey >= 10
),
anc(node, anc, dist) AS (
  SELECT node, parent, 1 FROM par
  UNION ALL
  SELECT a.node, p.parent, a.dist + 1
  FROM anc a JOIN par p ON p.node = a.anc
)
SELECT a.anc AS ancestor,
       COUNT(*) AS n_descendants,
       MAX(a.dist) AS max_depth,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,4))) AS DOUBLE)
         AS subtree_bal
FROM anc a JOIN customer c ON c.c_custkey = a.node
GROUP BY 1
""")
def hier_subtree_rollup(spark, sf):
    """Hierarchy subtree rollup: the decimal-digit parent chain
    (parent = custkey DIV 10) forms a synthetic org-chart/BOM tree;
    every ancestor aggregates its FULL descendant subtree (count, max
    depth, decimal-exact balance total).  Spark computes the ancestor
    closure by pointer DOUBLING (log-depth supersteps,
    operators.relational.ancestor_closure); the oracle is the classic
    WITH RECURSIVE -- same closure, sequential semantics."""
    from .operators.relational import ancestor_closure, dsum
    customer = read_table(spark, sf, "customer")
    par = (customer.where(F.col("c_custkey") >= 10)
           .select(F.col("c_custkey").alias("node"),
                   F.expr("c_custkey DIV 10").cast("long")
                   .alias("parent")))
    clo = ancestor_closure(par)
    return (clo.join(customer.select(F.col("c_custkey").alias("node"),
                                     "c_acctbal"), "node")
            .groupBy(F.col("anc").alias("ancestor"))
            .agg(F.count(F.lit(1)).alias("n_descendants"),
                 F.max("dist").alias("max_depth"),
                 dsum(F.col("c_acctbal")).alias("subtree_bal")))


@register("anomaly_mad", """
WITH med AS (
  SELECT event_type, quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, CAST(e.value AS DOUBLE) AS v, m.med,
         abs(CAST(e.value AS DOUBLE) - m.med) AS d
  FROM events e JOIN med m ON m.event_type = e.event_type
),
mad AS (
  SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT d.event_type, COUNT(*) AS n,
       round(d.med, 6) AS median, round(m.mad, 6) AS mad,
       COUNT(*) FILTER (WHERE d.d > 3 * m.mad) AS n_outliers
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type, d.med, m.mad
""")
def anomaly_mad(spark, sf):
    """Median-absolute-deviation outlier audit per event type: the
    robust sibling of anomaly_zscore (one wild value cannot drag the
    threshold the way it drags a mean/stddev).  Two exact-median passes
    (value, then |value - median|) + one filtered count; the unrounded
    median/MAD drive the 3-MAD comparison on both engines, rounding is
    display-only.  At 100 TB swap the exact medians for
    approx_percentile -- the join/filter shape is unchanged."""
    events = read_table(spark, sf, "events")
    v = F.col("value").cast("double")
    med = (events.groupBy("event_type")
           .agg(F.percentile(v, F.lit(0.5)).alias("med")))
    dev = (events.join(F.broadcast(med), "event_type")
           .select("event_type", v.alias("v"), "med",
                   F.abs(v - F.col("med")).alias("d")))
    mad = (dev.groupBy("event_type")
           .agg(F.percentile("d", F.lit(0.5)).alias("mad")))
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type", "med", "mad")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count(F.when(F.col("d") > 3 * F.col("mad"),
                                F.lit(1))).alias("n_outliers"))
            .select("event_type", "n",
                    F.round("med", 6).alias("median"),
                    F.round("mad", 6).alias("mad"), "n_outliers"))


@register("copurchase_rules", """
WITH brands AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM brands),
sup AS (SELECT p_brand, COUNT(*) AS n_b FROM brands GROUP BY 1),
pairs AS (
  SELECT a.p_brand AS antecedent, b.p_brand AS consequent,
         COUNT(*) AS n_ab
  FROM brands a JOIN brands b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand != b.p_brand
  GROUP BY 1, 2
  HAVING COUNT(*) >= 50
)
SELECT p.antecedent, p.consequent, p.n_ab,
       round(CAST(p.n_ab AS DOUBLE) / CAST(sa.n_b AS DOUBLE), 8)
         AS confidence,
       round((CAST(p.n_ab AS DOUBLE) / CAST(sa.n_b AS DOUBLE))
             / (CAST(sb.n_b AS DOUBLE) / CAST((SELECT n FROM tot)
                                              AS DOUBLE)), 8) AS lift
FROM pairs p
JOIN sup sa ON sa.p_brand = p.antecedent
JOIN sup sb ON sb.p_brand = p.consequent
""")
def copurchase_rules(spark, sf):
    """Association rules over the market-basket pairs: DIRECTED
    (antecedent -> consequent) support counts with confidence
    (n_ab / n_a) and lift (confidence / consequent base rate) -- the
    scoring pass that turns copurchase_pairs counts into ranked
    recommendations.  All ratios are single IEEE divisions of exact
    integers.  Same bounded pair-space shape as copurchase_pairs; the
    support/total sides are brand-cardinality aggregates, broadcast
    back."""
    li = read_table(spark, sf, "lineitem").select("l_orderkey",
                                                  "l_partkey")
    part = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    brands = (li.join(F.broadcast(part),
                      li.l_partkey == part.p_partkey)
              .select("l_orderkey", "p_brand").distinct()
              .localCheckpoint())  # three consumers below
    tot = brands.select("l_orderkey").distinct().count()
    sup = brands.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_b"))
    a = brands.select("l_orderkey", F.col("p_brand").alias("antecedent"))
    b = brands.select("l_orderkey", F.col("p_brand").alias("consequent"))
    pairs = (a.join(b, (a.l_orderkey == b.l_orderkey)
                    & (F.col("antecedent") != F.col("consequent")))
             .groupBy("antecedent", "consequent")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= 50))
    sa = sup.select(F.col("p_brand").alias("antecedent"),
                    F.col("n_b").alias("__na"))
    sb = sup.select(F.col("p_brand").alias("consequent"),
                    F.col("n_b").alias("__nb"))
    conf = F.col("n_ab").cast("double") / F.col("__na").cast("double")
    return (pairs.join(F.broadcast(sa), "antecedent")
            .join(F.broadcast(sb), "consequent")
            .select("antecedent", "consequent", "n_ab",
                    F.round(conf, 8).alias("confidence"),
                    F.round(conf / (F.col("__nb").cast("double")
                                    / F.lit(float(tot))), 8)
                    .alias("lift")))


@register("dq_psi", """
WITH assigned AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v,
         event_id % 2 AS half
  FROM events
),
rng AS (
  SELECT event_type, MIN(v) AS lo, MAX(v) AS hi
  FROM assigned GROUP BY 1
),
bucketed AS (
  SELECT a.event_type, a.half,
         LEAST(9, CAST(floor((a.v - r.lo) / (r.hi - r.lo) * 10)
                       AS INTEGER)) AS bucket
  FROM assigned a JOIN rng r ON r.event_type = a.event_type
  WHERE r.hi > r.lo
),
counts AS (
  SELECT event_type, bucket,
         COUNT(*) FILTER (WHERE half = 0) AS n0,
         COUNT(*) FILTER (WHERE half = 1) AS n1
  FROM bucketed GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(n0) AS t0, SUM(n1) AS t1
  FROM counts GROUP BY 1
)
SELECT c.event_type,
       ROUND(CAST(SUM(CAST(
         (CAST(c.n0 AS DOUBLE) / t.t0 - CAST(c.n1 AS DOUBLE) / t.t1)
         * ln((CAST(c.n0 AS DOUBLE) / t.t0)
              / (CAST(c.n1 AS DOUBLE) / t.t1))
         AS DECIMAL(27,12))) AS DOUBLE), 8) AS psi,
       COUNT(*) AS n_buckets_used,
       CAST(10 - COUNT(*) AS INTEGER) AS n_buckets_degenerate
FROM counts c JOIN tot t ON t.event_type = c.event_type
WHERE c.n0 > 0 AND c.n1 > 0
GROUP BY c.event_type
""")
def dq_psi(spark, sf):
    """Population-stability-index drift audit per metric: the two
    deterministic halves (event_id parity -- the ab_test assignment
    discipline) are bucketed into 10 equal-width bins over the
    metric's global range, and PSI = sum (p0 - p1) ln(p0/p1) scores
    the distribution shift (rule of thumb: > 0.2 = action).  Buckets
    empty on either side are excluded and counted -- the standard
    degenerate-bin convention.  One scan + bucket-sized aggregates;
    decimal-exact PSI sum."""
    ev = read_table(spark, sf, "events")
    v = F.col("value").cast("double")
    assigned = ev.select("event_type", v.alias("v"),
                         F.pmod(F.col("event_id"), F.lit(2)).alias("half"))
    rng = (assigned.groupBy("event_type")
           .agg(F.min("v").alias("lo"), F.max("v").alias("hi")))
    bucketed = (assigned.join(F.broadcast(rng), "event_type")
                .where(F.col("hi") > F.col("lo"))
                .select("event_type", "half",
                        F.least(F.lit(9),
                                F.floor((F.col("v") - F.col("lo"))
                                        / (F.col("hi") - F.col("lo"))
                                        * 10).cast("int"))
                        .alias("bucket")))
    counts = (bucketed.groupBy("event_type", "bucket")
              .agg(F.count(F.when(F.col("half") == 0, 1)).alias("n0"),
                   F.count(F.when(F.col("half") == 1, 1)).alias("n1")))
    tot = (counts.groupBy("event_type")
           .agg(F.sum("n0").alias("t0"), F.sum("n1").alias("t1")))
    p0 = F.col("n0").cast("double") / F.col("t0")
    p1 = F.col("n1").cast("double") / F.col("t1")
    return (counts.join(F.broadcast(tot), "event_type")
            .where((F.col("n0") > 0) & (F.col("n1") > 0))
            .groupBy("event_type")
            .agg(F.round(F.sum(((p0 - p1) * F.log(p0 / p1))
                               .cast("decimal(27,12)")).cast("double"), 8)
                 .alias("psi"),
                 F.count(F.lit(1)).alias("n_buckets_used"),
                 (F.lit(10) - F.count(F.lit(1))).cast("int")
                 .alias("n_buckets_degenerate")))


@register("rec_item_cosine", """
WITH brands AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
sup AS (SELECT p_brand, COUNT(*) AS n_b FROM brands GROUP BY 1),
pairs AS (
  SELECT a.p_brand AS item_a, b.p_brand AS item_b, COUNT(*) AS n_ab
  FROM brands a JOIN brands b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand != b.p_brand
  GROUP BY 1, 2
),
scored AS (
  SELECT p.item_a, p.item_b, p.n_ab,
         CAST(p.n_ab AS DOUBLE)
         / sqrt(CAST(sa.n_b AS DOUBLE) * CAST(sb.n_b AS DOUBLE))
           AS cos_sim
  FROM pairs p
  JOIN sup sa ON sa.p_brand = p.item_a
  JOIN sup sb ON sb.p_brand = p.item_b
)
SELECT item_a, item_b, n_ab, round(cos_sim, 8) AS cos_sim, sim_rank
FROM (SELECT item_a, item_b, n_ab, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY item_a
                                ORDER BY cos_sim DESC, item_b)
               AS sim_rank
      FROM scored)
WHERE sim_rank <= 5
""")
def rec_item_cosine(spark, sf):
    """Item-item collaborative filtering: cosine similarity over
    order-occurrence sets (n_ab / sqrt(n_a n_b)) with the top-5
    neighbors per brand -- the classic Amazon-style item-to-item
    recommender scoring, computed from the same bounded basket-pair
    space as copurchase_pairs (exact integer counts, one IEEE
    division)."""
    li = read_table(spark, sf, "lineitem").select("l_orderkey",
                                                  "l_partkey")
    part = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    brands = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .select("l_orderkey", "p_brand").distinct()
              .localCheckpoint())
    sup = brands.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_b"))
    a = brands.select("l_orderkey", F.col("p_brand").alias("item_a"))
    b = brands.select("l_orderkey", F.col("p_brand").alias("item_b"))
    pairs = (a.join(b, (a.l_orderkey == b.l_orderkey)
                    & (F.col("item_a") != F.col("item_b")))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("n_ab")))
    sa = sup.select(F.col("p_brand").alias("item_a"),
                    F.col("n_b").alias("__na"))
    sb = sup.select(F.col("p_brand").alias("item_b"),
                    F.col("n_b").alias("__nb"))
    scored = (pairs.join(F.broadcast(sa), "item_a")
              .join(F.broadcast(sb), "item_b")
              .select("item_a", "item_b", "n_ab",
                      (F.col("n_ab").cast("double")
                       / F.sqrt(F.col("__na").cast("double")
                                * F.col("__nb").cast("double")))
                      .alias("cos_sim")))
    w = Window.partitionBy("item_a").orderBy(F.desc("cos_sim"),
                                             F.asc("item_b"))
    return (scored.withColumn("sim_rank", F.row_number().over(w))
            .where(F.col("sim_rank") <= 5)
            .select("item_a", "item_b", "n_ab",
                    F.round("cos_sim", 8).alias("cos_sim"), "sim_rank"))


@register("ml_auc", """
WITH scored AS (
  SELECT CAST(value AS DOUBLE) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
ranked AS (
  SELECT y,
         -- midrank: ties share the average of their rank range,
         -- the exact Mann-Whitney convention
         (CAST(MIN(rn) OVER (PARTITION BY score) AS DOUBLE)
          + CAST(MAX(rn) OVER (PARTITION BY score) AS DOUBLE)) / 2.0
           AS midrank
  FROM (SELECT y, score,
               ROW_NUMBER() OVER (ORDER BY score, y) AS rn
        FROM scored)
),
agg AS (
  SELECT CAST(SUM(CASE WHEN y = 1 THEN CAST(midrank AS DECIMAL(27,4))
                       ELSE CAST(0.0 AS DECIMAL(27,4)) END) AS DOUBLE)
           AS rank_sum,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg,
       ROUND((rank_sum
              - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0)
                / 2.0)
             / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 8)
         AS auc
FROM agg
""")
def ml_auc(spark, sf):
    """Exact ROC-AUC via the Mann-Whitney rank statistic: does the
    metric value separate purchase events from the rest?  Midranks
    handle score ties exactly (average of the tie range -- the U-test
    convention), the rank sum is decimal-exact, and the final formula
    is two IEEE ops -- no curve sampling, no sort on the driver.  The
    ranking sorts once globally; at 100 TB swap the global window for
    a two-phase rank (per-partition + offsets) -- the statistic is
    unchanged.  Completes the classifier-evaluation family next to
    llm_knn_confusion."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    scored = ev.select(
        F.col("value").cast("double").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("y"))
    rn = F.row_number().over(W.orderBy("score", "y"))
    ranked = scored.select("y", "score", rn.alias("rn"))
    wsc = W.partitionBy("score")
    mid = ((F.min("rn").over(wsc).cast("double")
            + F.max("rn").over(wsc).cast("double")) / 2.0)
    ranked = ranked.select("y", mid.alias("midrank"))
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1,
                     F.col("midrank").cast("decimal(27,4)"))
              .otherwise(F.lit(0.0).cast("decimal(27,4)")))
        .cast("double").alias("rank_sum"),
        F.sum("y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"))
    np_, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    return agg.select(
        "n_pos", "n_neg",
        F.round((F.col("rank_sum") - np_ * (np_ + 1.0) / 2.0)
                / (np_ * nn), 8).alias("auc"))


@register("dq_k_anonymity", """
WITH groups AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
  FROM customer GROUP BY 1, 2
)
SELECT COUNT(*) AS n_groups,
       MIN(group_size) AS min_group_size,
       COUNT(*) FILTER (WHERE group_size < 5) AS n_violating_groups,
       CAST(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
            AS BIGINT) AS n_reidentifiable_rows
FROM groups
""")
def dq_k_anonymity(spark, sf):
    """k-anonymity audit (k = 5) over the (nation, market-segment)
    quasi-identifier: how many equivalence classes fall below k, and
    how many rows they expose -- the release-gate check before any
    record-level data sharing.  One group-sized aggregate; at 100 TB
    the quasi-identifier grid stays dimension-sized."""
    customer = read_table(spark, sf, "customer")
    groups = (customer.groupBy("c_nationkey", "c_mktsegment")
              .agg(F.count(F.lit(1)).alias("group_size")))
    viol = F.when(F.col("group_size") < 5, F.col("group_size")) \
        .otherwise(F.lit(0))
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("min_group_size"),
        F.count(F.when(F.col("group_size") < 5, 1))
        .alias("n_violating_groups"),
        F.sum(viol).cast("long").alias("n_reidentifiable_rows"))


@register("ts_cooccurrence", """
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_cooccur,
       COUNT(DISTINCT a.user_id) AS n_users
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
 AND a.event_id != b.event_id
 AND a.event_type < b.event_type
GROUP BY 1, 2
""")
def ts_cooccurrence(spark, sf):
    """Temporal co-occurrence: ordered event-type pairs by the same
    user within one hour -- the behavioral-basket analog of
    copurchase_pairs (which-actions-travel-together feeds session
    features and next-action models).  The self-join is user-keyed
    AND time-banded, so the pair space per user is bounded by events-
    per-hour, never the user's full history squared; at 100 TB add a
    coarse time-bucket equi-key to the join (the range_join pattern)
    so the band probe stays partition-local."""
    ev = read_table(spark, sf, "events")
    e = ev.select("user_id", "event_type",
                  F.col("ts").cast("timestamp").alias("ts"), "event_id")
    a = e.select("user_id", F.col("event_type").alias("type_a"),
                 F.col("ts").alias("ts_a"),
                 F.col("event_id").alias("id_a"))
    b = e.select("user_id", F.col("event_type").alias("type_b"),
                 F.col("ts").alias("ts_b"),
                 F.col("event_id").alias("id_b"))
    return (a.join(b, "user_id")
            .where((F.col("ts_b") >= F.col("ts_a"))
                   & (F.col("ts_b") <= F.col("ts_a")
                      + F.expr("INTERVAL 1 HOUR"))
                   & (F.col("id_a") != F.col("id_b"))
                   & (F.col("type_a") < F.col("type_b")))
            .groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).alias("n_cooccur"),
                 F.countDistinct("user_id").alias("n_users")))


@register("w_streaks", """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
  FROM events
),
islands AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS len,
         MIN(d) AS start_day, MAX(d) AS end_day
  FROM islands GROUP BY 1, 2
)
SELECT user_id, len AS longest_streak_days,
       CAST(start_day AS VARCHAR) AS start_day,
       CAST(end_day AS VARCHAR) AS end_day
FROM (SELECT user_id, len, start_day, end_day,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY len DESC, start_day) AS r
      FROM streaks) WHERE r = 1
""")
def w_streaks(spark, sf):
    """Longest consecutive-day activity streak per user -- the classic
    gaps-and-islands window pattern (consecutive days share
    ``day - row_number``); the retention-adjacent metric every product
    analytics stack computes.  One distinct-days collapse + one window
    + island-sized aggregates."""
    ev = read_table(spark, sf, "events")
    days = (ev.select("user_id",
                      F.col("ts").cast("timestamp").cast("date")
                      .alias("d"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id", "d",
        F.date_sub("d", F.row_number().over(w)).alias("island"))
    streaks = (islands.groupBy("user_id", "island")
               .agg(F.count(F.lit(1)).alias("len"),
                    F.min("d").alias("start_day"),
                    F.max("d").alias("end_day")))
    w2 = Window.partitionBy("user_id").orderBy(F.desc("len"),
                                               F.asc("start_day"))
    return (streaks.withColumn("__r", F.row_number().over(w2))
            .where(F.col("__r") == 1)
            .select("user_id", F.col("len").alias("longest_streak_days"),
                    F.col("start_day").cast("string").alias("start_day"),
                    F.col("end_day").cast("string").alias("end_day")))


@register("attribution_position", """
WITH p AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(ts AS TIMESTAMP) AS pts
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT event_id, user_id, event_type,
         CAST(ts AS TIMESTAMP) AS tts
  FROM events WHERE event_type IN ('click', 'view')
),
journey AS (
  SELECT p.purchase_id, t.event_id, t.event_type,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY t.tts, t.event_id) AS rn,
         COUNT(*) OVER (PARTITION BY p.purchase_id) AS n
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY
),
credited AS (
  SELECT event_type,
         CASE WHEN n = 1 THEN 1.0
              WHEN rn = 1 OR rn = n THEN
                   CASE WHEN n = 2 THEN 0.5 ELSE 0.4 END
              ELSE 0.2 / CAST(n - 2 AS DOUBLE) END AS credit
  FROM journey
)
SELECT event_type,
       COUNT(*) AS n_touches,
       ROUND(CAST(SUM(CAST(credit AS DECIMAL(27,12))) AS DOUBLE), 6)
         AS total_credit
FROM credited GROUP BY event_type
""")
def attribution_position(spark, sf):
    """Position-based (40/20/40) multi-touch attribution: each
    purchase's prior-7-day click/view journey splits credit 40% first
    touch, 40% last, 20% across the middle -- the standard U-shaped
    model next to attribution_last_touch.  The journey join is
    user-keyed and time-banded (bounded per user-week); credit sums
    are decimal-exact."""
    ev = read_table(spark, sf, "events")
    p = (ev.where(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"), "user_id",
                 F.col("ts").cast("timestamp").alias("pts")))
    t = (ev.where(F.col("event_type").isin("click", "view"))
         .select("event_id", "user_id", "event_type",
                 F.col("ts").cast("timestamp").alias("tts")))
    j = (p.join(t, "user_id")
         .where((F.col("tts") < F.col("pts"))
                & (F.col("tts") >= F.col("pts")
                   - F.expr("INTERVAL 7 DAY"))))
    w = Window.partitionBy("purchase_id").orderBy("tts", "event_id")
    wn = Window.partitionBy("purchase_id")
    j = (j.withColumn("rn", F.row_number().over(w))
         .withColumn("n", F.count(F.lit(1)).over(wn)))
    credit = (F.when(F.col("n") == 1, F.lit(1.0))
              .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")),
                    F.when(F.col("n") == 2, F.lit(0.5))
                    .otherwise(F.lit(0.4)))
              .otherwise(F.lit(0.2)
                         / (F.col("n") - 2).cast("double")))
    return (j.select("event_type", credit.alias("credit"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_touches"),
                 F.round(F.sum(F.col("credit").cast("decimal(27,12)"))
                         .cast("double"), 6).alias("total_credit")))


@register("survival_km", """
WITH spans AS (
  SELECT user_id,
         MIN(CAST(ts AS TIMESTAMP)) AS t0,
         MIN(CASE WHEN event_type = 'error'
                  THEN CAST(ts AS TIMESTAMP) END) AS terr,
         MAX(CAST(ts AS TIMESTAMP)) AS tmax
  FROM events GROUP BY user_id
),
obs AS (
  SELECT user_id,
         CASE WHEN terr IS NOT NULL
              THEN epoch_us(terr) - epoch_us(t0)
              ELSE epoch_us(tmax) - epoch_us(t0) END AS t_obs,
         terr IS NOT NULL AS observed
  FROM spans
  WHERE (CASE WHEN terr IS NOT NULL
              THEN epoch_us(terr) - epoch_us(t0)
              ELSE epoch_us(tmax) - epoch_us(t0) END) > 0
),
times AS (
  SELECT t_obs AS t, COUNT(*) AS d
  FROM obs WHERE observed GROUP BY 1
),
risk AS (
  SELECT tm.t, tm.d,
         (SELECT COUNT(*) FROM obs o WHERE o.t_obs >= tm.t) AS n
  FROM times tm
)
SELECT t AS t_micros, d AS n_events, n AS n_at_risk,
       CASE WHEN MAX(CASE WHEN d = n THEN 1 ELSE 0 END)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
            THEN 0.0
            ELSE ROUND(exp(CAST(SUM(CAST(
              CASE WHEN d < n
                   THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))
                   END
              AS DECIMAL(27,12))) OVER (ORDER BY t
                                        ROWS UNBOUNDED PRECEDING)
              AS DOUBLE)), 8) END AS survival
FROM risk
""")
def survival_km(spark, sf):
    """Kaplan-Meier survival curve for time-to-first-error per user
    (users without an error are right-censored at their last event):
    S(t) = product over event times <= t of (1 - d/n), computed as
    exp of a decimal-exact running ln-sum so the cumulative product
    is reduction-order-free.  The time-to-churn/failure estimator
    every lifecycle analysis runs.

    Scale shape: the risk set n(t) = |{users: t_obs >= t}| is NOT a
    range join of two user-sized tables (that plan is a
    broadcast-nested-loop going quadratic in users); it is a suffix
    cumulative sum over the observation-time histogram -- the same
    cumulative-histogram pattern as ``llm_curriculum_order`` -- so one
    groupBy collapses the users to distinct times and one ordered
    window (over the same distinct-times table the KM product already
    traverses) yields every n(t) with zero pair expansion."""
    ev = read_table(spark, sf, "events")
    t = F.col("ts").cast("timestamp")
    spans = (ev.groupBy("user_id")
             .agg(F.min(F.unix_micros(t)).alias("t0"),
                  F.min(F.when(F.col("event_type") == "error",
                               F.unix_micros(t))).alias("terr"),
                  F.max(F.unix_micros(t)).alias("tmax")))
    t_obs = F.when(F.col("terr").isNotNull(),
                   F.col("terr") - F.col("t0")) \
        .otherwise(F.col("tmax") - F.col("t0"))
    obs = (spans.select(t_obs.alias("t_obs"),
                        F.col("terr").isNotNull().alias("observed"))
           .where(F.col("t_obs") > 0))
    # one histogram carries BOTH the death counts d(t) and the at-risk
    # suffix sums n(t): n(t) = sum of all-observation counts at times
    # >= t, a cumulative window ordered by t descending
    hist = (obs.groupBy(F.col("t_obs").alias("t"))
            .agg(F.count(F.lit(1)).alias("c_all"),
                 F.sum(F.when(F.col("observed"), 1).otherwise(0))
                 .alias("d")))
    wdesc = (Window.orderBy(F.col("t").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
    risk = (hist.withColumn("n", F.sum("c_all").over(wdesc))
            .where(F.col("d") > 0).select("t", "d", "n"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # d == n zeroes the product exactly; ln is undefined there, so the
    # running max flag pins survival to 0 from that time on
    lnterm = F.when(F.col("d") < F.col("n"),
                    F.log(F.lit(1.0) - F.col("d").cast("double")
                          / F.col("n").cast("double")))
    zeroed = F.max(F.when(F.col("d") == F.col("n"), 1)
                   .otherwise(0)).over(w)
    return (risk.select(F.col("t").alias("t_micros"),
                        F.col("d").alias("n_events"),
                        F.col("n").alias("n_at_risk"),
                        F.when(zeroed == 1, F.lit(0.0))
                        .otherwise(F.round(F.exp(F.sum(
                            lnterm.cast("decimal(27,12)")).over(w)
                            .cast("double")), 8)).alias("survival")))


@register("agg_yoy_growth", """
WITH monthly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT yr, mo, ROUND(revenue, 4) AS revenue,
       ROUND((revenue - prev) / prev, 8) AS yoy_growth
FROM (SELECT yr, mo, revenue,
             LAG(revenue, 12) OVER (ORDER BY yr, mo) AS prev
      FROM monthly)
WHERE prev IS NOT NULL AND prev != 0
""")
def agg_yoy_growth(spark, sf):
    """Year-over-year monthly revenue growth: decimal-exact monthly
    sums, one lag-12 window over the (tiny) month grid -- the standard
    finance trend shape (the month table is dimension-sized at any
    fact volume, so the global window is free)."""
    from .operators.relational import dsum
    from pyspark.sql import Window as W
    orders = read_table(spark, sf, "orders")
    monthly = (orders.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"))
        .agg(dsum(F.col("o_totalprice")).alias("revenue")))
    w = W.orderBy("yr", "mo")
    return (monthly.withColumn("prev", F.lag("revenue", 12).over(w))
            .where(F.col("prev").isNotNull() & (F.col("prev") != 0))
            .select("yr", "mo", F.round("revenue", 4).alias("revenue"),
                    F.round((F.col("revenue") - F.col("prev"))
                            / F.col("prev"), 8).alias("yoy_growth")))


@register("agg_concentration", """
WITH spend AS (
  SELECT c.c_nationkey AS nation, o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
           AS s
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT nation, s,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY s, o_custkey) AS i,
         COUNT(*) OVER (PARTITION BY nation) AS n,
         CAST(SUM(CAST(s AS DECIMAL(27,4)))
              OVER (PARTITION BY nation) AS DOUBLE) AS tot
  FROM spend
)
SELECT nation, MAX(n) AS n_customers,
       ROUND((2.0 * CAST(SUM(CAST(i * s AS DECIMAL(27,4))) AS DOUBLE))
             / (MAX(n) * MAX(tot))
             - (CAST(MAX(n) AS DOUBLE) + 1.0) / MAX(n), 8) AS gini,
       ROUND(CAST(SUM(CAST((s / tot) * (s / tot)
                           AS DECIMAL(27,12))) AS DOUBLE), 8) AS hhi
FROM ranked
GROUP BY nation
""")
def agg_concentration(spark, sf):
    """Spend-concentration metrics per nation: Gini coefficient (from
    the rank formula over the (spend, custkey) total order) and
    Herfindahl-Hirschman index (sum of squared shares) -- the
    inequality/market-concentration pass straight out of the
    Factbook's economics theme.  Exact integer ranks, decimal-exact
    sums; per-nation windows shuffle customer-sized rows once."""
    from .operators.relational import dsum
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    spend = (orders.join(F.broadcast(
        customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nation"), "o_custkey")
        .agg(dsum(F.col("o_totalprice")).alias("s")))
    w = Window.partitionBy("nation").orderBy("s", "o_custkey")
    wn = Window.partitionBy("nation")
    ranked = (spend
              .withColumn("i", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(wn))
              .withColumn("tot", F.sum(F.col("s").cast("decimal(27,4)"))
                          .over(wn).cast("double")))
    gini = (F.lit(2.0)
            * F.sum((F.col("i") * F.col("s")).cast("decimal(27,4)"))
            .cast("double")
            / (F.max("n") * F.max("tot"))
            - (F.max("n").cast("double") + 1.0) / F.max("n"))
    share = F.col("s") / F.col("tot")
    return (ranked.groupBy("nation")
            .agg(F.max("n").alias("n_customers"),
                 F.round(gini, 8).alias("gini"),
                 F.round(F.sum((share * share).cast("decimal(27,12)"))
                         .cast("double"), 8).alias("hhi"))
            .select("nation", "n_customers", "gini", "hhi"))


@register("agg_skyline", """
WITH pts AS (
  SELECT c.c_custkey, c.c_acctbal AS y,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
           AS x
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
xg AS (
  SELECT x, MAX(y) AS maxy FROM pts GROUP BY x
),
sfx AS (
  SELECT x, maxy,
         MAX(maxy) OVER (ORDER BY x DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS better_x_maxy
  FROM xg
)
SELECT p.c_custkey, ROUND(p.x, 4) AS total_spend, p.y AS acctbal
FROM pts p JOIN sfx s ON s.x = p.x
WHERE (s.better_x_maxy IS NULL OR s.better_x_maxy < p.y)
  AND s.maxy <= p.y
""")
def agg_skyline(spark, sf):
    """Skyline (Pareto front) of customers over (total spend,
    account balance): the classic dominance query -- keep exactly the
    points no other point beats on both dimensions.  The dominance
    test collapses to a suffix-max over the DISTINCT-x table; since
    distinct spend values grow with the customer count, the suffix
    max is BUCKETED (the st_late_audit two-level pattern) instead of
    one global window:

    - spend buckets via ``floor(x / 10000)`` -- bounded by the spend
      DOMAIN (~700 buckets for TPC-H's 0..7M totals), constant in N;
    - cross-bucket suffix max from a tiny non-equi self-join on the
      bucket-max table (broadcast nested-loop over <= ~700 rows, no
      window);
    - within-bucket suffix max from a PARTITIONED window (partition
      size = distinct-x / buckets -- parallel);
    - better_x_maxy = greatest of the two (null-skipping, so null
      only when NO strictly-higher spend exists anywhere -- the same
      predicate the oracle's global suffix-max produces).

    p survives iff no strictly-higher-spend group reaches its balance
    and no same-spend point exceeds it.  Nothing point-sized funnels
    through one partition."""
    from .operators.dedup import _hold
    from .operators.relational import dsum
    customer = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    # pts (customer-cardinality, << fact) and xg (distinct-x) each
    # feed multiple consumers; pin them so the customer x orders join
    # runs ONCE, not once per dominance subtree.
    pts = _hold(customer.join(orders,
                              customer.c_custkey == orders.o_custkey)
                .groupBy("c_custkey", F.col("c_acctbal").alias("y"))
                .agg(dsum(F.col("o_totalprice")).alias("x")))
    xg = _hold(pts.groupBy("x").agg(F.max("y").alias("maxy"))
               .withColumn("_bkt",
                           F.floor(F.col("x") / F.lit(10000.0))))
    bmax = xg.groupBy("_bkt").agg(F.max("maxy").alias("_bmaxy"))
    ba, bb = bmax.alias("ba"), bmax.alias("bb")
    hi = (ba.join(F.broadcast(bb),
                  F.col("bb._bkt") > F.col("ba._bkt"), "left")
          .groupBy(F.col("ba._bkt").alias("_bkt"))
          .agg(F.max("bb._bmaxy").alias("_hi_max")))
    wb = (Window.partitionBy("_bkt").orderBy(F.desc("x"))
          .rowsBetween(Window.unboundedPreceding, -1))
    sfx = (xg.join(F.broadcast(hi), "_bkt")
           .withColumn("_in_max", F.max("maxy").over(wb))
           .withColumn("better_x_maxy",
                       F.greatest("_hi_max", "_in_max")))
    return (pts.join(sfx.select("x", "maxy", "better_x_maxy"), "x")
            .where((F.col("better_x_maxy").isNull()
                    | (F.col("better_x_maxy") < F.col("y")))
                   & (F.col("maxy") <= F.col("y")))
            .select("c_custkey", F.round("x", 4).alias("total_spend"),
                    F.col("y").alias("acctbal")))


@register("agg_entropy", """
WITH c AS (
  SELECT n.n_name AS nation, o.o_orderpriority AS cat,
         COUNT(*) AS cnt
  FROM orders o
  JOIN customer cu ON cu.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = cu.c_nationkey
  GROUP BY 1, 2
),
t AS (SELECT nation, SUM(cnt) AS n FROM c GROUP BY 1)
SELECT c.nation,
       COUNT(*) AS n_categories,
       ROUND(CAST(SUM(CAST(
         -(CAST(c.cnt AS DOUBLE) / t.n)
          * ln(CAST(c.cnt AS DOUBLE) / t.n)
         AS DECIMAL(27,12))) AS DOUBLE), 8) AS entropy_nats
FROM c JOIN t ON t.nation = c.nation
GROUP BY c.nation
""")
def agg_entropy(spark, sf):
    """Shannon entropy of the order-priority mix per nation: the
    categorical-spread metric (0 = single class, ln(5) = uniform over
    5 priorities) used for feature screening and drift baselines.
    Decimal-exact -p ln p sums over exact integer shares; everything
    after the fact scan is dimension-sized."""
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    nation = read_table(spark, sf, "nation")
    c = (orders.join(F.broadcast(customer.select("c_custkey",
                                                 "c_nationkey")),
                     orders.o_custkey == F.col("c_custkey"))
         .join(F.broadcast(nation),
               F.col("c_nationkey") == nation.n_nationkey)
         .groupBy(F.col("n_name").alias("nation"),
                  F.col("o_orderpriority").alias("cat"))
         .agg(F.count(F.lit(1)).alias("cnt")))
    t = c.groupBy("nation").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt").cast("double") / F.col("n")
    return (c.join(F.broadcast(t), "nation")
            .groupBy("nation")
            .agg(F.count(F.lit(1)).alias("n_categories"),
                 F.round(F.sum((-p * F.log(p))
                               .cast("decimal(27,12)")).cast("double"),
                         8).alias("entropy_nats")))


_DP_EPS = 1.0


@register("dq_dp_counts", f"""
WITH c AS (
  SELECT c_nationkey AS nation, COUNT(*) AS true_count
  FROM customer GROUP BY 1
),
u AS (
  SELECT nation, true_count,
         (('0x' || substr(md5('dp:' || CAST(nation AS VARCHAR)), 1, 13))
          ::BIGINT + 1.0) / {float((1 << 52) + 1)!r} AS uu
  FROM c
)
SELECT nation, true_count,
       ROUND(true_count
             + CASE WHEN uu < 0.5
                    THEN (1.0 / {_DP_EPS!r}) * ln(2.0 * uu)
                    ELSE -(1.0 / {_DP_EPS!r}) * ln(2.0 * (1.0 - uu))
               END, 6) AS dp_count
FROM u
""")
def dq_dp_counts(spark, sf):
    """Differential-privacy release mechanism (Laplace, sensitivity-1
    counts, epsilon = 1): noise drawn by inverse-CDF from the keyed
    md5 uniform -- REPLAYABLE noise, which is exactly what a pipeline
    wants in tests/audits of its DP plumbing (swap the coin for a real
    RNG at release time; the plan is identical).  The mechanism runs
    scan-side per group; no row-level data leaves the aggregate."""
    customer = read_table(spark, sf, "customer")
    c = (customer.groupBy(F.col("c_nationkey").alias("nation"))
         .agg(F.count(F.lit(1)).alias("true_count")))
    uu = ((F.conv(F.substring(
        F.md5(F.concat(F.lit("dp:"), F.col("nation").cast("string"))),
        1, 13), 16, 10).cast("double") + 1.0)
        / float((1 << 52) + 1))
    b = 1.0 / _DP_EPS
    noise = (F.when(uu < 0.5, F.lit(b) * F.log(2.0 * uu))
             .otherwise(-F.lit(b) * F.log(2.0 * (1.0 - uu))))
    return c.select("nation", "true_count",
                    F.round(F.col("true_count") + noise, 6)
                    .alias("dp_count"))


@register("agg_spearman", """
WITH spend AS (
  SELECT c.c_custkey, c.c_acctbal,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
           AS total_spend
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey)
              AS DOUBLE) AS rx,
         CAST(ROW_NUMBER() OVER (ORDER BY total_spend, c_custkey)
              AS DOUBLE) AS ry
  FROM spend
),
mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(rx AS DECIMAL(27,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ry AS DECIMAL(27,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(rx AS DECIMAL(27,4))
                  * CAST(ry AS DECIMAL(27,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(rx AS DECIMAL(27,4))
                  * CAST(rx AS DECIMAL(27,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ry AS DECIMAL(27,4))
                  * CAST(ry AS DECIMAL(27,4))) AS DOUBLE) AS syy
  FROM ranked
)
SELECT n,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)), 8)
         AS spearman_rho
FROM mom
""")
def agg_spearman(spark, sf):
    """Spearman rank correlation between account balance and total
    spend: Pearson over RANKS (exact integers under a keyed total
    order, so ties are deterministic) with decimal-exact moments --
    the monotone-association test that ignores outliers and scale,
    next to the parametric agg_stats_corr."""
    from pyspark.sql import Window as W
    from .operators.relational import dsum
    customer = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    spend = (customer.join(orders,
                           customer.c_custkey == orders.o_custkey)
             .groupBy("c_custkey", "c_acctbal")
             .agg(dsum(F.col("o_totalprice")).alias("total_spend")))
    rx = F.row_number().over(W.orderBy("c_acctbal", "c_custkey")) \
        .cast("double")
    ry = F.row_number().over(W.orderBy("total_spend", "c_custkey")) \
        .cast("double")
    ranked = spend.select(rx.alias("rx"), ry.alias("ry"))
    dx = F.col("rx").cast("decimal(27,4)")
    dy = F.col("ry").cast("decimal(27,4)")
    mom = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"))
    n = F.col("n").cast("double")
    rho = ((n * F.col("sxy") - F.col("sx") * F.col("sy"))
           / F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * (n * F.col("syy") - F.col("sy") * F.col("sy"))))
    return mom.select("n", F.round(rho, 8).alias("spearman_rho"))


@register("agg_ks_test", """
WITH s AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v,
         event_id % 2 AS half, event_id
  FROM events
),
tot AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE half = 0) AS n0,
         COUNT(*) FILTER (WHERE half = 1) AS n1
  FROM s GROUP BY 1
),
cum AS (
  SELECT s.event_type,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY s.event_type
                    ORDER BY v, event_id
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / t.n0 AS f0,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
              OVER (PARTITION BY s.event_type
                    ORDER BY v, event_id
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / t.n1 AS f1
  FROM s JOIN tot t ON t.event_type = s.event_type
)
SELECT c.event_type, t.n0, t.n1,
       ROUND(MAX(abs(c.f0 - c.f1)), 8) AS ks_statistic
FROM cum c JOIN tot t ON t.event_type = c.event_type
GROUP BY c.event_type, t.n0, t.n1
""")
def agg_ks_test(spark, sf):
    """Two-sample Kolmogorov-Smirnov statistic per metric between the
    parity halves: max |empirical-CDF difference| over the pooled
    total order -- the distribution-free shift test next to Welch
    (means) and PSI (binned shares).  Exact integer cumulative counts;
    one ordered window per metric."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    s = ev.select("event_type", F.col("value").cast("double").alias("v"),
                  F.pmod(F.col("event_id"), F.lit(2)).alias("half"),
                  "event_id")
    tot = (s.groupBy("event_type")
           .agg(F.count(F.when(F.col("half") == 0, 1)).alias("n0"),
                F.count(F.when(F.col("half") == 1, 1)).alias("n1")))
    w = (W.partitionBy("event_type").orderBy("v", "event_id")
         .rowsBetween(W.unboundedPreceding, 0))
    cum = (s.join(F.broadcast(tot), "event_type")
           .select("event_type", "n0", "n1",
                   (F.sum(F.when(F.col("half") == 0, 1)
                          .otherwise(0)).over(w).cast("double")
                    / F.col("n0")).alias("f0"),
                   (F.sum(F.when(F.col("half") == 1, 1)
                          .otherwise(0)).over(w).cast("double")
                    / F.col("n1")).alias("f1")))
    return (cum.groupBy("event_type", "n0", "n1")
            .agg(F.round(F.max(F.abs(F.col("f0") - F.col("f1"))), 8)
                 .alias("ks_statistic")))


@register("ml_gains_table", """
WITH scored AS (
  SELECT CAST(value AS DOUBLE) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         event_id
  FROM events
),
deciled AS (
  SELECT y,
         NTILE(10) OVER (ORDER BY score DESC, event_id) AS decile
  FROM scored
),
per AS (
  SELECT decile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS positives
  FROM deciled GROUP BY 1
),
tot AS (SELECT CAST(SUM(positives) AS DOUBLE) AS tp FROM per)
SELECT decile, n, positives,
       ROUND(CAST(SUM(positives) OVER (ORDER BY decile
                                       ROWS UNBOUNDED PRECEDING)
                  AS DOUBLE) / (SELECT tp FROM tot), 8)
         AS cum_capture_rate,
       ROUND((CAST(positives AS DOUBLE) / n)
             / ((SELECT tp FROM tot)
                / CAST(SUM(n) OVER () AS DOUBLE)), 8) AS lift
FROM per
""")
def ml_gains_table(spark, sf):
    """Decile gains table: rank events by score (value), cut into 10
    equal bins, report each bin's positive capture and lift vs the
    base rate -- the campaign-targeting readout next to ml_auc (AUC
    summarizes, the gains table tells you WHERE to cut).  NTILE over
    a deterministic total order; exact integer counts."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    scored = ev.select(
        F.col("value").cast("double").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("y"), "event_id")
    dec = scored.select(
        "y", F.ntile(10).over(W.orderBy(F.desc("score"),
                                        F.asc("event_id")))
        .alias("decile"))
    per = (dec.groupBy("decile")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("y").cast("long").alias("positives"))
           .localCheckpoint())
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    tp = F.sum("positives").over(w_all).cast("double")
    tn = F.sum("n").over(w_all).cast("double")
    return per.select(
        "decile", "n", "positives",
        F.round(F.sum("positives").over(w_cum).cast("double") / tp, 8)
        .alias("cum_capture_rate"),
        F.round((F.col("positives").cast("double") / F.col("n"))
                / (tp / tn), 8).alias("lift"))


@register("dq_rules", """
SELECT 'orders_totalprice_positive' AS rule,
       (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
         AS n_violations,
       (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) = 0
         AS passed
UNION ALL
SELECT 'lineitem_discount_in_unit_range',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_discount < 0 OR l_discount > 1),
       (SELECT COUNT(*) FROM lineitem
        WHERE l_discount < 0 OR l_discount > 1) = 0
UNION ALL
SELECT 'lineitem_quantity_positive',
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0),
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) = 0
UNION ALL
SELECT 'orders_custkey_exists',
       (SELECT COUNT(*) FROM orders o
        LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey IS NULL),
       (SELECT COUNT(*) FROM orders o
        LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey IS NULL) = 0
UNION ALL
SELECT 'customer_nation_valid',
       (SELECT COUNT(*) FROM customer cu
        LEFT JOIN nation n ON n.n_nationkey = cu.c_nationkey
        WHERE n.n_nationkey IS NULL),
       (SELECT COUNT(*) FROM customer cu
        LEFT JOIN nation n ON n.n_nationkey = cu.c_nationkey
        WHERE n.n_nationkey IS NULL) = 0
""")
def dq_rules(spark, sf):
    """Declarative expectation suite (Great-Expectations shape): five
    named rules -- range checks, positivity, referential existence --
    each reporting its violation count and pass flag in one result
    (the run-on-every-load contract the reference validates by hand,
    README.md:30-33).  Each rule is one scan-side count or anti-join;
    rules share scans when Catalyst can collapse them."""
    orders = read_table(spark, sf, "orders")
    lineitem = read_table(spark, sf, "lineitem")
    customer = read_table(spark, sf, "customer")
    nation = read_table(spark, sf, "nation")

    def row(name, cnt):
        return (name, cnt, cnt == 0)

    rows = [
        row("orders_totalprice_positive",
            orders.where(F.col("o_totalprice") <= 0).count()),
        row("lineitem_discount_in_unit_range",
            lineitem.where((F.col("l_discount") < 0)
                           | (F.col("l_discount") > 1)).count()),
        row("lineitem_quantity_positive",
            lineitem.where(F.col("l_quantity") <= 0).count()),
        row("orders_custkey_exists",
            orders.join(customer,
                        orders.o_custkey == customer.c_custkey,
                        "left_anti").count()),
        row("customer_nation_valid",
            customer.join(nation,
                          customer.c_nationkey == nation.n_nationkey,
                          "left_anti").count()),
    ]
    return spark.createDataFrame(
        rows, "rule string, n_violations long, passed boolean")


_OLS_MOMENTS = """
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(y  AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,0))) AS DOUBLE) AS s11,
         CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS s12,
         CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS s22,
         CAST(SUM(CAST(x1 * y AS DECIMAL(38,0))) AS DOUBLE) AS s1y,
         CAST(SUM(CAST(x2 * y AS DECIMAL(38,0))) AS DOUBLE) AS s2y,
         CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
"""


@register("ml_ols_2var", f"""
WITH feats AS (
  SELECT o.o_orderkey,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS x1,
         CAST(SUM(CAST(round(l.l_discount * 100)
                       AS BIGINT)) AS BIGINT) AS x2,
         CAST(MAX(CAST(round(o.o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS y
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey
),
m AS ({{_OLS_MOMENTS}} FROM feats),
solved AS (
  SELECT n, sy, syy,
         (n * (s11 * s22 - s12 * s12)
          - s1 * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s12 - s11 * s2)) AS det,
         (sy * (s11 * s22 - s12 * s12)
          - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y)) AS det0,
         (n * (s1y * s22 - s12 * s2y)
          - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2)) AS det1,
         (n * (s11 * s2y - s1y * s12)
          - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2)) AS det2,
         s1, s2, s1y, s2y
  FROM m
)
SELECT n,
       ROUND(det0 / det, 6) AS b0,
       ROUND(det1 / det, 6) AS b1,
       ROUND(det2 / det, 6) AS b2,
       ROUND(1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
                    - (det2 / det) * s2y)
             / (syy - sy * sy / n), 8) AS r2
FROM solved
""".replace("{_OLS_MOMENTS}", _OLS_MOMENTS))
def ml_ols_2var(spark, sf):
    """Two-feature OLS by exact normal equations: order price (cents)
    regressed on (total quantity, total discount cents), solved in
    closed form with Cramer's rule -- every moment is an EXACT integer
    (quantities, cents) summed through decimal(38,0), so the 3x3
    solve sees bit-identical inputs on any engine and partitioning;
    no iterative solver, constant post-aggregate work.  The
    multivariate upgrade of agg_trend_slope."""
    orders = read_table(spark, sf, "orders")
    lineitem = read_table(spark, sf, "lineitem")
    feats = (orders.join(lineitem,
                         orders.o_orderkey == lineitem.l_orderkey)
             .groupBy(orders.o_orderkey)
             .agg(F.sum(F.col("l_quantity").cast("bigint"))
                  .cast("bigint").alias("x1"),
                  F.sum(F.round(F.col("l_discount") * 100)
                        .cast("bigint")).cast("bigint").alias("x2"),
                  F.max(F.round(F.col("o_totalprice") * 100)
                        .cast("bigint")).cast("bigint").alias("y")))
    d0 = lambda e: F.sum(e.cast("decimal(38,0)")).cast("double")
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    m = feats.agg(
        F.count(F.lit(1)).alias("n"),
        d0(x1).alias("s1"), d0(x2).alias("s2"), d0(y).alias("sy"),
        d0(x1 * x1).alias("s11"), d0(x1 * x2).alias("s12"),
        d0(x2 * x2).alias("s22"), d0(x1 * y).alias("s1y"),
        d0(x2 * y).alias("s2y"), d0(y * y).alias("syy"))
    n, s1, s2, sy = (F.col("n").cast("double"), F.col("s1"),
                     F.col("s2"), F.col("sy"))
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    s1y, s2y, syy = F.col("s1y"), F.col("s2y"), F.col("syy")
    det = (n * (s11 * s22 - s12 * s12)
           - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    det0 = (sy * (s11 * s22 - s12 * s12)
            - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y))
    det1 = (n * (s1y * s22 - s12 * s2y)
            - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2))
    det2 = (n * (s11 * s2y - s1y * s12)
            - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2))
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    r2 = (F.lit(1.0) - (syy - b0 * sy - b1 * s1y - b2 * s2y)
          / (syy - sy * sy / n))
    return m.select(F.col("n"),
                    F.round(b0, 6).alias("b0"),
                    F.round(b1, 6).alias("b1"),
                    F.round(b2, 6).alias("b2"),
                    F.round(r2, 8).alias("r2"))


@register("agg_cramers_v", """
WITH obs AS (
  SELECT cu.c_nationkey AS r, o.o_orderpriority AS c,
         COUNT(*) AS n_rc
  FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
marg AS (
  SELECT o.r, o.c, o.n_rc,
         rm.n_r, cm.n_c, t.n
  FROM obs o
  JOIN (SELECT r, SUM(n_rc) AS n_r FROM obs GROUP BY 1) rm
    ON rm.r = o.r
  JOIN (SELECT c, SUM(n_rc) AS n_c FROM obs GROUP BY 1) cm
    ON cm.c = o.c
  CROSS JOIN (SELECT SUM(n_rc) AS n FROM obs) t
),
chi AS (
  SELECT CAST(SUM(CAST(
           (n_rc - CAST(n_r * n_c AS DOUBLE) / n)
           * (n_rc - CAST(n_r * n_c AS DOUBLE) / n)
           / (CAST(n_r * n_c AS DOUBLE) / n)
           AS DECIMAL(27,12))) AS DOUBLE) AS chi2,
         CAST(MAX(n) AS BIGINT) AS n,
         COUNT(DISTINCT r) AS nr, COUNT(DISTINCT c) AS nc
  FROM marg
)
SELECT n, nr AS n_rows_cat, nc AS n_cols_cat,
       ROUND(chi2, 8) AS chi2,
       ROUND(sqrt(chi2 / (n * LEAST(nr - 1, nc - 1))), 8)
         AS cramers_v
FROM chi
""")
def agg_cramers_v(spark, sf):
    """Cramer's V association between customer nation and order
    priority: chi-square over the contingency grid (exact integer
    observed/marginal counts, decimal-exact cell sum) normalized to
    [0, 1] -- the categorical-categorical dependence test next to
    corr (numeric) and entropy (spread).  Grid-sized work after one
    fact aggregate."""
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    obs = (orders.join(F.broadcast(
        customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("r"),
                 F.col("o_orderpriority").alias("c"))
        .agg(F.count(F.lit(1)).alias("n_rc"))
        .localCheckpoint())
    rm = obs.groupBy("r").agg(F.sum("n_rc").alias("n_r"))
    cm = obs.groupBy("c").agg(F.sum("n_rc").alias("n_c"))
    t = obs.agg(F.sum("n_rc").alias("n"))
    exp = (F.col("n_r") * F.col("n_c")).cast("double") / F.col("n")
    cell = ((F.col("n_rc") - exp) * (F.col("n_rc") - exp) / exp)
    chi = (obs.join(F.broadcast(rm), "r").join(F.broadcast(cm), "c")
           .crossJoin(F.broadcast(t))
           .agg(F.sum(cell.cast("decimal(27,12)")).cast("double")
                .alias("chi2"),
                F.max("n").alias("n"),
                F.countDistinct("r").alias("nr"),
                F.countDistinct("c").alias("nc")))
    return chi.select(
        "n", F.col("nr").alias("n_rows_cat"),
        F.col("nc").alias("n_cols_cat"),
        F.round("chi2", 8).alias("chi2"),
        F.round(F.sqrt(F.col("chi2")
                       / (F.col("n")
                          * F.least(F.col("nr") - 1,
                                    F.col("nc") - 1))), 8)
        .alias("cramers_v"))


@register("agg_theil", """
WITH spend AS (
  SELECT c.c_nationkey AS nation,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
           AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, c.c_nationkey
),
g AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS tot
  FROM spend
),
total AS (
  SELECT CAST(SUM(CAST((x / (g.tot / g.n))
                       * ln(x / (g.tot / g.n))
                       AS DECIMAL(27,12))) AS DOUBLE) / MAX(g.n)
           AS t_total
  FROM spend, g
),
nat AS (
  SELECT nation, COUNT(*) AS n_k,
         CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS tot_k
  FROM spend GROUP BY 1
),
between_t AS (
  SELECT CAST(SUM(CAST(
           (CAST(nat.n_k AS DOUBLE) / g.n)
           * ((nat.tot_k / nat.n_k) / (g.tot / g.n))
           * ln((nat.tot_k / nat.n_k) / (g.tot / g.n))
           AS DECIMAL(27,12))) AS DOUBLE) AS t_between
  FROM nat, g
)
SELECT (SELECT MAX(n) FROM g) AS n_customers,
       ROUND((SELECT t_total FROM total), 8) AS theil_total,
       ROUND((SELECT t_between FROM between_t), 8) AS theil_between,
       ROUND((SELECT t_total FROM total)
             - (SELECT t_between FROM between_t), 8) AS theil_within
FROM (SELECT 1)
""")
def agg_theil(spark, sf):
    """Theil-T inequality index of customer spend with its
    between/within-nation DECOMPOSITION (the property Gini lacks:
    total = between-group + within-group exactly) -- how much spend
    inequality is across countries vs inside them, straight from the
    Factbook's economics theme.  Decimal-exact x ln x sums; group
    tables are dimension-sized."""
    from .operators.relational import dsum
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    spend = (orders.join(F.broadcast(
        customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_custkey", F.col("c_nationkey").alias("nation"))
        .agg(dsum(F.col("o_totalprice")).alias("x"))
        .localCheckpoint())
    g = spend.agg(F.count(F.lit(1)).alias("n"),
                  dsum(F.col("x")).alias("tot")).first()
    n, tot = g["n"], g["tot"]
    mu = tot / n
    t_total = (spend.agg(
        (F.sum(((F.col("x") / mu) * F.log(F.col("x") / mu))
               .cast("decimal(27,12)")).cast("double") / n)
        .alias("t")).first()["t"])
    nat = (spend.groupBy("nation")
           .agg(F.count(F.lit(1)).alias("n_k"),
                dsum(F.col("x")).alias("tot_k")))
    mu_k = F.col("tot_k") / F.col("n_k")
    t_between = (nat.agg(F.sum(
        ((F.col("n_k").cast("double") / n) * (mu_k / mu)
         * F.log(mu_k / mu)).cast("decimal(27,12)"))
        .cast("double").alias("t")).first()["t"])
    return spark.createDataFrame(
        [(n, round(t_total, 8), round(t_between, 8),
          round(t_total - t_between, 8))],
        "n_customers long, theil_total double, theil_between double, "
        "theil_within double")


@register("agg_eta_squared", """
WITH x AS (
  SELECT cu.c_nationkey AS grp, CAST(o.o_totalprice AS DOUBLE) AS v
  FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
),
g AS (
  SELECT grp, COUNT(*) AS n_g,
         CAST(SUM(CAST(v AS DECIMAL(27,4))) AS DOUBLE) AS s_g
  FROM x GROUP BY 1
),
tot AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(v AS DECIMAL(27,4))) AS DOUBLE) AS s,
         CAST(SUM(CAST(v AS DECIMAL(27,4))
                  * CAST(v AS DECIMAL(27,4))) AS DOUBLE) AS ss
  FROM x
),
parts AS (
  SELECT (SELECT ss - s * s / n FROM tot) AS sst,
         (SELECT CAST(SUM(CAST(s_g * s_g / n_g AS DECIMAL(27,6)))
                 AS DOUBLE) FROM g)
         - (SELECT s * s / n FROM tot) AS ssb,
         (SELECT COUNT(*) FROM g) AS k,
         (SELECT n FROM tot) AS n
)
SELECT n, k AS n_groups,
       ROUND(ssb / sst, 8) AS eta_squared,
       ROUND((ssb / (k - 1)) / ((sst - ssb) / (n - k)), 8)
         AS f_statistic
FROM parts
""")
def agg_eta_squared(spark, sf):
    """One-way ANOVA effect size: how much of order-price variance the
    customer's nation explains (eta^2 = between-group / total sum of
    squares) with the F statistic -- the does-this-dimension-matter
    test behind feature triage.  All sums decimal-exact; group table
    is dimension-sized."""
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    x = (orders.join(F.broadcast(
        customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"))
        .select(F.col("c_nationkey").alias("grp"),
                F.col("o_totalprice").cast("double").alias("v"))
        .localCheckpoint())
    dv = F.col("v").cast("decimal(27,4)")
    tot = x.agg(F.count(F.lit(1)).alias("n"),
                F.sum(dv).cast("double").alias("s"),
                F.sum(dv * dv).cast("double").alias("ss")).first()
    n, s, ss = tot["n"], tot["s"], tot["ss"]
    sst = ss - s * s / n
    g = (x.groupBy("grp")
         .agg(F.count(F.lit(1)).alias("n_g"),
              F.sum(dv).cast("double").alias("s_g")))
    ssb_row = g.agg(F.sum((F.col("s_g") * F.col("s_g")
                           / F.col("n_g")).cast("decimal(27,6)"))
                    .cast("double").alias("b"),
                    F.count(F.lit(1)).alias("k")).first()
    ssb = ssb_row["b"] - s * s / n
    k = ssb_row["k"]
    return spark.createDataFrame(
        [(n, k, round(ssb / sst, 8),
          round((ssb / (k - 1)) / ((sst - ssb) / (n - k)), 8))],
        "n long, n_groups long, eta_squared double, f_statistic double")


@register("dq_sequence_gaps", """
WITH seq AS (
  SELECT event_id,
         LAG(event_id) OVER (ORDER BY event_id) AS prev_id
  FROM events
)
SELECT COUNT(*) + 1 AS n_ids,
       MIN(prev_id) IS NOT NULL AS has_rows,
       CAST(SUM(event_id - prev_id - 1) AS BIGINT) AS n_missing,
       CAST(MAX(event_id - prev_id - 1) AS BIGINT) AS largest_gap,
       COUNT(CASE WHEN event_id - prev_id > 1 THEN 1 END) AS n_gaps
FROM seq WHERE prev_id IS NOT NULL
""")
def dq_sequence_gaps(spark, sf):
    """Sequence-continuity audit: missing ids in the event_id ledger
    (total missing, gap count, largest hole) -- the completeness check
    for anything that should be gap-free (ledgers, offsets, invoice
    numbers).  One ordered lag window; at 100 TB partition the
    sequence into ranges and lag within ranges + one boundary pass --
    same counts."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    seq = ev.select("event_id",
                    F.lag("event_id").over(W.orderBy("event_id"))
                    .alias("prev_id"))
    d = F.col("event_id") - F.col("prev_id") - 1
    return (seq.where(F.col("prev_id").isNotNull())
            .agg((F.count(F.lit(1)) + 1).alias("n_ids"),
                 (F.min("prev_id").isNotNull()).alias("has_rows"),
                 F.sum(d).cast("long").alias("n_missing"),
                 F.max(d).cast("long").alias("largest_gap"),
                 F.count(F.when(d > 0, 1)).alias("n_gaps")))


@register("rfm_segments", """
WITH base AS (
  SELECT user_id,
         MAX(CAST(ts AS TIMESTAMP)) AS last_ts,
         COUNT(*) AS freq,
         CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS monetary
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
),
scored AS (
  SELECT user_id,
         NTILE(5) OVER (ORDER BY last_ts, user_id) AS r,
         NTILE(5) OVER (ORDER BY freq, user_id) AS f,
         NTILE(5) OVER (ORDER BY monetary, user_id) AS m
  FROM base
)
SELECT r AS r_score, f AS f_score, m AS m_score,
       COUNT(*) AS n_users,
       r * 100 + f * 10 + m AS rfm_code
FROM scored GROUP BY r, f, m
""")
def rfm_segments(spark, sf):
    """RFM segmentation: purchase recency / frequency / monetary
    quintiles per user, aggregated to segment cells -- the classic
    customer-value grid (555 = best).  NTILE over deterministic total
    orders; the per-user pass is one grouped aggregate, the grid is
    125 cells at any scale."""
    from pyspark.sql import Window as W
    from .operators.relational import dsum
    ev = read_table(spark, sf, "events")
    base = (ev.where(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.max(F.col("ts").cast("timestamp")).alias("last_ts"),
                 F.count(F.lit(1)).alias("freq"),
                 dsum(F.col("value")).alias("monetary")))
    scored = base.select(
        "user_id",
        F.ntile(5).over(W.orderBy("last_ts", "user_id")).alias("r"),
        F.ntile(5).over(W.orderBy("freq", "user_id")).alias("f"),
        F.ntile(5).over(W.orderBy("monetary", "user_id")).alias("m"))
    return (scored.groupBy(F.col("r").alias("r_score"),
                           F.col("f").alias("f_score"),
                           F.col("m").alias("m_score"))
            .agg(F.count(F.lit(1)).alias("n_users"))
            .select("r_score", "f_score", "m_score", "n_users",
                    (F.col("r_score") * 100 + F.col("f_score") * 10
                     + F.col("m_score")).alias("rfm_code")))


@register("anomaly_tukey", """
WITH q AS (
  SELECT event_type,
         quantile_cont(CAST(value AS DOUBLE), 0.25) AS q1,
         quantile_cont(CAST(value AS DOUBLE), 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_type, COUNT(*) AS n,
       ROUND(q.q1, 6) AS q1, ROUND(q.q3, 6) AS q3,
       COUNT(CASE WHEN CAST(e.value AS DOUBLE)
                       < q.q1 - 1.5 * (q.q3 - q.q1)
                    OR CAST(e.value AS DOUBLE)
                       > q.q3 + 1.5 * (q.q3 - q.q1)
                  THEN 1 END) AS n_outliers,
       COUNT(CASE WHEN CAST(e.value AS DOUBLE)
                       < q.q1 - 3.0 * (q.q3 - q.q1)
                    OR CAST(e.value AS DOUBLE)
                       > q.q3 + 3.0 * (q.q3 - q.q1)
                  THEN 1 END) AS n_far_outliers
FROM events e JOIN q ON q.event_type = e.event_type
GROUP BY e.event_type, q.q1, q.q3
""")
def anomaly_tukey(spark, sf):
    """Tukey-fence (boxplot) outlier audit per metric: counts beyond
    1.5x and 3x IQR -- the third member of the outlier family
    (z-score: parametric; MAD: robust center; Tukey: quartile
    fences).  Exact interpolated quartiles broadcast back over one
    scan."""
    ev = read_table(spark, sf, "events")
    v = F.col("value").cast("double")
    q = (ev.groupBy("event_type")
         .agg(F.percentile(v, F.lit(0.25)).alias("q1"),
              F.percentile(v, F.lit(0.75)).alias("q3")))
    iqr = F.col("q3") - F.col("q1")
    out = ((v < F.col("q1") - 1.5 * iqr)
           | (v > F.col("q3") + 1.5 * iqr))
    far = ((v < F.col("q1") - 3.0 * iqr)
           | (v > F.col("q3") + 3.0 * iqr))
    return (ev.join(F.broadcast(q), "event_type")
            .groupBy("event_type", "q1", "q3")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count(F.when(out, 1)).alias("n_outliers"),
                 F.count(F.when(far, 1)).alias("n_far_outliers"))
            .select("event_type", "n",
                    F.round("q1", 6).alias("q1"),
                    F.round("q3", 6).alias("q3"),
                    "n_outliers", "n_far_outliers"))


@register("agg_chi2_uniform_dow", """
WITH c AS (
  SELECT CAST(EXTRACT(dow FROM CAST(ts AS TIMESTAMP)) AS INTEGER)
           AS dow,
         COUNT(*) AS n
  FROM events GROUP BY 1
),
t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot, COUNT(*) AS k FROM c)
SELECT (SELECT k FROM t) AS n_buckets,
       ROUND(CAST(SUM(CAST(
         (n - (SELECT tot FROM t) / (SELECT k FROM t))
         * (n - (SELECT tot FROM t) / (SELECT k FROM t))
         / ((SELECT tot FROM t) / (SELECT k FROM t))
         AS DECIMAL(27,12))) AS DOUBLE), 8) AS chi2,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM c
""")
def agg_chi2_uniform_dow(spark, sf):
    """Chi-square goodness-of-fit of event volume against a UNIFORM
    day-of-week profile: the is-there-weekly-structure test that
    decides whether ts_seasonal_index-style adjustment is even needed
    (chi2 >> df = yes).  Exact integer counts, decimal-exact cell
    sum."""
    ev = read_table(spark, sf, "events")
    dow = (F.dayofweek(F.col("ts").cast("timestamp")) - 1).cast("int")
    c = (ev.groupBy(dow.alias("dow"))
         .agg(F.count(F.lit(1)).alias("n")).localCheckpoint())
    t = c.agg(F.sum("n").cast("double").alias("tot"),
              F.count(F.lit(1)).alias("k")).first()
    exp = t["tot"] / t["k"]
    cell = (F.col("n") - exp) * (F.col("n") - exp) / exp
    out = c.agg(F.sum(cell.cast("decimal(27,12)")).cast("double")
                .alias("chi2"),
                F.sum("n").cast("long").alias("n_events")).first()
    return spark.createDataFrame(
        [(t["k"], round(out["chi2"], 8), out["n_events"])],
        "n_buckets long, chi2 double, n_events long")


@register("ml_calibration", """
WITH s AS (
  SELECT GREATEST(0.0, LEAST(1.0,
           0.5 + CAST(embedding[1] AS DOUBLE))) AS score,
         CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
  FROM embeddings
),
b AS (
  SELECT LEAST(CAST(FLOOR(score * 10.0) AS INT), 9) AS bin, score, y
  FROM s
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(score AS DECIMAL(27,12))) AS DOUBLE)
             / COUNT(*), 8) AS avg_score,
       CAST(SUM(y) AS DOUBLE) / COUNT(*) AS pos_rate,
       ROUND(ABS(CAST(SUM(CAST(score AS DECIMAL(27,12))) AS DOUBLE)
                   / COUNT(*)
                 - CAST(SUM(y) AS DOUBLE) / COUNT(*)), 8) AS gap
FROM b GROUP BY bin
""")
def ml_calibration(spark, sf):
    """Calibration (reliability) table for a probabilistic scorer:
    bin predicted scores into 10 equal-width bins and compare each
    bin's mean score to its empirical positive rate -- the per-bin
    |confidence - accuracy| gaps are the terms of Expected
    Calibration Error.  Score = the first embedding component mapped
    affinely into [0, 1] (no transcendentals -- the clamp and shift
    are IEEE-exact on both engines); positive class = label < 5.
    Completes the classifier-evaluation family next to ml_auc and
    ml_gains_table.

    Scale shape: one partial-agg groupBy on a 10-value key; the
    decimal score sum keeps avg_score engine-exact at any row
    count."""
    emb = read_table(spark, sf, "embeddings")
    score = F.greatest(
        F.lit(0.0),
        F.least(F.lit(1.0),
                F.lit(0.5) + F.col("embedding").getItem(0).cast("double")))
    s = emb.select(score.alias("score"),
                   F.when(F.col("label") < 5, 1).otherwise(0).alias("y"))
    b = s.select(F.least(F.floor(F.col("score") * 10.0).cast("int"),
                         F.lit(9)).alias("bin"),
                 "score", "y")
    avg = (F.sum(F.col("score").cast("decimal(27,12)")).cast("double")
           / F.count(F.lit(1)))
    pos = F.sum("y").cast("double") / F.count(F.lit(1))
    return (b.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(avg, 8).alias("avg_score"),
                 pos.alias("pos_rate"),
                 F.round(F.abs(avg - pos), 8).alias("gap")))


@register("funnel_time_to_convert", """
WITH v AS (
  SELECT user_id,
         MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id,
         MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t_purchase
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(CAST(e.ts AS TIMESTAMP)) > v.t_view
  GROUP BY e.user_id
),
d AS (
  SELECT p.user_id, (p.t_purchase - v.t_view) // 1000000 AS delta_s
  FROM p JOIN v ON v.user_id = p.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(MIN(delta_s) AS BIGINT) AS min_s,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY delta_s)
            AS BIGINT) AS p50_s,
       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY delta_s)
            AS BIGINT) AS p90_s,
       CAST(MAX(delta_s) AS BIGINT) AS max_s
FROM d
""")
def funnel_time_to_convert(spark, sf):
    """Time-to-convert distribution: for users whose first purchase
    follows their first view, the latency between the two as exact
    integer seconds, summarized by discrete percentiles (p50/p90 are
    ACTUAL observed latencies -- PERCENTILE_DISC, no interpolation,
    so the statistic is engine-exact).  The duration companion to
    funnel_conversion's count funnel: counts say HOW MANY convert,
    this says HOW FAST.

    Scale shape: two (user, min-ts) partial aggregates + one
    user-keyed join; the percentile runs over the converted-users
    table (user-sized, one sort)."""
    ev = read_table(spark, sf, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    v = (ev.where(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min(us).alias("t_view")))
    p = (ev.where(F.col("event_type") == "purchase")
         .join(v, "user_id")
         .where(us > F.col("t_view"))
         .groupBy("user_id").agg(F.min(us).alias("t_purchase")))
    d = (p.join(v, "user_id")
         .select(F.expr("(t_purchase - t_view) DIV 1000000")
                 .alias("delta_s")))
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.min("delta_s").cast("long").alias("min_s"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY delta_s)")
        .cast("long").alias("p50_s"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY delta_s)")
        .cast("long").alias("p90_s"),
        F.max("delta_s").cast("long").alias("max_s"))
