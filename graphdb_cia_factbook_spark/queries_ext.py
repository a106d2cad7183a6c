"""EXT operator queries (SURVEY.md §2.3/2.4 EXT rows): as-of join,
range join, join-strategy hints, salted skew join, approximate
sketches.  The reference has none of these; at 100 TB they are the
difference between a join that finishes and one that doesn't.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.relational import (
    asof_join,
    range_join,
    salted_join,
)
from .registry import register
from .sources import read_table

# deterministic dedup of the right side at equal (user_id, ts):
# greatest event_id wins -- mirrored in asof_join(payload_cols order)
_ASOF_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC, value DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts, c.value,
       p.event_id AS asof_event_id, p.value AS asof_value
FROM clicks c
ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND p.ts <= c.ts
"""


@register("j_asof_prior_purchase", _ASOF_ORACLE)
def j_asof_prior_purchase(spark, sf):
    """EXT as-of join: every click gets the user's latest purchase at
    or before it (union-trick plan: ONE shuffle on user_id, linear
    window scan -- no per-row range probe)."""
    ev = read_table(spark, sf, "events")
    clicks = (ev.where(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts", "value"))
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id", "value"))
    return asof_join(clicks, purchases, "user_id", "ts",
                     ["event_id", "value"])


_BANDS = [("low", 0.0, 10.0), ("mid", 10.0, 100.0),
          ("high", 100.0, 1e9)]
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@register("j_range_value_bands", f"""
SELECT e.event_id, e.value, b.band
FROM events e
LEFT JOIN (VALUES {_BANDS_SQL}) b(band, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
""")
def j_range_value_bands(spark, sf):
    """EXT range join: classify event values against a band dimension
    (broadcast nested-loop on the non-equi predicate; the fact side
    never shuffles)."""
    ev = read_table(spark, sf, "events")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (range_join(ev, bands, "value")
            .select("event_id", "value", "band"))


@register("j_salted_hot_key", """
SELECT e.event_id, e.event_type, t.weight
FROM events e
JOIN (VALUES ('click', 1.0), ('view', 0.1), ('purchase', 10.0),
             ('signup', 5.0), ('error', 0.0)) t(event_type, weight)
  ON e.event_type = t.event_type
""")
def j_salted_hot_key(spark, sf):
    """EXT skew join: events.event_type has 5 values covering ALL rows
    (maximal hot-key skew); the salted join splits each key into 8
    sub-keys so no single reducer owns a whole key.  Row-identical to
    the plain join the oracle runs."""
    ev = read_table(spark, sf, "events")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double")
    return (salted_join(ev, dim, "event_type", salt=8)
            .select("event_id", "event_type", "weight"))


@register("j_merge_hint", """
SELECT o_orderkey, o_totalprice, c_name
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""")
def j_merge_hint(spark, sf):
    """EXT physical-join control: force sort-merge (the strategy for
    two huge, similarly-sized inputs where broadcast is impossible)."""
    orders = read_table(spark, sf, "orders")
    cust = read_table(spark, sf, "customer").hint("merge")
    return (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_totalprice", "c_name"))


@register("j_shuffle_hash_hint", """
SELECT o_orderkey, o_totalprice, c_name
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""")
def j_shuffle_hash_hint(spark, sf):
    """EXT physical-join control: force shuffled-hash (no sort; wins
    when one side is much smaller per-partition but too big to
    broadcast)."""
    orders = read_table(spark, sf, "orders")
    cust = read_table(spark, sf, "customer").hint("shuffle_hash")
    return (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_totalprice", "c_name"))


@register("agg_approx_sketches")  # rows-only: HLL/KLL internals are
# engine-specific by design; the pytest suite bounds the error vs exact
def agg_approx_sketches(spark, sf):
    """EXT sketches: approx_count_distinct (HyperLogLog++) and
    approx_percentile (KLL-style) -- the sub-linear-memory versions of
    COUNT(DISTINCT)/median that a 100-TB profile job actually runs."""
    orders = read_table(spark, sf, "orders")
    return (orders.groupBy("o_orderstatus")
            .agg(F.approx_count_distinct("o_custkey").alias("approx_custs"),
                 F.percentile_approx("o_totalprice", 0.5)
                 .alias("approx_median_price"),
                 F.count(F.lit(1)).alias("n")))


@register("s1_from_records", """
SELECT r.r_regionkey, r.r_name, m.hemisphere
FROM region r
LEFT JOIN (VALUES (0, 'south'), (1, 'north'), (2, 'east'),
                  (3, 'west'), (4, 'mixed')) m(r_regionkey, hemisphere)
  ON r.r_regionkey = m.r_regionkey
""")
def s1_from_records(spark, sf):
    """S1: driver-side records -> DataFrame with explicit schema (the
    scrape stage's list-of-dicts boundary, scrape_cia.py:47-64),
    broadcast-joined as a dimension.  At 100 TB the records side
    becomes spark.read over a crawl dump; the boundary is the same."""
    from pyspark.sql import types as T

    from .sources import from_records
    schema = T.StructType([T.StructField("r_regionkey", T.IntegerType()),
                           T.StructField("hemisphere", T.StringType())])
    recs = [{"r_regionkey": i, "hemisphere": h}
            for i, h in enumerate(["south", "north", "east", "west",
                                   "mixed"])]
    dim = from_records(spark, recs, schema)
    region = read_table(spark, sf, "region")
    return (region.join(F.broadcast(dim), "r_regionkey", "left")
            .select("r_regionkey", "r_name", "hemisphere"))
