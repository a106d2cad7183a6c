"""EXT operator queries (SURVEY.md §2.3/2.4 EXT rows): as-of join,
range join, join-strategy hints, salted skew join, approximate
sketches.  The reference has none of these; at 100 TB they are the
difference between a join that finishes and one that doesn't.
"""

from __future__ import annotations

import os

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


@register("agg_approx_sketches", """
SELECT o_orderstatus,
       COUNT(*) AS n,
       COUNT(DISTINCT o_custkey) AS n_custs_exact,
       abs(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
         <= 0.05 * COUNT(DISTINCT o_custkey) AS acd_within_5pct,
       approx_quantile(o_totalprice, 0.5)
         BETWEEN quantile_cont(o_totalprice, 0.45)
             AND quantile_cont(o_totalprice, 0.55) AS median_in_p45_p55
FROM orders GROUP BY o_orderstatus
""")
def agg_approx_sketches(spark, sf):
    """EXT sketches: approx_count_distinct (HyperLogLog++) and
    approx_percentile (KLL-style) -- the sub-linear-memory versions of
    COUNT(DISTINCT)/median that a 100-TB profile job actually runs.

    Sketch internals are engine-specific, so the cross-engine contract
    is the BOUND, not the estimate: each engine checks its own sketch
    against its own exact answer (HLL estimate within 5% of the exact
    distinct count; approx median inside the exact p45..p55 band) and
    emits booleans plus the exact values -- hash-comparable across
    engines.  The pytest suite additionally bounds Spark's raw
    estimates vs exact."""
    orders = read_table(spark, sf, "orders")
    return (orders.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("o_custkey").alias("n_custs_exact"),
                 F.approx_count_distinct("o_custkey", 0.01).alias("__acd"),
                 F.percentile_approx("o_totalprice", 0.5).alias("__amed"),
                 F.expr("percentile(o_totalprice, 0.45)").alias("__p45"),
                 F.expr("percentile(o_totalprice, 0.55)").alias("__p55"))
            .select("o_orderstatus", "n", "n_custs_exact",
                    (F.abs(F.col("__acd") - F.col("n_custs_exact"))
                     <= 0.05 * F.col("n_custs_exact"))
                    .alias("acd_within_5pct"),
                    F.col("__amed").between(F.col("__p45"), F.col("__p55"))
                    .alias("median_in_p45_p55")))


#: deterministic synthesized crawl dump for the S1 scale path -- the
#: spark.read.text analog of scrape_cia.py:42-62 (one record per line,
#: country|raw-amount-text).  The path is derived from this file's
#: location (repo root / spark-warehouse), never hardcoded to a
#: checkout directory, and the blob is written LAZILY on the query's
#: first run (registration has no filesystem side effect).  The
#: Spark builder always runs before the oracle in the gate, so the
#: file exists by the time DuckDB's read_text needs it.
_CRAWL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", "s1_crawl_blob.txt")


def _ensure_crawl_blob() -> None:
    import os
    lines = []
    for i in range(400):
        country = f"COUNTRY_{i % 40:02d}"
        if i % 7 == 0:
            raw = "NA"
        elif i % 11 == 0:
            raw = f"$1,{i % 10}23,000,000 ({1990 + i % 30} est.)"
        else:
            unit = [" million", " billion", " trillion", ""][i % 4]
            raw = f"${i * 3 % 997}{unit} ({1990 + i % 30} est.)"
        lines.append(f"{country}|{raw}")
    content = "\n".join(lines) + "\n"
    os.makedirs(os.path.dirname(_CRAWL_PATH), exist_ok=True)
    try:
        with open(_CRAWL_PATH) as fh:
            if fh.read() == content:
                return
    except OSError:
        pass
    with open(_CRAWL_PATH, "w") as fh:
        fh.write(content)


@register("s1_text_crawl", f"""
WITH lines AS (
  SELECT unnest(string_split(rtrim(content, chr(10)), chr(10))) AS line
  FROM read_text('{_CRAWL_PATH}')
),
parsed AS (
  SELECT string_split(line, '|')[1] AS country,
         string_split(line, '|')[2] AS raw
  FROM lines
)
SELECT country, raw,
       CASE WHEN regexp_matches(raw, '^\\$\\d+') THEN
         CAST(replace(string_split(ltrim(raw, '$'), ' ')[1], ',', '')
              AS DOUBLE)
         * CASE string_split(ltrim(raw, '$') || ' ', ' ')[2]
             WHEN 'million' THEN 1e6 WHEN 'billion' THEN 1e9
             WHEN 'trillion' THEN 1e12 ELSE 1.0 END
       END AS amount,
       CASE WHEN regexp_matches(substr(string_split(raw, ' (')[-1], 1, 4),
                                '^\\d{{4}}$')
            THEN substr(string_split(raw, ' (')[-1], 1, 4) END AS year_str
FROM parsed
""")
def s1_text_crawl(spark, sf):
    """S1 at crawl scale: ``spark.read.text`` over a raw-text dump
    (one scraped record per line), parsed with the SAME F1/F2 column
    expressions the fixture path uses (scrape_cia.py:42-74 analog).
    This is the 100-TB shape of the scrape stage: the driver never
    touches records; executors scan text splits and every parse is
    whole-stage codegen (no UDF)."""
    from .functions import extract_year, parse_currency
    _ensure_crawl_blob()
    raw = spark.read.text(_CRAWL_PATH)
    return (raw
            .select(F.split_part(F.col("value"), F.lit("|"), F.lit(1))
                    .alias("country"),
                    F.split_part(F.col("value"), F.lit("|"), F.lit(2))
                    .alias("raw"))
            .select("country", "raw",
                    parse_currency(F.col("raw")).alias("amount"),
                    extract_year(F.col("raw")).alias("year_str")))


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


@register("scd2_user_history", """
SELECT user_id, event_type, event_id,
       CAST(ts AS TIMESTAMP) AS valid_from,
       LEAD(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
       LEAD(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def scd2_user_history(spark, sf):
    """SCD type-2 dimension history from the event change stream:
    every per-user event opens a validity interval closed by the next
    one -- one window over key-partitioned data, no joins (the
    time-travel generalization of the reference's latest-wins A1
    dedup)."""
    from .operators.relational import scd2_intervals
    ev = read_table(spark, sf, "events")
    return (scd2_intervals(ev, "user_id", ["event_type"], "ts",
                           tiebreak_col="event_id")
            .select("user_id", "event_type", "event_id",
                    "valid_from", "valid_to", "is_current"))


@register("mv_incremental_refresh", """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
         AS total_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
         / COUNT(*) AS avg_price
FROM orders
GROUP BY o_custkey
""")
def mv_incremental_refresh(spark, sf):
    """Incremental materialized-view maintenance: the per-customer
    order summary is built as mergeable state from a 'history' slice
    (orders before 1999) and refreshed with the 'new arrivals' delta
    (1999 onward) -- and the oracle computes the view from scratch
    over ALL orders.  The hash-match IS the proof that incremental
    refresh == full recompute, which only holds because the persisted
    state sums are exact decimals (associative in any batch order).
    At 100 TB this is the difference between folding a daily delta
    into a key-sized summary and rescanning years of history."""
    from .operators.relational import aggregate_state, merge_aggregate_state
    orders = read_table(spark, sf, "orders")
    cutoff = F.lit("1999-01-01").cast("timestamp")
    hist = aggregate_state(orders.where(F.col("o_orderdate") < cutoff),
                           ["o_custkey"], ["o_totalprice"])
    delta = aggregate_state(orders.where(F.col("o_orderdate") >= cutoff),
                            ["o_custkey"], ["o_totalprice"])
    merged = merge_aggregate_state(["o_custkey"], hist, delta)
    return merged.select(
        "o_custkey", F.col("n_rows").alias("n_orders"),
        F.col("sum_o_totalprice").cast("double").alias("total_price"),
        (F.col("sum_o_totalprice").cast("double") / F.col("n_rows"))
        .alias("avg_price"))


_JSONL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", "s1_records.jsonl")


def _ensure_jsonl_blob() -> None:
    """Synthesize a deterministic JSONL feed (the API-export format
    next to the crawl blob): 200 records with nested-ish fields."""
    import json as _json
    recs = []
    for i in range(200):
        recs.append(_json.dumps(
            {"rec_id": i, "country": f"COUNTRY_{i % 40:02d}",
             "amount": (i * 37) % 1000,
             "tag": "export" if i % 2 == 0 else "import"},
            sort_keys=True))
    content = "\n".join(recs) + "\n"
    os.makedirs(os.path.dirname(_JSONL_PATH), exist_ok=True)
    try:
        with open(_JSONL_PATH) as fh:
            if fh.read() == content:
                return
    except OSError:
        pass
    with open(_JSONL_PATH, "w") as fh:
        fh.write(content)


@register("s1_jsonl_source", f"""
SELECT country, tag,
       COUNT(*) AS n_records,
       CAST(SUM(amount) AS BIGINT) AS total_amount
FROM read_json_auto('{_JSONL_PATH}')
GROUP BY 1, 2
""")
def s1_jsonl_source(spark, sf):
    """JSONL (API-export) source: schema-DECLARED json lines read +
    aggregate -- the semi-structured sibling of s1_text_crawl
    (S1 family: ingest surfaces beyond parquet/CSV).  The Spark read
    pins an explicit schema (never inference on 100 TB -- one pass
    saved and no drift surprises); the file is a deterministic
    synthesized feed generated at query time."""
    _ensure_jsonl_blob()
    schema = ("rec_id BIGINT, country STRING, amount BIGINT, "
              "tag STRING")
    df = spark.read.schema(schema).json(_JSONL_PATH)
    return (df.groupBy("country", "tag")
            .agg(F.count(F.lit(1)).alias("n_records"),
                 F.sum("amount").cast("long").alias("total_amount")))


# ---------------------------------------------------------------------------
# S3/S5 sink round-trips (VERDICT round 3 item 8): the three sink-side
# ops previously verified only by pytest get oracle-checkable entries.
# Each writes to a scratch dir under spark-warehouse/ (gitignored),
# reads its own output back, and returns content a DuckDB oracle can
# recompute from the SOURCE tables -- so the official gate verifies the
# write+read round-trip preserved every value, not just that the write
# succeeded.
# ---------------------------------------------------------------------------

_SINK_RT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", "_sink_rt")


def _sink_path(name: str, sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_SINK_RT_DIR, name, tag)


@register("s3_csv_roundtrip", """
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""")
def s3_csv_roundtrip(spark, sf):
    """S3 CSV sink round-trip (scrape_cia.py:86-87's df.to_csv):
    nation x region written through sources.write_csv, read back with
    a DECLARED schema (headers on, no inference), returned verbatim --
    the oracle recomputes the same 25 rows from the source tables, so
    a green row proves the CSV layer is lossless for the exported
    types."""
    from .sources import read_csv, write_csv
    from pyspark.sql import types as T
    out = _sink_path("s3_csv", sf)
    nation = read_table(spark, sf, "nation")
    region = read_table(spark, sf, "region")
    df = (nation.join(region,
                      nation.n_regionkey == region.r_regionkey)
          .select("n_nationkey", "n_name", "r_name"))
    write_csv(df, out)
    schema = T.StructType([
        T.StructField("n_nationkey", T.LongType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("r_name", T.StringType()),
    ])
    return read_csv(spark, out, schema, header=True)


@register("s5_compaction_roundtrip", """
SELECT CAST((COUNT(*) + 2047) // 2048 AS BIGINT) AS n_files,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
         AS total_price
FROM orders WHERE o_orderstatus = 'F'
""")
def s5_compaction_roundtrip(spark, sf):
    """Small-file compaction round-trip: finished orders written as 16
    deliberately-tiny files, compacted to ceil(rows/2048) files via
    sources.compact_files (round-robin repartition + atomic tmp-dir
    rename), read back and reduced to (file count, row count,
    decimal-exact price total).  The oracle recomputes all three from
    the source table -- file count included, since the sizing formula
    is pure integer arithmetic over COUNT(*)."""
    from .sources import compact_files
    out = _sink_path("s5_compact", sf)
    src = (read_table(spark, sf, "orders")
           .where(F.col("o_orderstatus") == "F"))
    src.repartition(16).write.mode("overwrite").parquet(out)
    n_files = compact_files(spark, out, target_rows_per_file=2048)
    from .operators.relational import dsum
    back = spark.read.parquet(out)
    return (back.agg(F.count(F.lit(1)).alias("n_rows"),
                     dsum(F.col("o_totalprice")).alias("total_price"))
            .select(F.lit(n_files).cast("long").alias("n_files"),
                    "n_rows", "total_price"))


@register("s3_clustered_write", """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(27,4))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY 1
""")
def s3_clustered_write(spark, sf):
    """Cluster-by write round-trip: lineitem written through
    sources.write_clustered (range-partition on l_shipdate + sort
    within files -- the layout that makes parquet min/max footers
    selective for the dominant predicate at 100 TB), read back and
    aggregated per ship month.  The builder ALSO asserts the
    structural property the oracle cannot see: per-file [min, max]
    shipdate ranges must not overlap (file-count-sized stats, one
    tiny collect).  A green row proves content preservation; the
    assert proves the clustering."""
    from .sources import write_clustered
    out = _sink_path("s3_clustered", sf)
    li = read_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    write_clustered(li, out, cluster_by=["l_shipdate"], n_files=4)
    back = spark.read.parquet(out)
    stats = (back.groupBy(F.input_file_name().alias("f"))
             .agg(F.min("l_shipdate").alias("lo"),
                  F.max("l_shipdate").alias("hi"))
             .orderBy("lo").collect())
    for a, b in zip(stats, stats[1:]):
        assert a.hi <= b.lo, (
            f"clustered files overlap: {a.f} [..{a.hi}] vs "
            f"{b.f} [{b.lo}..]")
    from .operators.relational import dsum
    return (back.groupBy(F.date_format("l_shipdate", "yyyy-MM")
                         .alias("ship_month"))
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 dsum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount"))).alias("revenue")))


@register("s_schema_evolution", """
SELECT o_orderkey,
       CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS INTEGER)
         AS batch,
       o_totalprice,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END
         AS o_orderstatus
FROM orders
""")
def s_schema_evolution(spark, sf):
    """Schema-evolution read (the 100-TB ingest reality: yesterday's
    parquet lacks the column today's writer added): batch 1 is
    written WITHOUT ``o_orderstatus``, batch 2 WITH it; the read
    unifies both via ``mergeSchema`` + partition discovery, and the
    legacy batch's rows surface the new column as NULL -- no rewrite
    of the old data, which is the whole point at scale (schema
    evolution must be metadata-only).  The oracle recomputes the
    expected unified table, NULLs included, from the source."""
    out = _sink_path("s_schema_evo", sf)
    orders = read_table(spark, sf, "orders")
    v1 = (orders.where(F.col("o_orderkey") % 2 == 0)
          .select("o_orderkey", "o_totalprice"))
    v2 = (orders.where(F.col("o_orderkey") % 2 == 1)
          .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    v1.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
    back = (spark.read.option("mergeSchema", "true")
            .option("basePath", out).parquet(
                os.path.join(out, "batch=1"),
                os.path.join(out, "batch=2")))
    return back.select("o_orderkey", F.col("batch").cast("int"),
                       "o_totalprice", "o_orderstatus")
