"""Scalar-function operator queries (SURVEY.md §2.8, F1-F16) with
DuckDB oracles.

The driver's tables carry no factbook text, so each query SYNTHESIZES
deterministic raw strings from integer columns (never from doubles --
double->string formatting differs across engines) and then exercises
the real parser expressions from :mod:`.functions` on them.  The
oracle rebuilds the same strings in SQL and applies the same parse.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions import (
    canonicalize_country,
    extract_percentage,
    extract_year,
    impute,
    parse_currency,
    parse_population,
    scale_to_billions,
    split_goods_list,
    strip_percentage_token,
)
from .operators.relational import dsum
from .registry import register
from .sources import read_table


@register("f1_parse_currency", """
WITH raw AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 7 = 0 THEN 'NA (2020 est.)'
              WHEN p_partkey % 11 = 0 THEN '$2,732,370,000,000 (2020 est.)'
              ELSE '$' || CAST(p_partkey % 1000 AS VARCHAR) ||
                   CASE p_partkey % 4
                     WHEN 0 THEN ' million (2021 est.)'
                     WHEN 1 THEN ' billion (2020 est.)'
                     WHEN 2 THEN ' trillion'
                     ELSE ' (2019 est.)' END
         END AS s
  FROM part
)
SELECT p_partkey, s,
       CASE WHEN regexp_matches(s, '^\\$\\d+') THEN
         CAST(replace(string_split(ltrim(s, '$'), ' ')[1], ',', '') AS DOUBLE)
         * CASE string_split(ltrim(s, '$') || ' ', ' ')[2]
             WHEN 'million' THEN 1e6 WHEN 'billion' THEN 1e9
             WHEN 'trillion' THEN 1e12 ELSE 1.0 END
       END AS amount
FROM raw
""")
def f1_parse_currency(spark, sf):
    """F1: currency parser (currency_converter, scrape_cia.py:22-38)
    incl. the gate miss, the word multipliers, and the comma-grouped
    full amount."""
    part = read_table(spark, sf, "part")
    s = (F.when(F.col("p_partkey") % 7 == 0, F.lit("NA (2020 est.)"))
         .when(F.col("p_partkey") % 11 == 0,
               F.lit("$2,732,370,000,000 (2020 est.)"))
         .otherwise(F.concat(
             F.lit("$"), (F.col("p_partkey") % 1000).cast("string"),
             F.when(F.col("p_partkey") % 4 == 0, F.lit(" million (2021 est.)"))
             .when(F.col("p_partkey") % 4 == 1, F.lit(" billion (2020 est.)"))
             .when(F.col("p_partkey") % 4 == 2, F.lit(" trillion"))
             .otherwise(F.lit(" (2019 est.)")))))
    return (part.select("p_partkey", s.alias("s"))
            .withColumn("amount", parse_currency(F.col("s"))))


@register("f2_extract_year", """
WITH raw AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 5 = 0 THEN p_name || ' (note to self)'
              ELSE p_name || ' (' || CAST(1990 + p_partkey % 30 AS VARCHAR)
                   || ' est.)' END AS s
  FROM part
)
SELECT p_partkey,
       CASE WHEN regexp_matches(substr(string_split(s, ' (')[-1], 1, 4),
                                '^\\d{4}$')
            THEN substr(string_split(s, ' (')[-1], 1, 4) END AS year_str
FROM raw
""")
def f2_extract_year(spark, sf):
    """F2: year peel ``split(" (",1)[-1][:4]`` + 4-digit gate
    (scrape_cia.py:71-74)."""
    part = read_table(spark, sf, "part")
    s = (F.when(F.col("p_partkey") % 5 == 0,
                F.concat(F.col("p_name"), F.lit(" (note to self)")))
         .otherwise(F.concat(F.col("p_name"), F.lit(" ("),
                             (1990 + F.col("p_partkey") % 30).cast("string"),
                             F.lit(" est.)"))))
    return (part.select("p_partkey", s.alias("s"))
            .select("p_partkey", extract_year(F.col("s")).alias("year_str")))


@register("f4_f5_percentage", """
WITH raw AS (
  SELECT c_custkey, 'P' || CAST(c_custkey % 50 AS VARCHAR) AS partner,
         CASE c_custkey % 3
           WHEN 0 THEN 'P' || CAST(c_custkey % 50 AS VARCHAR) || ' '
                       || CAST(c_custkey % 100 AS VARCHAR) || '%'
           WHEN 1 THEN 'almost entirely P' || CAST(c_custkey % 50 AS VARCHAR)
           ELSE 'P' || CAST(c_custkey % 50 AS VARCHAR) END AS s
  FROM customer
)
SELECT c_custkey,
       CASE WHEN s LIKE '%almost entirely%' THEN 0.9
            WHEN regexp_matches(s, '\\d+%$')
              THEN CAST(regexp_extract(s, '(\\d+)%$', 1) AS DOUBLE) / 100
       END AS percentage,
       CASE WHEN s LIKE '%almost entirely%'
              THEN trim(replace(s, 'almost entirely', ''))
            WHEN regexp_matches(s, '\\d+%$')
              THEN trim(regexp_replace(s, '\\s+\\S+$', ''))
            ELSE trim(s) END AS trade_country
FROM raw
""")
def f4_f5_percentage(spark, sf):
    """F4+F5: percentage extraction with the "almost entirely"->0.9
    fuzzy imputation and partner-name recovery (scrape_cia.py:119-129)."""
    cust = read_table(spark, sf, "customer")
    partner = F.concat(F.lit("P"), (F.col("c_custkey") % 50).cast("string"))
    s = (F.when(F.col("c_custkey") % 3 == 0,
                F.concat(partner, F.lit(" "),
                         (F.col("c_custkey") % 100).cast("string"), F.lit("%")))
         .when(F.col("c_custkey") % 3 == 1,
               F.concat(F.lit("almost entirely "), partner))
         .otherwise(partner))
    return (cust.select("c_custkey", s.alias("s"))
            .select("c_custkey",
                    extract_percentage(F.col("s")).alias("percentage"),
                    strip_percentage_token(F.col("s")).alias("trade_country")))


@register("f8_population_parse", """
WITH raw AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'no data'
              WHEN c_custkey % 6 = 0
                THEN 'approximately (' || CAST(1990 + c_custkey % 30 AS VARCHAR)
                     || ' est.)'
              ELSE 'total: ' || CAST(c_custkey % 900 + 100 AS VARCHAR) || ','
                   || lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') || ','
                   || lpad(CAST(c_custkey * 13 % 1000 AS VARCHAR), 3, '0')
                   || ' (' || CAST(1990 + c_custkey % 30 AS VARCHAR) || ' est.)'
         END AS s
  FROM customer
),
scanned AS (
  SELECT c_custkey, s,
         regexp_extract_all(s, '[\\d,]+') AS arr,
         list_position(list_transform(regexp_extract_all(s, '[\\d,]+'),
                                      x -> len(x) != 4), true) AS pop_i
  FROM raw
)
SELECT c_custkey,
       CASE WHEN pop_i > 0
            THEN CAST(replace(arr[pop_i], ',', '') AS DOUBLE) END AS population,
       CASE WHEN pop_i > 0
            THEN list_filter(arr[pop_i+1:], x -> len(x) = 4)[1] END AS pop_year
FROM scanned
""")
def f8_population_parse(spark, sf):
    """F8: the stateful population/year digit-group scan
    (scrape_cia.py:256-280), incl. the no-population and no-match
    branches where the reference leaves both fields unset."""
    cust = read_table(spark, sf, "customer")
    year = (1990 + F.col("c_custkey") % 30).cast("string")
    s = (F.when(F.col("c_custkey") % 7 == 0, F.lit("no data"))
         .when(F.col("c_custkey") % 6 == 0,
               F.concat(F.lit("approximately ("), year, F.lit(" est.)")))
         .otherwise(F.concat(
             F.lit("total: "),
             (F.col("c_custkey") % 900 + 100).cast("string"), F.lit(","),
             F.lpad((F.col("c_custkey") * 7 % 1000).cast("string"), 3, "0"),
             F.lit(","),
             F.lpad((F.col("c_custkey") * 13 % 1000).cast("string"), 3, "0"),
             F.lit(" ("), year, F.lit(" est.)"))))
    population, pop_year = parse_population(F.col("s"))
    return (cust.select("c_custkey", s.alias("s"))
            .select("c_custkey", population.alias("population"),
                    pop_year.alias("pop_year")))


@register("f6_f7_goods_split", """
WITH raw AS (
  SELECT p_partkey,
         p_brand || ', ' || p_type || ', refined goods ('
                 || CAST(1990 + p_partkey % 30 AS VARCHAR) || ')' AS s
  FROM part
),
toks AS (
  SELECT p_partkey,
         list_transform(string_split(string_split(s, '(')[1], ','),
                        x -> trim(x)) AS goods
  FROM raw
)
SELECT p_partkey, trim(goods[i]) AS good, i AS rank
FROM toks, generate_series(1, 10) AS t(i)
WHERE i <= len(goods) AND trim(goods[i]) != ''
""")
def f6_f7_goods_split(spark, sf):
    """F6/F7/F16/W2: goods-list split -> trim -> posexplode with the
    1-based positional rank (scrape_cia.py:206-214)."""
    part = read_table(spark, sf, "part")
    s = F.concat(F.col("p_brand"), F.lit(", "), F.col("p_type"),
                 F.lit(", refined goods ("),
                 (1990 + F.col("p_partkey") % 30).cast("string"), F.lit(")"))
    goods = split_goods_list(s)
    return (part.select("p_partkey", goods.alias("goods"))
            .select("p_partkey", F.posexplode("goods").alias("pos", "good"))
            .where(F.col("good") != "")
            .select("p_partkey", "good", (F.col("pos") + 1).alias("rank")))


@register("f9_f10_impute_scale", """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 5 = 0 THEN 0.0
            ELSE CAST(o_orderkey % 100000 AS DOUBLE) * 1e6 END AS amount_filled,
       round(CASE WHEN o_orderkey % 5 = 0 THEN 0.0
                  ELSE CAST(o_orderkey % 100000 AS DOUBLE) * 1e6 END / 1e9,
             3) AS amount_billions,
       CASE WHEN o_orderkey % 3 = 0 THEN '' ELSE 'ok' END AS note_filled
FROM orders
""")
def f9_f10_impute_scale(spark, sf):
    """F9/F10: constant imputation (fillna 0 / "") + round(x/1e9, 3)
    unit scaling (preprocess_upload_neo4j.py:125-126, 259-266)."""
    orders = read_table(spark, sf, "orders")
    amount = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("double")) \
        .otherwise((F.col("o_orderkey") % 100000).cast("double") * 1e6)
    note = F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("string")) \
        .otherwise(F.lit("ok"))
    return orders.select(
        "o_orderkey",
        impute(amount, 0.0).alias("amount_filled"),
        scale_to_billions(impute(amount, 0.0)).alias("amount_billions"),
        impute(note, "").alias("note_filled"))


@register("f14_f15_json_ts", """
SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) % 10 AS k_bucket,
       date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2
""")
def f14_f15_json_ts(spark, sf):
    """F14/F15: JSON prop extraction via ``from_json`` + timestamp
    truncation, aggregated (the Cypher TIMESTAMP()/json round-trip,
    preprocess_upload_neo4j.py:253, 452-453)."""
    ev = read_table(spark, sf, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (ev.select((k % 10).alias("k_bucket"),
                      F.date_trunc("day", F.col("ts")).alias("day"), "value")
            .groupBy("k_bucket", "day")
            .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total")))


@register("j6_canonicalize", """
WITH fixed AS (
  SELECT CASE n_name WHEN 'NATION_3' THEN 'Korea, South'
                     WHEN 'NATION_5' THEN 'US' ELSE n_name END AS dirty
  FROM nation JOIN customer ON n_nationkey = c_nationkey
)
SELECT CASE dirty WHEN 'Korea, South' THEN 'South Korea'
                  WHEN 'Korea, North' THEN 'North Korea'
                  WHEN 'US' THEN 'United States'
                  WHEN 'Untied States' THEN 'United States'
                  ELSE dirty END AS nation_fixed,
       COUNT(*) AS n_customers
FROM fixed GROUP BY 1
""")
def j6_canonicalize(spark, sf):
    """J6: country-name canonicalization (scrape_cia.py:66-67, map at
    :305-309) -- dirty variants injected, fixed by the when-chain."""
    cust = read_table(spark, sf, "customer")
    nation = read_table(spark, sf, "nation")
    dirty = (F.when(F.col("n_name") == "NATION_3", F.lit("Korea, South"))
             .when(F.col("n_name") == "NATION_5", F.lit("US"))
             .otherwise(F.col("n_name")))
    return (cust.join(F.broadcast(nation),
                      cust.c_nationkey == nation.n_nationkey)
            .select(dirty.alias("dirty"))
            .select(canonicalize_country(F.col("dirty")).alias("nation_fixed"))
            .groupBy("nation_fixed")
            .agg(F.count(F.lit(1)).alias("n_customers")))


@register("f_date_parts", """
SELECT o_orderkey,
       date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS order_month,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_m,
       CAST(dayofweek(o_orderdate) AS INTEGER) AS order_dow,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_q
FROM orders
""")
def f_date_parts(spark, sf):
    """F12/F14 family: date truncation + part extraction (the temporal
    scalar toolkit behind year-based latest-wins logic,
    preprocess_upload_neo4j.py:139-140).  DuckDB dayofweek is
    0=Sunday..6; Spark dayofweek is 1=Sunday..7 -- aligned by -1."""
    orders = read_table(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_m"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.quarter("o_orderdate").alias("order_q"))


@register("w7_first_last_frame", """
SELECT event_id, user_id,
       first_value(value) OVER w AS first_in_hour,
       last_value(value) OVER (PARTITION BY user_id,
                               time_bucket(INTERVAL 1 HOUR,
                                           CAST(ts AS TIMESTAMP))
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING) AS last_in_hour
FROM events
WINDOW w AS (PARTITION BY user_id,
             time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def w7_first_last_frame(spark, sf):
    """EXT window: first/last value over an explicit full-partition
    frame (per user-hour) -- last_value needs the UNBOUNDED FOLLOWING
    frame or it degenerates to the current row on both engines."""
    from pyspark.sql import Window
    ev = read_table(spark, sf, "events")
    hour = F.date_trunc("hour", "ts")
    w = (Window.partitionBy("user_id", hour).orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return ev.select(
        "event_id", "user_id",
        F.first("value").over(w).alias("first_in_hour"),
        F.last("value").over(w).alias("last_in_hour"))


@register("f_zorder", """
SELECT c_custkey, c_nationkey,
       CAST((((c_custkey >> 0) & 1) << 0) | (((c_nationkey >> 0) & 1) << 1) | (((c_custkey >> 1) & 1) << 2) | (((c_nationkey >> 1) & 1) << 3) | (((c_custkey >> 2) & 1) << 4) | (((c_nationkey >> 2) & 1) << 5) | (((c_custkey >> 3) & 1) << 6) | (((c_nationkey >> 3) & 1) << 7) | (((c_custkey >> 4) & 1) << 8) | (((c_nationkey >> 4) & 1) << 9) | (((c_custkey >> 5) & 1) << 10) | (((c_nationkey >> 5) & 1) << 11) | (((c_custkey >> 6) & 1) << 12) | (((c_nationkey >> 6) & 1) << 13) | (((c_custkey >> 7) & 1) << 14) | (((c_nationkey >> 7) & 1) << 15) | (((c_custkey >> 8) & 1) << 16) | (((c_nationkey >> 8) & 1) << 17) | (((c_custkey >> 9) & 1) << 18) | (((c_nationkey >> 9) & 1) << 19) | (((c_custkey >> 10) & 1) << 20) | (((c_nationkey >> 10) & 1) << 21) | (((c_custkey >> 11) & 1) << 22) | (((c_nationkey >> 11) & 1) << 23) | (((c_custkey >> 12) & 1) << 24) | (((c_nationkey >> 12) & 1) << 25) | (((c_custkey >> 13) & 1) << 26) | (((c_nationkey >> 13) & 1) << 27) | (((c_custkey >> 14) & 1) << 28) | (((c_nationkey >> 14) & 1) << 29) | (((c_custkey >> 15) & 1) << 30) | (((c_nationkey >> 15) & 1) << 31) AS BIGINT) AS zval
FROM customer
""")
def f_zorder(spark, sf):
    """Z-order (Morton) clustering key over (custkey, nationkey):
    the 2-D data-layout key under OPTIMIZE ZORDER -- sort/range-write
    by zval and min-max footer skipping prunes BOTH dimensions.  Pure
    integer shift/mask codegen; see functions.zvalue and the
    write_clustered sink it feeds."""
    from .functions import zvalue
    customer = read_table(spark, sf, "customer")
    return customer.select(
        "c_custkey", "c_nationkey",
        zvalue(F.col("c_custkey"), F.col("c_nationkey")).alias("zval"))


@register("f_text_fold", """
SELECT doc_id,
       trim(regexp_replace(lower(translate(text,
         'àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ',
         'aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY')),
         '\\s+', ' ', 'g')) AS folded,
       md5(trim(regexp_replace(lower(translate(text,
         'àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ',
         'aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY')),
         '\\s+', ' ', 'g'))) AS fold_key
FROM documents
""")
def f_text_fold(spark, sf):
    """Canonical text fold (lowercase + explicit accent table +
    whitespace collapse) and its md5 matching key -- the
    encoding-insensitive sibling of the exact-dedup fingerprint; an
    EXPLICIT fold table keeps the key identical across engines and
    releases.  See functions.text_fold."""
    from .functions import text_fold
    docs = read_table(spark, sf, "documents")
    folded = text_fold(F.col("text"))
    return docs.select("doc_id", folded.alias("folded"),
                       F.md5(folded).alias("fold_key"))
