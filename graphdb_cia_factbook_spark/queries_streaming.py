"""Streaming-surface queries (SURVEY.md §2.10 EXT) in their
batch-equivalent form, each with a DuckDB oracle.

Every builder here calls the SAME transform functions
(:mod:`.streaming`) that the streaming tests drive over
``readStream`` + memory sink -- one logical plan, two execution modes
(the Structured Streaming contract).  Oracles: ``time_bucket`` for
tumbling/sliding alignment (epoch-aligned, like ``F.window``),
gaps-and-islands SQL for session windows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.relational import dsum
from .registry import register
from .sources import read_table
from .streaming import (
    dedup_events,
    session_agg,
    sliding_agg,
    tumbling_agg,
)


@register("st_tumbling", """
SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""")
def st_tumbling(spark, sf):
    """Tumbling 1h event-time windows per event_type (streaming-ready:
    identical plan under readStream + watermark)."""
    return tumbling_agg(read_table(spark, sf, "events"), "1 hour")


@register("st_sliding", """
WITH k AS (SELECT * FROM (VALUES (0), (1)) t(k)),
w AS (
  SELECT e.value,
         time_bucket(INTERVAL 30 MINUTE, CAST(e.ts AS TIMESTAMP))
           - k.k * INTERVAL 30 MINUTE AS window_start,
         CAST(e.ts AS TIMESTAMP) AS ts
  FROM events e CROSS JOIN k
)
SELECT window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) / COUNT(value)
         AS avg_value
FROM w
WHERE ts < window_start + INTERVAL 60 MINUTE
GROUP BY 1
""")
def st_sliding(spark, sf):
    """Sliding 1h windows every 30min: each event belongs to 2 windows
    (the oracle materializes the overlap with a 2-row offset join)."""
    return sliding_agg(read_table(spark, sf, "events"),
                       "1 hour", "30 minutes")


@register("st_session", """
WITH x AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         CASE WHEN CAST(ts AS TIMESTAMP)
                   - lag(CAST(ts AS TIMESTAMP))
                     OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
y AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
FROM y GROUP BY user_id, sid
""")
def st_session(spark, sf):
    """Per-user session windows (10-minute gap): native session_window
    on Spark; the oracle is the equivalent gaps-and-islands SQL.
    A new session starts when the gap is >= 10min (windows [t, t+10m)
    merge only on strict overlap)."""
    return session_agg(read_table(spark, sf, "events"), "10 minutes")


@register("st_dedup", """
SELECT DISTINCT event_id FROM events
""")
def st_dedup(spark, sf):
    """Streaming dedup by event key (state-store keyed dropDuplicates
    on a stream; distinct projection in batch)."""
    return dedup_events(read_table(spark, sf, "events"))


@register("st_stream_join", """
WITH l AS (
  SELECT user_id, event_id AS left_id, CAST(ts AS TIMESTAMP) AS left_ts
  FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, event_id AS right_id, CAST(ts AS TIMESTAMP) AS right_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT l.user_id, l.left_id, l.left_ts, r.right_id, r.right_ts
FROM l JOIN r ON l.user_id = r.user_id
  AND l.left_ts >= r.right_ts - INTERVAL 30 MINUTE
  AND l.left_ts < r.right_ts
""")
def st_stream_join(spark, sf):
    """Stream-stream interval join: purchases attributed to same-user
    clicks in the preceding 30 minutes (Spark's canonical
    watermark-evicted stream-stream join, run in its batch form)."""
    from .streaming import interval_join
    return interval_join(read_table(spark, sf, "events"))


@register("st_concurrency", """
WITH b AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT user_id, CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS t,
         -1 AS delta
  FROM events
),
r AS (
  SELECT user_id,
         SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS open
  FROM b
)
SELECT user_id, CAST(MAX(open) AS BIGINT) AS peak_concurrency
FROM r GROUP BY user_id
""")
def st_concurrency(spark, sf):
    """Interval-overlap analytics: peak number of concurrently-open
    5-minute sessions per user, by sweep-line (+1/-1 boundaries +
    running sum) -- never the O(n^2) interval self-join."""
    from .streaming import concurrency_peaks
    return concurrency_peaks(read_table(spark, sf, "events"))


@register("st_static_enrich", """
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""")
def st_static_enrich(spark, sf):
    """Stream-static enrichment: events join the static customer
    dimension (broadcast per micro-batch, stateless -- the third
    streaming join mode next to stream-stream and windowed aggs),
    rolled up per (market segment, event type)."""
    from .streaming import enriched_segment_totals
    return enriched_segment_totals(read_table(spark, sf, "events"),
                                   read_table(spark, sf, "customer"))


@register("st_sessionize", """
WITH b AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR date_diff('second',
                             LAG(CAST(ts AS TIMESTAMP)) OVER w,
                             CAST(ts AS TIMESTAMP)) > 1800
              THEN 1 ELSE 0 END AS newb
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP),
               event_id)
)
SELECT event_id, user_id, ts,
       CAST(SUM(newb) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS session_seq
FROM b
""")
def st_sessionize(spark, sf):
    """Gap-based sessionization: explicit (user, session_seq) ids on
    every event via lag-boundary + running sum in one window stage --
    the joinable-key complement to session windows."""
    from .streaming import sessionize
    return sessionize(read_table(spark, sf, "events"))


@register("st_topk_per_window", """
WITH agg AS (
  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
           AS window_start,
         event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT window_start, rank, event_type, n_events, total_value
FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY window_start
                                ORDER BY total_value DESC, event_type)
               AS rank
      FROM agg)
WHERE rank <= 3
""")
def st_topk_per_window(spark, sf):
    """Top-3 event types per tumbling hour (streaming leaderboard):
    incremental windowed aggregate + rank over closed windows; the
    post-aggregate shuffle is window-count-sized, never event-sized."""
    from .streaming import windowed_topk
    return windowed_topk(read_table(spark, sf, "events"), "1 hour", k=3)


@register("ts_ewma", """
WITH ordered AS (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY ts, value) AS vals,
         COUNT(*) AS n_obs
  FROM events GROUP BY user_id
)
SELECT user_id, n_obs,
       list_reduce(vals, (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma_value
FROM ordered
""")
def ts_ewma(spark, sf):
    """Exponential smoothing per user (alpha = 0.5): a sequential left
    fold over the time-ordered series -- F.aggregate == list_reduce
    bit for bit; one key-partitioned shuffle, fold inside codegen."""
    from .operators.timeseries import ewma
    return ewma(read_table(spark, sf, "events"), alpha=0.5)


@register("ts_resample_ffill", """
WITH ranked AS (
  SELECT user_id,
         time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS bucket,
         CAST(value AS DOUBLE) AS v,
         ROW_NUMBER() OVER (
           PARTITION BY user_id,
                        time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
           ORDER BY ts DESC, value DESC) AS rn,
         COUNT(*) OVER (
           PARTITION BY user_id,
                        time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)))
           AS n_events
  FROM events
),
pb AS (SELECT user_id, bucket, v, n_events FROM ranked WHERE rn = 1),
span AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
         FROM pb GROUP BY user_id),
grid AS (SELECT user_id,
                unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
         FROM span),
j AS (SELECT g.user_id, g.bucket,
             COALESCE(p.n_events, 0) AS n_events, p.v AS obs
      FROM grid g LEFT JOIN pb p
        ON g.user_id = p.user_id AND g.bucket = p.bucket),
grp AS (SELECT *, COUNT(obs) OVER (PARTITION BY user_id ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING) AS g
        FROM j)
SELECT user_id, bucket, n_events,
       MAX(obs) OVER (PARTITION BY user_id, g) AS value_ffill,
       obs IS NULL AS is_gap
FROM grp
""")
def ts_resample_ffill(spark, sf):
    """Gap-filled hourly resampling with forward fill (the
    time_bucket_gapfill / hypertable shape): dense per-user grid from
    one sequence+explode, last observation per bucket via struct MAX
    (map-side combined), carry via one last(ignorenulls) window."""
    from .operators.timeseries import resample_ffill
    return resample_ffill(read_table(spark, sf, "events"),
                          bucket="1 hour")


@register("st_session_paths", """
WITH x AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
         CASE WHEN lag(CAST(ts AS TIMESTAMP))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                OR date_diff('second',
                             lag(CAST(ts AS TIMESTAMP))
                               OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                             CAST(ts AS TIMESTAMP)) > 600
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
y AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM y GROUP BY user_id, sid
),
grams AS (
  SELECT arr[i] || '>' || arr[i + 1] || '>' || arr[i + 2] AS trigram
  FROM (SELECT string_split(path, '>') AS arr FROM paths) t,
       unnest(range(1, len(t.arr) - 1)) AS u(i)
  WHERE len(arr) >= 3
)
SELECT trigram, COUNT(*) AS n
FROM grams GROUP BY trigram
ORDER BY n DESC, trigram LIMIT 20
""")
def st_session_paths(spark, sf):
    """Clickstream path mining: sessionize by 10-minute gaps, join
    each session's event types into a path, count the top-20 trigram
    sub-paths -- the navigation-pattern query behind funnel design.
    One session window + one path aggregate + one gram-keyed count;
    everything shuffles on user or gram keys."""
    from .streaming import sessionize
    ev = read_table(spark, sf, "events")
    sess = (sessionize(ev, gap_seconds=600)
            .join(ev.select("event_id", "event_type"), "event_id"))
    paths = (sess.groupBy("user_id", "session_seq")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("ts", "event_id", "event_type"))),
                     lambda s: s["event_type"]), ">").alias("path")))
    arr = F.split(F.col("path"), ">")
    grams_expr = F.expr(
        "CASE WHEN size(__arr) >= 3 THEN "
        "transform(sequence(1, size(__arr) - 2), "
        "i -> concat(element_at(__arr, i), '>', "
        "element_at(__arr, i + 1), '>', element_at(__arr, i + 2))) "
        "ELSE array() END")
    return (paths.select(arr.alias("__arr"))
            .select(F.explode(grams_expr).alias("trigram"))
            .groupBy("trigram").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("trigram")).limit(20))


@register("st_late_audit", """
WITH e AS (
  SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         event_id // 1000 AS arrival_bucket
  FROM events
),
bmax AS (
  SELECT arrival_bucket, MAX(ts) AS bucket_max FROM e GROUP BY 1
),
wm AS (
  SELECT arrival_bucket,
         MAX(bucket_max) OVER (ORDER BY arrival_bucket
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)
           - INTERVAL 10 MINUTE AS watermark
  FROM bmax
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN w.watermark IS NOT NULL
                     AND e.ts < w.watermark
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN w.watermark IS NOT NULL AND e.ts < w.watermark
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS late_frac
FROM e JOIN wm w ON e.arrival_bucket = w.arrival_bucket
GROUP BY e.event_type
""")
def st_late_audit(spark, sf):
    """Watermark design audit: replay the arrival log (event_id order,
    bucketed per 1000 arrivals) and count events that a 10-minute
    watermark would drop -- the measurement that picks a watermark
    BEFORE deploying the streaming job.  The prefix-max runs over
    BUCKET aggregates (arrival-bucket-count rows, broadcast back), so
    nothing event-sized ever funnels through one partition."""
    ev = read_table(spark, sf, "events")
    e = ev.select("event_id", "event_type",
                  F.col("ts").cast("timestamp").alias("ts"),
                  F.expr("event_id DIV 1000").alias("arrival_bucket"))
    bmax = (e.groupBy("arrival_bucket")
            .agg(F.max("ts").alias("bucket_max")))
    w = (Window.orderBy("arrival_bucket")
         .rowsBetween(Window.unboundedPreceding, -1))
    wm = bmax.select(
        "arrival_bucket",
        (F.max("bucket_max").over(w)
         - F.expr("INTERVAL 10 MINUTE")).alias("watermark"))
    late = (F.col("watermark").isNotNull()
            & (F.col("ts") < F.col("watermark")))
    return (e.join(F.broadcast(wm), "arrival_bucket")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(late.cast("int")).alias("n_late"),
                 (F.sum(late.cast("int")).cast("double")
                  / F.count(F.lit(1))).alias("late_frac")))


@register("ts_rollup_multi", """
SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
       CASE WHEN GROUPING(time_bucket(INTERVAL 1 HOUR,
                                      CAST(ts AS TIMESTAMP))) = 0
            THEN time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
       END AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY GROUPING SETS (
  (date_trunc('day', CAST(ts AS TIMESTAMP)),
   time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))),
  (date_trunc('day', CAST(ts AS TIMESTAMP)))
)
""")
def ts_rollup_multi(spark, sf):
    """Multi-grain continuous-aggregate ladder (the hypertable rollup
    shape): hour and day grains in ONE grouping-sets pass -- partial
    aggregates are shared, so the fact stream is read and combined
    once for every grain."""
    ev = read_table(spark, sf, "events")
    ts = F.col("ts").cast("timestamp")
    day = F.date_trunc("day", ts)
    hour = F.window("ts", "1 hour")["start"]
    gs = (ev.select(day.alias("day"), hour.alias("hour"), "value")
          .groupingSets([["day", "hour"], ["day"]], "day", "hour")
          .agg(F.count(F.lit(1)).alias("n_events"),
               dsum("value").alias("total_value")))
    return gs.select("day", "hour", "n_events", "total_value")


@register("ts_rolling_distinct", """
WITH du AS (
  SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       (SELECT COUNT(*) FROM du WHERE du.day = d.day) AS dau,
       (SELECT COUNT(DISTINCT u.user_id) FROM du u
        WHERE u.day > d.day - INTERVAL 7 DAY AND u.day <= d.day)
         AS rolling_7d_users
FROM days d
""")
def ts_rolling_distinct(spark, sf):
    """Rolling 7-day distinct users (the WAU curve): distinct is not
    window-decomposable, so the exact form pre-collapses events to
    (day, user) pairs ONCE (the only event-sized op), then re-counts
    distincts over each day's trailing week via a bounded 7-row grid
    join -- cost is days x 7 over day-user pairs, never raw events.
    (At extreme cardinality the HLL sketch union replaces the exact
    recount; agg_approx_sketches holds that contract.)"""
    ev = read_table(spark, sf, "events")
    du = (ev.select(F.date_trunc("day", F.col("ts").cast("timestamp"))
                    .alias("day"), "user_id")
          .distinct().localCheckpoint())
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = du.select("day").distinct() \
        .withColumnRenamed("day", "anchor")
    window_pairs = (days.join(
        du, (F.col("day") > F.col("anchor") - F.expr("INTERVAL 7 DAY"))
        & (F.col("day") <= F.col("anchor"))))
    rolling = (window_pairs.groupBy("anchor")
               .agg(F.countDistinct("user_id").alias("rolling_7d_users")))
    return (dau.join(rolling, dau.day == rolling.anchor)
            .select("day", "dau", "rolling_7d_users"))


@register("st_stream_join_outer", """
WITH l AS (
  SELECT user_id, event_id AS left_id, CAST(ts AS TIMESTAMP) AS left_ts
  FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, event_id AS right_id, CAST(ts AS TIMESTAMP) AS right_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT l.user_id, l.left_id, l.left_ts, r.right_id, r.right_ts,
       r.right_id IS NULL AS unconverted
FROM l LEFT JOIN r ON l.user_id = r.user_id
  AND l.left_ts >= r.right_ts - INTERVAL 30 MINUTE
  AND l.left_ts < r.right_ts
""")
def st_stream_join_outer(spark, sf):
    """LEFT OUTER stream-stream interval join: clicks that converted
    AND clicks that did not (null-padded after the watermark passes,
    on a stream) in one pass -- the funnel-drop-off staple.  Batch
    twin of streaming.interval_join_outer."""
    from .streaming import interval_join_outer
    return interval_join_outer(read_table(spark, sf, "events"))


@register("ts_twap", """
WITH spans AS (
  SELECT user_id, value,
         LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
         - epoch_us(CAST(ts AS TIMESTAMP)) AS w
  FROM events
)
SELECT user_id, COUNT(*) AS n_intervals,
       CAST(SUM(w) AS DOUBLE) / 1e6 AS total_seconds,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)) * w) AS DOUBLE)
             / CAST(SUM(w) AS DOUBLE), 6) AS twap
FROM spans WHERE w IS NOT NULL
GROUP BY user_id
""")
def ts_twap(spark, sf):
    """Time-weighted average value per user over irregular event
    samples (each observation weighted by its holding duration) --
    the metering/pricing average a plain AVG gets wrong on bursty
    streams.  See operators.timeseries.twap."""
    from .operators.timeseries import twap
    return twap(read_table(spark, sf, "events"))


_HOLT_A, _HOLT_B = 0.5, 0.3


def _holt_sql(a: float, b: float) -> str:
    """DuckDB twin of holt_linear.  v1.0 list_reduce has no initial
    accumulator, so the init state [l1, b1] rides as the FIRST element
    of a list of 2-arrays (list_reduce seeds from element one); the
    (1-alpha)/(1-beta) coefficients interpolate as repr() so both
    engines parse the identical IEEE double."""
    ca, cb = 1.0 - a, 1.0 - b
    new_l = f"{a!r} * x[1] + {ca!r} * (acc[1] + acc[2])"
    return f"""
WITH ordered AS (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY ts, value) AS vals,
         COUNT(*) AS n_obs
  FROM events GROUP BY user_id
),
folded AS (
  SELECT user_id, n_obs,
         list_reduce(
           list_concat(
             [[CASE WHEN len(vals) >= 2 THEN vals[2] ELSE vals[1] END,
               CASE WHEN len(vals) >= 2 THEN vals[2] - vals[1]
                    ELSE 0.0 END]],
             list_transform(vals[3:], x -> [x, 0.0])),
           (acc, x) -> [
             {new_l},
             {b!r} * (({new_l}) - acc[1]) + {cb!r} * acc[2]
           ]) AS st
  FROM ordered
)
SELECT user_id, n_obs, st[1] AS level, st[2] AS trend,
       st[1] + st[2] AS forecast_1
FROM folded"""


@register("ts_holt_linear", _holt_sql(_HOLT_A, _HOLT_B))
def ts_holt_linear(spark, sf):
    """Holt's linear (level + trend) smoothing per user: the
    one-step-ahead forecaster for trending series; the 2-state fold
    runs as one collect_list + one F.aggregate per key, same shape and
    bit-equality contract as ts_ewma.  See
    operators.timeseries.holt_linear."""
    from .operators.timeseries import holt_linear
    return holt_linear(read_table(spark, sf, "events"),
                       alpha=_HOLT_A, beta=_HOLT_B)


_CUSUM_DRIFT, _CUSUM_TH = 0.5, 5.0


@register("ts_cusum", f"""
WITH ordered AS (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY ts, value) AS vals,
         COUNT(*) AS n_obs,
         CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(27,4))
                  * CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS s2
  FROM events GROUP BY user_id
),
stats AS (
  SELECT user_id, vals, n_obs,
         s1 / n_obs AS mean,
         sqrt((s2 - (s1 * s1) / n_obs) / (n_obs - 1)) AS sd
  FROM ordered
),
folded AS (
  SELECT user_id, n_obs, mean, sd,
         list_reduce(
           list_concat([[0.0, 0.0, 0.0]],
                       list_transform(vals, x -> [x, 0.0, 0.0])),
           (acc, x) -> [
             CASE WHEN greatest(0.0, acc[1] + (x[1] - mean) / sd
                                - {_CUSUM_DRIFT!r}) > {_CUSUM_TH!r}
                  THEN 0.0
                  ELSE greatest(0.0, acc[1] + (x[1] - mean) / sd
                                - {_CUSUM_DRIFT!r}) END,
             acc[2] + CASE WHEN greatest(0.0, acc[1]
                                         + (x[1] - mean) / sd
                                         - {_CUSUM_DRIFT!r})
                                > {_CUSUM_TH!r}
                           THEN 1.0 ELSE 0.0 END,
             greatest(acc[3],
                      greatest(0.0, acc[1] + (x[1] - mean) / sd
                               - {_CUSUM_DRIFT!r}))
           ]) AS st
  FROM stats
)
SELECT user_id, n_obs, ROUND(mean, 8) AS mean,
       CASE WHEN sd IS NULL OR sd <= 0 THEN 0.0
            ELSE ROUND(st[3], 8) END AS max_cusum,
       CASE WHEN sd IS NULL OR sd <= 0 THEN 0
            ELSE CAST(st[2] AS BIGINT) END AS n_alarms
FROM folded
""")
def ts_cusum(spark, sf):
    """CUSUM change-point detection per user (standardized one-sided
    detector, drift 0.5, threshold 5): decimal-exact moments feed a
    3-state sequential fold -- alarms count level shifts in the value
    stream.  See operators.timeseries.cusum."""
    from .operators.timeseries import cusum
    return cusum(read_table(spark, sf, "events"),
                 drift=_CUSUM_DRIFT, threshold=_CUSUM_TH)


@register("ts_rolling_median", """
SELECT user_id, event_id,
       ROUND(CAST(quantile_cont(CAST(value AS DOUBLE), 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE), 8)
         AS rolling_median
FROM events
""")
def ts_rolling_median(spark, sf):
    """Rolling 5-observation median per user: the robust smoother
    (one wild sample cannot move it, unlike a moving average) -- a
    single window stage, interpolated percentile over a bounded ROWS
    frame, ordered by the unique (ts, event_id) so frames are
    engine-identical."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, 0))
    return ev.select(
        "user_id", "event_id",
        F.round(F.percentile(F.col("value").cast("double"),
                             F.lit(0.5)).over(w), 8)
        .alias("rolling_median"))


@register("ts_seasonal_index", """
WITH hourly AS (
  SELECT event_type, EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hod,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS s
  FROM events GROUP BY 1, 2
),
overall AS (
  SELECT event_type,
         CAST(SUM(CAST(n AS DECIMAL(27,4))) AS DOUBLE) AS tn,
         CAST(SUM(CAST(s AS DECIMAL(27,4))) AS DOUBLE) AS ts
  FROM hourly GROUP BY 1
)
SELECT h.event_type, CAST(h.hod AS INTEGER) AS hour_of_day, h.n,
       ROUND((h.s / h.n) / (o.ts / o.tn), 8) AS seasonal_index
FROM hourly h JOIN overall o ON o.event_type = h.event_type
""")
def ts_seasonal_index(spark, sf):
    """Hour-of-day seasonal index per metric: hourly mean value over
    the overall mean -- the multiplicative seasonal profile that
    deseasonalizes a series before trend fitting (agg_trend_slope) or
    CUSUM.  Decimal-exact sums; two dimension-sized aggregates."""
    ev = read_table(spark, sf, "events")
    from .operators.relational import dsum
    hourly = (ev.groupBy("event_type",
                         F.hour(F.col("ts").cast("timestamp"))
                         .alias("hour_of_day"))
              .agg(F.count(F.lit(1)).alias("n"),
                   dsum(F.col("value")).alias("s")))
    overall = (hourly.groupBy("event_type")
               .agg(dsum(F.col("n").cast("double")).alias("tn"),
                    dsum(F.col("s")).alias("ts")))
    return (hourly.join(F.broadcast(overall), "event_type")
            .select("event_type",
                    F.col("hour_of_day").cast("int").alias("hour_of_day"),
                    "n",
                    F.round((F.col("s") / F.col("n"))
                            / (F.col("ts") / F.col("tn")), 8)
                    .alias("seasonal_index")))


_FE_A = 0.5


@register("ts_forecast_eval", f"""
WITH ordered AS (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY ts, value) AS vals,
         COUNT(*) AS n_obs
  FROM events GROUP BY user_id
),
folded AS (
  SELECT user_id, n_obs,
         list_reduce(
           list_concat([[vals[1], 0.0, 0.0, vals[1], 0.0]],
                       list_transform(vals[2:],
                                      x -> [x, 0.0, 0.0, 0.0, 0.0])),
           (acc, x) -> [
             CAST({_FE_A!r} AS DOUBLE) * x[1]
             + CAST({1.0 - _FE_A!r} AS DOUBLE) * acc[1],
             acc[2] + abs(x[1] - acc[1]),
             acc[3] + abs(x[1] - acc[4]),
             x[1],
             acc[5] + 1.0
           ]) AS st
  FROM ordered
)
SELECT user_id, n_obs,
       ROUND(st[2] / st[5], 8) AS mae_ewma,
       ROUND(st[3] / st[5], 8) AS mae_naive,
       ROUND(st[2] / st[3], 8) AS mase
FROM folded WHERE st[5] > 0 AND st[3] > 0
""")
def ts_forecast_eval(spark, sf):
    """Walk-forward forecast evaluation per user: one-step-ahead MAE
    of the EWMA forecaster vs the naive (last value) baseline, and
    their ratio (MASE < 1 = smoothing beats naive).  The whole
    walk-forward loop is ONE sequential fold -- state
    [ewma, err_ewma, err_naive, prev, n] rides a 5-element array, the
    same collect_list + F.aggregate shape as ts_ewma; flat or
    single-observation series are excluded (no error scale)."""
    ev = read_table(spark, sf, "events")
    pair = F.struct(F.col("ts").alias("t"),
                    F.col("value").cast("double").alias("v"))
    per_key = (ev.groupBy("user_id")
               .agg(F.transform(F.array_sort(F.collect_list(pair)),
                                lambda s: s["v"]).alias("__vals"),
                    F.count(F.lit(1)).alias("n_obs")))
    vals = F.col("__vals")
    init = F.array(F.element_at(vals, 1), F.lit(0.0), F.lit(0.0),
                   F.element_at(vals, 1), F.lit(0.0))
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    a, ca = _FE_A, 1.0 - _FE_A

    def step(acc, x):
        return F.array(
            F.lit(a) * x + F.lit(ca) * F.element_at(acc, 1),
            F.element_at(acc, 2) + F.abs(x - F.element_at(acc, 1)),
            F.element_at(acc, 3) + F.abs(x - F.element_at(acc, 4)),
            x,
            F.element_at(acc, 5) + F.lit(1.0))

    st = F.aggregate(rest, init, step)
    out = per_key.select(
        "user_id", "n_obs",
        F.element_at(st, 2).alias("__ee"),
        F.element_at(st, 3).alias("__en"),
        F.element_at(st, 5).alias("__n"))
    return (out.where((F.col("__n") > 0) & (F.col("__en") > 0))
            .select("user_id", "n_obs",
                    F.round(F.col("__ee") / F.col("__n"), 8)
                    .alias("mae_ewma"),
                    F.round(F.col("__en") / F.col("__n"), 8)
                    .alias("mae_naive"),
                    F.round(F.col("__ee") / F.col("__en"), 8)
                    .alias("mase")))


_BURST_S, _BURST_G = 2.0, 1.0


@register("ts_burst_detect", f"""
WITH ordered AS (
  SELECT user_id,
         list(epoch_us(CAST(ts AS TIMESTAMP))
              ORDER BY epoch_us(CAST(ts AS TIMESTAMP))) AS tsl,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
),
gapped AS (
  SELECT user_id, n_events,
         list_transform(range(1, len(tsl)),
                        i -> CAST(tsl[i + 1] - tsl[i] AS DOUBLE)
                             / 1000000.0) AS gaps
  FROM ordered
),
based AS (
  SELECT user_id, n_events, gaps,
         len(gaps) AS n,
         list_reduce(list_concat([0.0], gaps), (a, x) -> a + x) AS t
  FROM gapped
  WHERE len(gaps) >= 1
),
rated AS (
  SELECT user_id, n_events, gaps,
         CAST(n AS DOUBLE) / t AS lam0,
         CAST({_BURST_S!r} AS DOUBLE) * (CAST(n AS DOUBLE) / t) AS lam1,
         CAST({_BURST_G!r} AS DOUBLE) * ln(CAST(n AS DOUBLE) + 1.0)
           AS tc
  FROM based WHERE t > 0
),
folded AS (
  SELECT user_id, n_events,
         list_reduce(
           list_concat([[0.0, 1e18]],
                       list_transform(gaps, g -> [g, 0.0])),
           (acc, x) -> [
             least(acc[1], acc[2]) - (ln(lam0) - lam0 * x[1]),
             least(acc[2], acc[1] + tc) - (ln(lam1) - lam1 * x[1])
           ]) AS st
  FROM rated
)
SELECT user_id, n_events,
       ROUND(st[1], 6) AS cost_base,
       ROUND(st[2], 6) AS cost_burst,
       st[2] < st[1] AS burst_at_end
FROM folded
""")
def ts_burst_detect(spark, sf):
    """Kleinberg-style burst detection per user: the 2-state Viterbi
    min-cost pass over inter-arrival gaps as ONE sequential fold
    (exponential negative log-densities, gamma ln(n) up-transition
    cost) -- is each user's event stream ending in a burst?  See
    operators.timeseries.burst_detect."""
    from .operators.timeseries import burst_detect
    return burst_detect(read_table(spark, sf, "events"),
                        s=_BURST_S, gamma=_BURST_G)


_ACF_LAGS = (1, 2, 3)


def _acf_sql(lags) -> str:
    parts = []
    for lag in lags:
        parts.append(f"""
SELECT event_type, {lag} AS lag, n_pairs,
       ROUND((CAST(n_pairs AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n_pairs AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n_pairs AS DOUBLE) * syy - sy * sy)), 8)
         AS acf
FROM (
  SELECT event_type, COUNT(*) AS n_pairs,
         CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(27,4))
                  * CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(27,4))
                  * CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(27,4))
                  * CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS syy
  FROM (SELECT event_type,
               CAST(value AS DOUBLE) AS x,
               LEAD(CAST(value AS DOUBLE), {lag}) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id) AS y
        FROM events)
  WHERE y IS NOT NULL
  GROUP BY event_type
)""")
    return "\nUNION ALL".join(parts)


@register("ts_acf", _acf_sql(_ACF_LAGS))
def ts_acf(spark, sf):
    """Autocorrelation function at lags 1-3 per metric: Pearson r of
    the series against its lead, from decimal-exact moments (the
    ab_test_welch discipline) so every engine derives the identical
    coefficient -- the is-there-serial-structure diagnostic run before
    trusting i.i.d. assumptions (CUSUM thresholds, bootstrap CIs).
    One lead window + one moments aggregate per lag."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    v = F.col("value").cast("double")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    outs = []
    for lag in _ACF_LAGS:
        pairs = (ev.select("event_type", v.alias("x"),
                           F.lead(v, lag).over(w).alias("y"))
                 .where(F.col("y").isNotNull()))
        dx = F.col("x").cast("decimal(27,4)")
        dy = F.col("y").cast("decimal(27,4)")
        mom = (pairs.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n_pairs"),
                    F.sum(dx).cast("double").alias("sx"),
                    F.sum(dy).cast("double").alias("sy"),
                    F.sum(dx * dy).cast("double").alias("sxy"),
                    F.sum(dx * dx).cast("double").alias("sxx"),
                    F.sum(dy * dy).cast("double").alias("syy")))
        n = F.col("n_pairs").cast("double")
        acf = ((n * F.col("sxy") - F.col("sx") * F.col("sy"))
               / F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx"))
                        * (n * F.col("syy")
                           - F.col("sy") * F.col("sy"))))
        outs.append(mom.select("event_type", F.lit(lag).alias("lag"),
                               "n_pairs",
                               F.round(acf, 8).alias("acf")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register("ts_deseasonalized_anomaly", """
WITH hourly AS (
  SELECT event_type, EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hod,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS s
  FROM events GROUP BY 1, 2
),
overall AS (
  SELECT event_type,
         CAST(SUM(CAST(n AS DECIMAL(27,4))) AS DOUBLE) AS tn,
         CAST(SUM(CAST(s AS DECIMAL(27,4))) AS DOUBLE) AS ts
  FROM hourly GROUP BY 1
),
idx AS (
  SELECT h.event_type, h.hod,
         (h.s / h.n) / (o.ts / o.tn) AS si
  FROM hourly h JOIN overall o ON o.event_type = h.event_type
),
adj AS (
  SELECT e.event_type,
         CAST(e.value AS DOUBLE) / i.si AS v
  FROM events e
  JOIN idx i ON i.event_type = e.event_type
            AND i.hod = EXTRACT(hour FROM CAST(e.ts AS TIMESTAMP))
  WHERE i.si > 0
),
mom AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(v AS DECIMAL(27,4))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(v AS DECIMAL(27,4))
                  * CAST(v AS DECIMAL(27,4))) AS DOUBLE) AS s2
  FROM adj GROUP BY 1
),
stats AS (
  SELECT event_type, n, s1 / n AS mean,
         sqrt((s2 - (s1 * s1) / n) / (n - 1)) AS sd
  FROM mom
)
SELECT a.event_type, s.n,
       COUNT(*) FILTER (WHERE abs(a.v - s.mean) > 3 * s.sd)
         AS n_anomalies,
       ROUND(s.mean, 6) AS deseasonalized_mean
FROM adj a JOIN stats s ON s.event_type = a.event_type
GROUP BY a.event_type, s.n, s.mean, s.sd
""")
def ts_deseasonalized_anomaly(spark, sf):
    """Deseasonalized anomaly counts: divide each value by its metric's
    hour-of-day seasonal index (ts_seasonal_index), then 3-sigma count
    on the adjusted series with decimal-exact moments -- the
    composition that stops daily rhythm from masquerading as
    anomalies.  Two dimension-sized aggregates + one broadcast-index
    join; nothing event-squared."""
    ev = read_table(spark, sf, "events")
    from .operators.relational import dsum
    v = F.col("value").cast("double")
    hourly = (ev.groupBy("event_type",
                         F.hour(F.col("ts").cast("timestamp"))
                         .alias("hod"))
              .agg(F.count(F.lit(1)).alias("n"), dsum(v).alias("s")))
    overall = (hourly.groupBy("event_type")
               .agg(dsum(F.col("n").cast("double")).alias("tn"),
                    dsum(F.col("s")).alias("ts")))
    idx = (hourly.join(F.broadcast(overall), "event_type")
           .select("event_type", "hod",
                   ((F.col("s") / F.col("n"))
                    / (F.col("ts") / F.col("tn"))).alias("si")))
    adj = (ev.select("event_type",
                     F.hour(F.col("ts").cast("timestamp")).alias("hod"),
                     v.alias("v0"))
           .join(F.broadcast(idx), ["event_type", "hod"])
           .where(F.col("si") > 0)
           .select("event_type", (F.col("v0") / F.col("si")).alias("v")))
    dec = F.col("v").cast("decimal(27,4)")
    mom = (adj.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(dec).cast("double").alias("s1"),
                F.sum(dec * dec).cast("double").alias("s2")))
    n = F.col("n").cast("double")
    stats = mom.select("event_type", "n",
                       (F.col("s1") / n).alias("mean"),
                       F.sqrt((F.col("s2")
                               - (F.col("s1") * F.col("s1")) / n)
                              / (n - 1)).alias("sd"))
    return (adj.join(F.broadcast(stats), "event_type")
            .groupBy("event_type", "n", "mean", "sd")
            .agg(F.count(F.when(F.abs(F.col("v") - F.col("mean"))
                                > 3 * F.col("sd"), 1))
                 .alias("n_anomalies"))
            .select("event_type", "n", "n_anomalies",
                    F.round("mean", 6).alias("deseasonalized_mean")))


@register("ts_rate_shift", """
WITH spans AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE event_id % 2 = 0) AS n0,
         COUNT(*) FILTER (WHERE event_id % 2 = 1) AS n1
  FROM events GROUP BY 1
)
SELECT event_type, n0, n1,
       ROUND((CAST(n1 AS DOUBLE) - n0)
             / sqrt(CAST(n0 + n1 AS DOUBLE)), 8) AS rate_z,
       abs((CAST(n1 AS DOUBLE) - n0)
           / sqrt(CAST(n0 + n1 AS DOUBLE))) > 3.0 AS shifted
FROM spans WHERE n0 + n1 > 0
""")
def ts_rate_shift(spark, sf):
    """Poisson rate-shift test per metric between the two
    deterministic halves (event_id parity): under equal rates
    (n1 - n0)/sqrt(n0 + n1) is approximately standard normal, so
    |z| > 3 flags a volume shift -- the counting-side sibling of the
    value-side PSI/Welch audits.  One grouped conditional count."""
    ev = read_table(spark, sf, "events")
    spans = (ev.groupBy("event_type")
             .agg(F.count(F.when(F.pmod(F.col("event_id"), F.lit(2))
                                 == 0, 1)).alias("n0"),
                  F.count(F.when(F.pmod(F.col("event_id"), F.lit(2))
                                 == 1, 1)).alias("n1")))
    z = ((F.col("n1").cast("double") - F.col("n0"))
         / F.sqrt((F.col("n0") + F.col("n1")).cast("double")))
    return (spans.where(F.col("n0") + F.col("n1") > 0)
            .select("event_type", "n0", "n1",
                    F.round(z, 8).alias("rate_z"),
                    (F.abs(z) > 3.0).alias("shifted")))


_COV_HOLD_US = 5 * 60 * 1000000  # each event covers 5 minutes


@register("ts_interval_coverage", f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS s,
         epoch_us(CAST(ts AS TIMESTAMP)) + {_COV_HOLD_US} AS e
  FROM events
),
ordered AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max_e
  FROM iv
),
segs AS (
  SELECT user_id,
         CASE WHEN prev_max_e IS NULL OR prev_max_e < s
              THEN e - s
              ELSE GREATEST(e - prev_max_e, 0) END AS covered
  FROM ordered
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(covered) AS BIGINT) AS covered_micros,
       ROUND(CAST(SUM(covered) AS DOUBLE) / 60000000.0, 6)
         AS covered_minutes
FROM segs GROUP BY user_id
""")
def ts_interval_coverage(spark, sf):
    """Interval-union coverage per user: each event opens a 5-minute
    activity window; overlapping windows must not double-count, so
    each interval contributes only the part past the running max end
    (the sweep-line union-length trick -- one ordered window, exact
    integer microseconds).  The billing/SLA 'active time' metric that
    naive duration sums overstate."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    mic = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select("user_id", mic.alias("s"),
                   (mic + _COV_HOLD_US).alias("e"))
    w = (W.partitionBy("user_id").orderBy("s", "e")
         .rowsBetween(W.unboundedPreceding, -1))
    ordered = iv.withColumn("prev_max_e", F.max("e").over(w))
    covered = (F.when(F.col("prev_max_e").isNull()
                      | (F.col("prev_max_e") < F.col("s")),
                      F.col("e") - F.col("s"))
               .otherwise(F.greatest(F.col("e") - F.col("prev_max_e"),
                                     F.lit(0))))
    return (ordered.select("user_id", covered.alias("covered"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 F.sum("covered").cast("long").alias("covered_micros"),
                 F.round(F.sum("covered").cast("double") / 60000000.0,
                         6).alias("covered_minutes")))


@register("ts_stickiness", """
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
),
monthly AS (
  SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS m,
         COUNT(DISTINCT user_id) AS mau
  FROM events GROUP BY 1
)
SELECT CAST(d.d AS VARCHAR) AS day, d.dau, m.mau,
       ROUND(CAST(d.dau AS DOUBLE) / m.mau, 8) AS stickiness
FROM daily d
JOIN monthly m ON m.m = date_trunc('month', CAST(d.d AS TIMESTAMP))
""")
def ts_stickiness(spark, sf):
    """DAU/MAU stickiness per day: daily distinct users over that
    month's distinct users -- the engagement ratio product analytics
    tracks next to cohort retention.  Two distinct-count aggregates +
    one month-key join; exact integer ratio."""
    ev = read_table(spark, sf, "events")
    ts = F.col("ts").cast("timestamp")
    daily = (ev.groupBy(ts.cast("date").alias("d"))
             .agg(F.countDistinct("user_id").alias("dau")))
    monthly = (ev.groupBy(F.date_trunc("month", ts).alias("m"))
               .agg(F.countDistinct("user_id").alias("mau")))
    return (daily.join(F.broadcast(monthly),
                       F.date_trunc("month",
                                    F.col("d").cast("timestamp"))
                       == F.col("m"))
            .select(F.col("d").cast("string").alias("day"),
                    "dau", "mau",
                    F.round(F.col("dau").cast("double")
                            / F.col("mau"), 8).alias("stickiness")))


_DEB_TH, _DEB_COOLDOWN_US = 95.0, 3600 * 1000000


@register("st_alert_debounce", f"""
WITH ordered AS (
  SELECT user_id,
         list(epoch_us(CAST(ts AS TIMESTAMP))
              ORDER BY ts, event_id) AS tsl,
         list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vl
  FROM events GROUP BY user_id
),
crossings AS (
  SELECT user_id,
         list_filter(
           list_transform(range(1, len(vl) + 1),
             i -> CASE WHEN vl[i] > {_DEB_TH!r}
                        AND (i = 1 OR vl[i - 1] <= {_DEB_TH!r})
                       THEN tsl[i] END),
           x -> x IS NOT NULL) AS ct
  FROM ordered
),
folded AS (
  SELECT user_id, len(ct) AS n_raw_alerts,
         list_reduce(
           list_concat([[CAST(-9223372036854775807 AS DOUBLE), 0.0]],
                       list_transform(ct, t -> [CAST(t AS DOUBLE),
                                                0.0])),
           (acc, x) -> CASE
             WHEN x[1] - acc[1] >= {_DEB_COOLDOWN_US}
             THEN [x[1], acc[2] + 1.0]
             ELSE [acc[1], acc[2]] END) AS st
  FROM crossings
)
SELECT user_id, CAST(n_raw_alerts AS BIGINT) AS n_raw_alerts,
       CAST(st[2] AS BIGINT) AS n_debounced_alerts
FROM folded WHERE n_raw_alerts > 0
""")
def st_alert_debounce(spark, sf):
    """Alert debouncing: threshold UP-crossings (value rises above
    ``_DEB_TH``) suppressed within a 1-hour cooldown of the last KEPT
    alert -- inherently sequential (each keep decision moves the
    cooldown anchor), so it runs as the house sequential fold per
    user: state [last_kept_ts, n_kept] over the crossing list.  The
    pager hygiene every alerting pipeline needs."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    pair = F.struct(F.col("ts").cast("timestamp").alias("t"),
                    F.col("event_id").alias("e"),
                    F.col("value").cast("double").alias("v"))
    per = (ev.groupBy("user_id")
           .agg(F.array_sort(F.collect_list(pair)).alias("__p")))
    tsl = F.transform(F.col("__p"),
                      lambda s: F.unix_micros(s["t"]))
    vl = F.transform(F.col("__p"), lambda s: s["v"])
    per = per.select("user_id", tsl.alias("tsl"), vl.alias("vl"))
    idx = F.sequence(F.lit(1), F.size("vl"))
    crossing_ts = F.filter(
        F.transform(idx, lambda i: F.when(
            (F.element_at("vl", i) > _DEB_TH)
            & ((i == 1)
               | (F.element_at("vl", i - 1) <= _DEB_TH)),
            F.element_at("tsl", i))),
        lambda x: x.isNotNull())
    per = per.select("user_id", crossing_ts.alias("ct"))

    def step(acc, t):
        td = t.cast("double")
        keep = td - F.element_at(acc, 1) >= _DEB_COOLDOWN_US
        return F.array(
            F.when(keep, td).otherwise(F.element_at(acc, 1)),
            F.element_at(acc, 2) + F.when(keep, F.lit(1.0))
            .otherwise(F.lit(0.0)))

    st = F.aggregate("ct",
                     F.array(F.lit(-9223372036854775807.0), F.lit(0.0)),
                     step)
    return (per.select("user_id",
                       F.size("ct").cast("long").alias("n_raw_alerts"),
                       F.element_at(st, 2).cast("long")
                       .alias("n_debounced_alerts"))
            .where(F.col("n_raw_alerts") > 0))


@register("st_disorder", """
WITH seq AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id ORDER BY event_id) AS prev_t
  FROM events
)
SELECT user_id,
       COUNT(prev_t) AS n_pairs,
       COUNT(CASE WHEN t < prev_t THEN 1 END) AS n_inversions,
       ROUND(CAST(COUNT(CASE WHEN t < prev_t THEN 1 END) AS DOUBLE)
             / COUNT(prev_t), 8) AS inversion_rate,
       CAST(COALESCE(MAX(CASE WHEN t < prev_t THEN prev_t - t END), 0)
            AS BIGINT) AS max_backwards_micros
FROM seq GROUP BY user_id
HAVING COUNT(prev_t) > 0
""")
def st_disorder(spark, sf):
    """Stream out-of-orderness audit per user: adjacent-arrival
    (event_id order) timestamp inversions and the worst backwards jump
    -- EXACTLY the measurement that sizes a watermark delay (set it
    above max_backwards and bounded-state streaming drops nothing).
    One lag window per key."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("event_id")
    seq = ev.select("user_id", t.alias("t"),
                    F.lag(t).over(w).alias("prev_t"))
    inv = F.when(F.col("t") < F.col("prev_t"), 1)
    back = F.when(F.col("t") < F.col("prev_t"),
                  F.col("prev_t") - F.col("t"))
    return (seq.groupBy("user_id")
            .agg(F.count("prev_t").alias("n_pairs"),
                 F.count(inv).alias("n_inversions"),
                 F.round(F.count(inv).cast("double")
                         / F.count("prev_t"), 8)
                 .alias("inversion_rate"),
                 F.coalesce(F.max(back), F.lit(0)).cast("long")
                 .alias("max_backwards_micros"))
            .where(F.col("n_pairs") > 0))


@register("ts_durbin_watson", """
WITH e0 AS (
  SELECT event_type, ts, event_id,
         CAST(value AS DOUBLE)
         - (CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER (
              PARTITION BY event_type) AS DOUBLE)
            / COUNT(*) OVER (PARTITION BY event_type)) AS e
  FROM events
),
resid AS (
  SELECT event_type, e,
         LAG(e) OVER (PARTITION BY event_type
                      ORDER BY ts, event_id) AS e_prev
  FROM e0
)
SELECT event_type, COUNT(e_prev) AS n_pairs,
       ROUND(CAST(SUM(CASE WHEN e_prev IS NOT NULL THEN
                      CAST((e - e_prev) * (e - e_prev) AS DECIMAL(27,6))
                      ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(e * e AS DECIMAL(27,6))) AS DOUBLE), 8)
         AS durbin_watson
FROM resid
GROUP BY event_type
""")
def ts_durbin_watson(spark, sf):
    """Durbin-Watson statistic per metric: serial correlation of
    mean-residuals in event-time order (~2 = independent, <2 =
    positive autocorrelation) -- the regression-residual diagnostic
    next to ts_acf.  The mean comes from a decimal-exact window so
    residuals are engine-identical; squared-difference sums are
    decimal-cast.  The denominator sums e^2 over ALL residuals
    (textbook DW), including each group's first row, whose lagged
    difference cannot exist -- the numerator is conditional instead of
    the rows being filtered (ADVICE round 3)."""
    from pyspark.sql import Window as W
    ev = read_table(spark, sf, "events")
    wp = W.partitionBy("event_type")
    wo = W.partitionBy("event_type").orderBy("ts", "event_id")
    mean = (F.sum(F.col("value").cast("decimal(27,4)")).over(wp)
            .cast("double") / F.count(F.lit(1)).over(wp))
    e = F.col("value").cast("double") - mean
    resid = ev.select("event_type", e.alias("e"),
                      F.lag(e).over(wo).alias("e_prev"))
    d = F.col("e") - F.col("e_prev")
    num = F.when(F.col("e_prev").isNotNull(),
                 (d * d).cast("decimal(27,6)")) \
        .otherwise(F.lit(0).cast("decimal(27,6)"))
    return (resid.groupBy("event_type")
            .agg(F.count("e_prev").alias("n_pairs"),
                 F.round(F.sum(num).cast("double")
                         / F.sum((F.col("e") * F.col("e"))
                                 .cast("decimal(27,6)"))
                         .cast("double"), 8).alias("durbin_watson")))


@register("st_doc_curation", """
WITH t AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks,
         CAST(length(text) AS DOUBLE) AS n_char
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok, n_char,
         (n_char - CAST(length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                        AS DOUBLE)) AS n_alpha,
         CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'to', 'in', 'is'))) AS DOUBLE)
           AS n_stop
  FROM t
),
q AS (
  SELECT doc_id,
         least(n_tok / 100, 1.0) * 0.3
           + (CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) * 0.3
           + (CASE WHEN n_char > 0 THEN n_alpha / n_char ELSE 0.0 END) * 0.4
           AS quality_score
  FROM m
),
f AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
           AS fingerprint
  FROM documents
),
g AS (
  SELECT f.fingerprint,
         COUNT(*) AS n_docs,
         MIN(f.doc_id) AS first_id,
         arg_min(m.n_tok, f.doc_id) AS tok_first,
         arg_min(q.quality_score, f.doc_id) AS q_first
  FROM f
  JOIN m ON m.doc_id = f.doc_id
  JOIN q ON q.doc_id = f.doc_id
  GROUP BY 1
)
SELECT fingerprint, CAST(n_docs AS BIGINT) AS n_docs, first_id,
       CASE WHEN tok_first < 15 THEN 'too_short'
            WHEN q_first < 0.45 THEN 'low_quality'
            ELSE 'kept' END AS status
FROM g
""")
def st_doc_curation(spark, sf):
    """Streaming-ingest curation (streaming-ready: identical plan over
    streaming.stream_documents + complete mode, pinned stream==batch
    by pytest): as documents arrive, maintain per-fingerprint groups
    -- dup count, first-seen doc, and the CANONICAL doc's
    length/quality verdict via min_by -- so the curation report is
    continuously current instead of recomputed after each crawl
    lands.

    Scale shape: one streaming groupBy on the 32-byte fingerprint
    (state = one row per distinct document text, the same cardinality
    the batch dedup shuffles); all per-doc features are stateless
    scan-side codegen.  In production the state store gets a TTL of
    the crawl-revisit horizon."""
    from .streaming import doc_curation_groups
    docs = read_table(spark, sf, "documents")
    return doc_curation_groups(docs)
