"""Time-series operators (EXT): the hypertable-style surface a metric
store needs over the driver's ``events`` stream -- exponential
smoothing and gap-filled resampling.  No time-series abstraction
exists in the reference (only ``year`` columns, SURVEY.md §1.3); these
are north-star extensions built the Spark-first way: arrays + higher-
order functions and windows, never a row-at-a-time UDF.

Determinism: EWMA is a SEQUENTIAL left fold over the per-key
time-ordered value list -- Spark ``F.aggregate`` and DuckDB
``list_reduce`` execute the identical operation chain, so results are
bit-equal (the same contract the ANN cosine kernels rely on).
Resampling emits exact bucket timestamps and forward-fills by carrying
the last non-null observation -- value-equal however the engine
implements the carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma(events: DataFrame, key_col: str = "user_id",
         ts_col: str = "ts", value_col: str = "value",
         alpha: float = 0.5) -> DataFrame:
    """Exponentially-weighted moving average per key:
    ``s_1 = x_1; s_t = alpha * x_t + (1 - alpha) * s_{t-1}`` over the
    time-ascending series; returns the final smoothed level (the
    streaming-forecast baseline).

    The recursion is a sequential left fold, so it runs as ONE
    ``collect_list`` (time-ordered via sort_array over (ts, value)
    structs -- unique timestamps per key make the order total) + one
    ``F.aggregate`` -- a single key-partitioned shuffle, all fold
    arithmetic inside codegen.  Per-key state is the key's row list:
    bounded by series length, the applyInPandas-free shape for
    dimension-cardinality keys.  (For unbounded series, window it
    first -- compose with tumbling_agg.)"""
    pair = F.struct(F.col(ts_col).alias("t"),
                    F.col(value_col).cast("double").alias("v"))
    per_key = (events.groupBy(key_col)
               .agg(F.transform(
                   F.array_sort(F.collect_list(pair)),
                   lambda s: s["v"]).alias("__vals"),
                   F.count(F.lit(1)).alias("n_obs")))
    folded = F.aggregate(
        F.slice(F.col("__vals"), 2,
                F.greatest(F.size("__vals") - 1, F.lit(0))),
        F.element_at(F.col("__vals"), 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc)
    return per_key.select(key_col, "n_obs",
                          folded.alias("ewma_value"))


def resample_ffill(events: DataFrame, bucket: str = "1 hour",
                   key_col: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value") -> DataFrame:
    """Gap-filled resampling (the hypertable / time_bucket_gapfill
    shape): per key, one row per ``bucket`` between the key's first
    and last observation; buckets with data carry that bucket's LAST
    observation (by (ts, value) order), empty buckets forward-fill the
    previous carried value.

    Scale shape: the per-bucket last-observation collapse is a
    map-side-combinable MAX of (ts, value) structs; the dense grid
    comes from one ``sequence`` + explode per key (grid-sized, not
    event-sized); the forward fill is one ``last(ignorenulls)`` window
    per key ordered by bucket.  Everything shuffles on the key."""
    b = F.window(ts_col, bucket)["start"]
    per_bucket = (events
                  .groupBy(key_col, b.alias("bucket"))
                  .agg(F.max(F.struct(F.col(ts_col).alias("t"),
                                      F.col(value_col).cast("double")
                                      .alias("v"))
                             ).alias("__last"),
                       F.count(F.lit(1)).alias("n_events")))
    span = (per_bucket.groupBy(key_col)
            .agg(F.min("bucket").alias("__lo"),
                 F.max("bucket").alias("__hi")))
    grid = span.select(
        key_col,
        F.explode(F.sequence("__lo", "__hi",
                             F.expr(f"INTERVAL {bucket}")))
        .alias("bucket"))
    joined = (grid.join(per_bucket, [key_col, "bucket"], "left")
              .select(key_col, "bucket",
                      F.coalesce("n_events", F.lit(0)).alias("n_events"),
                      F.col("__last.v").alias("__obs")))
    w = (Window.partitionBy(key_col).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        key_col, "bucket", "n_events",
        F.last("__obs", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("__obs").isNull().alias("is_gap"))


def twap(events: DataFrame, key_col: str = "user_id",
         ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Time-weighted average value per key (TWAP): each observation
    holds until the key's next one, so its weight is that holding
    duration in seconds; the last observation of a key carries no
    weight (no known holding period -- the standard open-interval
    convention).

    The irregular-sampling average every metering / pricing / sensor
    pipeline needs: a plain AVG over-weights bursts of closely-spaced
    samples.  One lead window per key + one aggregate; weights are
    exact integer microsecond differences and the weighted sum runs
    over decimal-cast addends, so the result is engine-exact.  Keys
    with a single observation yield NULL (zero total duration)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    # exact integer microseconds (unix_micros == DuckDB epoch_us), so
    # weights carry no float error and the sums are decimal-exact
    mic = F.unix_micros(F.col(ts_col).cast("timestamp"))
    span = F.lead(mic).over(w) - mic
    weighted = events.select(
        key_col, F.col(value_col).alias("__v"), span.alias("__w"))
    return (weighted.where(F.col("__w").isNotNull())
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 (F.sum(F.col("__w")).cast("double") / F.lit(1e6))
                 .alias("total_seconds"),
                 # value is a 2-decimal quantity: decimal(18,2) * the
                 # integer micros weight stays EXACT (no double->
                 # decimal rounding of 16-digit products, which the
                 # two engines round differently at the last ulp)
                 # the scaled numerator can exceed 2^53, where the
                 # engines' decimal->double conversions differ by an
                 # ulp -- round the quotient to 6dp (the repo-standard
                 # cross-engine stabilizer for derived ratios)
                 F.round(F.sum(F.col("__v").cast("decimal(18,2)")
                               * F.col("__w")).cast("double")
                         / F.sum(F.col("__w")).cast("double"), 6)
                 .alias("twap")))


def holt_linear(events: DataFrame, key_col: str = "user_id",
                ts_col: str = "ts", value_col: str = "value",
                alpha: float = 0.5, beta: float = 0.3) -> DataFrame:
    """Holt's linear (double exponential) smoothing per key: level AND
    trend state, the one-step-ahead forecaster for trending series
    (:func:`ewma` is the no-trend special case).

    ``l_2 = x_2, b_2 = x_2 - x_1`` (``l_1 = x_1, b_1 = 0`` for a
    singleton series), then for each subsequent observation
    ``l_t = alpha x_t + (1-alpha)(l + b);  b_t = beta (l_t - l) +
    (1-beta) b``.  The state rides the fold as a 2-element double
    array, so the whole recursion is STILL one collect_list + one
    ``F.aggregate`` per key (identical scale shape and bit-equality
    contract as :func:`ewma` -- DuckDB list_reduce executes the same
    operation chain, with the (1-alpha)/(1-beta) coefficients
    interpolated as repr() so both engines parse the identical IEEE
    double).  Output: (key, n_obs, level, trend, forecast_1 =
    level + trend)."""
    pair = F.struct(F.col(ts_col).alias("t"),
                    F.col(value_col).cast("double").alias("v"))
    per_key = (events.groupBy(key_col)
               .agg(F.transform(
                   F.array_sort(F.collect_list(pair)),
                   lambda s: s["v"]).alias("__vals"),
                   F.count(F.lit(1)).alias("n_obs")))
    vals = F.col("__vals")
    init = F.array(
        F.when(F.size(vals) >= 2, F.element_at(vals, 2))
        .otherwise(F.element_at(vals, 1)),
        F.when(F.size(vals) >= 2,
               F.element_at(vals, 2) - F.element_at(vals, 1))
        .otherwise(F.lit(0.0)))
    rest = F.slice(vals, 3, F.greatest(F.size(vals) - 2, F.lit(0)))
    a, b1 = alpha, beta
    ca, cb = 1.0 - alpha, 1.0 - beta

    def step(acc, x):
        new_l = F.lit(a) * x + F.lit(ca) * (F.element_at(acc, 1)
                                            + F.element_at(acc, 2))
        new_b = (F.lit(b1) * (new_l - F.element_at(acc, 1))
                 + F.lit(cb) * F.element_at(acc, 2))
        return F.array(new_l, new_b)

    folded = F.aggregate(rest, init, step)
    return per_key.select(
        key_col, "n_obs",
        F.element_at(folded, 1).alias("level"),
        F.element_at(folded, 2).alias("trend"),
        (F.element_at(folded, 1) + F.element_at(folded, 2))
        .alias("forecast_1"))


def cusum(events: DataFrame, key_col: str = "user_id",
          ts_col: str = "ts", value_col: str = "value",
          drift: float = 0.5, threshold: float = 5.0) -> DataFrame:
    """One-sided CUSUM change-point detection per key:
    ``s_t = max(0, s_{t-1} + (x_t - mean_key) / sd_key - drift)`` over
    the time-ordered series; an alarm fires whenever s crosses
    ``threshold`` (s then resets -- the standard repeated-alarm form).
    The sequential detector a metrics pipeline runs after resampling.

    One aggregate pass computes decimal-exact moments (s1, s2 -- the
    ab_test_welch discipline, so mean and sd are engine-identical
    doubles, never a float-accumulated stddev) ALONGSIDE the value
    list; the same collect_list + F.aggregate fold as
    :func:`ewma`/:func:`holt_linear` then runs the detector -- the
    state [s, n_alarms, max_s] rides as a 3-element double array.
    Keys with sd = 0 report no alarms (flat series cannot drift).
    Output: (key, n_obs, mean, max_cusum, n_alarms)."""
    pair = F.struct(F.col(ts_col).alias("t"),
                    F.col(value_col).cast("double").alias("v"))
    dec = F.col(value_col).cast("decimal(27,4)")
    per_key = (events.groupBy(key_col)
               .agg(F.transform(
                   F.array_sort(F.collect_list(pair)),
                   lambda s: s["v"]).alias("__vals"),
                   F.count(F.lit(1)).alias("n_obs"),
                   F.sum(dec).cast("double").alias("__s1"),
                   F.sum(dec * dec).cast("double").alias("__s2")))
    n = F.col("n_obs").cast("double")
    mean = F.col("__s1") / n
    var = (F.col("__s2") - (F.col("__s1") * F.col("__s1")) / n) / (n - 1)
    sd = F.sqrt(var)

    def step(acc, x):
        z = (x - mean) / sd - F.lit(drift)
        s_new = F.greatest(F.lit(0.0), F.element_at(acc, 1) + z)
        alarm = s_new > F.lit(threshold)
        return F.array(
            F.when(alarm, F.lit(0.0)).otherwise(s_new),
            F.element_at(acc, 2) + F.when(alarm, F.lit(1.0))
            .otherwise(F.lit(0.0)),
            F.greatest(F.element_at(acc, 3), s_new))

    folded = F.aggregate(F.col("__vals"),
                         F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)),
                         step)
    return per_key.select(
        key_col, "n_obs", F.round(mean, 8).alias("mean"),
        F.when(sd.isNull() | (sd <= 0), F.lit(0.0))
        .otherwise(F.round(F.element_at(folded, 3), 8))
        .alias("max_cusum"),
        F.when(sd.isNull() | (sd <= 0), F.lit(0))
        .otherwise(F.element_at(folded, 2).cast("long"))
        .alias("n_alarms"))


def burst_detect(events: DataFrame, key_col: str = "user_id",
                 ts_col: str = "ts", s: float = 2.0,
                 gamma: float = 1.0) -> DataFrame:
    """Kleinberg-style burst detection (2-state automaton) per key:
    inter-arrival gaps are scored under a base rate (state 0,
    lambda0 = n/T) and a burst rate (state 1, s * lambda0); the
    VITERBI min-cost forward pass -- exponential negative
    log-densities plus a gamma*ln(n) cost per up-transition -- runs as
    ONE sequential fold carrying the two path costs [c0, c1].

    Output per key: final costs and whether the cheapest path ends in
    the burst state (``burst_at_end``) -- the streaming-rate-anomaly
    primitive behind trending-topic and incident detectors.  Keys
    with < 2 events or zero time span are excluded (no rate).  Same
    collect_list + F.aggregate shape and bit-equality contract as the
    EWMA/CUSUM folds."""
    mic = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_key = (events.groupBy(key_col)
               .agg(F.array_sort(F.collect_list(mic)).alias("__ts"),
                    F.count(F.lit(1)).alias("n_events")))
    ts_arr = F.col("__ts")
    gaps = F.zip_with(
        F.slice(ts_arr, 2, F.greatest(F.size(ts_arr) - 1, F.lit(0))),
        F.slice(ts_arr, 1, F.greatest(F.size(ts_arr) - 1, F.lit(0))),
        lambda b, a: (b - a).cast("double") / F.lit(1e6))
    per_key = (per_key.withColumn("__gaps", gaps)
               .withColumn("__n", F.size("__gaps"))
               .withColumn("__t", F.aggregate(
                   "__gaps", F.lit(0.0), lambda acc, x: acc + x))
               .where((F.col("__n") >= 1) & (F.col("__t") > 0)))
    lam0 = F.col("__n").cast("double") / F.col("__t")
    lam1 = F.lit(s) * lam0
    tcost = F.lit(gamma) * F.log(F.col("__n").cast("double") + 1.0)

    def step(acc, g):
        c0, c1 = F.element_at(acc, 1), F.element_at(acc, 2)
        stay0 = F.least(c0, c1)
        stay1 = F.least(c1, c0 + tcost)
        n0 = stay0 - (F.log(lam0) - lam0 * g)
        n1 = stay1 - (F.log(lam1) - lam1 * g)
        return F.array(n0, n1)

    st = F.aggregate("__gaps", F.array(F.lit(0.0), F.lit(1e18)), step)
    return per_key.select(
        key_col, F.col("n_events"),
        F.round(F.element_at(st, 1), 6).alias("cost_base"),
        F.round(F.element_at(st, 2), 6).alias("cost_burst"),
        (F.element_at(st, 2) < F.element_at(st, 1)).alias("burst_at_end"))
