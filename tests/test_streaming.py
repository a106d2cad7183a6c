"""Structured Streaming execution tests: the same transforms the
oracle-checked batch twins use, driven over a real file-source stream
(availableNow trigger, memory sink) -- stream results must equal the
batch results row-for-row."""

import pytest
from pyspark.sql import functions as F

from graphdb_cia_factbook_spark.sources import read_table
from graphdb_cia_factbook_spark.streaming import (
    dedup_events,
    run_to_memory,
    session_agg,
    stateful_user_totals,
    stream_events,
    tumbling_agg,
    with_watermark,
)

SF = "/root/testdata/sf0.001"


def rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def batch_events(spark):
    return read_table(spark, SF, "events")


def test_stream_tumbling_equals_batch(spark, batch_events):
    sdf = tumbling_agg(with_watermark(stream_events(spark, SF)))
    run_to_memory(sdf, "t_tumbling", "complete")
    got = rows(spark.table("t_tumbling"),
               ["window_start", "event_type", "n_events", "total_value"])
    want = rows(tumbling_agg(batch_events),
                ["window_start", "event_type", "n_events", "total_value"])
    assert got == want and len(got) > 0


def test_stream_session_equals_batch(spark, batch_events):
    sdf = session_agg(with_watermark(stream_events(spark, SF)))
    run_to_memory(sdf, "t_session", "complete")
    got = rows(spark.table("t_session"),
               ["user_id", "session_start", "session_end", "n_events"])
    want = rows(session_agg(batch_events),
                ["user_id", "session_start", "session_end", "n_events"])
    assert got == want and len(got) > 0


def test_stream_dedup_append(spark, batch_events):
    sdf = dedup_events(stream_events(spark, SF))
    run_to_memory(sdf, "t_dedup", "append")
    got = rows(spark.table("t_dedup"), ["event_id"])
    want = rows(dedup_events(batch_events), ["event_id"])
    assert got == want and len(got) > 0


def test_stream_static_enrich_equals_batch(spark, batch_events):
    """Stream-static join (static customer dim broadcast per
    micro-batch, stateless) + rollup must equal the batch twin."""
    from graphdb_cia_factbook_spark.streaming import (
        enriched_segment_totals,
    )
    customers = read_table(spark, SF, "customer")
    sdf = enriched_segment_totals(stream_events(spark, SF), customers)
    run_to_memory(sdf, "t_enrich", "complete")
    cols = ["c_mktsegment", "event_type", "n_events", "total_value"]
    got = rows(spark.table("t_enrich"), cols)
    want = rows(enriched_segment_totals(batch_events, customers), cols)
    assert got == want and len(got) > 0


def test_stream_stream_interval_join(spark, batch_events):
    """Stream-stream interval join (watermarks on both sides, append
    mode) must equal the batch range join row-for-row."""
    from graphdb_cia_factbook_spark.streaming import interval_join
    sdf = interval_join(stream_events(spark, SF), watermark="1 hour")
    run_to_memory(sdf, "t_sjoin", "append")
    cols = ["user_id", "left_id", "left_ts", "right_id", "right_ts"]
    got = rows(spark.table("t_sjoin"), cols)
    want = rows(interval_join(batch_events), cols)
    assert got == want and len(got) > 0


def test_stateful_user_totals(spark, batch_events):
    sdf = stateful_user_totals(stream_events(spark, SF))
    run_to_memory(sdf, "t_state", "update")
    # update mode may emit a key several times; the last emission per
    # key must equal the batch aggregate (single batch => one emission)
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.table("t_state").collect()}
    want = {r["user_id"]: (r["n"], r["tv"]) for r in
            batch_events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
            .collect()}
    assert set(got) == set(want)
    for uid, (n, tv) in want.items():
        gn, gtv = got[uid]
        assert gn == n
        assert abs(gtv - tv) < 1e-6 * max(1.0, abs(tv))


def _split_events_files(tmp_path, n_chunks=4):
    """Slice the events parquet into time-ordered chunk files so the
    file source delivers multiple micro-batches (storage schema
    preserved verbatim, whatever ts flavor the testdata ships).

    The chunk files get STRICTLY INCREASING mtimes (10s apart, ending
    now): Spark's FileStreamSource orders files by modification time,
    and chunks written milliseconds apart can tie, making trigger
    order nondeterministic -- observed once under heavy host load as
    an out-of-event-time-order micro-batch that broke the stateful
    EWMA stream==batch bit-exactness."""
    import os
    import time
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    src = tmp_path / "stream_src"
    src.mkdir()
    t = pq.read_table(f"{SF}/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n = t.num_rows
    step = (n + n_chunks - 1) // n_chunks
    base = time.time() - 10 * n_chunks
    for i in range(n_chunks):
        path = src / f"events_{i:02d}.parquet"
        pq.write_table(t.slice(i * step, step), path)
        mt = base + 10 * (i + 1)
        os.utime(path, (mt, mt))
    return str(src)


def test_incremental_watermark_append(spark, batch_events, tmp_path):
    """Multi-micro-batch run (maxFilesPerTrigger=1): the watermark
    advances between batches, so append mode emits closed windows
    incrementally.  Every emitted window must carry exactly the batch
    aggregate's values."""
    from graphdb_cia_factbook_spark.streaming import stream_events_dir
    src = _split_events_files(tmp_path)
    stream = stream_events_dir(spark, src, SF, max_files_per_trigger=1)
    sdf = tumbling_agg(with_watermark(stream, "10 minutes"))
    run_to_memory(sdf, "t_incr", "append")
    emitted = rows(spark.table("t_incr"),
                   ["window_start", "event_type", "n_events", "total_value"])
    want = dict(((r[0], r[1]), r) for r in rows(
        tumbling_agg(batch_events),
        ["window_start", "event_type", "n_events", "total_value"]))
    assert len(emitted) > 0, "watermark never closed any window"
    for row in emitted:
        assert want[(row[0], row[1])] == row
    # append withholds windows still above the final watermark
    assert len(emitted) < len(want)


def test_foreachbatch_incremental_sink(spark, batch_events, tmp_path):
    """foreachBatch: per-micro-batch custom sink (idempotent parquet
    appends keyed by batch id) -- the escape hatch for sinks Spark
    doesn't ship natively."""
    src = _split_events_files(tmp_path)
    out = str(tmp_path / "sink")
    from graphdb_cia_factbook_spark.streaming import stream_events_dir
    stream = stream_events_dir(spark, src, SF, max_files_per_trigger=2)

    def sink(batch_df, batch_id):
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out))

    q = (stream.writeStream.foreachBatch(sink)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert back.count() == batch_events.count()
    assert back.select("batch_id").distinct().count() >= 2


def test_dropduplicates_within_watermark(spark, batch_events, tmp_path):
    from graphdb_cia_factbook_spark.streaming import (
        dedup_events_within_watermark,
    )
    src = _split_events_files(tmp_path)
    from graphdb_cia_factbook_spark.streaming import stream_events_dir
    stream = stream_events_dir(spark, src, SF, max_files_per_trigger=2)
    sdf = dedup_events_within_watermark(stream).select("event_id")
    run_to_memory(sdf, "t_wmdedup", "append")
    got = spark.table("t_wmdedup")
    # event_ids are unique in the source => pass-through cardinality
    assert got.count() == batch_events.count()
    assert got.distinct().count() == got.count()


def test_user_value_peaks_stateful(spark, batch_events, tmp_path):
    from graphdb_cia_factbook_spark.streaming import user_value_peaks
    src = _split_events_files(tmp_path)
    from graphdb_cia_factbook_spark.streaming import stream_events_dir
    stream = stream_events_dir(spark, src, SF, max_files_per_trigger=1)
    run_to_memory(user_value_peaks(stream), "t_peaks", "update")
    peaks = spark.table("t_peaks").collect()
    assert peaks, "no peaks emitted"
    want = {r.user_id: r.mx for r in
            batch_events.groupBy("user_id")
            .agg(F.max("value").alias("mx")).collect()}
    by_user = {}
    for r in peaks:
        by_user.setdefault(r.user_id, []).append(r.peak)
    for uid, ps in by_user.items():
        assert max(ps) == want[uid]       # final peak == batch max
        assert all(p <= want[uid] for p in ps)
    # every user emits at least its first-seen peak
    assert set(by_user) == set(want)


def test_concurrency_peaks_sweep_line(spark):
    import datetime as dt
    from graphdb_cia_factbook_spark.streaming import concurrency_peaks
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    mk = lambda uid, mins: (uid, t0 + dt.timedelta(minutes=mins))
    # user 1: three sessions overlapping at minute 4 (0,2,4); the one
    # at minute 10 is disjoint.  user 2: back-to-back sessions exactly
    # 5 minutes apart never overlap (half-open intervals).
    df = spark.createDataFrame(
        [mk(1, 0), mk(1, 2), mk(1, 4), mk(1, 10), mk(2, 0), mk(2, 5)],
        ["user_id", "ts"])
    rows = {r.user_id: r.peak_concurrency
            for r in concurrency_peaks(df, "5 minutes").collect()}
    assert rows[1] == 3
    assert rows[2] == 1


def test_sessionize_gap_boundaries(spark):
    import datetime as dt
    from graphdb_cia_factbook_spark.streaming import sessionize
    t0 = dt.datetime(2026, 1, 1, 9, 0, 0)
    mk = lambda eid, uid, mins: (eid, uid, t0 + dt.timedelta(minutes=mins))
    df = spark.createDataFrame(
        [mk(1, 7, 0), mk(2, 7, 10), mk(3, 7, 50), mk(4, 7, 55),
         mk(5, 8, 0)],
        ["event_id", "user_id", "ts"])
    rows = {r.event_id: r.session_seq
            for r in sessionize(df, gap_seconds=1800).collect()}
    # 40-min gap between events 2 and 3 opens session 2 for user 7
    assert rows[1] == 1 and rows[2] == 1
    assert rows[3] == 2 and rows[4] == 2
    assert rows[5] == 1


def test_foreach_batch_sink_idempotent(spark, batch_events, tmp_path):
    """Multi-batch foreachBatch parquet sink: all input rows land
    exactly once, and replaying a batch (the crash-recovery case)
    leaves the row count unchanged because the batch overwrites its
    own partition."""
    from graphdb_cia_factbook_spark.streaming import (
        foreach_batch_parquet_sink,
        stream_events_dir,
    )
    src = _split_events_files(tmp_path)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = stream_events_dir(spark, src, SF, max_files_per_trigger=1)
    q = foreach_batch_parquet_sink(
        stream.select("event_id", "ts", "user_id"), out, ckpt)
    q.awaitTermination()
    back = spark.read.parquet(out)
    n_in = batch_events.count()
    assert back.count() == n_in
    assert back.select("event_id").distinct().count() == n_in
    n_batches = back.select("__batch_id").distinct().count()
    assert n_batches >= 2            # maxFilesPerTrigger=1 split it

    # simulate a replay of batch 0: rewrite the same partition
    replay = back.where("__batch_id = 0").drop("__batch_id")
    (replay.withColumn("__batch_id", F.lit(0))
     .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     .partitionBy("__batch_id").parquet(out))
    assert spark.read.parquet(out).count() == n_in


def test_windowed_topk_rank_and_tiebreak(spark):
    from graphdb_cia_factbook_spark.streaming import windowed_topk
    rows = [
        # window 00:00 -- click total 30, view 30 (tie -> click first),
        # error 5
        ("2024-01-01 00:10:00", "click", 30.0),
        ("2024-01-01 00:20:00", "view", 10.0),
        ("2024-01-01 00:30:00", "view", 20.0),
        ("2024-01-01 00:40:00", "error", 5.0),
        # window 01:00 -- only one type
        ("2024-01-01 01:10:00", "click", 1.0),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, "
                                     "value double") \
        .selectExpr("CAST(ts AS TIMESTAMP) ts", "event_type", "value")
    got = [(r.window_start.hour, r.rank, r.event_type)
           for r in windowed_topk(df, "1 hour", k=2)
           .orderBy("window_start", "rank").collect()]
    assert got == [(0, 1, "click"), (0, 2, "view"), (1, 1, "click")]


def test_ewma_fold_and_single_obs(spark):
    from graphdb_cia_factbook_spark.operators.timeseries import ewma
    rows = [(1, "2024-01-01 00:00:00", 10.0),
            (1, "2024-01-01 01:00:00", 20.0),
            (1, "2024-01-01 02:00:00", 40.0),
            (2, "2024-01-01 00:00:00", 7.0)]
    df = spark.createDataFrame(rows, "user_id long, ts string, "
                                     "value double") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "value")
    got = {r.user_id: r for r in ewma(df, alpha=0.5).collect()}
    # s1=10, s2=0.5*20+0.5*10=15, s3=0.5*40+0.5*15=27.5
    assert got[1].ewma_value == 27.5 and got[1].n_obs == 3
    assert got[2].ewma_value == 7.0 and got[2].n_obs == 1


def test_resample_ffill_carries_through_gaps(spark):
    from graphdb_cia_factbook_spark.operators.timeseries import (
        resample_ffill,
    )
    rows = [(1, "2024-01-01 00:10:00", 5.0),
            (1, "2024-01-01 00:50:00", 6.0),   # same bucket, later wins
            (1, "2024-01-01 03:20:00", 9.0)]   # 2 empty buckets between
    df = spark.createDataFrame(rows, "user_id long, ts string, "
                                     "value double") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "value")
    got = sorted(resample_ffill(df, "1 hour").collect(),
                 key=lambda r: r.bucket)
    assert len(got) == 4                       # 00,01,02,03
    assert [r.value_ffill for r in got] == [6.0, 6.0, 6.0, 9.0]
    assert [r.is_gap for r in got] == [False, True, True, False]
    assert [r.n_events for r in got] == [2, 0, 0, 1]


def test_windowed_topk_streaming_foreachbatch(spark, tmp_path,
                                              batch_events):
    """The deployment path windowed_topk documents: incremental
    windowed aggregate under readStream + watermark, rank applied in
    foreachBatch over CLOSED (append-mode) windows.  Every emitted
    window's top-k must equal the batch answer for that window."""
    from graphdb_cia_factbook_spark.streaming import (
        stream_events_dir,
        tumbling_agg,
        windowed_topk,
        with_watermark,
    )
    src = _split_events_files(tmp_path)
    out = str(tmp_path / "topk_sink")
    stream = stream_events_dir(spark, src, SF, max_files_per_trigger=1)
    sdf = tumbling_agg(with_watermark(stream, "10 minutes"))

    def rank_sink(batch_df, batch_id):
        from pyspark.sql import Window as W
        w = W.partitionBy("window_start").orderBy(
            F.desc("total_value"), F.asc("event_type"))
        (batch_df.withColumn("rank", F.row_number().over(w))
         .where(F.col("rank") <= 3)
         .write.mode("append").parquet(out))

    q = (sdf.writeStream.foreachBatch(rank_sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.read.parquet(out)
    want = {(r.window_start, r.rank): (r.event_type, r.n_events)
            for r in windowed_topk(batch_events, "1 hour", 3).collect()}
    emitted = got.collect()
    assert emitted, "no closed windows emitted"
    for r in emitted:
        assert want[(r.window_start, r.rank)] == (r.event_type,
                                                  r.n_events)


def test_stream_outer_interval_join(spark, batch_events):
    """LEFT OUTER stream-stream interval join: matched rows must equal
    the batch join exactly; null-padded (unconverted) rows must be a
    subset of the batch nulls, and every left row old enough that the
    final watermark proves no match can arrive must have emitted."""
    from graphdb_cia_factbook_spark.streaming import interval_join_outer
    sdf = interval_join_outer(stream_events(spark, SF), watermark="1 hour")
    run_to_memory(sdf, "t_sjoin_outer", "append")
    cols = ["user_id", "left_id", "left_ts", "right_id", "right_ts"]
    got = spark.table("t_sjoin_outer")
    want = interval_join_outer(batch_events)
    assert rows(got.where("right_id IS NOT NULL"), cols) == \
        rows(want.where("right_id IS NOT NULL"), cols)
    got_null = rows(got.where("right_id IS NULL"), cols)
    want_null = rows(want.where("right_id IS NULL"), cols)
    assert set(got_null) <= set(want_null)
    # rows provably unmatched under the final watermark must have
    # emitted.  The query's global watermark is the MIN across both
    # withWatermark nodes (each side tracks its own max event time),
    # and a left row may null-emit only once watermark > left_ts +
    # within -- so the horizon derives from the SLOWER side's max,
    # minus delay (1h), the join bound (30m), and a safety margin
    import datetime
    max_l = batch_events.where("event_type = 'click'") \
        .agg(F.max("ts")).first()[0]
    max_r = batch_events.where("event_type = 'purchase'") \
        .agg(F.max("ts")).first()[0]
    horizon = min(max_l, max_r) - datetime.timedelta(hours=1, minutes=45)
    must_emit = [r for r in want_null if r[2] < horizon]
    assert set(must_emit) <= set(got_null)
    assert len(must_emit) > 0 and len(got_null) > 0


def test_stateful_ewma_multibatch_matches_batch_fold(spark, tmp_path):
    """The streaming EWMA state carried across 4 time-ordered
    micro-batches must equal the batch sequential fold exactly (same
    float operation chain, just split across batches)."""
    from graphdb_cia_factbook_spark.streaming import (
        run_to_memory, stateful_user_ewma, stream_events_dir)
    from graphdb_cia_factbook_spark.operators.timeseries import ewma
    from graphdb_cia_factbook_spark.sources import read_table

    src = _split_events_files(tmp_path, n_chunks=4)
    sdf = stateful_user_ewma(
        stream_events_dir(spark, src, SF, max_files_per_trigger=1))
    run_to_memory(sdf, "t_sewma", "update")
    # update mode re-emits keys; keep the LAST emission per user
    emitted = spark.table("t_sewma").collect()
    got = {}
    for r in emitted:                       # memory sink appends in order
        got[r["user_id"]] = (r["n_obs"], r["ewma_value"])
    want = {r["user_id"]: (r["n_obs"], r["ewma_value"])
            for r in ewma(read_table(spark, SF, "events"),
                          alpha=0.5).collect()}
    assert set(got) == set(want)
    for uid, (n, s) in want.items():
        gn, gs = got[uid]
        assert gn == n, uid
        assert gs == s, uid                 # bit-exact: same op chain


def test_stream_doc_curation_equals_batch(spark):
    """The st_doc_curation plan produces IDENTICAL per-fingerprint
    verdicts when run over the document stream (complete mode) as
    over the batch table -- the stream==batch contract for the
    curation surface."""
    from graphdb_cia_factbook_spark.registry import queries
    from graphdb_cia_factbook_spark.streaming import (
        doc_curation_groups, run_to_memory, stream_documents)
    batch = queries()["st_doc_curation"](spark, SF)
    sdf = doc_curation_groups(stream_documents(spark, SF))
    run_to_memory(sdf, "t_doc_curation", "complete")
    cols = ["fingerprint", "n_docs", "first_id", "status"]
    assert rows(spark.table("t_doc_curation"), cols) == rows(batch, cols)
