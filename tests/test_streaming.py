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
