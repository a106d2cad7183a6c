"""Round-12 optimization internals: conf_flip/restore hygiene, the
_small_loop_mode diet scoping, and the compute-gated MinHash widen.

These pin the three behaviors the round-12 optimizations rely on, so
a later edit cannot silently (a) leave a session's AQE flipped, (b)
leak the loop diet's shuffle width into the rest of a query, or (c)
re-introduce the unconditional widen shuffle on the cheap operating
point (the round-11 llm_minhash_lsh 0.84x regression)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_cia_factbook_spark.session import (clear_scratch, conf_flip,
                                                get_spark)


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-small-loop")


def test_conf_flip_restores_prior_value_not_default(spark):
    """clear_scratch must put back the RECORDED prior value -- a
    session deliberately running with AQE off stays off (round-11
    ADVICE items 1-2)."""
    key = "spark.sql.adaptive.enabled"
    clear_scratch(spark)  # drain any leftover flips first
    spark.conf.set(key, "false")  # harness chose AQE off
    try:
        conf_flip(spark, key, "true")
        assert spark.conf.get(key) == "true"
        clear_scratch(spark)
        assert spark.conf.get(key) == "false"  # NOT hardcoded "true"
    finally:
        spark.conf.set(key, "true")


def test_conf_flip_first_flip_wins(spark):
    """Two flips of the same key in one query restore to the ORIGINAL
    value, not the intermediate one."""
    key = "spark.sql.shuffle.partitions"
    clear_scratch(spark)
    original = spark.conf.get(key)
    conf_flip(spark, key, "7")
    conf_flip(spark, key, "3")
    assert spark.conf.get(key) == "3"
    clear_scratch(spark)
    assert spark.conf.get(key) == original


def test_small_loop_mode_scoped_restore(spark):
    """_small_loop_mode's restore() puts AQE and the shuffle width
    back immediately (loop scoping), and the small=False path is a
    no-op passthrough."""
    from graphdb_cia_factbook_spark.operators.graph import _small_loop_mode

    clear_scratch(spark)
    aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    width0 = spark.conf.get("spark.sql.shuffle.partitions")
    stationary = spark.range(10).localCheckpoint()

    hint, restore = _small_loop_mode(spark, True, stationary)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert (spark.conf.get("spark.sql.shuffle.partitions")
            == str(stationary.rdd.getNumPartitions()))
    restore()
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe0
    assert spark.conf.get("spark.sql.shuffle.partitions") == width0

    df = spark.range(3)
    passthrough, noop_restore = _small_loop_mode(spark, False, stationary)
    assert passthrough(df) is df
    noop_restore()
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe0
    clear_scratch(spark)


def _minhash_plan(spark, num_hashes: int, bands: int) -> str:
    from graphdb_cia_factbook_spark.operators.dedup import minhash_lsh_dedup
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc{i % 3}")
         for i in range(12)], ["doc_id", "text"])
    out = minhash_lsh_dedup(docs, num_hashes=num_hashes, bands=bands)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    clear_scratch(spark)
    return plan


def test_widen_gate_only_on_hash_heavy_point(spark):
    """The REPARTITION_BY_NUM widen shuffle appears on the 32-hash
    sharp operating point and NOT on the 12-hash default (which the
    unconditional widen regressed 0.84x in round 11)."""
    # NOTE: the widen is a no-op when the checkpointed shingle table
    # is already cluster-wide, so assert only the cheap-point absence
    # unconditionally and the sharp-point presence when the table
    # came out narrower than the cluster (always true for 12 docs).
    assert "REPARTITION_BY_NUM" not in _minhash_plan(spark, 12, 4)
    assert "REPARTITION_BY_NUM" in _minhash_plan(spark, 32, 8)
