"""SparkSession builder.

Local testing runs a single JVM (``local[N]``); the configuration is
nevertheless the one we would ship to a 1000-executor cluster reading
100 TB:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting
  for hub keys -- the trade graph's China/US analogs).
- ``spark.sql.shuffle.partitions`` sized to the core count locally; on a
  real cluster this is a starting point that AQE re-plans per stage.
- Arrow enabled so the Pandas-UDF path (multimodal decode, grouped ops)
  transfers columnar batches, not pickled rows.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (and any other engine) bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "graphdb_cia_factbook_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # whole-stage codegen emits a class per stage; a long session
        # (60+ queries) fills the default 240m JIT code cache, after
        # which HotSpot stops compiling and everything runs interpreted
        # (observed 10x+ slowdowns late in a session)
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing")
        # generated methods above HotSpot's 8000-bytecode HugeMethodLimit
        # are NEVER JIT-compiled; wide fused stages (12-column min-hash
        # aggregates) hit this and run interpreted with pathological
        # compile-queue stalls in long sessions -- fall back to the
        # Volcano path for such stages instead (observed 6-20x on the
        # MinHash pipeline late in a session)
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Broadcast variables created by operators (the Arrow top-k query
#: blocks) register here so ``clear_scratch`` can release executor
#: copies between logically independent queries -- otherwise repeated
#: registry sweeps in one session accumulate broadcast memory.
_TRACKED_BROADCASTS: list = []


def track_broadcast(bc):
    """Register an operator-created broadcast for release by
    :func:`clear_scratch`.  Returns ``bc`` unchanged."""
    _TRACKED_BROADCASTS.append(bc)
    return bc


#: Scratch parquet directories written by eager operators (the
#: blocked Arrow top-k's phase-1 candidate spill) register here so
#: ``clear_scratch`` can delete them -- the returned DataFrames read
#: them lazily, so the operator itself can never know when the last
#: consumer is done.  Same lifecycle caveat as localCheckpoints.
_TRACKED_SCRATCH_DIRS: list[str] = []


def track_scratch_dir(path: str) -> str:
    """Register an operator-written scratch directory for deletion by
    :func:`clear_scratch`.  Returns ``path`` unchanged."""
    _TRACKED_SCRATCH_DIRS.append(path)
    return path


#: Session confs flipped by an operator for the duration of ONE query
#: (graph._superstep_mode turns AQE off for small superstep loops),
#: mapped to the PRIOR value to restore at the next query boundary.
#: clear_scratch restores the recorded value -- not a hardcoded
#: default -- so a harness session deliberately configured with AQE
#: off stays that way (round-11 ADVICE items 1-2).
_CONF_RESTORE: dict[str, str] = {}


def conf_flip(spark: SparkSession, key: str, value: str) -> None:
    """Set a session conf for the CURRENT query only: records the
    prior value (first flip wins) for :func:`clear_scratch` to restore
    at the query boundary."""
    if key not in _CONF_RESTORE:
        try:
            _CONF_RESTORE[key] = spark.conf.get(key)
        except Exception:  # noqa: BLE001 -- unknown key: nothing to restore
            _CONF_RESTORE[key] = None
    spark.conf.set(key, value)


def clear_scratch(spark: SparkSession) -> int:
    """Drop all persisted/checkpointed RDD blocks and cached plans.

    Iterative operators (PageRank supersteps) and multi-consumer
    pipelines (MinHash shingle/pair tables) materialize scratch via
    ``localCheckpoint`` -- non-recomputable blocks that must outlive
    their own query but are dead weight afterwards.  Leaving them in
    the block manager measurably degrades every LATER job in the
    session (observed 3-5x on the bench); run this between logically
    independent queries.  Returns the number of RDDs dropped.

    CAUTION: call only when no live DataFrame still reads a
    localCheckpoint -- checkpointed blocks are non-recomputable, so
    clearing under a live consumer fails its next action."""
    import gc

    # restore operator-flipped confs to their RECORDED prior values:
    # small iterative operators turn AQE off for their own action
    # (graph._superstep_mode via conf_flip -- AQE re-plans every
    # superstep exchange, pure driver latency on tiny supersteps); the
    # flip is session-level, so the query boundary puts back whatever
    # the session had before -- not a hardcoded "true", which would
    # override a harness session deliberately built with AQE off
    while _CONF_RESTORE:
        key, val = _CONF_RESTORE.popitem()
        try:
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)
        except Exception:
            pass

    jrdds = spark.sparkContext._jsc.getPersistentRDDs()
    ids = list(jrdds.keySet().toArray())
    for rid in ids:
        jrdds.get(rid).unpersist(True)
    spark.catalog.clearCache()
    # non-blocking: a still-live DataFrame that references a tracked
    # broadcast can lazily re-broadcast from the driver copy
    dropped_broadcasts = bool(_TRACKED_BROADCASTS)
    while _TRACKED_BROADCASTS:
        try:
            _TRACKED_BROADCASTS.pop().unpersist(blocking=False)
        except Exception:
            pass
    # scratch parquet spills (blocked Arrow top-k phase-1 candidates)
    # -- non-recomputable like checkpoints: the same "no live
    # consumer" caution above applies
    import shutil
    had_scratch = bool(_TRACKED_SCRATCH_DIRS) or dropped_broadcasts
    while _TRACKED_SCRATCH_DIRS:
        shutil.rmtree(_TRACKED_SCRATCH_DIRS.pop(), ignore_errors=True)
    # gc releases the py4j handles of what was just dropped so the JVM
    # side can actually free it -- pure overhead (~20ms/call) when this
    # sweep found nothing, which is most queries in a bench pass
    if ids or had_scratch:
        gc.collect()
    return len(ids)
