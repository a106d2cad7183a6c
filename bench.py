"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full computation, no
driver-side row transfer -- the number measures the engine, not
toPandas).  One untimed warm-up query absorbs JVM/codegen start-up.

Throttle-proofing (round 6): the host shows bursty CPU throttling
(identical runs vary up to 10x within minutes), which made round-5's
recorded numbers useless for round-over-round comparison.  Three
guards now ship in the JSON so a throttled round is *visible*:
  - "calibration": a fixed-work single-thread loop (sha256 over a
    constant 1 MiB buffer) timed before / midway / after the suite;
    "worst_ratio" > ~1.5 means the host slowed down DURING the run
    and the recorded numbers are inflated -- discount them.
  - every query gets >= 4 interleaved passes (was 2), with up to two
    extra rounds for queries whose passes still disagree > 1.5x.
  - "queries" remains min-of-passes (throttle only ever inflates);
    all raw per-pass timings ship in "passes".

Scale rung (round 6): when scratch/sf1 exists (tools/gen_scale.py,
10x bench scale: 6M lineitem / 50k documents), the ten hot paths from
SCALE.md's measured ladder run there too ("sf1" block, min of >= 2
passes) so the scale posture is in the driver-visible artifact, not
just SCALE.md.

Artifact-truncation-proofing (round 7): the driver records only the
LAST ~2000 chars of stdout, which in rounds 5-6 cut the JSON line's
head mid-"queries" and left only raw pass arrays (and round 6's sf1
sub-object, which tools/bench_compare.py then mis-recovered as the
whole run -- a bogus 1.54x "regression").  Two changes make the
artifact truncation-proof:
  - the printed line is COMPACT (< ~1.9 KB): per-query MINs,
    calibration stamp, and the sf1 rung's MINs only.  The whole line
    fits inside the driver's tail window, so it parses outright.
  - raw per-pass timings move to a sidecar (bench_passes.json,
    repo root; "passes_file" in the line points at it) -- full
    fidelity locally, no stdout bloat.
  - the sf1 rung is exception-isolated: a failure there records
    {"error": ...} under "sf1" instead of destroying the main
    results (the rung runs before the single print).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphdb_cia_factbook_spark import registry
from graphdb_cia_factbook_spark.session import clear_scratch, get_spark

#: headline set: the reference's workhorse shapes (scan/join/argmax-
#: dedup/rank/top-k/graph) + the north-star LLM ops + streaming twins.
HEADLINE = [
    "q1_pricing_summary",    # wide agg (TPC-H Q1 shape)
    "q3_shipping_priority",  # fact-fact join + agg + global top-k (Q3 shape)
    "q5_local_supplier_volume",  # 6-table join with co-nation condition (Q5)
    "j2_chained_dims",       # chained broadcast dim joins
    "j4_derived_share",      # self-aggregate join + derive
    "a1_latest_per_key",     # the reference's argmax-dedup workhorse
    "w5_topk_per_group",     # rank + top-k per key
    "o1_top50_orders",       # global top-k
    "j_asof_prior_purchase", # as-of join (union-trick plan)
    "g1_pagerank",           # iterative graph rank (20 supersteps)
    "g1_pagerank_weighted",  # amount-weighted rank (same loop, weighted shares)
    "g_top_partner",         # flagship: top trade partner per nation
    "g_triangles",           # triangle counting
    "llm_exact_dedup",       # hash dedup over documents
    "llm_minhash_lsh",       # MinHash-LSH near-dedup
    "llm_ann_brute",         # cosine top-k similarity search
    "llm_ann_ivf",           # IVF approximate top-k
    "llm_tfidf",             # TF-IDF keyword extraction
    "st_tumbling",           # event-time tumbling windows
    "st_session",            # session windows
    "llm_span_dedup",        # span-level exact dedup (C4 line-dedup pass)
    "ts_ewma",               # sequential-fold exponential smoothing
    "q9_product_profit",     # fact x 2 dims x orders, two-level group (Q9)
    "q21_waiting_suppliers", # double-correlated semi+anti joins (Q21)
    "llm_dsir_weights",      # DSIR importance-resampling selection
    "g_link_prediction",     # wedge-join link prediction scores
    "g_mst",                 # Boruvka minimum spanning forest
    "llm_mmr_rerank",        # greedy MMR diversified re-rank
    "hier_subtree_rollup",   # pointer-doubling recursive hierarchy
    "ts_cusum",              # sequential CUSUM change detection
    # round 4 additions (r4 gate surface representatives; the list
    # stays a strict superset of every earlier round's HEADLINE)
    "llm_pack_sequences",    # sharded prefix-sum sequence packing
    "q8_market_share",       # 8-table join, share-of-total by year (Q8)
    "dq_psi",                # population-stability drift report
    "agg_skyline",           # Pareto skyline (dominance anti-join)
    "llm_curation_pipeline", # composed dedup->length->quality verdicts
    "llm_retrieval_eval",    # top-k metrics (nDCG/MRR) over exact cosine
    # round 5 additions (r5 gate surface representatives)
    "q12_priority_by_status",  # shipmode CASE-count pivot (Q12 shape)
    "llm_incremental_dedup",   # two-batch dedup vs index, one fingerprint pass
    "g_temporal_reachability", # time-respecting BFS over event edges
    "ts_rolling_median",       # sliding exact median (dual-heap shape)
    # round 6 additions (r6 gate surface representatives)
    "llm_minhash_lsh_sharp",   # sharp (b=8,r=4) LSH operating point
    "g_betweenness",           # Brandes-style betweenness (multi-root BFS)
]

#: the SCALE.md measured-ladder hot paths, run at scratch/sf1 (10x)
#: when that rung exists -- the driver-visible scale receipt.
SF1_HOT = [
    "q1_pricing_summary", "q9_product_profit", "llm_exact_dedup",
    "llm_incremental_dedup", "llm_curation_pipeline", "llm_minhash_lsh",
    "llm_ann_ivf", "g1_pagerank", "st_tumbling", "ts_ewma",
    # round 12 (VERDICT item 5): the queries round 11-12's loop and
    # dedup changes touched get a 10x receipt in the driver-visible
    # artifact (additive only -- existing entries never move)
    "g_mst", "g_betweenness", "llm_minhash_lsh_sharp", "llm_span_dedup",
]
SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scratch", "sf1")

_CAL_BUF = bytes(range(256)) * 4096  # 1 MiB, constant


def calibrate(rounds: int = 300) -> float:
    """Fixed single-thread CPU work (sha256 over a constant 1 MiB
    buffer): ~0.5-1s on a healthy host, identical work every call, so
    the before/mid/after ratio is a pure host-health signal -- query
    code never touches it."""
    t0 = time.perf_counter()
    for _ in range(rounds):
        hashlib.sha256(_CAL_BUF).digest()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    queries = registry.queries()

    # warm-up: scan every table once (JVM + codegen + file listing)
    queries["a3_distinct_values"](spark, sf_dir).write \
        .format("noop").mode("overwrite").save()

    # interleaved passes, min per query: the host shows bursty CPU
    # throttling (identical runs vary 10x within minutes, always
    # late-biased), so a single bad window can poison adjacent
    # queries.  Interleaving full passes (A/B/A...) decorrelates the
    # noise from any one query; the min isolates engine cost while
    # still timing full executions.  Queries whose passes disagree by
    # >1.5x get extra passes -- the spread is throttle noise by
    # construction (identical plan, identical data).  All raw
    # per-pass timings ship in the JSON ("passes") so a regression can
    # be told from noise without re-running.
    def run_one(name: str, at: str = sf_dir) -> float:
        t0 = time.perf_counter()
        queries[name](spark, at).write \
            .format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        clear_scratch(spark)
        return dt

    calibration = {"before": calibrate()}

    passes: dict[str, list[float]] = {name: [] for name in HEADLINE}
    mids = []
    for _pass in range(4):
        for name in HEADLINE:
            passes[name].append(run_one(name))
        mids.append(calibrate())
    for _extra in range(2):
        noisy = [n for n, ts in passes.items()
                 if max(ts) > 1.5 * min(ts)]
        if not noisy:
            break
        for name in noisy:
            passes[name].append(run_one(name))
    timings = {name: min(ts) for name, ts in passes.items()}

    calibration["after"] = calibrate()
    # worst_ratio compares the UNDER-LOAD mid samples only (one per
    # pass, like-for-like): round 11 found the idle before/after
    # samples run at single-core boost clock ~18% faster than the
    # same loop next to a busy Spark pool -- two back-to-back runs
    # both showed worst_ratio ~1.22, in OPPOSITE directions (run 1's
    # 'before' fast, run 2's 'after' fast) while their mid samples
    # agreed within 3%.  Edge samples stay in the JSON for context;
    # the ratio now measures the mid-run throttling it was built to
    # catch, not frequency-governor transitions at the run's edges.
    calibration["mid"] = mids
    calibration["worst_ratio"] = round(max(mids) / min(mids), 3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "calibration": calibration,
        "sf": None,
        "passes_file": "bench_passes.json",
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        out["sf"] = float(sf)
    except ValueError:
        out["sf"] = sf

    # the sf1 rung (10x): min of >= 2 passes per hot path, plus its
    # own calibration stamp.  Skipped cleanly when the generated rung
    # is absent (fresh checkout before tools/gen_scale.py runs).
    # Exception-isolated: the rung runs before the single print, so a
    # failure here must not destroy the already-computed headline.
    sf1_passes: dict[str, list[float]] = {}
    if os.path.isdir(SF1_DIR):
        try:
            run_one(SF1_HOT[0], SF1_DIR)  # untimed rung warm-up
            sf1_passes = {n: [] for n in SF1_HOT}
            for _pass in range(2):
                for name in SF1_HOT:
                    sf1_passes[name].append(run_one(name, SF1_DIR))
            for _extra in range(2):
                noisy = [n for n, ts in sf1_passes.items()
                         if max(ts) > 1.5 * min(ts)]
                if not noisy:
                    break
                for name in noisy:
                    sf1_passes[name].append(run_one(name, SF1_DIR))
            sf1 = {name: min(ts) for name, ts in sf1_passes.items()}
            out["sf1"] = {
                "value": round(sum(sf1.values()), 3),
                "queries": sf1,
                "calibration_after": calibrate(),
            }
        except Exception as exc:  # noqa: BLE001 -- rung must not kill main
            out["sf1"] = {"error": f"{type(exc).__name__}: {exc}"[:200]}

    # raw per-pass timings: sidecar file, NOT stdout (see module
    # docstring -- the driver keeps only a ~2KB stdout tail).  The
    # sidecar embeds the run's headline value + calibration stamp so a
    # consumer can verify the pass arrays belong to THIS printed line
    # (a stale sidecar from an earlier run won't carry them); if the
    # write fails, the line must not advertise a sidecar at all.
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "bench_passes.json"), "w") as f:
            json.dump({"passes": passes, "sf1_passes": sf1_passes,
                       "sf": out["sf"], "run_value": out["value"],
                       "run_calibration": calibration}, f)
    except OSError:
        del out["passes_file"]  # read-only checkout: no stale pairing

    # ONE compact JSON line (separators trimmed so the whole line fits
    # the driver's tail window and parses outright).  The ~2KB tail
    # window is the hard constraint this design exists for: warn the
    # moment HEADLINE/SF1_HOT growth pushes the line near it, so the
    # front-truncation bug cannot silently return.
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        print(f"WARNING: bench line is {len(line)} chars -- the "
              "driver keeps only a ~2000-char stdout tail and will "
              "front-truncate it; shrink HEADLINE/SF1_HOT or move "
              "fields to the sidecar", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
