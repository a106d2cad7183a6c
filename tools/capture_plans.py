"""Capture .explain("formatted") output for bench HEADLINE queries.

Usage:  python tools/capture_plans.py <suffix> [query ...]

Writes plans/$PLANS_ROUND/<query>_<suffix>.txt for each query
(default round: r12; default queries: the whole bench HEADLINE list).

NOTE (round-11 ADVICE): this is NOT planning-only -- query builders
that hold intermediates (Graph.hold, dedup._hold, BFS edge tables,
power-iteration supersteps) run eager localCheckpoints at BUILD time,
so capturing plans executes real Spark jobs and writes checkpoint
blocks.  clear_scratch runs between queries so those blocks don't
accumulate across the sweep.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphdb_cia_factbook_spark import registry  # noqa: E402
from graphdb_cia_factbook_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)

    import bench
    names = sys.argv[2:] or bench.HEADLINE

    from graphdb_cia_factbook_spark.session import clear_scratch
    spark = get_spark("capture_plans")
    queries = registry.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} plan lines -> {path}")
        clear_scratch(spark)


if __name__ == "__main__":
    main()
