"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference README.md:17-26
analog: top nations by PageRank with their #1 trade partner) at
sf0.001.  ``queries()`` exposes one named DataFrame-builder per
implemented operator from SURVEY.md §2; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each (omitted only for genuinely
non-SQL-expressible ops, which get rows-only checks).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from graphdb_cia_factbook_spark.flagship import flagship
from graphdb_cia_factbook_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()``."""
    return registry.oracle_sql()
