"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query on /root/testdata/sf0.001.
queries()      — every implemented operator, (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-runnable ANSI SQL per query (same column names).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from thuvienphapluat_crawler_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the window-ranked frontier
    snapshot (north_rule priority queue) — canonicalized URLs ranked per
    host by (category_priority, depth, fingerprint) under a per-host
    budget. Driver checks rows>0."""
    return Q.QUERIES["frontier_rank"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.get_queries()


def oracle_sql() -> dict[str, str]:
    return Q.get_oracles()
