"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in ``kafkaconnect_spark/queries.py`` — one
entry per operator from SURVEY.md §2 plus the Phase-E training-data
operators (dedup / similarity / text / multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafkaconnect_spark.queries import QUERY_CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped
    revenue top-10 (broadcast dim join + co-partitioned fact join)."""
    return QUERY_CATALOG["q3_top_revenue_orders"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / Phase E."""
    return {name: qd.fn for name, qd in QUERY_CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted entries take the
    driver's weaker rows-only check."""
    return {
        name: qd.oracle for name, qd in QUERY_CATALOG.items() if qd.oracle is not None
    }
