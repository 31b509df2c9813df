"""Plain-SQL surface: register the engine's tables as temp views so
`spark.sql(...)` works directly — the same table names the DuckDB
oracle environment pre-registers (TESTDATA.md), so any oracle query
in this repo also runs verbatim on Spark SQL.

At cluster scale the equivalent is a real catalog (saveAsTable /
external metastore); temp views keep the local story dependency-free.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create one temp view per parquet table in ``sf_dir``; events
    goes through the nanosecond-timestamp loader. Returns the names."""
    from kafkaconnect_spark.queries import _t

    out = []
    for name in TABLES:
        df = _t(spark, sf_dir, name)  # routes events through the ns loader
        df.createOrReplaceTempView(name)
        out.append(name)
    return out
