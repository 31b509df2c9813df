"""Skew-aware aggregation — explicit salting for hot keys.

AQE's skew-join splitting handles joins; *aggregations* on a hot key
still funnel that key's rows into one task at the final agg. Salting
splits the hot key across S partial aggregates, then merges:

    stage 1: groupBy(key, salt)  — S-way parallel partial aggs
    stage 2: groupBy(key)        — merges S tiny partials

Two shuffles, but the first is uniform; on a 1000-executor cluster a
key holding 10% of 100 TB goes from one 10 TB task to S balanced ones.
Only decomposable aggregates apply (sum/count/min/max and anything
with a merge function) — the same contract as map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_alias: str | None = "n",
    salt_buckets: int = 16,
    salt_col: str = "__salt",
) -> DataFrame:
    """groupBy(keys) with salting: sums/counts survive the two-phase
    decomposition exactly (same result as a direct groupBy).

    ``sums``: {input_col: output_alias} summed per group. The salt is
    a per-partition round-robin counter (spark_partition_id +
    monotonically_increasing_id), NOT a hash of the row's content: a
    content hash sends identical/low-cardinality rows — precisely the
    hot key's duplicates the salt exists to spread — into ONE bucket,
    silently restoring the skew. The RESULT is independent of bucket
    assignment (any partial→final decomposition sums to the same
    totals). Retry safety: the counter is position-dependent, so Spark
    marks the expression nondeterministic and handles shuffle-fetch
    failure by resubmitting the whole indeterminate stage rather than
    individual tasks — never a silent double-count (the content-hash
    alternative is per-task-retry-stable but defeats the operator).
    """
    sums = sums or {}
    salted = df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial_aggs = [F.sum(F.col(c)).alias(f"__p_{a}") for c, a in sums.items()]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias(f"__p_{count_alias}"))
    partial = salted.groupBy(*keys, salt_col).agg(*partial_aggs)
    final_aggs = [F.sum(F.col(f"__p_{a}")).alias(a) for a in sums.values()]
    if count_alias:
        final_aggs.append(F.sum(F.col(f"__p_{count_alias}")).alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)
