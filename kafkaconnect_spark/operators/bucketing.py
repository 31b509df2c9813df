"""Bucketed (pre-shuffled) tables — co-located joins without a
runtime exchange (SURVEY §4: partitioning-by-key is the one physical
concern Catalyst can't conjure at read time; bucketing bakes it into
the storage layout).

The 100 TB story: a fact table joined on the same key every day
(lineitem ⋈ orders on orderkey, events ⋈ users on user_id) pays a
full shuffle of the big side per query. Writing both sides
``bucketBy(N, key)`` once makes every subsequent equi-join on that
key exchange-free — Spark matches bucket specs at plan time and scans
bucket i of each side in the same task. The write itself costs one
shuffle; it amortizes over every downstream join/aggregate on the
bucket key (groupBy on the bucket key is also exchange-free).

Bucket-count guidance: pick N so one bucket of the big table is
~100-500 MB (compressed); both sides must use the same N (or a
multiple, with spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table. Sorting
    within buckets lets the join skip its sort too (SortMergeJoin
    reads pre-sorted runs).

    The input is first repartitioned onto the bucket keys with
    ``buckets`` partitions: writing straight from an N-partition
    DataFrame emits up to N×buckets files (each task writes one file
    per bucket it holds rows for) — the small-file explosion that
    turns later bucketed scans into a metadata storm. repartition and
    bucketBy share Murmur3 hashing, so this yields ~one file per
    bucket."""
    w = df.repartition(buckets, *[df[k] for k in keys]).write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket keys. When both
    specs match, the physical plan has no Exchange on either side —
    verified by tests/test_plan_shapes.py."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
