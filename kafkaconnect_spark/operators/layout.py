"""Dataset layout for 100 TB parquet lakes — hive-style partitioned
writes and clustered file contents (SURVEY §2.7 / Phase E scale
plumbing; the reference's sinks are row stores, so this is the
parquet-lake analogue of K3 table routing).

Why layout is the scale lever: partition pruning turns a predicate on
the partition column into a directory listing (zero data read for
excluded partitions), and sorting within files tightens parquet
row-group min/max bounds so even unpartitioned predicates skip pages.
Both are free at read time — they only cost placement at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a hive-partitioned parquet dataset.

    The repartition on the partition columns routes every output
    partition-directory's rows to ONE task, so each directory gets one
    well-sized file instead of (shuffle.partitions × directories)
    small files — the classic partitioned-write small-file explosion.
    ``cluster_by`` additionally sorts within each task so parquet
    row-group min/max statistics become selective for those columns.
    For skewed partition keys, salt the repartition with a second
    column (cheap: files-per-dir = salt buckets, still bounded)."""
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if cluster_by:
        out = out.sortWithinPartitions(*partition_cols, *cluster_by)
    out.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def read_pruned(spark, path: str) -> DataFrame:
    """Read a partitioned dataset; filters on partition columns prune
    directories before any IO (asserted in test_layout.py via
    PartitionFilters in the physical plan)."""
    return spark.read.parquet(path)
