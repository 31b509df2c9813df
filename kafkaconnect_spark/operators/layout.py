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

from pyspark.sql import DataFrame, Window
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


def merge_into_partitioned(
    spark,
    updates: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str,
    order_col: str,
    delete_col: str | None = None,
) -> None:
    """Last-write-wins MERGE of a change batch into a hive-partitioned
    parquet dataset — the file-lake analogue of the JDBC upsert sink
    (K1/K2): upsert by ``keys``, newest ``order_col`` wins, rows
    flagged true in ``delete_col`` are tombstones.

    Scale shape: only the partitions PRESENT IN THE BATCH are read
    (partition pruning on the existing dataset) and rewritten
    (``partitionOverwriteMode=dynamic`` leaves every other partition's
    files untouched — asserted by file identity in test_layout.py).
    A CDC batch touching 3 of 10,000 daily partitions rewrites 3.
    Idempotent: replaying a batch converges to the same state."""
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    try:
        existing = spark.read.parquet(path).where(F.col(partition_col).isin(touched))
    except Exception:  # first batch: nothing to merge yet
        existing = None

    if delete_col is None:
        updates = updates.withColumn("__del", F.lit(False))
        delete_col = "__del"
    cols = [c for c in updates.columns if c != delete_col]
    # __src breaks order_col ties in favor of the incoming batch —
    # replaying an already-applied batch stays deterministic
    base = updates.select(*cols, F.col(delete_col).alias("__del")).withColumn(
        "__src", F.lit(1)
    )
    if existing is not None:
        base = base.unionByName(
            existing.select(*cols)
            .withColumn("__del", F.lit(False))
            .withColumn("__src", F.lit(0)),
            allowMissingColumns=False,
        )
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    merged = (
        base.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (~F.col("__del")))
        .drop("__rn", "__del", "__src")
    )
    # set the mode on the session that will EXECUTE the write: inside
    # foreachBatch the batch DataFrame belongs to a cloned micro-batch
    # session whose conf snapshot ignores later changes to the original
    sess = merged.sparkSession
    prev = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition(F.col(partition_col))
            .write.partitionBy(partition_col)
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
