"""Small-file compaction — the janitor op every long-running pipeline
needs (SURVEY §2.7 / Phase E; no reference citation by definition —
though the reference's SpoolDir labs produce exactly the many-small-
files pattern this fixes when replayed at scale).

Streaming sinks and fine-grained partition writes leave thousands of
KB-scale files; at 100 TB that turns every downstream scan into a
metadata storm (file listing + footer reads dominate). Compaction
rewrites a directory to files of a target size: partition count =
ceil(bytes_on_disk / target), one sequential rewrite, no data change.

The rewrite uses ``coalesce`` when shrinking (no shuffle — adjacent
input splits concatenate) and ``repartition`` only when the input has
*fewer* partitions than the target (needs a real redistribution).
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(path: str) -> int:
    return sum(
        f.stat().st_size for f in Path(path).rglob("*.parquet") if f.is_file()
    )


def plan_target_files(total_bytes: int, target_file_mb: int = 256) -> int:
    return max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 256,
) -> int:
    """Rewrite ``src`` to ``dst`` with ~``target_file_mb`` files.
    Returns the number of output files planned. ``dst`` must differ
    from ``src`` (write-then-swap is the caller's move, so a failed
    compaction never corrupts the source)."""
    if Path(src).resolve() == Path(dst).resolve():
        raise ValueError("compact to a new directory, then swap")
    df = spark.read.parquet(src)
    n = plan_target_files(dir_bytes(src), target_file_mb)
    shaped = _reshape(df, n)
    shaped.write.mode("overwrite").parquet(dst)
    return n


def _reshape(df: DataFrame, n: int) -> DataFrame:
    current = df.rdd.getNumPartitions()
    if current >= n:
        return df.coalesce(n)
    return df.repartition(n)
