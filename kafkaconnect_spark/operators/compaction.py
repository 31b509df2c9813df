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

from kafkaconnect_spark.session import conf_bytes


def dir_bytes(path: str, spark: SparkSession | None = None) -> int:
    """Total parquet bytes under ``path``. Local paths use the local
    filesystem; any scheme'd path (s3a://, hdfs://, gs://) goes
    through the Hadoop FileSystem API — Path.rglob silently returns 0
    for those, which would plan ONE output file and funnel a multi-TB
    directory through a single task."""
    if "://" in path:
        if spark is None:
            raise ValueError(
                f"dir_bytes needs a SparkSession for non-local path {path!r}"
            )
        jvm = spark._jvm
        jsc = spark._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        # sum only *.parquet (like the local branch): getContentSummary
        # counts _SUCCESS/.crc/_temporary too, inflating the planned
        # file count and producing smaller-than-target output files
        total = 0
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                total += int(st.getLen())
        return total
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
    if "://" not in src and "://" not in dst:
        if Path(src).resolve() == Path(dst).resolve():
            raise ValueError("compact to a new directory, then swap")
    elif src.rstrip("/") == dst.rstrip("/"):
        raise ValueError("compact to a new directory, then swap")
    df = spark.read.parquet(src)
    total = dir_bytes(src, spark)
    n = plan_target_files(total, target_file_mb)
    shaped = _reshape(df, n, total)
    shaped.write.mode("overwrite").parquet(dst)
    return n


def _reshape(df: DataFrame, n: int, total_bytes: int) -> DataFrame:
    """Estimate the scan's partition count from bytes on disk (a scan
    yields at least ceil(bytes / maxPartitionBytes) splits; small-file
    inputs yield more) instead of df.rdd.getNumPartitions(), which
    forces plan analysis plus an RDD conversion. Underestimating only
    matters in the current<n case, where coalesce would silently keep
    current partitions — repartition handles that one."""
    max_pb = conf_bytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    est_current = max(1, math.ceil(total_bytes / max_pb))
    if est_current >= n:
        return df.coalesce(n)
    return df.repartition(n)
