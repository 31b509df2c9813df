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
from pyspark.sql.utils import AnalysisException


# characters Spark's ExternalCatalogUtils.escapePathName percent-encodes
# in partition directory names (plus all control chars)
_PART_ESCAPE = set('"#%\'*/:=?\\{[]^') | {chr(i) for i in range(0x20)} | {chr(0x7F)}


def _escape_part_value(v) -> str:
    """Hive partition-path encoding of a partition VALUE — must match
    what partitionBy writes, or the emptied-partition rewrite targets a
    phantom directory (e.g. day=2024/01/01 nesting instead of
    day=2024%2F01%2F01) and the real partition's deletes are undone."""
    if v is None or v == "":
        # Spark writes BOTH null and empty-string values to the
        # default partition directory
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(v)
    return "".join(f"%{ord(c):02X}" if c in _PART_ESCAPE else c for c in s)


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


def zorder_code(cols: list[str], bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of 2+ non-negative integer rank
    columns into one BIGINT — the multi-column clustering key. Sorting
    by this code keeps rows close in EVERY interleaved dimension, so
    parquet row-group min/max stats become selective for predicates on
    ANY of the columns, not just the leading sort key (the
    Delta/Iceberg OPTIMIZE ZORDER trick, here as a plain expression).

    Inputs must already be ranks/buckets in [0, 2^bits) — compute them
    with ntile/width-bucket style bucketing first. The interleave is a
    constant-unrolled JVM bit expression: NARROW, codegen'd, no
    Python, no shuffle of its own. bits·len(cols) must fit 63."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed bigint")
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"(shiftleft(cast((shiftright(cast(`{c}` as bigint), {i}) & 1) "
                f"as bigint), {i * n + j}))"
            )
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Z-order code of ``zorder_by``
    (columns must be non-negative integer ranks/buckets; see
    zorder_code). repartitionByRange on the code gives each output
    file a disjoint code range — globally clustered, no global sort —
    and sortWithinPartitions tightens per-row-group bounds inside each
    file. One range shuffle total."""
    code = zorder_code(zorder_by, bits).alias("__z")
    out = df.withColumn("__z", code)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    out = out.repartitionByRange(n, F.col("__z")).sortWithinPartitions("__z")
    out.drop("__z").write.mode(mode).parquet(path)


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

    CONTRACT: ``partition_col`` must be a stable function of the key
    (the standard date-partitioned-CDC assumption; Hudi/Iceberg need a
    global index for the same reason). A change record that moves a
    key between partitions would leave the old partition's copy in
    place, since only the batch's partitions are read.

    Scale shape: only the partitions PRESENT IN THE BATCH are read
    (partition pruning on the existing dataset) and rewritten
    (``partitionOverwriteMode=dynamic`` leaves every other partition's
    files untouched — asserted by file identity in test_layout.py).
    A CDC batch touching 3 of 10,000 daily partitions rewrites 3.
    Touched partitions whose rows are ALL deleted are rewritten as
    empty (dynamic overwrite alone would skip them, silently undoing
    the deletes). Idempotent: replaying a batch converges to the same
    state; order_col ties are broken by batch-over-existing, then by
    the remaining value columns, so the winner never depends on row
    order."""
    from pyspark import StorageLevel

    updates = updates.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
        part_filter = F.col(partition_col).isin([t for t in touched if t is not None])
        if any(t is None for t in touched):
            part_filter = part_filter | F.col(partition_col).isNull()
        try:
            # the try covers ONLY the read: an AnalysisException from the
            # .where (e.g. partition_col missing after schema drift on an
            # EXISTING dataset) must fail loudly, not masquerade as
            # "first batch" and silently drop the un-updated rows
            existing_all = spark.read.parquet(path)
        except AnalysisException:  # first batch: dataset doesn't exist yet
            existing = None
        else:
            existing = existing_all.where(part_filter)

        if delete_col is None:
            updates_flagged = updates.withColumn("__del", F.lit(False))
            delete_col = "__del"
        else:
            updates_flagged = updates
        cols = [c for c in updates_flagged.columns if c != delete_col]
        base = updates_flagged.select(*cols, F.col(delete_col).alias("__del")).withColumn(
            "__src", F.lit(1)
        )
        if existing is not None:
            base = base.unionByName(
                existing.select(*cols)
                .withColumn("__del", F.lit(False))
                .withColumn("__src", F.lit(0)),
                allowMissingColumns=False,
            )
        # tie-break: order_col, then batch-over-existing, then every
        # remaining column (deterministic for duplicate (key, order)
        # rows within one batch — replay converges)
        rest = [c for c in cols if c not in keys and c != order_col]
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(),
            F.col("__src").desc(),
            *[F.col(c).desc() for c in rest],
        )
        merged = (
            base.withColumn("__rn", F.row_number().over(w))
            .where((F.col("__rn") == 1) & (~F.col("__del")))
            .drop("__rn", "__del", "__src")
        )
        # the merged plan is executed twice (survivor collect + write) —
        # persist so touched partitions are read and shuffled once
        from pyspark import StorageLevel

        merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # survivors must be collected BEFORE the overwrite: the
            # merged plan reads the existing files, and re-executing it
            # after the write would hit their deleted predecessors
            if existing is not None:
                surviving = {
                    r[0] for r in merged.select(partition_col).distinct().collect()
                }
            (
                merged.repartition(F.col(partition_col))
                .write.partitionBy(partition_col)
                # per-WRITE option, not a session conf toggle: a shared
                # session conf races when two merges run concurrently
                # (one finally-restore flips the other's pending write
                # back to static overwrite = delete the whole dataset)
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(path)
            )
            # partitions the batch touched but that have NO survivors are
            # absent from `merged`; dynamic overwrite skips them, which
            # would silently drop the deletes — rewrite them empty
            if existing is not None:
                emptied = [t for t in touched if t not in surviving]
                # a zero-row dynamic write would also touch nothing, so
                # each emptied directory gets a direct static overwrite
                # with an empty file of the partition's row schema
                empty_rows = merged.drop(partition_col).limit(0).coalesce(1)
                for t in emptied:
                    part_dir = f"{partition_col}={_escape_part_value(t)}"
                    empty_rows.write.mode("overwrite").parquet(f"{path}/{part_dir}")
        finally:
            merged.unpersist()
    finally:
        updates.unpersist()


def write_with_bloom_filters(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int = 100_000,
    sort_within: list[str] | None = None,
) -> None:
    """Parquet write with per-column BLOOM FILTERS — the point-lookup
    row-group skipping lever min/max bounds can't give you: a
    high-cardinality unsorted column (user_id, fingerprint) has
    near-full min/max ranges in every row group, so `WHERE id = x`
    scans everything; a bloom filter answers "definitely absent" per
    row group and the reader skips it. Costs ~1.2 bytes/ndv per
    column at write time, nothing at read time (readers that predate
    blooms ignore them).

    ``sort_within`` additionally clusters rows so min/max bounds
    tighten for range predicates — the two skipping mechanisms
    compose. Spark's native parquet writer options do the work; no
    custom format. NOTE parquet-mr correctly omits the bloom when a
    column stays fully dictionary-encoded (the dictionary already
    answers point lookups exactly) — blooms materialize precisely on
    the high-cardinality columns that need them
    (tests/test_layout.py pins both behaviors)."""
    out = df.sortWithinPartitions(*sort_within) if sort_within else df
    writer = out.write.mode("overwrite")
    for c in bloom_cols:
        writer = writer.option(
            f"parquet.bloom.filter.enabled#{c}", "true"
        ).option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
    writer.parquet(path)
