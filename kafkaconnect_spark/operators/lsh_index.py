"""Persistent MinHash-LSH index lifecycle — build / append / compact.

`minhash_dedup_pairs_between` (operators/dedup.py) has the right JOIN
shape for incremental dedup, but recomputes the corpus's shingle sets
and banded signatures on every batch. At 100 TB the corpus side must
be a PERSISTED index the ingest batch joins against — this module is
that index's lifecycle:

- ``build``    — shingle + sign + band the corpus once; write two
  parquet tables: ``shingles`` (doc_id, __sh array<string>) and
  ``bands`` (doc_id, band, band_hash).
- ``append``   — match a new batch against the CURRENT index (no
  corpus recompute: one banded equi-join + Jaccard verify against the
  stored shingle sets), then add the batch's own entries to the index
  so the NEXT batch deduplicates against it too.
- ``compact``  — rewrite the accumulated append deltas into one
  deduplicated, band_hash-clustered table generation.

Versioned layout (the lakehouse commit pattern — compaction never
rewrites in place; readers pin the generation named by the manifest,
so a concurrent reader of v1 is unaffected by a v2 commit):

    index_dir/MANIFEST.json     {"version": N}
    index_dir/shingles/v{N}/*.parquet
    index_dir/bands/v{N}/*.parquet

Scale shape: append is one (band, band_hash) equi-join of a
batch-sized frame against the band table (partition-prunable once the
table is clustered by band_hash — exactly what compact() restores
after appends fragment it) plus a candidate-sized verify join; no
corpus self-join anywhere. Compact is one distinct + repartition per
table — linear, and amortized across many appends.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaconnect_spark.operators.dedup import (
    _banded,
    _check_banding,
    _jaccard_verify,
    _signatures_from_arrays,
    shingle_arrays,
)


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "MANIFEST.json")


def _read_manifest(index_dir: str) -> dict:
    with open(_manifest_path(index_dir)) as fh:
        return json.load(fh)


def _write_manifest(index_dir: str, version: int) -> None:
    tmp = _manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, _manifest_path(index_dir))  # atomic commit


def _table_path(index_dir: str, table: str, version: int) -> str:
    return os.path.join(index_dir, table, f"v{version}")


def _tables(spark: SparkSession, index_dir: str) -> tuple[DataFrame, DataFrame, int]:
    v = _read_manifest(index_dir)["version"]
    return (
        spark.read.parquet(_table_path(index_dir, "shingles", v)),
        spark.read.parquet(_table_path(index_dir, "bands", v)),
        v,
    )


def build(
    corpus: DataFrame,
    index_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Create generation v1 of the index from the standing corpus."""
    _check_banding(num_hashes, bands)
    sh = shingle_arrays(corpus, text_col, id_col, n)
    sh.write.mode("errorifexists").parquet(_table_path(index_dir, "shingles", 1))
    sh = corpus.sparkSession.read.parquet(_table_path(index_dir, "shingles", 1))
    _banded(_signatures_from_arrays(sh, num_hashes, id_col), bands, id_col).write.mode(
        "errorifexists"
    ).parquet(_table_path(index_dir, "bands", 1))
    _write_manifest(index_dir, 1)


def append(
    spark: SparkSession,
    index_dir: str,
    new_batch: DataFrame,
    threshold: float = 0.2,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Match `new_batch` against the current index generation and add
    the batch to it. The verified duplicate pairs
    (id_new, id_corpus, jaccard) are WRITTEN to a report table under
    the index before the index tables are appended — an in-memory
    cache would not survive the append (Spark invalidates cached
    plans over a path on any write to it via refreshByPath, so a
    merely-persisted result would silently recompute against the
    post-append listing and report the batch as duplicating itself).
    Returns a read of the report — durable and replayable, like any
    other index table."""
    _check_banding(num_hashes, bands)
    import uuid

    from pyspark import StorageLevel

    idx_sh, idx_bands, v = _tables(spark, index_dir)
    sh_new = shingle_arrays(new_batch, text_col, id_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    b_new = _banded(_signatures_from_arrays(sh_new, num_hashes, id_col), bands, id_col)
    cands = (
        b_new.withColumnRenamed(id_col, "id_new")
        .join(
            idx_bands.withColumnRenamed(id_col, "id_corpus"),
            ["band", "band_hash"],
        )
        # a re-ingested doc present on both sides is not its own dup
        .where(F.col("id_new") != F.col("id_corpus"))
        .select("id_new", "id_corpus")
        .distinct()
    )
    pairs = _jaccard_verify(
        cands, sh_new, idx_sh, threshold, "id_new", "id_corpus", id_col
    )
    report = os.path.join(index_dir, "reports", f"v{v}-{uuid.uuid4().hex[:12]}")
    pairs.write.mode("errorifexists").parquet(report)
    sh_new.write.mode("append").parquet(_table_path(index_dir, "shingles", v))
    b_new.write.mode("append").parquet(_table_path(index_dir, "bands", v))
    sh_new.unpersist()
    return spark.read.parquet(report)


def compact(spark: SparkSession, index_dir: str, n_buckets: int = 8) -> dict:
    """Rewrite the current generation (base + append deltas) as
    generation v+1: one row per doc in `shingles`, distinct rows in
    `bands` clustered (repartitioned) by band_hash so a batch join
    scans only matching clusters. Commits the manifest atomically;
    the old generation stays readable for pinned readers. Returns
    {"version", "n_docs", "n_band_rows", "n_files_before/after"}."""
    idx_sh, idx_bands, v = _tables(spark, index_dir)

    def _n_files(table: str, version: int) -> int:
        p = _table_path(index_dir, table, version)
        return sum(1 for f in os.listdir(p) if f.endswith(".parquet"))

    files_before = _n_files("shingles", v) + _n_files("bands", v)
    sh_c = idx_sh.dropDuplicates([idx_sh.columns[0]]).repartition(n_buckets)
    sh_c.write.mode("errorifexists").parquet(
        _table_path(index_dir, "shingles", v + 1)
    )
    bands_c = idx_bands.distinct().repartition(n_buckets, "band_hash")
    bands_c.write.mode("errorifexists").parquet(
        _table_path(index_dir, "bands", v + 1)
    )
    _write_manifest(index_dir, v + 1)
    new_sh, new_bands, _ = _tables(spark, index_dir)
    return {
        "version": v + 1,
        "n_docs": new_sh.count(),
        "n_band_rows": new_bands.count(),
        "n_files_before": files_before,
        "n_files_after": _n_files("shingles", v + 1) + _n_files("bands", v + 1),
    }
