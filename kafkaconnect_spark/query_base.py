"""Shared substrate for the query catalog modules.

The catalog spans several per-round modules (queries.py, queries_r3*,
queries_r4, …) that all need the same table readers, hash helpers,
and the QueryDef record. Those live HERE — not in queries.py — so a
round module can be imported directly (e.g. by a test) without the
circular chain queries_rN → queries → queries_rN-partially-initialized
that a bottom-of-queries merge import would otherwise create.
"""

from __future__ import annotations

import math
import os
from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkaconnect_spark.session import conf_bytes


class QueryDef(NamedTuple):
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check


# per-application pin for spark.sql.legacy.parquet.nanosAsLong — set
# once by the first _t() call's capability probe (see _t docstring)
_NANOS_PIN: dict[str, bool] = {}


def _t(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read a driver testdata table, normalizing every temporal column
    to TimestampType. The generator has already switched encodings
    once (timestamp[ns] → naive timestamp[us]); this handles both for
    ALL tables (l_shipdate/o_orderdate, not just events.ts) so a
    regeneration can't silently break the catalog:

    - timestamp[ns] (parquet reader rejects): read nanos as long via
      the runtime conf, truncate to µs — same truncation DuckDB
      applies. Which columns were ns comes from the parquet footer.
    - naive timestamp[us] (TIMESTAMP_NTZ on Spark ≥3.5, which
      watermarking rejects): cast to TimestampType; the session tz is
      pinned UTC so the instant mapping is identity and matches
      DuckDB's naive timestamps.

    ``spread=True`` additionally repartitions small scans up to
    defaultParallelism before a compute-heavy narrow stage (per-row
    hashing, serde, Arrow UDFs): the driver's testdata ships one row
    group per parquet file, so scans arrive single-partition and a
    heavy map stage would run on one core. The decision is made from
    the file size on disk vs spark.sql.files.maxPartitionBytes —
    never from the physical plan (no .rdd touch, no analysis) — so at
    cluster scale, where the input spans many split units, it is a
    no-op branch."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq  # driver-side, one footer read

        footer_path = path
        if os.path.isdir(path):  # Spark-written dataset: read one part
            footer_path = os.path.join(
                path,
                sorted(
                    f
                    for f in os.listdir(path)
                    if f.endswith(".parquet") and not f.startswith((".", "_"))
                )[0],
            )
        arrow_schema = pq.read_schema(footer_path)
        ns_cols = {
            f.name
            for f in arrow_schema
            if str(f.type).startswith("timestamp[ns")
        }
        footer_ok = True
    except Exception:  # no pyarrow / non-posix path (cluster deploy)
        ns_cols, footer_ok = set(), False
    # nanosAsLong only when footer inspection works: without it we
    # can't know which bigints are disguised timestamps, so Spark's
    # reader must reject a timestamp[ns] file loudly instead of
    # silently reading it as bigint and filtering every temporal row.
    # The conf is SET ONCE per session, pinned by the first read's
    # capability probe (r4 ADVICE): Spark reads runtime confs lazily
    # at analysis/execution, so per-read toggling could flip the value
    # before an earlier interleaved plan executes. Mixed
    # posix/non-posix paths in one session are rejected loudly in the
    # dangerous direction (pinned true → later footer unreadable)
    # rather than mis-read.
    pinned = _NANOS_PIN.get(spark.sparkContext.applicationId)
    if pinned is None:
        _NANOS_PIN[spark.sparkContext.applicationId] = footer_ok
        spark.conf.set(
            "spark.sql.legacy.parquet.nanosAsLong",
            "true" if footer_ok else "false",
        )
    elif pinned and not footer_ok:
        raise RuntimeError(
            f"parquet footer for {path} is unreadable but this session is "
            "pinned nanosAsLong=true from an earlier readable path; use "
            "separate sessions for posix and non-posix table roots"
        )
    df = spark.read.parquet(path)
    for c, t in df.dtypes:
        if c in ns_cols and t == "bigint":
            # integer division: `/` would go through double and round
            # the microsecond (ns epochs exceed double's exact range)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    if spread:
        df = _spread(df, path)
    return df


def _path_bytes(path: str) -> int:
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(path)
            for f in files
            if not f.startswith((".", "_"))
        )
    return os.path.getsize(path)


def _spread(df: DataFrame, path: str) -> DataFrame:
    """Repartition a just-read scan up to defaultParallelism when the
    source is too small to split (see _t docstring). Sized from the
    bytes on disk: a scan yields ~ceil(bytes / maxPartitionBytes)
    input partitions, so anything under one split unit per core gets
    spread before the heavy narrow stage that follows."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        src_bytes = _path_bytes(path)
    except OSError:  # non-posix storage (s3a://…) — trust the scan split
        return df
    max_pb = conf_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    est_partitions = max(1, math.ceil(src_bytes / max_pb))
    if est_partitions < target:
        return df.repartition(target)
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with `ts` normalized to TimestampType (see _t)."""
    return _t(spark, sf_dir, "events")


def _hash64_sql(expr: str, seed: str) -> str:
    """DuckDB-side twin of functions/text.hash64 (md5-prefix bigint)."""
    return f"('0x'||substr(md5('{seed}:'||{expr}),1,15))::BIGINT"


_NTOK_SQL = r"""CASE WHEN length(trim(text)) = 0 THEN 0
    ELSE len(regexp_split_to_array(trim(text), '\s+')) END"""


# -- shared DuckDB oracle fragments (minhash / simhash), used by both
# -- queries.py and the per-round modules' oracle builders

_SHINGLE_CTE = r"""
sh AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
      FOR i IN range(1, greatest(len(toks) - 2, 0) + 1)])) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks FROM documents)
  WHERE len(toks) >= 3)
"""

# h_i = word (i%4) of md5 seeded by group (i//4) — matches
# dedup._signatures_from_shingles (4 hashes per md5 call)
_MINHASH_AGGS = ",\n".join(
    f"min(('0x'||substr(md5('{i // 4}:'||shingle),{(i % 4) * 8 + 1},8))::BIGINT) h{i}"
    for i in range(16)
)
_SIG_LIST = "[" + ", ".join(f"h{i}" for i in range(16)) + "]"

_SIMHASH_BITSUMS = ", ".join(
    f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) b{b}" for b in range(32)
)
_SIMHASH_VALUE = " + ".join(
    f"CASE WHEN b{b} >= 0 THEN {2 ** b}::BIGINT ELSE 0 END" for b in range(32)
)


def _hyperplane_sql(vec: str, planes: int, dim: int) -> str:
    """DuckDB replay of similarity.hyperplane_signature — the md5-
    derived random hyperplane bucket (shared by queries.py's
    embedding oracles and the per-round modules')."""
    bits = []
    for p in range(planes):
        w = (
            f"[(('0x'||substr(md5('{p}:'||d),1,8))::BIGINT / 2147483648.0 - 1.0) "
            f"FOR d IN range(0, {dim})]"
        )
        bits.append(
            f"(CASE WHEN list_dot_product({vec}::DOUBLE[], {w}) >= 0 THEN {2 ** p} ELSE 0 END)"
        )
    return "(" + " + ".join(bits) + ")"
