"""SCD Type-2 history materialization from a CDC change stream.

The reference's CDC labs stream per-row change events (Debezium
envelope: op c/u/d + ts, 실습수행/Debezium MySQL CDC Source Connector
실습 - 01.md:140-159) into sinks that keep only the latest state
(upsert, SURVEY §2.2 K1). The other standard consumer of the same
stream is a *history* table: every version kept, with validity
intervals — SCD Type 2.

Semantics: per key, ordered by (event-time, change-id),
- every c/u change opens a version valid from its timestamp;
- the next change on the key (including a delete) closes it
  (``valid_to`` = next change's timestamp, exclusive);
- a version with no successor is current; a delete closes the last
  version without opening one.

Scale: one keyed window (partition by business key, order by time) —
the exact shuffle a 100 TB change log can afford: partitioned by key,
no global ordering; map-side the stream is already key-partitioned
when it arrives from Kafka, so at scale this is frequently a
shuffle-free sort within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    seq_col: str = "change_id",
    op_col: str = "op",
) -> DataFrame:
    """Build the SCD2 version table from (key, ts, seq, op, payload…)
    change rows. Returns every input column except ``op_col``, plus
    ``valid_from`` / ``valid_to`` / ``is_current``; delete ops close
    intervals but emit no row.

    A NULL/unknown op is data corruption (a bad envelope unwrap), not
    a delete: ``op != 'd'`` evaluates NULL for it, so it would silently
    vanish while still closing the previous version's interval —
    fail loudly instead."""
    valid_ops = F.col(op_col).isin("c", "u", "d", "r")
    checked = changes.withColumn(
        op_col,
        F.when(valid_ops, F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("scd2_history: invalid op for key "),
                    F.col(key_col).cast("string"),
                    F.lit(": "),
                    F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
                )
            )
        ),
    )
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(seq_col))
    versioned = checked.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )
    return (
        versioned.where(F.col(op_col) != "d")
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(op_col)
    )
