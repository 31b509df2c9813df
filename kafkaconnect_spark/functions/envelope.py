"""Debezium change-event envelope — schema builders, wrap, unwrap.

The envelope shape (FIXTURES.md F6; produced in
실습수행/Debezium MySQL CDC Source Connector 실습 - 01.md:140-193):

    key:   struct of the row's PK columns
    value: struct {
        before: row | null,
        after:  row | null,
        source: struct {connector, db, table, ts_ms, ...},
        op:     'c' | 'u' | 'd' | 'r',
        ts_ms:  long
    }
    delete = (op='d', after=null) followed by a tombstone (value=null)
    when drop.tombstones=false (…실습 - 01.md:308).

``wrap_as_envelope`` turns any flat change feed (a row + an op column)
into this shape — used by the CDC-ingest tests and by the JDBC poller
when a pipeline asks for envelope output. ``unwrap_envelope`` is the
engine-internal twin of the ExtractNewRecordState SMT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    source_schema = T.StructType(
        [
            T.StructField("connector", T.StringType(), True),
            T.StructField("db", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )
    return T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("source", source_schema, True),
            T.StructField("op", T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def wrap_as_envelope(
    df: DataFrame,
    row_cols: list[str],
    op_col: str = "op",
    ts_col: str | None = None,
    db: str = "db",
    table: str = "table",
    connector: str = "kafkaconnect-spark",
) -> DataFrame:
    """Flat change feed → (value: envelope struct) records.

    ``op_col`` must hold c/u/d/r. For op='d' the row goes to ``before``
    and ``after`` is null; otherwise the row is ``after`` (Debezium
    update events carry both, but the reference's pipelines only ever
    consume ``after`` + op — before is populated only for deletes here
    and documented as such).
    """
    row = F.struct(*[F.col(c).alias(c) for c in row_cols])
    # unix_millis is integer math end-to-end; double*1000 truncation
    # can be 1 ms off for values not exactly representable as doubles
    ts_ms = F.unix_millis(F.col(ts_col)) if ts_col else F.lit(None).cast("long")
    src = F.struct(
        F.lit(connector).alias("connector"),
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
        ts_ms.alias("ts_ms"),
    )
    is_delete = F.col(op_col) == "d"
    value = F.struct(
        F.when(is_delete, row).otherwise(F.lit(None)).alias("before"),
        F.when(is_delete, F.lit(None)).otherwise(row).alias("after"),
        src.alias("source"),
        F.col(op_col).alias("op"),
        ts_ms.alias("ts_ms"),
    )
    return df.withColumn("value", value)


def unwrap_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Envelope → flat value + op. Deletes keep key, value becomes null
    (the delete signal a sink consumes; SURVEY §2.4 T3)."""
    after_type = df.schema[value_col].dataType["after"].dataType
    return df.withColumn(
        "op", F.col(f"{value_col}.op")
    ).withColumn(
        value_col,
        F.when(F.col(f"{value_col}.op") == "d", F.lit(None).cast(after_type)).otherwise(
            F.col(f"{value_col}.after")
        ),
    )
