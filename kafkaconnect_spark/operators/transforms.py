"""SMT library — the reference's single-message transforms as Column ops.

Connect SMTs are per-record, stateless, chainable functions
(SURVEY §2.4, T1–T5). Here each is a ``DataFrame -> DataFrame``
closure over pure built-in Column expressions — narrow, codegen'd,
zero shuffle, zero Python in the hot path.

Canonical record shape (the engine's analogue of a ``SourceRecord``):
    key: any (struct / scalar / null)
    value: struct (null = tombstone)
    topic: string
plus passthrough metadata columns (partition, offset, timestamp) when
present. SMTs only touch key/value/topic, like Connect.

Reference parity:
- T1 ValueToKey        jdbc_source_configs/mysql_jdbc_source_customers.json:19-20
                       (composite: connector_configs/mysql_jdbc_om_source_mkey.json:14-16)
- T2 ExtractField$Key  jdbc_source_configs/mysql_jdbc_source_customers.json:21-22
- T3 ExtractNewRecordState (Debezium unwrap)
                       실습수행/Debezium MySQL CDC Source Connector 실습 - 01.md:306-308
- T4 RegexRouter       실습수행/Debezium MySQL CDC Source Connector 실습 - 01.md:630-634
- T5 TimestampConverter$Value
                       실습수행/Debezium MySQL CDC Source Connector 실습 - 02.md:364-368
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafkaconnect_spark.plans.spec import SpecError, TransformSpec

Transform = Callable[[DataFrame], DataFrame]

# Connect timestamp format strings are java.text.SimpleDateFormat; Spark
# uses java.time.DateTimeFormatter patterns — for the patterns the
# reference exercises ("yyyy-MM-dd'T'HH:mm:ss'Z'") they coincide.


def value_to_key(fields: list[str]) -> Transform:
    """T1: copy value fields into a struct key.

    A single-field key stays a one-field struct (Connect emits a
    Struct either way; scalar unwrap is T2's job).
    """
    if not fields:
        raise SpecError("ValueToKey requires fields")

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn("key", F.struct(*[F.col(f"value.{f}").alias(f) for f in fields]))

    return _apply


def extract_field(field: str, target: str) -> Transform:
    """T2 (and the $Value twin): unwrap one field of a struct column."""
    if target not in ("key", "value"):
        raise SpecError(f"ExtractField target must be key or value, got {target}")

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(target, F.col(f"{target}.{field}"))

    return _apply


def extract_new_record_state(drop_tombstones: bool = False) -> Transform:
    """T3: Debezium envelope {before, after, source, op, ts_ms} → flat row.

    - op in (c, u, r): value = after
    - op = d: value = null (a delete signal the sink turns into DELETE)
    - tombstone passthrough unless drop_tombstones
      (drop.tombstones="false" everywhere in the reference,
      실습수행/Debezium MySQL CDC Source Connector 실습 - 01.md:308)

    drop_tombstones drops only PRE-EXISTING tombstones (value already
    null before unwrap) — Connect semantics. Delete events (op='d')
    always pass through as null-value delete signals; filtering after
    the conversion would silently discard every DELETE, not just
    tombstones."""

    def _apply(df: DataFrame) -> DataFrame:
        if drop_tombstones:
            df = df.where(F.col("value").isNotNull())
        return df.withColumn(
            "value",
            F.when(F.col("value").isNull(), F.lit(None).cast(df.schema["value"].dataType["after"].dataType))
            .when(F.col("value.op") == "d", F.lit(None))
            .otherwise(F.col("value.after")),
        )

    return _apply


def regex_router(regex: str, replacement: str) -> Transform:
    """T4: rewrite topic. Connect's RegexRouter full-matches the topic
    against `regex` and applies `replacement` ($1 group refs); topics
    that don't match pass through unchanged. We reproduce full-match
    semantics by anchoring with a non-capturing group so user group
    numbers ($1...) are preserved.
    """
    anchored = f"^(?:{regex})$"

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "topic",
            F.when(
                F.col("topic").rlike(anchored),
                F.regexp_replace(F.col("topic"), anchored, replacement),
            ).otherwise(F.col("topic")),
        )

    return _apply


def timestamp_converter(
    field: str,
    target_type: str,
    fmt: str | None = None,
    target: str = "value",
) -> Transform:
    """T5: convert one value field between string/unix/Timestamp/Date.

    Reference usage: string "2023-01-01T10:00:00Z" → Timestamp with
    format yyyy-MM-dd'T'HH:mm:ss'Z' (실습 - 02.md:364-368).
    """
    valid = {"Timestamp", "Date", "string", "unix"}
    if target_type not in valid:
        raise SpecError(f"TimestampConverter target.type must be one of {sorted(valid)}")

    def _convert(c: Column) -> Column:
        if target_type == "Timestamp":
            return F.to_timestamp(c, fmt) if fmt else F.to_timestamp(c)
        if target_type == "Date":
            return F.to_date(c, fmt) if fmt else F.to_date(c)
        if target_type == "string":
            return F.date_format(c, fmt or "yyyy-MM-dd'T'HH:mm:ss'Z'")
        # unix: honor the declared parse format (without it a
        # non-default string format parses to all-NULL); Connect's unix
        # target is epoch MILLISECONDS, not seconds. unix_millis is
        # exact — a double*1000 detour truncates ~0.6% of exact-ms
        # timestamps one millisecond low
        parsed = (F.to_timestamp(c, fmt) if fmt else F.to_timestamp(c))
        return F.unix_millis(parsed)

    def _apply(df: DataFrame) -> DataFrame:
        struct_fields = [f.name for f in df.schema[target].dataType.fields]
        if field not in struct_fields:
            # Connect's TimestampConverter fails on an unknown field —
            # a silent pass-through would hide a spec typo until the
            # sink chokes on the unconverted type
            raise SpecError(
                f"TimestampConverter field '{field}' not in {target} "
                f"fields {struct_fields}"
            )
        replaced = [
            _convert(F.col(f"{target}.{name}")).alias(name) if name == field
            else F.col(f"{target}.{name}").alias(name)
            for name in struct_fields
        ]
        # preserve tombstones: null struct in, null struct out
        return df.withColumn(
            target,
            F.when(F.col(target).isNull(), F.lit(None)).otherwise(F.struct(*replaced)),
        )

    return _apply


# ---------------------------------------------------------------------------
# registry: Connect SMT class name -> builder(params) -> Transform
# ---------------------------------------------------------------------------

def _build_value_to_key(p: dict[str, str]) -> Transform:
    return value_to_key([f.strip() for f in p.get("fields", "").split(",") if f.strip()])


def _build_extract_key(p: dict[str, str]) -> Transform:
    return extract_field(p["field"], "key")


def _build_extract_value(p: dict[str, str]) -> Transform:
    return extract_field(p["field"], "value")


def _build_unwrap(p: dict[str, str]) -> Transform:
    return extract_new_record_state(
        drop_tombstones=str(p.get("drop.tombstones", "true")).lower() == "true"
    )


def _build_router(p: dict[str, str]) -> Transform:
    return regex_router(p["regex"], p["replacement"])


def _build_ts_converter(p: dict[str, str]) -> Transform:
    return timestamp_converter(
        field=p["field"],
        target_type=p["target.type"],
        fmt=p.get("format"),
    )


# ---------------------------------------------------------------------------
# user extension point (SURVEY §2.7): registered Python transforms.
# Connect's SMT surface has no UDF hook; ours allows a named Python
# DataFrame→DataFrame function in the chain — spec type
# "PythonFunction" with param "function": the registered name:
#   {"type": "kafkaconnect_spark.PythonFunction", "function": "clean"}
# ---------------------------------------------------------------------------

USER_TRANSFORM_REGISTRY: dict[str, Callable[[dict[str, str]], Transform]] = {}


def register_python_transform(
    name: str, fn: Transform | Callable[[dict[str, str]], Transform], takes_params: bool = False
) -> None:
    """Register a Python transform for use in SMT chains. ``fn`` is a
    DataFrame→DataFrame callable, or (with ``takes_params=True``) a
    builder params→Transform."""
    USER_TRANSFORM_REGISTRY[name] = fn if takes_params else (lambda _p, _fn=fn: _fn)


def pandas_batch_transform(fn, schema) -> Transform:
    """Arrow-batched pandas map as an SMT: ``fn`` sees a
    pandas.DataFrame per batch and returns one matching ``schema``.
    The slow-path escape hatch — per-batch Arrow transfer, never
    row-at-a-time; keep hot-path transforms as Column expressions."""

    def _apply(df: DataFrame) -> DataFrame:
        def gen(batches):
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(gen, schema=schema)

    return _apply


def _build_python_function(p: dict[str, str]) -> Transform:
    name = p.get("function", "")
    builder = USER_TRANSFORM_REGISTRY.get(name)
    if builder is None:
        raise SpecError(f"unregistered python transform {name!r}")
    return builder(p)


TRANSFORM_REGISTRY: dict[str, Callable[[dict[str, str]], Transform]] = {
    "ValueToKey": _build_value_to_key,
    "ExtractField$Key": _build_extract_key,
    "ExtractField$Value": _build_extract_value,
    "ExtractNewRecordState": _build_unwrap,
    "RegexRouter": _build_router,
    "TimestampConverter$Value": _build_ts_converter,
    "PythonFunction": _build_python_function,
}


def build_transform_chain(transforms: list[TransformSpec]) -> Transform:
    """Compose the spec's SMT chain in declared order
    (chain ordering semantics: 실습수행/JDBC Source Connector 실습.md:445)."""
    built: list[Transform] = []
    for t in transforms:
        builder = TRANSFORM_REGISTRY.get(t.short_type)
        if builder is None:
            raise SpecError(f"unknown transform type {t.type!r}")
        built.append(builder(t.params))

    def _apply(df: DataFrame) -> DataFrame:
        for fn in built:
            df = fn(df)
        return df

    return _apply
