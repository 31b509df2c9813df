"""C3: Avro codec + Confluent wire framing + Schema Registry."""

from __future__ import annotations

import datetime
import io
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkaconnect_spark.functions.avro_wire import (
    CompatibilityError,
    SchemaRegistry,
    _decode_record,
    _encode_record,
    avro_deserialize_udf,
    avro_schema_for,
    avro_serialize_udf,
    decode_message,
    encode_message,
    frame,
    unframe,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("active", T.BooleanType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("price", T.DecimalType(10, 2), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
    ]
)

RECORD = {
    "id": 42,
    "name": "café",  # multibyte utf-8
    "score": 3.14159,
    "active": True,
    "ts": datetime.datetime(2023, 5, 1, 12, 30, 45),
    "d": datetime.date(2023, 5, 1),
    "price": Decimal("1234.56"),
    "tags": ["a", "b"],
}


def test_codec_roundtrip_all_types():
    avro = avro_schema_for(SCHEMA, name="events")
    buf = io.BytesIO()
    _encode_record(avro, RECORD, buf)
    back = _decode_record(avro, io.BytesIO(buf.getvalue()))
    assert back == RECORD


def test_codec_nulls():
    avro = avro_schema_for(SCHEMA)
    rec = {k: (42 if k == "id" else None) for k in RECORD}
    buf = io.BytesIO()
    _encode_record(avro, rec, buf)
    assert _decode_record(avro, io.BytesIO(buf.getvalue())) == rec


def test_confluent_framing():
    body = b"\x02\x04ab"
    wire = frame(7, body)
    assert wire[0:1] == b"\x00" and len(wire) == 5 + len(body)
    sid, got = unframe(wire)
    assert sid == 7 and got == body
    with pytest.raises(ValueError, match="magic"):
        unframe(b"\x01garbage")


def test_tombstone_stays_null():
    avro = avro_schema_for(SCHEMA)
    assert encode_message(avro, None, 1) is None
    assert decode_message(None, lambda i: avro) is None


def test_registry_subjects_versions_and_ids(tmp_path):
    reg = SchemaRegistry(tmp_path / "registry.json")
    avro = avro_schema_for(SCHEMA, name="customers")
    sid = reg.register("mysqlavro-customers-value", avro)
    assert reg.register("mysqlavro-customers-value", avro) == sid  # idempotent
    assert reg.get_by_id(sid)["name"] == "customers"
    # persisted across instances (file-backed _schemas topic analogue)
    reg2 = SchemaRegistry(tmp_path / "registry.json")
    assert reg2.latest("mysqlavro-customers-value")[0] == sid
    assert reg2.subjects() == ["mysqlavro-customers-value"]


def test_registry_backward_compat_rejects_required_add(tmp_path):
    """Reference edge: adding a NOT NULL column without default fails
    registration under BACKWARD (Schema Registry 실습.md:444-549)."""
    reg = SchemaRegistry()
    base = avro_schema_for(
        T.StructType([T.StructField("id", T.IntegerType(), False)]), "t"
    )
    reg.register("t-value", base)
    widened_bad = avro_schema_for(
        T.StructType(
            [
                T.StructField("id", T.IntegerType(), False),
                T.StructField("must", T.StringType(), False),  # no default
            ]
        ),
        "t",
    )
    with pytest.raises(CompatibilityError):
        reg.register("t-value", widened_bad)
    # nullable add (has null default) is BACKWARD-OK
    widened_ok = avro_schema_for(
        T.StructType(
            [
                T.StructField("id", T.IntegerType(), False),
                T.StructField("opt", T.StringType(), True),
            ]
        ),
        "t",
    )
    assert reg.register("t-value", widened_ok) > 0
    # per-subject override to NONE (실습.md:533-537) lifts the check
    reg2 = SchemaRegistry()
    reg2.register("u-value", base)
    reg2.set_compatibility("NONE", "u-value")
    assert reg2.register("u-value", widened_bad) > 0


def test_spark_roundtrip_via_pandas_udf(spark):
    sub = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    avro = avro_schema_for(sub, "events")
    reg = SchemaRegistry()
    sid = reg.register("events-value", avro)
    df = spark.createDataFrame(
        [
            (1, "a", 0.5, datetime.datetime(2024, 1, 1, 10, 0, 0)),
            (2, None, None, None),
        ],
        sub,
    )
    rec = df.select(F.struct(*df.columns).alias("value"))
    ser = avro_serialize_udf(avro, sid)
    wire = rec.select(ser(F.col("value")).alias("raw"))
    first = wire.first()[0]
    assert bytes(first)[0:1] == b"\x00"  # framed
    de = avro_deserialize_udf(sub, avro)
    back = wire.select(de(F.col("raw")).alias("value")).select("value.*")
    got = sorted([tuple(r) for r in back.collect()])
    assert got == [
        (1, "a", 0.5, datetime.datetime(2024, 1, 1, 10, 0, 0)),
        (2, None, None, None),
    ]


def test_udf_roundtrip_array_column_and_id_check(spark):
    """The numpy path: list columns arrive in the pandas UDF as
    numpy arrays and must serialize; a message with a foreign schema
    id must fail loudly, not decode positionally."""
    sub = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("tags", T.ArrayType(T.StringType()), True),
        ]
    )
    avro = avro_schema_for(sub, "tagged")
    reg = SchemaRegistry()
    sid = reg.register("tagged-value", avro)
    df = spark.createDataFrame([(1, ["a", "b"]), (2, None)], sub)
    rec = df.select(F.struct(*df.columns).alias("value"))
    ser = avro_serialize_udf(avro, sid)
    wire = rec.select(ser(F.col("value")).alias("raw"))
    de = avro_deserialize_udf(sub, avro, expected_id=sid)
    back = wire.select(de(F.col("raw")).alias("value")).select("value.*")
    got = sorted([(r.id, list(r.tags) if r.tags is not None else None) for r in back.collect()])
    assert got == [(1, ["a", "b"]), (2, None)]

    import pytest

    bad = avro_deserialize_udf(sub, avro, expected_id=sid + 7)
    with pytest.raises(Exception, match="schema id"):
        wire.select(bad(F.col("raw")).alias("v")).collect()


def test_nested_struct_schema_names_unique():
    """Avro forbids redefining a record name: a schema with two nested
    structs must emit two distinct record names."""
    sub = T.StructType(
        [
            T.StructField(
                "before", T.StructType([T.StructField("id", T.IntegerType(), True)]), True
            ),
            T.StructField(
                "after", T.StructType([T.StructField("id", T.IntegerType(), True)]), True
            ),
        ]
    )
    avro = avro_schema_for(sub, "env")

    def names(node, acc):
        if isinstance(node, dict):
            if node.get("type") == "record":
                acc.append(node["name"])
            for v in node.values():
                names(v, acc)
        elif isinstance(node, list):
            for v in node:
                names(v, acc)
        return acc

    found = names(avro, [])
    assert len(found) == len(set(found)), found


def test_registry_global_compat_persists(tmp_path):
    p = str(tmp_path / "reg.json")
    reg = SchemaRegistry(p)
    reg.set_compatibility("NONE")
    reg2 = SchemaRegistry(p)
    assert reg2.compatibility("any-subject") == "NONE"
