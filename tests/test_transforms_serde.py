"""SMT library (T1-T5) + JSON serde (C1/C2) + Debezium envelope (T3)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkaconnect_spark.functions.envelope import unwrap_envelope, wrap_as_envelope
from kafkaconnect_spark.functions.serde import (
    connect_schema_for,
    json_deserialize,
    json_serialize,
)
from kafkaconnect_spark.operators.transforms import (
    build_transform_chain,
    extract_field,
    extract_new_record_state,
    regex_router,
    timestamp_converter,
    value_to_key,
)
from kafkaconnect_spark.plans.spec import TransformSpec


def records(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.select(F.struct(*df.columns).alias("value"))


def test_value_to_key_single_and_composite(spark):
    df = records(spark, [(1, 10, "a"), (2, 20, "b")], "order_id int, line_item_id int, x string")
    out = value_to_key(["order_id"])(df)
    assert out.schema["key"].dataType == T.StructType(
        [T.StructField("order_id", T.IntegerType(), True)]
    )
    comp = value_to_key(["order_id", "line_item_id"])(df)
    row = comp.select("key").orderBy("key.order_id").first()
    assert row.key.asDict() == {"order_id": 1, "line_item_id": 10}


def test_extract_field_key(spark):
    df = records(spark, [(7, "z")], "customer_id int, name string")
    out = extract_field("customer_id", "key")(value_to_key(["customer_id"])(df))
    assert out.select("key").first()[0] == 7
    assert out.schema["key"].dataType == T.IntegerType()


def test_regex_router_reference_patterns(spark):
    df = spark.createDataFrame(
        [("mysqlavro.oc.customers",), ("mysql_om_smt_key_customers",)], "topic string"
    )
    r1 = regex_router(r"(.*)\.(.*)\.(.*)", "$1-$2-$3")(df)
    assert r1.orderBy("topic").collect()[0].topic == "mysql_om_smt_key_customers"
    assert "mysqlavro-oc-customers" in {r.topic for r in r1.collect()}
    r2 = regex_router(r"mysql_om_smt_key_(.*)", "mysql_$1")(df)
    assert "mysql_customers" in {r.topic for r in r2.collect()}


def test_timestamp_converter_roundtrip(spark):
    fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    df = records(spark, [("2023-03-01 04:05:06",)], "ts string")
    df = df.select(F.struct(F.to_timestamp("value.ts").alias("ts")).alias("value"))
    as_str = timestamp_converter("ts", "string", fmt)(df)
    assert as_str.select("value.ts").first()[0] == "2023-03-01T04:05:06Z"
    back = timestamp_converter("ts", "Timestamp", fmt)(as_str)
    assert str(back.select("value.ts").first()[0]) == "2023-03-01 04:05:06"


def test_unwrap_envelope_and_tombstones(spark):
    df = spark.createDataFrame(
        [(1, "a", "c"), (2, "b", "u"), (3, "c", "d")], "id int, v string, op string"
    )
    env = wrap_as_envelope(df, ["id", "v"], op_col="op", db="om", table="t")
    assert set(env.schema["value"].dataType.fieldNames()) >= {
        "before", "after", "source", "op", "ts_ms",
    }
    flat = unwrap_envelope(env.select("value"))
    vals = {r.op: r.value for r in flat.collect()}
    assert vals["d"] is None  # delete → null value (tombstone signal)
    assert vals["c"].asDict()["v"] == "a"


def test_extract_new_record_state_drop_tombstones(spark):
    df = spark.createDataFrame(
        [(1, "a", "c"), (3, "c", "d")], "id int, v string, op string"
    )
    env = wrap_as_envelope(df, ["id", "v"], op_col="op", db="om", table="t")
    # add a PRE-EXISTING tombstone (value NULL before unwrap) — the only
    # thing drop.tombstones may remove; the op='d' DELETE event must
    # always pass through as a null-value delete signal (Connect
    # semantics: filtering post-conversion would eat every DELETE)
    tomb = env.limit(1).select(
        *[
            F.lit(None).cast(env.schema["value"].dataType).alias("value")
            if c == "value"
            else F.col(c)
            for c in env.columns
        ]
    )
    env3 = env.unionByName(tomb)
    keep = extract_new_record_state(drop_tombstones=False)(env3)
    drop = extract_new_record_state(drop_tombstones=True)(env3)
    # keep: insert + delete-signal + tombstone = 3 rows, 2 of them null
    assert keep.count() == 3
    assert keep.where(F.col("value").isNull()).count() == 2
    # drop: tombstone gone, delete SIGNAL retained
    assert drop.count() == 2
    assert drop.where(F.col("value").isNull()).count() == 1


def test_json_serde_roundtrip_with_schema_wrapper(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("price", T.DecimalType(10, 2), True),
        ]
    )
    from decimal import Decimal

    df = spark.createDataFrame([(1, "x", Decimal("9.99")), (2, None, None)], schema)
    rec = df.select(F.struct(*df.columns).alias("value"))
    wire = rec.select(json_serialize("value", schema, schemas_enable=True).alias("raw"))
    raw = wire.first()[0]
    assert '"schema"' in raw and '"payload"' in raw  # C1 wrapper shape
    back = wire.select(json_deserialize("raw", schema, schemas_enable=True).alias("value"))
    assert sorted((r.value.id, r.value.name) for r in back.collect()) == [
        (1, "x"), (2, None),
    ]


def test_connect_schema_structure():
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    cs = connect_schema_for(schema, name="customers")
    assert cs["type"] == "struct"
    by_field = {f["field"]: f for f in cs["fields"]}
    assert by_field["id"]["optional"] is False


def test_build_transform_chain_order(spark):
    chain = build_transform_chain(
        [
            TransformSpec("create_key", "org.apache.kafka.connect.transforms.ValueToKey", {"fields": "id"}),
            TransformSpec("extract_key", "org.apache.kafka.connect.transforms.ExtractField$Key", {"field": "id"}),
            TransformSpec(
                "rename_topic",
                "org.apache.kafka.connect.transforms.RegexRouter",
                {"regex": "pre_(.*)", "replacement": "post_$1"},
            ),
        ]
    )
    df = records(spark, [(5, "v")], "id int, x string").withColumn("topic", F.lit("pre_t"))
    out = chain(df)
    row = out.first()
    assert row.key == 5 and row.topic == "post_t"


def test_python_transform_in_chain(spark):
    from kafkaconnect_spark.operators.transforms import (
        pandas_batch_transform,
        register_python_transform,
    )

    def upper_x(pdf):
        # value is a Connect-style struct column → dicts in pandas
        pdf["value"] = pdf["value"].map(lambda v: {**v, "x": v["x"].upper()})
        return pdf

    register_python_transform(
        "upper_x",
        pandas_batch_transform(upper_x, "value struct<id:int, x:string>"),
    )
    chain = build_transform_chain(
        [
            TransformSpec("clean", "kafkaconnect_spark.PythonFunction", {"function": "upper_x"}),
            TransformSpec("create_key", "org.apache.kafka.connect.transforms.ValueToKey", {"fields": "id"}),
        ]
    )
    out = chain(records(spark, [(1, "ab")], "id int, x string")).first()
    assert out.value.x == "AB" and out.key.id == 1


def test_python_transform_unregistered_fails():
    import pytest

    from kafkaconnect_spark.plans.spec import SpecError

    with pytest.raises(SpecError, match="unregistered"):
        build_transform_chain(
            [TransformSpec("c", "kafkaconnect_spark.PythonFunction", {"function": "nope"})]
        )


# ---------------------------------------------------------------------------
# standard-set SMTs (beyond the reference labs)
# ---------------------------------------------------------------------------


def _rec(spark, rows, topic="t"):
    df = spark.createDataFrame(rows, "id INT, name STRING, score DOUBLE")
    return df.select(F.struct("id", "name", "score").alias("value"), F.lit(topic).alias("topic"))


def test_insert_replace_mask_cast_chain(spark):
    from kafkaconnect_spark.operators.transforms import (
        cast_fields, insert_field, mask_field, replace_field,
    )

    rec = _rec(spark, [(1, "alice", 1.5)], topic="orders")
    rec = insert_field(static_field="env", static_value="prod", topic_field="src")(rec)
    rec = mask_field(["name"])(rec)
    rec = cast_fields({"score": "string", "id": "int64"})(rec)
    rec = replace_field(renames={"id": "order_id"}, exclude=["score"])(rec)
    row = rec.collect()[0]
    assert row.value.asDict() == {
        "order_id": 1, "name": None, "env": "prod", "src": "orders"
    }
    # schema: id was widened to int64, then renamed
    assert dict(rec.schema["value"].dataType.fields[0].__dict__)["name"] == "order_id"


def test_mask_with_typed_replacement_and_unknown_field(spark):
    import pytest
    from kafkaconnect_spark.operators.transforms import mask_field
    from kafkaconnect_spark.plans.spec import SpecError

    rec = _rec(spark, [(1, "bob", 2.0)])
    out = mask_field(["score"], replacement="0")(rec).collect()[0]
    assert out.value.score == 0.0  # literal coerced to the field type
    with pytest.raises(SpecError):
        mask_field(["nope"])(rec).collect()


def test_hoist_flatten_roundtrip_and_tombstones(spark):
    from kafkaconnect_spark.operators.transforms import flatten_value, hoist_field

    df = spark.createDataFrame([(1, "x")], "id INT, name STRING")
    rec = df.select(F.struct("id", "name").alias("value"))
    # add a tombstone row
    tomb = rec.withColumn("value", F.lit(None).cast(rec.schema["value"].dataType)).limit(1)
    rec = rec.unionByName(tomb)
    hoisted = hoist_field("payload")(rec)
    flat = flatten_value("_")(hoisted)
    rows = flat.collect()
    live = [r for r in rows if r.value is not None][0]
    assert live.value.asDict() == {"payload_id": 1, "payload_name": "x"}
    assert any(r.value is None for r in rows)  # tombstone preserved


def test_timestamp_router_and_filter(spark):
    from kafkaconnect_spark.operators.transforms import filter_records, timestamp_router

    df = spark.createDataFrame(
        [(1, "a", "2024-03-05 10:00:00")], "id INT, name STRING, ts STRING"
    ).select(
        F.struct("id", "name").alias("value"),
        F.lit("orders").alias("topic"),
        F.to_timestamp("ts").alias("timestamp"),
    )
    routed = timestamp_router("${topic}-${timestamp}", "yyyyMMdd")(df)
    assert routed.collect()[0].topic == "orders-20240305"
    # Filter drops matching topics (anchored match); negate keeps
    # only matches. Applied pre-routing where topic == "orders".
    assert filter_records("TopicNameMatches", "orders")(df).count() == 0
    assert filter_records("TopicNameMatches", "orders")(routed).count() == 1  # anchored
    assert filter_records("TopicNameMatches", "orders.*", negate=True)(routed).count() == 1
    # RecordIsTombstone drops null-value records
    tomb = df.withColumn("value", F.lit(None).cast(df.schema["value"].dataType))
    both = df.unionByName(tomb)
    assert filter_records("RecordIsTombstone")(both).count() == 1


def test_standard_smts_via_registry_chain(spark):
    chain = build_transform_chain(
        [
            TransformSpec("wrap", "org.apache.kafka.connect.transforms.HoistField$Value", {"field": "p"}),
            TransformSpec("flat", "org.apache.kafka.connect.transforms.Flatten$Value", {"delimiter": "_"}),
            TransformSpec("cast", "org.apache.kafka.connect.transforms.Cast$Value", {"spec": "p_id:string"}),
            TransformSpec("mask", "org.apache.kafka.connect.transforms.MaskField$Value", {"fields": "p_name"}),
            TransformSpec("ins", "org.apache.kafka.connect.transforms.InsertField$Value", {"static.field": "v", "static.value": "1"}),
            TransformSpec("ren", "org.apache.kafka.connect.transforms.ReplaceField$Value", {"renames": "p_id:id"}),
        ]
    )
    rec = _rec(spark, [(7, "zoe", 3.5)])
    row = chain(rec).collect()[0]
    assert row.value.asDict() == {"id": "7", "p_name": None, "p_score": 3.5, "v": "1"}
