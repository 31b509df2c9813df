"""Avro sink tombstone: null wire bytes must survive the pandas-UDF
deserialize as a null STRUCT and trigger DELETE (K2 × C3)."""

from __future__ import annotations

import base64
import functools
import sqlite3

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkaconnect_spark.functions.avro_wire import (
    SchemaRegistry,
    avro_schema_for,
    encode_message,
)
from kafkaconnect_spark.streaming.engine import Engine


def test_avro_tombstone_deletes(spark, tmp_path):
    db = str(tmp_path / "s.db")
    url = "jdbc:sqlite:" + db
    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        connection_factories={url: functools.partial(sqlite3.connect, db)},
    )
    sub = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("name", T.StringType(), True),
        ]
    )
    avro = avro_schema_for(sub, "ConnectDefault")
    reg = SchemaRegistry(tmp_path / "registry.json")
    sid = reg.register("avt-value", avro)
    b64 = lambda rec: base64.b64encode(encode_message(avro, rec, sid)).decode()
    wire = spark.createDataFrame(
        [
            ("1", b64({"id": 1, "name": "a"})),
            ("2", b64({"id": 2, "name": "b"})),
            ("1", None),  # tombstone → DELETE id=1
        ],
        "key string, value string",
    ).withColumn("topic", F.lit("avt"))
    eng.transport.append(wire)

    eng.register(
        {
            "name": "avt_sink",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
                "topics": "avt",
                "connection.url": url,
                "insert.mode": "upsert",
                "pk.mode": "record_key",
                "pk.fields": "id",
                "delete.enabled": "true",
                "table.name.format": "t_sink",
                "value.converter": "io.confluent.connect.avro.AvroConverter",
                "value.converter.schema.registry.url": f"file://{tmp_path}/registry.json",
            },
        }
    )
    eng.run_once("avt_sink")
    with sqlite3.connect(db) as c:
        assert sorted(c.execute("SELECT id, name FROM t_sink").fetchall()) == [(2, "b")]
