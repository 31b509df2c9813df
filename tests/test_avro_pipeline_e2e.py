"""E2E: JDBC source → Avro-converted topic → JDBC sink — the Schema
Registry lab flow (실습수행/Schema Registry 기반의 Connector 구성 실습.md:
source :90-93, sinks :197-200) on the file transport."""

from __future__ import annotations

import functools
import json
import sqlite3

from kafkaconnect_spark.functions.avro_wire import SchemaRegistry
from kafkaconnect_spark.streaming.engine import Engine


def test_avro_source_to_sink(spark, tmp_path):
    db = str(tmp_path / "avro.db")
    url = "jdbc:sqlite:" + db
    registry_url = f"file://{tmp_path}/registry.json"
    state = {"rows": [(1, "a", 0.5), (2, "b", 1.5)]}

    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=lambda t: spark.createDataFrame(
            state["rows"], "id int, name string, score double"
        ),
        connection_factories={url: functools.partial(sqlite3.connect, db)},
    )

    eng.register(
        {
            "name": "avro_source",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
                "connection.url": "jdbc:mysql://fake:3306/om",
                "topic.prefix": "mysqlavro_",
                "table.whitelist": "customers",
                "mode": "incrementing",
                "incrementing.column.name": "id",
                "value.converter": "io.confluent.connect.avro.AvroConverter",
                "value.converter.schema.registry.url": registry_url,
                "transforms": "create_key, extract_key",
                "transforms.create_key.type": "org.apache.kafka.connect.transforms.ValueToKey",
                "transforms.create_key.fields": "id",
                "transforms.extract_key.type": "org.apache.kafka.connect.transforms.ExtractField$Key",
                "transforms.extract_key.field": "id",
            },
        }
    )
    assert eng.run_once()["avro_source"] == 2

    # subject registered under <topic>-value, like the reference (:146)
    reg = SchemaRegistry(f"{tmp_path}/registry.json")
    assert reg.subjects() == ["mysqlavro_customers-value"]

    # wire bytes are framed Avro (base64 on the file transport), not JSON
    log = spark.read.parquet(str(tmp_path / "topics" / "mysqlavro_customers" / "log"))
    raw = log.first().value
    import base64

    assert base64.b64decode(raw)[0:1] == b"\x00"
    try:
        json.loads(raw)
        assert False, "value should not be JSON"
    except (ValueError, AssertionError) as e:
        if isinstance(e, AssertionError):
            raise

    # sink resolves the schema from the registry (no value.schema.ddl)
    eng.register(
        {
            "name": "avro_sink",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
                "topics": "mysqlavro_customers",
                "connection.url": url,
                "insert.mode": "upsert",
                "pk.mode": "record_key",
                "pk.fields": "id",
                "delete.enabled": "true",
                "table.name.format": "customers_sink",
                "value.converter": "io.confluent.connect.avro.AvroConverter",
                "value.converter.schema.registry.url": registry_url,
            },
        }
    )
    eng.run_once("avro_sink")
    with sqlite3.connect(db) as c:
        got = sorted(c.execute("SELECT id, name, score FROM customers_sink").fetchall())
    assert got == [(1, "a", 0.5), (2, "b", 1.5)]

    # incremental update flows through the same avro path
    state["rows"] = state["rows"] + [(3, "c", 2.5)]
    eng.run_once()
    with sqlite3.connect(db) as c:
        n = c.execute("SELECT count(*) FROM customers_sink").fetchone()[0]
    assert n == 3


def test_avro_sink_tolerance_all_dead_letters_bad_frames(spark, tmp_path):
    """KIP-298 over the Avro path: a corrupt wire frame among good
    records is skipped and routed to the DLQ under
    errors.tolerance=all; good rows still land."""
    import base64

    from pyspark.sql import functions as F

    db = str(tmp_path / "avro_dlq.db")
    url = "jdbc:sqlite:" + db
    registry_url = f"file://{tmp_path}/registry.json"

    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=lambda t: spark.createDataFrame(
            [(1, "a", 0.5), (2, "b", 1.5)], "id int, name string, score double"
        ),
        connection_factories={url: functools.partial(sqlite3.connect, db)},
    )
    eng.register(
        {
            "name": "avro_source2",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
                "connection.url": "jdbc:mysql://fake:3306/om",
                "topic.prefix": "avrodlq_",
                "table.whitelist": "customers",
                "mode": "incrementing",
                "incrementing.column.name": "id",
                "value.converter": "io.confluent.connect.avro.AvroConverter",
                "value.converter.schema.registry.url": registry_url,
                "transforms": "create_key, extract_key",
                "transforms.create_key.type": "org.apache.kafka.connect.transforms.ValueToKey",
                "transforms.create_key.fields": "id",
                "transforms.extract_key.type": "org.apache.kafka.connect.transforms.ExtractField$Key",
                "transforms.extract_key.field": "id",
            },
        }
    )
    assert eng.run_once()["avro_source2"] == 2

    # inject a truncated/garbage frame (valid base64, broken avro)
    poison = base64.b64encode(b"\x00\x00\x00\x00\x01\xff").decode()
    eng.transport.append(
        spark.createDataFrame([("9", poison)], "key STRING, value STRING")
        .withColumn("topic", F.lit("avrodlq_customers"))
    )

    eng.register(
        {
            "name": "avro_dlq_sink",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
                "topics": "avrodlq_customers",
                "connection.url": url,
                "insert.mode": "upsert",
                "pk.mode": "record_key",
                "pk.fields": "id",
                "table.name.format": "customers_sink2",
                "value.converter": "io.confluent.connect.avro.AvroConverter",
                "value.converter.schema.registry.url": registry_url,
                "errors.tolerance": "all",
                "errors.deadletterqueue.topic.name": "avro_dlq",
            },
        }
    )
    eng.run_once("avro_dlq_sink")
    with sqlite3.connect(db) as c:
        got = sorted(c.execute("SELECT id, name FROM customers_sink2").fetchall())
    assert got == [(1, "a"), (2, "b")]
    dlq = eng.transport.read_batch(["avro_dlq"]).collect()
    assert len(dlq) == 1 and dlq[0].key == "9" and dlq[0].value == poison
