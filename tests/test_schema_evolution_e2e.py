"""Schema-drift mid-pipeline (SURVEY §1.3 / …실습 - 03.md:149-385):
the source table gains a column; the pipeline restart resolves the new
schema (Structured Streaming schemas are fixed per run), and the sink
auto-evolves the target with ALTER TABLE ADD COLUMN — or fails loudly
when auto.evolve=false, like the reference's failing sink task."""

from __future__ import annotations

import functools
import sqlite3

import pytest

from kafkaconnect_spark.streaming.engine import Engine


def _engine(spark, tmp_path, state, db):
    url = "jdbc:sqlite:" + db
    return Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=lambda t: spark.createDataFrame(state["rows"], state["ddl"]),
        connection_factories={url: functools.partial(sqlite3.connect, db)},
    ), url


def _source_spec():
    return {
        "name": "src",
        "config": {
            "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
            "connection.url": "jdbc:mysql://fake/om",
            "topic.prefix": "t_",
            "table.whitelist": "customers",
            "mode": "incrementing",
            "incrementing.column.name": "id",
            "value.converter.schemas.enable": "false",
            "transforms": "create_key, extract_key",
            "transforms.create_key.type": "org.apache.kafka.connect.transforms.ValueToKey",
            "transforms.create_key.fields": "id",
            "transforms.extract_key.type": "org.apache.kafka.connect.transforms.ExtractField$Key",
            "transforms.extract_key.field": "id",
        },
    }


def _sink_spec(url, evolve: bool, ddl: str):
    return {
        "name": "sink",
        "config": {
            "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
            "topics": "t_customers",
            "connection.url": url,
            "insert.mode": "upsert",
            "pk.mode": "record_key",
            "pk.fields": "id",
            "delete.enabled": "true",
            "table.name.format": "customers_sink",
            "auto.create": "true",
            "auto.evolve": str(evolve).lower(),
            "value.schema.ddl": ddl,
            "value.converter.schemas.enable": "false",
        },
    }


def test_add_column_evolves_target(spark, tmp_path):
    state = {"rows": [(1, "a")], "ddl": "id int, name string"}
    db = str(tmp_path / "evo.db")
    eng, url = _engine(spark, tmp_path, state, db)
    eng.register(_source_spec())
    eng.register(_sink_spec(url, evolve=True, ddl="id int, name string"))
    eng.run_once()
    with sqlite3.connect(db) as c:
        assert c.execute("SELECT id, name FROM customers_sink").fetchall() == [(1, "a")]

    # DDL at the source: new nullable column + new row
    state["ddl"] = "id int, name string, age int"
    state["rows"] = [(1, "a", None), (2, "b", 30)]

    # pipeline restart resolves the new schema (reference restarts the
    # connector after DDL too, …실습 - 03.md:265-273)
    eng.pause("sink")
    eng.delete("sink")
    eng.register(_sink_spec(url, evolve=True, ddl="id int, name string, age int"))
    eng.run_once()

    with sqlite3.connect(db) as c:
        got = sorted(c.execute("SELECT id, name, age FROM customers_sink").fetchall())
    assert got == [(1, "a", None), (2, "b", 30)]


def test_add_column_without_evolve_fails(spark, tmp_path):
    state = {"rows": [(1, "a")], "ddl": "id int, name string"}
    db = str(tmp_path / "noevo.db")
    eng, url = _engine(spark, tmp_path, state, db)
    eng.register(_source_spec())
    eng.register(_sink_spec(url, evolve=False, ddl="id int, name string"))
    eng.run_once()

    state["ddl"] = "id int, name string, age int"
    state["rows"] = [(2, "b", 30)]
    eng.run_once("src")  # the widened row reaches the topic
    eng.pause("sink")
    eng.delete("sink")
    eng.register(_sink_spec(url, evolve=False, ddl="id int, name string, age int"))
    with pytest.raises(Exception, match="auto.evolve=false"):
        eng.run_once("sink")
    assert eng.status("sink")["state"] == "FAILED"
