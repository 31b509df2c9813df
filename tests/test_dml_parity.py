"""CONNECT_DML_TEST analogue (SURVEY §5.2) — the reference's flagship
correctness methodology: run a randomized insert/update/delete mix
through source → topic → sink across multiple poll cycles, then assert
the sink table equals the source table's final state
(…실습 - 01.md:513-558 procedure; …실습 - 02.md:699-711 parity check).

Also the §5.4 failure probe: a JDBC sink pointed at a raw Debezium
envelope topic fails (the reference shows this exact error mode,
…실습 - 01.md:195-197,281)."""

from __future__ import annotations

import functools
import random
import sqlite3

import pytest
from pyspark.sql import functions as F

from kafkaconnect_spark.functions.envelope import wrap_as_envelope
from kafkaconnect_spark.functions.serde import json_serialize
from kafkaconnect_spark.streaming.engine import Engine
from kafkaconnect_spark.workloads import SourceTable, run_dml_parity


@pytest.mark.parametrize("seed", [7, 42])
def test_dml_mix_end_state_parity(spark, tmp_path, seed):
    rng = random.Random(seed)
    db = str(tmp_path / "dml.db")
    url = "jdbc:sqlite:" + db
    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        connection_factories={url: functools.partial(sqlite3.connect, db)},
    )
    src = SourceTable(rng)

    # cdc ingest (unwrap at source, like …실습 - 01.md:287-311) + sink
    eng.register(
        {
            "name": "dml_ingest",
            "config": {
                "connector.class": "io.debezium.connector.mysql.MySqlConnector",
                "cdc.topic.pattern": "dml.t.raw",
                "value.schema.ddl": "id int, name string, score double",
                "transforms": "unwrap, route",
                "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
                "transforms.unwrap.drop.tombstones": "false",
                "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
                "transforms.route.regex": "(.*)\\.(.*)\\.raw",
                "transforms.route.replacement": "$1-$2-flat",
            },
        }
    )
    eng.register(
        {
            "name": "dml_sink",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
                "topics": "dml-t-flat",
                "connection.url": url,
                "insert.mode": "upsert",
                "pk.mode": "record_key",
                "pk.fields": "id",
                "delete.enabled": "true",
                "table.name.format": "t_sink",
                "value.schema.ddl": "id int, name string, score double",
                "value.converter.schemas.enable": "false",
            },
        }
    )

    # 5 cycles of mixed DML, engine drains after each (poll cadence)
    for _ in range(5):
        src.step(n_ops=40)
        src.drain_to_topic(spark, eng, "dml.t.raw")
        eng.run_once()

    with sqlite3.connect(db) as c:
        got = {
            r[0]: (r[0], r[1], r[2])
            for r in c.execute("SELECT id, name, score FROM t_sink").fetchall()
        }
    assert got == src.rows  # exact end-state parity, like the UNION ALL check

    # replay the whole topic from scratch into a fresh sink →
    # idempotent same state (at-least-once + keyed upsert)
    db2 = str(tmp_path / "dml2.db")
    url2 = "jdbc:sqlite:" + db2
    eng.connection_factories[url2] = functools.partial(sqlite3.connect, db2)
    eng.register(
        {
            "name": "dml_sink_replay",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
                "topics": "dml-t-flat",
                "connection.url": url2,
                "insert.mode": "upsert",
                "pk.mode": "record_key",
                "pk.fields": "id",
                "delete.enabled": "true",
                "table.name.format": "t_sink",
                "value.schema.ddl": "id int, name string, score double",
                "value.converter.schemas.enable": "false",
            },
        }
    )
    eng.run_once("dml_sink_replay")
    with sqlite3.connect(db2) as c:
        got2 = {
            r[0]: (r[0], r[1], r[2])
            for r in c.execute("SELECT id, name, score FROM t_sink").fetchall()
        }
    assert got2 == src.rows


def test_sink_fails_on_raw_envelope(spark, tmp_path):
    """§5.4 F-probe: JDBC sink on the RAW envelope topic (no unwrap)
    fails and surfaces FAILED state — reference behavior at
    …실습 - 01.md:195-197,281 (sink task error on envelope shape)."""
    db = str(tmp_path / "raw.db")
    url = "jdbc:sqlite:" + db
    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        connection_factories={url: functools.partial(sqlite3.connect, db)},
    )
    rows = spark.createDataFrame([(1, "a", "c")], "id int, name string, op string")
    env = wrap_as_envelope(rows, ["id", "name"], op_col="op", db="om", table="t")
    value_type = env.schema["value"].dataType
    eng.transport.append(
        env.select(
            F.col("value.after.id").cast("string").alias("key"),
            json_serialize("value", value_type, schemas_enable=False).alias("value"),
            F.lit("om.t.raw").alias("topic"),
        )
    )
    eng.register(
        {
            "name": "raw_sink",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
                "topics": "om.t.raw",
                "connection.url": url,
                "insert.mode": "upsert",
                "pk.mode": "record_key",
                "pk.fields": "id",
                # declared flat schema vs envelope payload on the wire:
                "value.schema.ddl": "id int, name string",
                "value.converter.schemas.enable": "false",
            },
        }
    )
    with pytest.raises(Exception):
        eng.run_once("raw_sink")
    assert eng.status("raw_sink")["state"] == "FAILED"
    assert eng.status("raw_sink")["error"]


def test_baseline_scale_throughput(spark, tmp_path):
    """BASELINE.md operative workload: the reference's largest mixed-DML
    run (CONNECT_DML_TEST(0,5000,100,100) ≈ 25k change ops; here a
    6/3/1 insert/update/delete mix) through source → topic → sink with
    end-state parity. The reference spreads this over ≥50 s of 10 s
    poll cycles and sleeps; the engine must clear the whole backlog in
    ONE cycle well under that. Shares the exact harness bench.py
    records as `dml_parity_wall` (kafkaconnect_spark/workloads.py)."""
    result = run_dml_parity(spark, str(tmp_path), n_ops=25_000)
    assert result["n_ops"] == 25_000
    assert result["parity"]
    # generous CI bound; the reference's own cadence implies >= 50 s
    elapsed = result["elapsed_sec"]
    assert elapsed < 30, f"backlog took {elapsed:.1f}s"
    print(f"baseline workload: 25k ops end-to-end in {elapsed:.1f}s")


def test_sink_poison_pill_does_not_delete(spark, tmp_path):
    """A malformed value record (from_json → NULL) must fail the batch
    with a clear error — NOT be mistaken for a tombstone and DELETE
    live data."""
    db = str(tmp_path / "pp.db")
    url = "jdbc:sqlite:" + db
    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        connection_factories={url: functools.partial(sqlite3.connect, db)},
    )
    wire = spark.createDataFrame(
        [("1", '{"id": 1, "name": "a"}', "pp_topic"), ("1", "{truncated", "pp_topic")],
        "key string, value string, topic string",
    )
    eng.transport.append(wire)
    eng.register(
        {
            "name": "pp_sink",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
                "topics": "pp_topic",
                "connection.url": url,
                "insert.mode": "upsert",
                "pk.mode": "record_key",
                "pk.fields": "id",
                "delete.enabled": "true",
                "table.name.format": "t_sink",
                "value.schema.ddl": "id int, name string",
                "value.converter.schemas.enable": "false",
            },
        }
    )
    with pytest.raises(Exception, match="malformed|Malformed|FAILFAST"):
        eng.run_once("pp_sink")


def test_parity_harness_reports_batch_latency(spark, tmp_path):
    """run_dml_parity carries per-micro-batch latency percentiles from
    the engine's StreamingQueryProgress log (bench trendline, r4
    directive): every drained stream contributes progress rows."""
    out = run_dml_parity(spark, str(tmp_path), n_ops=500)
    assert out["parity"]
    assert out["n_micro_batches"] >= 2  # ingest drain + sink drain
    assert out["batch_p50_ms"] <= out["batch_p95_ms"]


def test_staged_dml_has_real_latency_distribution(spark, tmp_path):
    """The poll-cadence form: 2 batches per cycle, parity at the end —
    the bench's batch-latency percentiles come from here."""
    from kafkaconnect_spark.workloads import run_dml_staged

    out = run_dml_staged(spark, str(tmp_path), n_ops=1000, n_cycles=3)
    assert out["parity"]
    assert out["n_cycles"] == 3
    assert out["n_micro_batches"] >= 6
    assert out["batch_p50_ms"] <= out["batch_p95_ms"]
