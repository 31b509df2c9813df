"""End-to-end engine tests — the reference's lab flows, automated:

1. SpoolDir CSV → topic → JDBC sink upsert, row-parity (SURVEY §7
   minimum slice; 실습수행/Spool Dir Source Connector 실습.md).
2. JDBC incremental source → topic, multi-cycle resume (JDBC Source
   Connector 실습.md:42-199) including the missed-update failure mode.
3. CDC envelope ingest → unwrap → sink with tombstone deletes
   (Debezium MySQL CDC 실습 - 01).
4. Lifecycle verbs + offset reset + single-writer rule (§2.6).
"""

from __future__ import annotations

import functools
import sqlite3
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kafkaconnect_spark.plans.spec import SpecError
from kafkaconnect_spark.streaming.engine import Engine

CSV = "id,name,email\n{rows}\n"


def make_engine(spark, tmp_path, tables=None, dbs=None):
    (tmp_path / "topics").mkdir(exist_ok=True)
    return Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=(lambda t: tables[t]()) if tables else None,
        connection_factories=dbs or {},
    )


def spooldir_spec(tmp_path, topic="csv_topic"):
    for d in ("spool", "spool/finished", "spool/error"):
        (tmp_path / d).mkdir(parents=True, exist_ok=True)
    return {
        "name": "csv_spooldir",
        "config": {
            "connector.class": "com.github.jcustenborder.kafka.connect.spooldir.SpoolDirCsvSourceConnector",
            "topic": topic,
            "input.path": str(tmp_path / "spool"),
            "input.file.pattern": "^.*\\.csv$",
            "finished.path": str(tmp_path / "spool" / "finished"),
            "error.path": str(tmp_path / "spool" / "error"),
            "csv.first.row.as.header": "true",
            "schema.generation.enabled": "true",
        },
    }


def sink_spec(db_url, topic, table, name="sink", extra=None):
    cfg = {
        "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
        "topics": topic,
        "connection.url": db_url,
        "insert.mode": "upsert",
        "pk.mode": "record_key",
        "pk.fields": "id",
        "delete.enabled": "true",
        "table.name.format": table,
        "transforms": "create_key, extract_key",
        "transforms.create_key.type": "org.apache.kafka.connect.transforms.ValueToKey",
        "transforms.create_key.fields": "id",
        "transforms.extract_key.type": "org.apache.kafka.connect.transforms.ExtractField$Key",
        "transforms.extract_key.field": "id",
    }
    cfg.update(extra or {})
    return {"name": name, "config": cfg}


def test_spooldir_to_sink_parity(spark, tmp_path):
    """The minimum end-to-end slice: CSV file → topic → sqlite table."""
    db = str(tmp_path / "sink.db")
    url = "jdbc:sqlite:" + db
    rows = "\n".join(f"{i},name{i},u{i}@x.com" for i in range(100))
    (tmp_path / "spool" if (tmp_path / "spool").exists() else tmp_path).mkdir(exist_ok=True)
    spec = spooldir_spec(tmp_path)
    (tmp_path / "spool" / "batch1.csv").write_text(CSV.format(rows=rows))

    eng = make_engine(spark, tmp_path, dbs={url: functools.partial(sqlite3.connect, db)})
    eng.register(spec)
    eng.run_once("csv_spooldir")

    # sink registers after topic has data (schema sampled from topic)
    sink = sink_spec(url, "csv_topic", "csv_sink")
    # SMT chain on the sink side would re-key; value already has id —
    # use pk from value via key created at sink: keep chain minimal
    sink["config"]["transforms"] = "create_key, extract_key"
    eng.register(sink)
    eng.run_once("sink")

    with sqlite3.connect(db) as c:
        got = sorted(c.execute("SELECT id, name, email FROM csv_sink").fetchall())
    assert len(got) == 100
    assert got[0] == (0, "name0", "u0@x.com")

    # second cycle: new file appears; old file not re-processed
    (tmp_path / "spool" / "batch2.csv").write_text(CSV.format(rows="100,name100,u100@x.com"))
    eng.run_once("csv_spooldir")
    eng.run_once("sink")
    with sqlite3.connect(db) as c:
        n = c.execute("SELECT count(*) FROM csv_sink").fetchone()[0]
    assert n == 101


def jdbc_source_spec(name="om_source", mode="incrementing", tables="customers", prefix="mysql_om_", extra=None):
    cfg = {
        "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
        "connection.url": "jdbc:mysql://fake:3306/om",
        "topic.prefix": prefix,
        "table.whitelist": tables,
        "mode": mode,
        "incrementing.column.name": "id",
        "poll.interval.ms": 100,
    }
    if "timestamp" in mode:
        cfg["timestamp.column.name"] = "updated"
    cfg.update(extra or {})
    return {"name": name, "config": cfg}


def test_jdbc_source_incremental_cycles(spark, tmp_path):
    """S1: only rows beyond the stored offset flow on each poll."""
    state = {"rows": [(1, "a"), (2, "b")]}
    tables = {
        "customers": lambda: spark.createDataFrame(state["rows"], "id int, name string")
    }
    eng = make_engine(spark, tmp_path, tables=tables)
    eng.register(jdbc_source_spec())
    assert eng.run_once()["om_source"] == 2
    # no new rows → empty poll
    assert eng.run_once()["om_source"] == 0
    # new rows appear → only the delta flows
    state["rows"] = state["rows"] + [(3, "c")]
    assert eng.run_once()["om_source"] == 1

    log = spark.read.parquet(str(tmp_path / "topics" / "mysql_om_customers" / "log"))
    assert log.count() == 3
    assert [r.offset for r in log.orderBy("offset").collect()] == [0, 1, 2]


def test_timestamp_mode_misses_untouched_updates(spark, tmp_path):
    """Reference failure mode (JDBC Source Connector 실습.md:144-153):
    an UPDATE that doesn't bump the timestamp column is NOT captured."""
    state = {"rows": [(1, "a", "2024-01-01 00:00:00")]}

    def load():
        return spark.createDataFrame(
            state["rows"], "id int, name string, updated_s string"
        ).select("id", "name", F.to_timestamp("updated_s").alias("updated"))

    eng = make_engine(spark, tmp_path, tables={"customers": load})
    eng.register(jdbc_source_spec(mode="timestamp", extra={"timestamp.column.name": "updated"}))
    assert eng.run_once()["om_source"] == 1
    # update without touching `updated` → missed
    state["rows"] = [(1, "a-modified", "2024-01-01 00:00:00")]
    assert eng.run_once()["om_source"] == 0
    # update that bumps `updated` → captured
    state["rows"] = [(1, "a-modified", "2024-01-02 00:00:00")]
    assert eng.run_once()["om_source"] == 1


def test_single_writer_rule_and_lifecycle(spark, tmp_path):
    state = {"rows": [(1, "a")]}
    tables = {"customers": lambda: spark.createDataFrame(state["rows"], "id int, name string")}
    eng = make_engine(spark, tmp_path, tables=tables)
    eng.register(jdbc_source_spec())
    with pytest.raises(SpecError, match="single-writer"):
        eng.register(jdbc_source_spec(name="om_source_2"))

    assert eng.show() == {"om_source": "RUNNING"}
    eng.run_once()
    eng.pause("om_source")
    assert eng.status("om_source")["state"] == "PAUSED"
    # paused pipelines don't run
    assert eng.run_once() == {}
    eng.resume("om_source")
    assert eng.run_once()["om_source"] == 0  # offset survived pause/resume

    # offset reset → full replay
    eng.pause("om_source")
    eng.reset_offsets("om_source")
    eng.resume("om_source")
    assert eng.run_once()["om_source"] == 1

    eng.delete("om_source")
    assert eng.show() == {}
    # claim released → re-register OK
    eng.register(jdbc_source_spec(name="om_source_3"))


def test_cdc_ingest_unwrap_to_sink(spark, tmp_path):
    """E2 flagship: Debezium-envelope topic → unwrap → topic → sink
    with tombstone deletes (…실습 - 01.md:287-311 source-side unwrap)."""
    from kafkaconnect_spark.functions.envelope import wrap_as_envelope
    from kafkaconnect_spark.functions.serde import json_serialize

    db = str(tmp_path / "cdc.db")
    url = "jdbc:sqlite:" + db
    eng = make_engine(spark, tmp_path, dbs={url: functools.partial(sqlite3.connect, db)})

    # seed a Debezium-format topic: c,c,u,d on ids 1,2,1,2
    rows = spark.createDataFrame(
        [(1, "a", "c", 0), (2, "b", "c", 1), (1, "a2", "u", 2), (2, None, "d", 3)],
        "id int, name string, op string, seq int",
    )
    env = wrap_as_envelope(rows, ["id", "name"], op_col="op", db="oc", table="customers")
    env_type = env.schema["value"].dataType
    # key fallback for deletes: use before-image id
    wire = env.select(
        F.coalesce(F.col("value.after.id"), F.col("value.before.id")).cast("string").alias("key"),
        json_serialize("value", env_type, schemas_enable=False).alias("value"),
        F.lit("dbz.oc.customers").alias("topic"),
    )
    eng.transport.append(wire)

    eng.register(
        {
            "name": "cdc_ingest",
            "config": {
                "connector.class": "io.debezium.connector.mysql.MySqlConnector",
                "cdc.topic.pattern": "dbz.oc.customers",
                "value.schema.ddl": "id int, name string",
                "transforms": "unwrap, route",
                "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
                "transforms.unwrap.drop.tombstones": "false",
                "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
                "transforms.route.regex": "(.*)\\.(.*)\\.(.*)",
                "transforms.route.replacement": "$1-$2-$3",
            },
        }
    )
    eng.run_once("cdc_ingest")

    sink = sink_spec(
        url,
        "dbz-oc-customers",
        "customers_sink",
        name="cdc_sink",
        extra={
            "value.schema.ddl": "id int, name string",
            "value.converter.schemas.enable": "false",
            "transforms": "",
        },
    )
    eng.register(sink)
    eng.run_once("cdc_sink")

    with sqlite3.connect(db) as c:
        got = sorted(c.execute("SELECT id, name FROM customers_sink").fetchall())
    # id=1 upserted to a2; id=2 deleted by tombstone
    assert got == [(1, "a2")]


def test_parquet_lake_sink_merge(spark, tmp_path):
    """Engine-native parquet-lake sink: topic batches MERGE into a
    hive-partitioned dataset via dynamic partition overwrite."""
    from kafkaconnect_spark.functions.serde import json_serialize

    eng = make_engine(spark, tmp_path)
    lake = str(tmp_path / "lake")

    def wire(rows_df):
        vt = rows_df.schema["value"].dataType if "value" in rows_df.columns else None
        assert vt is None
        packed = rows_df.select(F.struct(*rows_df.columns).alias("value"))
        return packed.select(
            F.col("value.id").cast("string").alias("key"),
            json_serialize("value", packed.schema["value"].dataType, schemas_enable=False).alias("value"),
            F.lit("lake_topic").alias("topic"),
        )

    t0 = spark.createDataFrame(
        [(1, "a", "d1", 1, False), (2, "b", "d1", 1, False), (3, "c", "d2", 1, False)],
        "id int, name string, day string, ver int, deleted boolean",
    )
    eng.transport.append(wire(t0))

    eng.register(
        {
            "name": "lake_sink",
            "config": {
                "connector.class": "kafkaconnect_spark.ParquetLakeSinkConnector",
                "topics": "lake_topic",
                "path": lake,
                "pk.mode": "record_key",
                "pk.fields": "id",
                "partition.field": "day",
                "order.field": "ver",
                "delete.field": "deleted",
                "value.schema.ddl": "id int, name string, day string, ver int, deleted boolean",
                "value.converter.schemas.enable": "false",
                "transforms": "",
            },
        }
    )
    eng.run_once("lake_sink")
    assert {
        (r.id, r.name) for r in spark.read.parquet(lake).collect()
    } == {(1, "a"), (2, "b"), (3, "c")}

    # second batch: update id=1, tombstone id=2, new partition d3
    t1 = spark.createDataFrame(
        [(1, "a2", "d1", 2, False), (2, "b", "d1", 2, True), (4, "d", "d3", 1, False)],
        "id int, name string, day string, ver int, deleted boolean",
    )
    eng.transport.append(wire(t1))
    eng.run_once("lake_sink")
    assert {
        (r.id, r.name, r.day) for r in spark.read.parquet(lake).collect()
    } == {(1, "a2", "d1"), (3, "c", "d2"), (4, "d", "d3")}


def test_spooldir_to_parquet_lake_chain(spark, tmp_path):
    """S6 → K8 → parquet-lake sink: CSV files land as a partitioned
    parquet dataset through two registered pipelines."""
    eng = make_engine(spark, tmp_path)
    lake = str(tmp_path / "csv_lake")

    (tmp_path / "spool" / "batch1.csv").parent.mkdir(parents=True, exist_ok=True)
    (tmp_path / "spool" / "batch1.csv").write_text(
        "id,name,region\n1,alpha,eu\n2,beta,us\n3,gamma,eu\n"
    )
    spec = spooldir_spec(tmp_path, topic="csv_topic")
    eng.register(spec)
    eng.run_once("csv_spooldir")

    eng.register(
        {
            "name": "csv_lake",
            "config": {
                "connector.class": "kafkaconnect_spark.ParquetLakeSinkConnector",
                "topics": "csv_topic",
                "path": lake,
                "pk.mode": "record_key",
                "pk.fields": "id",
                "partition.field": "region",
                "order.field": "id",
                "value.schema.ddl": "id int, name string, region string",
                "value.converter.schemas.enable": "true",
                "transforms": "",
            },
        }
    )
    eng.run_once("csv_lake")
    got = {r.id: (r.name, r.region) for r in spark.read.parquet(lake).collect()}
    assert got == {1: ("alpha", "eu"), 2: ("beta", "us"), 3: ("gamma", "eu")}
    assert sorted(
        d for d in __import__("os").listdir(lake) if d.startswith("region=")
    ) == ["region=eu", "region=us"]


def test_standard_smt_chain_in_sink_pipeline(spark, tmp_path):
    """A Connect config using the standard SMT set (MaskField /
    InsertField / ReplaceField) compiles and runs end-to-end: the sink
    table materializes the transformed shape (masked PII, injected
    provenance column, renamed field)."""
    db = str(tmp_path / "smt_sink.db")
    url = "jdbc:sqlite:" + db
    rows = "\n".join(f"{i},name{i},u{i}@x.com" for i in range(20))
    spec = spooldir_spec(tmp_path)
    (tmp_path / "spool" / "batch1.csv").write_text(CSV.format(rows=rows))

    eng = make_engine(spark, tmp_path, dbs={url: functools.partial(sqlite3.connect, db)})
    eng.register(spec)
    eng.run_once("csv_spooldir")

    sink = sink_spec(url, "csv_topic", "smt_sink", name="smt_sink")
    sink["config"].update(
        {
            "transforms": "create_key, extract_key, mask, ins, ren",
            "transforms.mask.type": "org.apache.kafka.connect.transforms.MaskField$Value",
            "transforms.mask.fields": "email",
            "transforms.ins.type": "org.apache.kafka.connect.transforms.InsertField$Value",
            "transforms.ins.static.field": "src",
            "transforms.ins.static.value": "spooldir",
            "transforms.ren.type": "org.apache.kafka.connect.transforms.ReplaceField$Value",
            "transforms.ren.renames": "name:full_name",
        }
    )
    eng.register(sink)
    eng.run_once("smt_sink")

    with sqlite3.connect(db) as c:
        cols = [r[1] for r in c.execute("PRAGMA table_info(smt_sink)")]
        got = sorted(c.execute("SELECT id, full_name, email, src FROM smt_sink").fetchall())
    assert "full_name" in cols and "name" not in cols
    assert len(got) == 20
    assert got[0] == (0, "name0", None, "spooldir")  # email masked, src injected


def test_sink_errors_tolerance_and_dlq(spark, tmp_path):
    """KIP-298 error handling: a malformed value among good records
    fails the batch under the default errors.tolerance=none, and under
    =all the good rows land, the poison pill is skipped, and the raw
    record reaches the dead-letter topic."""
    db = str(tmp_path / "dlq_sink.db")
    url = "jdbc:sqlite:" + db
    eng = make_engine(spark, tmp_path, dbs={url: functools.partial(sqlite3.connect, db)})

    good = [
        ("1", '{"id": 1, "name": "a"}'),
        ("2", '{"id": 2, "name": "b"}'),
    ]
    poison = [("3", "{this is not json")]
    recs = spark.createDataFrame(good + poison, "key STRING, value STRING")
    eng.transport.append(recs.withColumn("topic", F.lit("dlq_topic")))

    base = sink_spec(url, "dlq_topic", "dlq_sink", name="strict_sink")
    base["config"]["transforms"] = ""
    base["config"]["value.converter.schemas.enable"] = "false"
    base["config"]["value.schema.ddl"] = "id INT, name STRING"
    eng.register(base)
    with pytest.raises(Exception, match="(?i)malformed"):
        eng.run_once("strict_sink")

    tolerant = sink_spec(url, "dlq_topic", "dlq_sink2", name="tolerant_sink")
    tolerant["config"]["transforms"] = ""
    tolerant["config"]["value.converter.schemas.enable"] = "false"
    tolerant["config"]["value.schema.ddl"] = "id INT, name STRING"
    tolerant["config"]["errors.tolerance"] = "all"
    tolerant["config"]["errors.deadletterqueue.topic.name"] = "my_dlq"
    eng.register(tolerant)
    eng.run_once("tolerant_sink")

    with sqlite3.connect(db) as c:
        got = sorted(c.execute("SELECT id, name FROM dlq_sink2").fetchall())
    assert got == [(1, "a"), (2, "b")]

    dlq = eng.transport.read_batch(["my_dlq"]).collect()
    assert len(dlq) == 1
    assert dlq[0].value == "{this is not json"
    assert dlq[0].key == "3"


def test_sink_dlq_requires_tolerance_all(spark, tmp_path):
    db = str(tmp_path / "x.db")
    url = "jdbc:sqlite:" + db
    eng = make_engine(spark, tmp_path, dbs={url: functools.partial(sqlite3.connect, db)})
    bad = sink_spec(url, "some_topic", "t", name="bad_sink")
    bad["config"]["errors.deadletterqueue.topic.name"] = "dlq"
    with pytest.raises(SpecError, match="errors.tolerance=all"):
        eng.register(bad)
