"""PipelineSpec parsing — reference-JSON-compatible configs.

Config shapes mirror the reference's connector_configs/*.json
(mysql_jdbc_om_source.json, mysql_jdbc_sink_customers.json,
spooldir_source.json) without copying the files.
"""

from __future__ import annotations

import pytest

from kafkaconnect_spark.plans.spec import PipelineSpec, SpecError


def jdbc_source_cfg(**over):
    cfg = {
        "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
        "tasks.max": "1",
        "connection.url": "jdbc:mysql://localhost:3306/om",
        "topic.prefix": "mysql_om_",
        "table.whitelist": "om.customers, om.orders",
        "poll.interval.ms": 10000,
        "mode": "timestamp+incrementing",
        "incrementing.column.name": "customer_id",
        "timestamp.column.name": "system_upd",
    }
    cfg.update(over)
    return {"name": "mysql_jdbc_om_source", "config": cfg}


def test_jdbc_source_parses():
    spec = PipelineSpec.from_json(jdbc_source_cfg())
    assert spec.kind == "jdbc-source"
    assert spec.tables == ["customers", "orders"]
    assert spec.topic_for_table("customers") == "mysql_om_customers"
    assert spec.poll_interval_ms == 10000


def test_jdbc_source_mode_validation():
    with pytest.raises(SpecError, match="mode"):
        PipelineSpec.from_json(jdbc_source_cfg(mode="nope"))
    bad = jdbc_source_cfg(mode="incrementing")
    del bad["config"]["incrementing.column.name"]
    with pytest.raises(SpecError, match="incrementing.column.name"):
        PipelineSpec.from_json(bad)


def test_whitelist_blacklist_exclusive():
    with pytest.raises(SpecError, match="mutually exclusive"):
        PipelineSpec.from_json(jdbc_source_cfg(**{"table.blacklist": "om.products"}))


def test_sink_parses_with_smt_chain():
    spec = PipelineSpec.from_json(
        {
            "name": "mysql_jdbc_sink_customers",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
                "topics": "mysql_om_smt_customers",
                "connection.url": "jdbc:sqlite:/tmp/x.db",
                "insert.mode": "upsert",
                "pk.mode": "record_key",
                "pk.fields": "customer_id",
                "delete.enabled": "true",
                "table.name.format": "customers_sink",
                "transforms": "rename_topic, unwrap",
                "transforms.rename_topic.type": "org.apache.kafka.connect.transforms.RegexRouter",
                "transforms.rename_topic.regex": "(.*)\\.(.*)\\.(.*)",
                "transforms.rename_topic.replacement": "$1-$2-$3",
                "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
                "transforms.unwrap.drop.tombstones": "false",
            },
        }
    )
    assert spec.kind == "jdbc-sink"
    assert spec.pk_fields == ["customer_id"]
    # chain order preserved, params scoped per alias
    assert [t.alias for t in spec.transforms] == ["rename_topic", "unwrap"]
    assert spec.transforms[0].short_type == "RegexRouter"
    assert spec.transforms[0].params["replacement"] == "$1-$2-$3"


def test_delete_requires_record_key_pk():
    with pytest.raises(SpecError, match="delete.enabled"):
        PipelineSpec.from_json(
            {
                "name": "bad_sink",
                "config": {
                    "connector.class": "io.confluent.connect.jdbc.JdbcSinkConnector",
                    "topics": "t",
                    "insert.mode": "insert",
                    "delete.enabled": "true",
                    "pk.mode": "none",
                },
            }
        )


def test_spooldir_fail_fast_on_missing_dirs(tmp_path):
    cfg = {
        "name": "csv_spooldir_source",
        "config": {
            "connector.class": "com.github.jcustenborder.kafka.connect.spooldir.SpoolDirCsvSourceConnector",
            "topic": "spooldir-test-topic",
            "input.path": str(tmp_path / "spool_test_dir"),
            "input.file.pattern": "^.*\\.csv$",
            "finished.path": str(tmp_path / "spool_test_dir" / "finished"),
            "error.path": str(tmp_path / "spool_test_dir" / "error"),
        },
    }
    # missing dirs → registration-time failure, like the reference
    with pytest.raises(SpecError, match="does not exist"):
        PipelineSpec.from_json(cfg)
    for k in ("input.path", "finished.path", "error.path"):
        import pathlib

        pathlib.Path(cfg["config"][k]).mkdir(parents=True, exist_ok=True)
    assert PipelineSpec.from_json(cfg).kind == "spooldir-source"


def test_debezium_class_maps_to_cdc():
    spec = PipelineSpec.from_json(
        {
            "name": "mysql_cdc",
            "config": {
                "connector.class": "io.debezium.connector.mysql.MySqlConnector",
                "database.hostname": "localhost",
            },
        }
    )
    assert spec.kind == "cdc-source"
