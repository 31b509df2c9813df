"""O5: topic auto-creation with partitions; keyed partition assignment
keeps every key in exactly one partition (per-key ordering prerequisite,
…JDBC Sink PostgreSQL 연동 실습.md:222-226 pre-created 3-partition topics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkaconnect_spark.streaming.engine import Engine


def test_partitioned_topic_keyed_assignment(spark, tmp_path):
    state = {"rows": [(i, f"n{i}") for i in range(60)]}
    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=lambda t: spark.createDataFrame(state["rows"], "id int, name string"),
    )
    eng.register(
        {
            "name": "part_source",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
                "connection.url": "jdbc:mysql://fake/om",
                "topic.prefix": "p_",
                "table.whitelist": "customers",
                "mode": "incrementing",
                "incrementing.column.name": "id",
                "topic.creation.default.partitions": "3",
                "topic.creation.default.replication.factor": "1",
                "transforms": "create_key, extract_key",
                "transforms.create_key.type": "org.apache.kafka.connect.transforms.ValueToKey",
                "transforms.create_key.fields": "id",
                "transforms.extract_key.type": "org.apache.kafka.connect.transforms.ExtractField$Key",
                "transforms.extract_key.field": "id",
            },
        }
    )
    eng.run_once()
    # second batch: same keys update → must land in the same partitions
    state["rows"] = state["rows"] + [(i + 100, f"n{i}") for i in range(10)]
    eng.run_once()

    log = eng.transport.read_batch(["p_customers"])
    parts = log.select("partition").distinct().collect()
    assert {r.partition for r in parts} == {0, 1, 2}
    # each key maps to exactly one partition
    per_key = (
        log.groupBy("key").agg(F.countDistinct("partition").alias("np")).collect()
    )
    assert all(r.np == 1 for r in per_key)
    # offsets stay monotonically unique per topic (shim semantics)
    offs = [r.offset for r in log.orderBy("offset").collect()]
    assert offs == list(range(len(offs)))
