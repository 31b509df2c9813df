"""S7 snapshot modes: initial (replay everything) vs schema_only
(changes after registration only) — …실습 - 01.md:800-847, verified
no-old-data at …실습 - 03.md:477-482."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafkaconnect_spark.functions.envelope import wrap_as_envelope
from kafkaconnect_spark.functions.serde import json_serialize
from kafkaconnect_spark.streaming.engine import Engine


def seed(spark, eng, ids):
    rows = spark.createDataFrame(
        [(i, f"n{i}", "c") for i in ids], "id int, name string, op string"
    )
    env = wrap_as_envelope(rows, ["id", "name"], op_col="op", db="oc", table="t")
    vt = env.schema["value"].dataType
    eng.transport.append(
        env.select(
            F.col("value.after.id").cast("string").alias("key"),
            json_serialize("value", vt, schemas_enable=False).alias("value"),
            F.lit("oc.t.raw").alias("topic"),
        )
    )


def cdc_spec(name, snapshot_mode):
    return {
        "name": name,
        "config": {
            "connector.class": "io.debezium.connector.mysql.MySqlConnector",
            "cdc.topic.pattern": "oc.t.raw",
            "value.schema.ddl": "id int, name string",
            "snapshot.mode": snapshot_mode,
            "transforms": "unwrap, route",
            "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
            "transforms.unwrap.drop.tombstones": "false",
            "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
            "transforms.route.regex": "(.*)\\.(.*)\\.raw",
            "transforms.route.replacement": "$1-$2-flat",
        },
    }


def flat_ids(eng):
    return {
        json.loads(r.value)["id"]
        for r in eng.transport.read_batch(["oc-t-flat"]).collect()
        if r.value
    }


def test_initial_replays_preexisting_changes(spark, tmp_path):
    eng = Engine(spark, servers=f"file://{tmp_path}/topics", checkpoint_root=tmp_path / "ckpt")
    seed(spark, eng, [1, 2, 3])
    eng.register(cdc_spec("cdc_initial", "initial"))
    eng.run_once()
    assert flat_ids(eng) == {1, 2, 3}


def test_schema_only_skips_preexisting(spark, tmp_path):
    eng = Engine(spark, servers=f"file://{tmp_path}/topics", checkpoint_root=tmp_path / "ckpt")
    seed(spark, eng, [1, 2, 3])  # pre-existing history
    eng.register(cdc_spec("cdc_so", "schema_only"))
    eng.run_once()
    assert flat_ids(eng) == set()  # old history skipped

    seed(spark, eng, [4, 5])  # new changes after registration
    eng.run_once()
    assert flat_ids(eng) == {4, 5}
