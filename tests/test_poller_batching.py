"""batch.max.rows (Connect JDBC source batching) + table.blacklist
catalog expansion (S5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkaconnect_spark.streaming.engine import Engine


def test_batch_max_rows_paginates_with_resume(spark, tmp_path):
    rows = [(i, f"n{i}") for i in range(25)]
    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=lambda t: spark.createDataFrame(rows, "id int, name string"),
    )
    eng.register(
        {
            "name": "paged",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
                "connection.url": "jdbc:mysql://fake/om",
                "topic.prefix": "pg_",
                "table.whitelist": "t",
                "mode": "incrementing",
                "incrementing.column.name": "id",
                "batch.max.rows": "10",
                "value.converter.schemas.enable": "false",
            },
        }
    )
    moved = [eng.run_once()["paged"] for _ in range(4)]
    assert moved == [10, 10, 5, 0]  # pages in resume-key order, then drains
    log = eng.transport.read_batch(["pg_t"])
    import json

    ids = sorted(json.loads(r.value)["id"] for r in log.collect())
    assert ids == list(range(25))  # no loss, no dup across pages


def test_timestamp_mode_limit_respects_ts_boundary(spark, tmp_path):
    """Rows sharing one timestamp never split across polls (the
    strict ts > offset predicate would drop the remainder)."""
    # 6 rows at ts A, 6 at ts B; limit 4 → whole-timestamp batches
    rows = [(i, "2024-01-01 00:00:00" if i < 6 else "2024-01-02 00:00:00") for i in range(12)]

    def load(t):
        return spark.createDataFrame(rows, "id int, ts_s string").select(
            "id", F.to_timestamp("ts_s").alias("updated")
        )

    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=load,
    )
    eng.register(
        {
            "name": "ts_paged",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
                "connection.url": "jdbc:mysql://fake/om",
                "topic.prefix": "tp_",
                "table.whitelist": "t",
                "mode": "timestamp",
                "timestamp.column.name": "updated",
                "batch.max.rows": "4",
                "value.converter.schemas.enable": "false",
            },
        }
    )
    moved = [eng.run_once()["ts_paged"] for _ in range(3)]
    assert moved == [6, 6, 0]  # boundary extension, nothing lost
    import json

    log = eng.transport.read_batch(["tp_t"])
    ids = sorted(json.loads(r.value)["id"] for r in log.collect())
    assert ids == list(range(12))


def test_blacklist_with_table_lister(spark, tmp_path):
    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=lambda t: spark.createDataFrame([(1,)], "id int"),
        table_lister=lambda: ["customers", "orders", "products", "order_items"],
    )
    eng.register(
        {
            "name": "bl_source",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
                "connection.url": "jdbc:mysql://fake/om",
                "topic.prefix": "bl_",
                "table.blacklist": "om.products",
                "catalog.pattern": "om",
                "mode": "incrementing",
                "incrementing.column.name": "id",
                "value.converter.schemas.enable": "false",
            },
        }
    )
    eng.run_once()
    topics_dir = tmp_path / "topics"
    made = sorted(p.name for p in topics_dir.iterdir())
    assert made == ["bl_customers", "bl_order_items", "bl_orders"]
