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


def test_jdbc_read_options_partitioned_backfill():
    from kafkaconnect_spark.sources.jdbc_poller import Offset, jdbc_read_options

    opts = jdbc_read_options(
        "jdbc:mysql://h/om", "customers", "incrementing", Offset(inc=42),
        inc_col="customer_id", tasks_max=4, inc_bounds=(43, 10042),
    )
    assert opts["dbtable"] == "(SELECT * FROM customers WHERE customer_id > 42) spark_poll"
    assert (opts["partitionColumn"], opts["numPartitions"]) == ("customer_id", "4")
    assert int(opts["lowerBound"]) == 43 and int(opts["upperBound"]) == 10043

    # narrow range never over-partitions (3 new rows -> 3 partitions max)
    opts = jdbc_read_options(
        "jdbc:mysql://h/om", "t", "incrementing", Offset(inc=0),
        inc_col="id", tasks_max=8, inc_bounds=(1, 3),
    )
    assert opts["numPartitions"] == "3"


def test_jdbc_read_options_predicates_match_modes():
    from kafkaconnect_spark.sources.jdbc_poller import Offset, jdbc_read_options

    ts = jdbc_read_options(
        "u", "t", "timestamp", Offset(ts="2024-01-10 00:00:00"), ts_col="upd"
    )
    assert "upd > TIMESTAMP '2024-01-10 00:00:00'" in ts["dbtable"]
    tsinc = jdbc_read_options(
        "u", "t", "timestamp+incrementing",
        Offset(ts="2024-01-10 00:00:00", inc=7), ts_col="upd", inc_col="id",
    )
    assert "OR (upd = TIMESTAMP '2024-01-10 00:00:00' AND id > 7)" in tsinc["dbtable"]
    # bulk and fresh-start offsets scan the whole table
    assert jdbc_read_options("u", "t", "bulk", Offset())["dbtable"] == "(SELECT * FROM t) spark_poll"
    assert jdbc_read_options("u", "t", "incrementing", Offset(), inc_col="id")[
        "dbtable"
    ] == "(SELECT * FROM t) spark_poll"


def test_ts_inc_offset_is_lexicographic_last_row(spark):
    """Regression: independent MAX(ts)/MAX(inc) fabricates an offset no
    row holds — e.g. an old row (high inc, old ts) updated after a new
    row (low inc, new ts) — and then skips later same-ts updates."""
    import datetime as dt

    from pyspark.sql import Row

    from kafkaconnect_spark.sources.jdbc_poller import IncrementalPoller, Offset

    t9 = dt.datetime(2024, 1, 1, 9, 0, 0)
    t10 = dt.datetime(2024, 1, 1, 10, 0, 0)
    poller = IncrementalPoller(
        spark, "timestamp+incrementing", inc_col="inc", ts_col="ts"
    )
    df1 = spark.createDataFrame([Row(inc=100, ts=t9), Row(inc=5, ts=t10)])
    batch, off = poller.poll(df1, Offset())
    assert batch.count() == 2
    # the offset must be the LAST row in (ts, inc) order: (10:00, 5) —
    # not the fabricated (10:00, 100)
    assert off.ts.startswith("2024-01-01 10:00:00") and off.inc == 5

    # a later update stamps inc=7 at the same boundary timestamp —
    # it must still be polled
    df2 = spark.createDataFrame(
        [Row(inc=100, ts=t9), Row(inc=5, ts=t10), Row(inc=7, ts=t10)]
    )
    batch2, off2 = poller.poll(df2, off)
    rows = batch2.collect()
    assert [r.inc for r in rows] == [7]
    assert off2.inc == 7


def test_ts_inc_unknown_inc_includes_boundary(spark):
    """Offset with ts but no inc (written by a pure timestamp run):
    the boundary timestamp is re-included — at-least-once, never
    skipped."""
    import datetime as dt

    from pyspark.sql import Row

    from kafkaconnect_spark.sources.jdbc_poller import (
        IncrementalPoller,
        Offset,
        _predicate_sql,
    )

    t10 = dt.datetime(2024, 1, 1, 10, 0, 0)
    poller = IncrementalPoller(
        spark, "timestamp+incrementing", inc_col="inc", ts_col="ts"
    )
    df = spark.createDataFrame([Row(inc=3, ts=t10)])
    batch, _ = poller.poll(df, Offset(inc=None, ts="2024-01-01 10:00:00"))
    assert batch.count() == 1
    sql = _predicate_sql(
        "timestamp+incrementing", "inc", "ts", Offset(inc=None, ts="2024-01-01 10:00:00")
    )
    assert ">=" in sql


def test_future_timestamp_row_is_deferred_not_offset_poisoning(spark, tmp_path):
    """A future-stamped row (clock skew / app bug) must NOT advance the
    timestamp offset past real traffic: every poll is bounded by
    now - delay, so the future row is deferred and later real rows
    still flow (Connect bounds its poll window the same way)."""
    rows = {
        "data": [
            (1, "2024-01-01 00:00:00"),
            (2, "2030-01-01 00:00:00"),  # future (vs the 2026 clock)
        ]
    }

    def load(t):
        return spark.createDataFrame(rows["data"], "id int, ts_s string").select(
            "id", F.to_timestamp("ts_s").alias("upd")
        )

    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=load,
    )
    eng.register(
        {
            "name": "fut",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
                "connection.url": "jdbc:mysql://fake/om",
                "topic.prefix": "f_",
                "table.whitelist": "t",
                "mode": "timestamp",
                "timestamp.column.name": "upd",
                "value.converter.schemas.enable": "false",
            },
        }
    )
    assert eng.run_once()["fut"] == 1  # only the past row; future deferred
    # a new REAL row must still be picked up (the poisoned-offset bug
    # would have advanced past 2030 and silently dropped it forever)
    rows["data"] = rows["data"] + [(3, "2024-06-01 00:00:00")]
    assert eng.run_once()["fut"] == 1
    import json

    ids = sorted(
        json.loads(r.value)["id"] for r in eng.transport.read_batch(["f_t"]).collect()
    )
    assert ids == [1, 3]
