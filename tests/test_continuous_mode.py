"""Continuous mode: start() runs the poll loop on poll.interval.ms
cadence in a daemon thread; pause stops it; a failing cycle surfaces
FAILED (the Connect task-thread model, SURVEY §3)."""

from __future__ import annotations

import time

from kafkaconnect_spark.streaming.engine import Engine


def test_start_polls_continuously_and_pause_stops(spark, tmp_path):
    state = {"rows": [(1, "a")], "fail": False}

    def resolver(t):
        if state["fail"]:
            raise RuntimeError("simulated source outage")
        return spark.createDataFrame(state["rows"], "id int, name string")

    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=resolver,
    )
    eng.register(
        {
            "name": "cont_src",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
                "connection.url": "jdbc:mysql://fake/om",
                "topic.prefix": "c_",
                "table.whitelist": "t",
                "mode": "incrementing",
                "incrementing.column.name": "id",
                "poll.interval.ms": 300,
                "value.converter.schemas.enable": "false",
            },
        }
    )
    eng.start("cont_src")
    deadline = time.time() + 30
    # first poll picks up the seed row
    while time.time() < deadline:
        log = eng.transport.read_batch(["c_t"])
        if log.count() >= 1:
            break
        time.sleep(0.2)
    assert eng.transport.read_batch(["c_t"]).count() >= 1

    # new row appears → a later cycle picks it up without intervention
    state["rows"] = [(1, "a"), (2, "b")]
    while time.time() < deadline:
        if eng.transport.read_batch(["c_t"]).count() >= 2:
            break
        time.sleep(0.2)
    assert eng.transport.read_batch(["c_t"]).count() == 2

    eng.pause("cont_src")
    assert eng.status("cont_src")["state"] == "PAUSED"
    n = eng.transport.read_batch(["c_t"]).count()
    time.sleep(1.0)
    assert eng.transport.read_batch(["c_t"]).count() == n  # loop stopped

    # resume + failure inside the loop → FAILED state surfaces
    eng.resume("cont_src")
    state["fail"] = True
    eng.start("cont_src")
    while time.time() < deadline:
        if eng.status("cont_src")["state"] == "FAILED":
            break
        time.sleep(0.2)
    st = eng.status("cont_src")
    assert st["state"] == "FAILED" and "simulated source outage" in st["error"]


def test_start_respects_paused_and_stop_preserves_failed(spark, tmp_path):
    state = {"fail": False}

    def resolver(t):
        if state["fail"]:
            raise RuntimeError("simulated outage")
        return spark.createDataFrame([(1, "a")], "id int, name string")

    eng = Engine(
        spark,
        servers=f"file://{tmp_path}/topics",
        checkpoint_root=tmp_path / "ckpt",
        table_resolver=resolver,
    )
    eng.register(
        {
            "name": "lc_src",
            "config": {
                "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
                "connection.url": "jdbc:mysql://fake/om",
                "topic.prefix": "lc_",
                "table.whitelist": "t",
                "mode": "incrementing",
                "incrementing.column.name": "id",
                "poll.interval.ms": 100,
                "value.converter.schemas.enable": "false",
            },
        }
    )
    # paused pipelines must NOT start (the operator's pause wins)
    eng.pause("lc_src")
    eng.start("lc_src")
    assert "lc_src" not in eng._threads
    eng.resume("lc_src")

    # a failure during the run must SURVIVE stop() — the old
    # pause+resume shutdown recompiled the error away
    state["fail"] = True
    eng.start("lc_src")
    deadline = time.time() + 30
    while time.time() < deadline and eng.pipelines["lc_src"].state != "FAILED":
        time.sleep(0.1)
    assert eng.pipelines["lc_src"].state == "FAILED"
    eng.stop("lc_src")
    assert eng.pipelines["lc_src"].state == "FAILED"
    assert "simulated outage" in (eng.pipelines["lc_src"].error or "")
