"""CLI verbs across separate invocations (registry re-hydration) —
the reference's REST workflow: register → show → pause → resume →
reset-offsets → delete (scripts/register_connector et al.)."""

from __future__ import annotations

import json

import pytest

from kafkaconnect_spark import cli


@pytest.fixture()
def worker(tmp_path, sf_dir):
    cfg = {
        "servers": f"file://{tmp_path}/topics",
        "checkpoint.root": str(tmp_path / "ckpt"),
        "tables.parquet.dir": sf_dir,
    }
    path = tmp_path / "worker.json"
    path.write_text(json.dumps(cfg))
    return path


@pytest.fixture()
def source_spec(tmp_path):
    spec = {
        "name": "ev_source",
        "config": {
            "connector.class": "io.confluent.connect.jdbc.JdbcSourceConnector",
            "connection.url": "jdbc:mysql://fake/om",
            "topic.prefix": "t_",
            "table.whitelist": "events",
            "mode": "incrementing",
            "incrementing.column.name": "event_id",
            "value.converter.schemas.enable": "false",
        },
    }
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(spec))
    return p


def run(worker, *argv):
    return cli.main(["--worker", str(worker), *argv])


def test_cli_lifecycle(worker, source_spec, capsys, spark):
    assert run(worker, "register", str(source_spec)) == 0
    assert json.loads(capsys.readouterr().out)["registered"] == "ev_source"

    # separate invocation: registry re-hydrated from disk
    run(worker, "show")
    assert json.loads(capsys.readouterr().out) == {"ev_source": "RUNNING"}

    run(worker, "run-once")
    moved = json.loads(capsys.readouterr().out)["moved"]["ev_source"]
    assert moved > 0

    # offsets survive across invocations → second cycle moves nothing
    run(worker, "run-once")
    assert json.loads(capsys.readouterr().out)["moved"]["ev_source"] == 0

    run(worker, "show-topic", "t_events", "-n", "2")
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2 and json.loads(lines[0])["offset"] == 0

    run(worker, "pause", "ev_source")
    assert json.loads(capsys.readouterr().out)["state"] == "PAUSED"
    run(worker, "show")
    assert json.loads(capsys.readouterr().out) == {"ev_source": "PAUSED"}
    run(worker, "run-once")
    assert json.loads(capsys.readouterr().out)["moved"] == {}

    run(worker, "resume", "ev_source")
    assert json.loads(capsys.readouterr().out)["state"] == "RUNNING"

    # reset → full replay on next cycle
    run(worker, "reset-offsets", "ev_source")
    capsys.readouterr()
    run(worker, "run-once")
    assert json.loads(capsys.readouterr().out)["moved"]["ev_source"] == moved

    run(worker, "delete", "ev_source")
    capsys.readouterr()
    run(worker, "show")
    assert json.loads(capsys.readouterr().out) == {}
