"""SpoolDir error handling (S6, 실습수행/Spool Dir Source Connector
실습.md:76-110): corrupt rows route to error.path with
halt.on.error=false; halt.on.error=true fails the pipeline."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from kafkaconnect_spark.streaming.engine import Engine

GOOD = "id,name,email\n1,a,a@x.com\n2,b,b@x.com\n"
# 'oops' can't parse as int id → corrupt under the generated schema
BAD_ROW = "oops,not-an-int-id,c@x.com,extra,cols,breaking,schema\n"


def setup_dirs(tmp_path):
    for d in ("spool", "spool/finished", "spool/error"):
        (tmp_path / d).mkdir(parents=True, exist_ok=True)


def spec(tmp_path, halt: bool):
    return {
        "name": "csv_err",
        "config": {
            "connector.class": "com.github.jcustenborder.kafka.connect.spooldir.SpoolDirCsvSourceConnector",
            "topic": "csv_err_topic",
            "input.path": str(tmp_path / "spool"),
            "input.file.pattern": "^.*\\.csv$",
            "finished.path": str(tmp_path / "spool" / "finished"),
            "error.path": str(tmp_path / "spool" / "error"),
            "halt.on.error": str(halt).lower(),
            "csv.first.row.as.header": "true",
            "schema.generation.enabled": "true",
            "value.converter.schemas.enable": "false",
        },
    }


def test_corrupt_rows_route_to_error_path(spark, tmp_path):
    setup_dirs(tmp_path)
    (tmp_path / "spool" / "seed.csv").write_text(GOOD)
    eng = Engine(spark, servers=f"file://{tmp_path}/topics", checkpoint_root=tmp_path / "ckpt")
    eng.register(spec(tmp_path, halt=False))
    eng.run_once()

    # drop a file with one good and one corrupt row
    (tmp_path / "spool" / "mixed.csv").write_text(GOOD + BAD_ROW)
    eng.run_once()

    # good rows flowed (2 seed + 2 good from mixed, mixed re-reads header rows)
    log = eng.transport.read_batch(["csv_err_topic"])
    values = [json.loads(r.value) for r in log.collect()]
    assert sum(1 for v in values if v.get("id") == 1) == 2
    assert not any(v.get("id") is None and v.get("name") is None for v in values)

    # corrupt raw line captured under error.path
    err_files = list((tmp_path / "spool" / "error" / "corrupt").glob("*.txt")) + list(
        (tmp_path / "spool" / "error" / "corrupt").glob("part-*")
    )
    assert err_files, "corrupt rows must be persisted under error.path"
    raw = "".join(f.read_text() for f in err_files)
    assert "oops" in raw


def test_halt_on_error_fails_pipeline(spark, tmp_path):
    setup_dirs(tmp_path)
    (tmp_path / "spool" / "seed.csv").write_text(GOOD)
    (tmp_path / "spool" / "bad.csv").write_text("id,name,email\n" + BAD_ROW)
    eng = Engine(spark, servers=f"file://{tmp_path}/topics", checkpoint_root=tmp_path / "ckpt")
    eng.register(spec(tmp_path, halt=True))
    with pytest.raises(Exception):
        eng.run_once()
    assert eng.status("csv_err")["state"] == "FAILED"


def test_spooldir_json_lines_variant(spark, tmp_path):
    """SpoolDirJsonSourceConnector analogue: same schema-gen +
    archive + corrupt-capture contract over JSON lines."""
    import json as _json

    from kafkaconnect_spark.sources.spooldir import (
        generate_schema,
        read_spooldir_stream,
        split_errors,
    )

    inp = tmp_path / "in"
    fin = tmp_path / "fin"
    inp.mkdir(), fin.mkdir()
    rows = [{"id": i, "name": f"n{i}", "amount": i * 1.5} for i in range(20)]
    (inp / "a.json").write_text("\n".join(_json.dumps(r) for r in rows[:10]))
    (inp / "b.json").write_text(
        "\n".join(_json.dumps(r) for r in rows[10:]) + "\n{not json"
    )

    schema = generate_schema(spark, str(inp), pattern="*.json", format="json")
    assert {f.name for f in schema.fields} >= {"id", "name", "amount"}

    stream = read_spooldir_stream(
        spark, str(inp), schema, finished_path=str(fin),
        pattern="*.json", format="json",
    )
    good, bad = split_errors(stream)
    q = (
        good.writeStream.format("memory").queryName("sdj_good")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("sdj_good")
    assert got.count() == 20
    assert {r.id for r in got.collect()} == set(range(20))


def test_spooldir_corrupt_lines_route_to_dlq_topic(spark, tmp_path):
    """Source-side KIP-298 parity: with errors.deadletterqueue.
    topic.name set, corrupt CSV lines land on the DLQ topic (and the
    good rows still flow), alongside the error.path file route."""
    from tests.test_engine_e2e import make_engine, spooldir_spec

    spec = spooldir_spec(tmp_path, topic="dlq_csv_topic")
    spec["name"] = "csv_dlq"
    spec["config"]["errors.deadletterqueue.topic.name"] = "csv_dlq_topic_errors"
    (tmp_path / "spool" / "bad.csv").write_text(
        "id,name,email\n1,a,a@x.com\nthis,is,not,a,valid,row,at,all\n2,b,b@x.com\n"
    )
    eng = make_engine(spark, tmp_path)
    eng.register(spec)
    eng.run_once("csv_dlq")

    good = eng.transport.read_batch(["dlq_csv_topic"]).collect()
    assert len(good) == 2
    dlq = eng.transport.read_batch(["csv_dlq_topic_errors"]).collect()
    assert len(dlq) == 1
    assert "this,is,not,a,valid,row" in dlq[0].value
