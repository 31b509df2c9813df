"""Engine CLI — the Connect REST surface as verbs (SURVEY §2.6 O4).

Reference parity:

- ``register <spec.json>``  = ``scripts/register_connector`` (POST /connectors)
- ``show``                  = ``scripts/show_connectors`` (GET /connectors)
- ``status <name>``         = GET /connectors/<name>/status
- ``delete <name>``         = ``scripts/delete_connector`` (DELETE)
- ``pause|resume|restart <name>`` = PUT /connectors/<name>/pause|resume|restart
  (실습수행/JDBC Sink Connector 실습.md:338-343, …실습 - 03.md:268)
- ``reset-offsets <name> [--table t]`` =
  실습수행/특정 Connector의 connect-offsets 리셋하기.md
- ``run-once [name]``       = one synchronous poll cycle (tests/cron)
- ``run [name] --seconds N``= continuous mode for N seconds
- ``show-topic <topic> [-n k]`` = ``scripts/show_topic_messages`` / kafkacat

Worker config (``--worker worker.json``) supplies the deployment
bindings a Connect worker gets from its properties file::

    {
      "servers": "file:///var/topics",          # or kafka bootstrap
      "checkpoint.root": "/var/ckpt",
      "tables.parquet.dir": "/data/tables",     # table_resolver source
      "connections": {"jdbc:sqlite:/x.db": "sqlite"}
    }

State persists across invocations via a registry dir of spec files
(``<checkpoint.root>/_registry/*.json``) — each CLI call re-hydrates
the engine, mirroring how a Connect worker reloads connector configs
from its internal topic on restart.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

from kafkaconnect_spark.plans.spec import PipelineSpec, SpecError


def _connection_factory(url: str):
    if url.startswith("jdbc:sqlite:"):
        import sqlite3

        return functools.partial(sqlite3.connect, url[len("jdbc:sqlite:"):])
    raise ValueError(
        f"no driver for {url!r} in this environment (sqlite supported; "
        "mysql/postgres factories plug in via Engine(connection_factories=...))"
    )


def build_engine(worker_cfg: dict, spark=None):
    from kafkaconnect_spark.session import get_spark
    from kafkaconnect_spark.streaming.engine import Engine

    spark = spark or get_spark("kafkaconnect-spark-cli")
    tables_dir = worker_cfg.get("tables.parquet.dir")

    def resolver(table: str):
        if not tables_dir:
            raise ValueError("worker config has no tables.parquet.dir")
        return spark.read.parquet(str(Path(tables_dir) / f"{table}.parquet"))

    conns = {
        url: _connection_factory(url) for url in worker_cfg.get("connections", {})
    }
    eng = Engine(
        spark,
        servers=worker_cfg["servers"],
        checkpoint_root=worker_cfg["checkpoint.root"],
        table_resolver=resolver,
        connection_factories=conns,
    )
    # re-hydrate previously registered pipelines (paused state persists)
    reg_dir = Path(worker_cfg["checkpoint.root"]) / "_registry"
    if reg_dir.is_dir():
        for f in sorted(reg_dir.glob("*.json")):
            doc = json.loads(f.read_text())
            p = eng.register(doc["spec"])
            # restore FAILED too (with its error): resurrecting it as
            # RUNNING would let the next `run` silently restart it and
            # erase the recorded failure one process boundary later
            if doc.get("state") in ("PAUSED", "FAILED"):
                p.state = doc["state"]
                p.error = doc.get("error")
    return eng, reg_dir


def _persist(eng, reg_dir: Path) -> None:
    reg_dir.mkdir(parents=True, exist_ok=True)
    names = set()
    for name, p in eng.pipelines.items():
        names.add(name)
        (reg_dir / f"{name}.json").write_text(
            json.dumps(
                {
                    "spec": {"name": p.spec.name, "config": p.spec.config},
                    "state": p.state,
                    "error": p.error,
                }
            )
        )
    for f in reg_dir.glob("*.json"):
        if f.stem not in names:
            f.unlink()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kafkaconnect-spark")
    ap.add_argument("--worker", default="worker.json", help="worker config JSON")
    sub = ap.add_subparsers(dest="verb", required=True)
    sub.add_parser("show")
    for v in ("status", "delete", "pause", "resume", "restart"):
        sub.add_parser(v).add_argument("name")
    p = sub.add_parser("register")
    p.add_argument("spec", help="connector spec JSON file")
    p = sub.add_parser("reset-offsets")
    p.add_argument("name")
    p.add_argument("--table", default=None)
    p = sub.add_parser("run-once")
    p.add_argument("name", nargs="?")
    p = sub.add_parser("run")
    p.add_argument("name", nargs="?")
    p.add_argument("--seconds", type=float, default=30.0)
    p = sub.add_parser("show-topic")
    p.add_argument("topic")
    p.add_argument("-n", type=int, default=10)
    args = ap.parse_args(argv)

    worker_path = Path(args.worker)
    if not worker_path.is_file():
        print(f"error: worker config not found: {worker_path}", file=sys.stderr)
        return 2
    worker_cfg = json.loads(worker_path.read_text())
    eng, reg_dir = build_engine(worker_cfg)

    name = getattr(args, "name", None)
    if name and args.verb != "register" and name not in eng.pipelines:
        known = ", ".join(sorted(eng.pipelines)) or "(none registered)"
        print(f"error: no pipeline {name!r}; registered: {known}", file=sys.stderr)
        return 1

    if args.verb == "register":
        try:
            spec = PipelineSpec.from_json(args.spec)
            eng.register(spec)
        except SpecError as e:
            # e.g. re-registering an existing name (update = delete +
            # register) — a clean CLI error, not a Python traceback
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(json.dumps({"registered": spec.name, "kind": spec.kind}))
    elif args.verb == "show":
        print(json.dumps(eng.show(), indent=2))
    elif args.verb == "status":
        print(json.dumps(eng.status(args.name), indent=2))
    elif args.verb == "delete":
        eng.delete(args.name)
        print(json.dumps({"deleted": args.name}))
    elif args.verb == "pause":
        eng.pause(args.name)
        print(json.dumps(eng.status(args.name)))
    elif args.verb == "resume":
        eng.resume(args.name)
        print(json.dumps(eng.status(args.name)))
    elif args.verb == "restart":
        eng.restart(args.name)
        print(json.dumps(eng.status(args.name)))
    elif args.verb == "reset-offsets":
        was_running = eng.pipelines[args.name].state == "RUNNING"
        if was_running:
            eng.pause(args.name)
        eng.reset_offsets(args.name, args.table)
        if was_running:
            eng.resume(args.name)
        print(json.dumps({"reset": args.name, "table": args.table}))
    elif args.verb == "run-once":
        moved = eng.run_once(args.name)
        print(json.dumps({"moved": moved}))
    elif args.verb == "run":
        names = [args.name] if args.name else list(eng.pipelines)
        # honor pause/failure state: starting a PAUSED pipeline would
        # violate the operator's pause, and the old pause+resume
        # shutdown recompiled FAILED pipelines back to RUNNING, erasing
        # the error before anyone could see it
        started = [
            n for n in names if eng.pipelines[n].state not in ("PAUSED", "FAILED")
        ]
        for n in started:
            eng.start(n)
        time.sleep(args.seconds)
        failed = {}
        for n in started:
            eng.stop(n)
            p = eng.pipelines[n]
            if p.state == "FAILED":
                failed[n] = p.error
        print(
            json.dumps(
                {
                    "ran": started,
                    "skipped": [n for n in names if n not in started],
                    "failed": failed,
                    "seconds": args.seconds,
                }
            )
        )
        _persist(eng, reg_dir)
        return 1 if failed else 0
    elif args.verb == "show-topic":
        df = eng.transport.read_batch([args.topic])
        rows = df.orderBy("offset").limit(args.n).collect()
        for r in rows:
            print(json.dumps({"offset": r.offset, "key": r.key, "value": r.value}))
    _persist(eng, reg_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
