"""PipelineSpec — parse reference-compatible connector JSON into a plan.

Every file in the reference's ``connector_configs/`` is directly
loadable: ``PipelineSpec.from_json(path_or_dict)``. The spec is the
engine's logical plan; the streaming engine (streaming/engine.py)
compiles it to a Structured Streaming query.

Connector-class → pipeline-kind mapping (reference surface, SURVEY §2):

- ``io.confluent.connect.jdbc.JdbcSourceConnector``  → kind="jdbc-source"
  (modes: bulk | incrementing | timestamp | timestamp+incrementing;
  e.g. connector_configs/mysql_jdbc_om_source.json:14-15)
- ``io.confluent.connect.jdbc.JdbcSinkConnector``    → kind="jdbc-sink"
  (insert.mode=upsert, pk.mode=record_key, delete.enabled;
  connector_configs/mysql_jdbc_sink_customers.json:10-13)
- ``...spooldir.SpoolDirCsvSourceConnector``         → kind="spooldir-source"
  (connector_configs/spooldir_source.json:5-14)
- ``io.debezium.connector.mysql.MySqlConnector`` /
  ``io.debezium.connector.postgresql.PostgresConnector`` → kind="cdc-source"
  (실습수행/Debezium MySQL CDC Source Connector 실습 - 01.md:140-159)

SMT chain parsing follows Connect semantics: ``transforms`` lists
aliases in application order; ``transforms.<alias>.type`` +
``transforms.<alias>.<param>`` configure each
(e.g. jdbc_source_configs/mysql_jdbc_source_customers.json:18-26).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


class SpecError(ValueError):
    """Invalid pipeline spec — raised at registration time (the
    reference fails fast at connector registration too, e.g. missing
    finished.path: 실습수행/Spool Dir Source Connector 실습.md:76-97)."""


_KIND_BY_CLASS_PATTERN: list[tuple[str, str]] = [
    (r"JdbcSourceConnector$", "jdbc-source"),
    (r"JdbcSinkConnector$", "jdbc-sink"),
    (r"SpoolDir(Csv)?SourceConnector$", "spooldir-source"),
    (r"io\.debezium\.connector\..*Connector$", "cdc-source"),
    # engine-native parquet-lake sink (no Connect analogue; SURVEY §2.7)
    (r"ParquetLakeSinkConnector$", "parquet-sink"),
]

VALID_JDBC_MODES = {"bulk", "incrementing", "timestamp", "timestamp+incrementing"}


@dataclass
class TransformSpec:
    """One SMT in the chain: alias + java-class-style type + params."""

    alias: str
    type: str
    params: dict[str, str] = field(default_factory=dict)

    @property
    def short_type(self) -> str:
        # "org.apache.kafka.connect.transforms.ExtractField$Key" -> "ExtractField$Key"
        return self.type.rsplit(".", 1)[-1]


@dataclass
class PipelineSpec:
    name: str
    kind: str
    config: dict[str, Any]
    transforms: list[TransformSpec] = field(default_factory=list)

    # ---- constructors -------------------------------------------------
    @classmethod
    def from_json(cls, source: str | Path | dict[str, Any]) -> "PipelineSpec":
        if isinstance(source, (str, Path)):
            raw = json.loads(Path(source).read_text())
        else:
            raw = source
        if "config" not in raw or "name" not in raw:
            raise SpecError("spec must have top-level 'name' and 'config'")
        config = {k: raw["config"][k] for k in raw["config"]}
        cls_name = str(config.get("connector.class", ""))
        kind = None
        for pattern, k in _KIND_BY_CLASS_PATTERN:
            if re.search(pattern, cls_name):
                kind = k
                break
        if kind is None:
            raise SpecError(f"unknown connector.class: {cls_name!r}")
        spec = cls(
            name=str(raw["name"]),
            kind=kind,
            config=config,
            transforms=cls._parse_transforms(config),
        )
        spec.validate()
        return spec

    @staticmethod
    def _parse_transforms(config: dict[str, Any]) -> list[TransformSpec]:
        chain = str(config.get("transforms", "")).strip()
        if not chain:
            return []
        out = []
        for alias in [a.strip() for a in chain.split(",") if a.strip()]:
            prefix = f"transforms.{alias}."
            params = {
                k[len(prefix):]: str(v)
                for k, v in config.items()
                if k.startswith(prefix)
            }
            ttype = params.pop("type", None)
            if not ttype:
                raise SpecError(f"transform {alias!r} missing transforms.{alias}.type")
            out.append(TransformSpec(alias=alias, type=ttype, params=params))
        return out

    # ---- validation ---------------------------------------------------
    def validate(self) -> None:
        cfg = self.config
        # the name becomes a registry FILENAME (<name>.json) — path
        # separators would write outside the registry dir or crash
        # persistence after registration already reported success
        if (
            not self.name
            or "/" in self.name
            or "\\" in self.name
            or ".." in self.name
            or self.name in (".", "~")
        ):
            raise SpecError(f"invalid pipeline name {self.name!r}")
        if self.kind == "jdbc-source":
            mode = str(cfg.get("mode", ""))
            if mode not in VALID_JDBC_MODES:
                raise SpecError(f"jdbc-source mode must be one of {sorted(VALID_JDBC_MODES)}, got {mode!r}")
            if "incrementing" in mode and not cfg.get("incrementing.column.name"):
                raise SpecError("incrementing mode requires incrementing.column.name")
            if "timestamp" in mode and not cfg.get("timestamp.column.name"):
                raise SpecError("timestamp mode requires timestamp.column.name")
            if not cfg.get("topic.prefix"):
                raise SpecError("jdbc-source requires topic.prefix")
            if cfg.get("table.whitelist") and cfg.get("table.blacklist"):
                raise SpecError("table.whitelist and table.blacklist are mutually exclusive")
        elif self.kind == "parquet-sink":
            for req in ("topics", "path", "partition.field", "order.field"):
                if not cfg.get(req):
                    raise SpecError(f"parquet-sink requires {req}")
            if not self.pk_fields:
                raise SpecError("parquet-sink requires pk.fields")
        elif self.kind == "jdbc-sink":
            if not cfg.get("topics") and not cfg.get("topics.regex"):
                raise SpecError("jdbc-sink requires topics or topics.regex")
            pk_mode = str(cfg.get("pk.mode", "none"))
            # default mirrors the ENGINE's default (upsert) — validating
            # against a different default let a no-PK sink pass here and
            # emit malformed ON CONFLICT () SQL at runtime
            if str(cfg.get("insert.mode", "upsert")) == "upsert" and pk_mode == "none":
                raise SpecError("insert.mode=upsert requires pk.mode != none")
            if _as_bool(cfg.get("delete.enabled", False)):
                # reference rule: deletes need a record_key PK
                # (실습수행/JDBC Sink Connector 실습.md:331-363; F7 no-PK edge)
                if pk_mode != "record_key" or not str(cfg.get("pk.fields", "")).strip():
                    raise SpecError("delete.enabled=true requires pk.mode=record_key and pk.fields")
        elif self.kind == "spooldir-source":
            for req in ("input.path", "input.file.pattern", "topic"):
                if not cfg.get(req):
                    raise SpecError(f"spooldir-source requires {req}")
            for dir_key in ("input.path", "finished.path", "error.path"):
                p = cfg.get(dir_key)
                if p and not Path(str(p)).is_dir():
                    # fail-fast parity with the reference
                    # (실습수행/Spool Dir Source Connector 실습.md:76-97)
                    raise SpecError(f"{dir_key} directory does not exist: {p}")
        elif self.kind == "cdc-source":
            if not (cfg.get("database.hostname") or cfg.get("cdc.topic.pattern")):
                raise SpecError("cdc-source requires database.hostname (or cdc.topic.pattern for ingest mode)")

    # ---- accessors ----------------------------------------------------
    @property
    def tables(self) -> list[str]:
        """Tables this source fans out to (SURVEY §2.1 S5)."""
        wl = str(self.config.get("table.whitelist", "")).strip()
        if wl:
            # entries may be catalog-qualified ("om.customers") — keep leaf
            return [t.strip().split(".")[-1] for t in wl.split(",") if t.strip()]
        return []

    @property
    def blacklist(self) -> list[str]:
        """table.blacklist leaf names (connector_configs/
        mysql_jdbc_om_source_mt.json:12-13)."""
        bl = str(self.config.get("table.blacklist", "")).strip()
        return [t.strip().split(".")[-1] for t in bl.split(",") if t.strip()] if bl else []

    def topic_for_table(self, table: str) -> str:
        """topic.prefix + table (connector_configs/mysql_jdbc_om_source.json:9,12)."""
        return str(self.config.get("topic.prefix", "")) + table

    @property
    def pk_fields(self) -> list[str]:
        return [f.strip() for f in str(self.config.get("pk.fields", "")).split(",") if f.strip()]

    @property
    def poll_interval_ms(self) -> int:
        return int(self.config.get("poll.interval.ms", 5000))


def _as_bool(v: Any) -> bool:
    return str(v).strip().lower() in {"1", "true", "yes"}
