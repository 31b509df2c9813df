"""Confluent Schema Registry REST protocol — client, server, and URL
factory over the engine's registry semantics.

The reference runs every Avro connector against a REAL Schema Registry
(실습수행/Schema Registry 기반의 Connector 구성 실습.md:136-174 — POST
/subjects/<s>/versions, GET /schemas/ids/<id>, PUT /config, the 409 on
an incompatible register), configured via
``value.converter.schema.registry.url: http://...:8081``. The engine's
`functions.avro_wire.SchemaRegistry` implements the SEMANTICS (global
ids, subject versions, BACKWARD checks, the wire format) but spoke no
HTTP — an ``http://`` URL silently fell back to an in-memory registry.
This module closes that seam both ways:

- :class:`RestSchemaRegistryClient` — the thin adapter a deployment
  points at a real registry. Same duck-typed surface as
  ``SchemaRegistry`` (register / get_by_id / latest / subjects /
  set_compatibility / compatibility), so every engine path accepts
  either interchangeably. stdlib urllib only; the protocol is the
  public Confluent REST API (docs.confluent.io — subjects, schemas,
  config resources; content type application/vnd.schemaregistry.v1+json).
- :func:`serve_registry` — the same protocol SERVED over a file-backed
  ``SchemaRegistry`` (stdlib ThreadingHTTPServer): lets other Connect
  tooling read the engine's registry, and lets the contract tests run
  client↔server over real HTTP with no external service.
- :func:`registry_for_url` — the config-URL factory the engine uses:
  ``http(s)://`` → REST client, ``file://`` → file-backed, empty →
  in-memory (the pre-r10 behavior, now only for the empty case).

Error mapping keeps the file-backed contract exactly: an incompatible
register raises :class:`~kafkaconnect_spark.functions.avro_wire.
CompatibilityError` (HTTP 409), unknown ids/subjects raise ``KeyError``
(HTTP 404 with Confluent error codes 40401/40403) — engine call sites
cannot tell which registry flavor they hold.
"""

from __future__ import annotations

import json
import threading
from typing import Any
from urllib import error as urlerror
from urllib import request as urlrequest

from kafkaconnect_spark.functions.avro_wire import (
    CompatibilityError,
    SchemaRegistry,
)

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class RestSchemaRegistryClient:
    """``SchemaRegistry``-shaped client for a Confluent-protocol REST
    registry. Methods mirror the file-backed class 1:1 so the engine's
    converter paths take either."""

    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        # schema ids are immutable once assigned in the Confluent
        # protocol, so id→schema memoizes safely — without it every
        # decode_message(registry_lookup=get_by_id) pays an HTTP round
        # trip per record batch (real Confluent deserializers cache
        # identically)
        self._id_cache: dict[int, dict] = {}

    # -- transport ------------------------------------------------------
    def _call(self, method: str, path: str, body: dict | None = None) -> Any:
        req = urlrequest.Request(
            self.base_url + path,
            data=None if body is None else json.dumps(body).encode(),
            method=method,
            headers={"Content-Type": CONTENT_TYPE, "Accept": CONTENT_TYPE},
        )
        try:
            with urlrequest.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read() or b"null")
        except urlerror.HTTPError as e:
            payload: dict = {}
            try:
                payload = json.loads(e.read() or b"{}")
            except (ValueError, OSError):
                pass
            msg = payload.get("message", str(e))
            if e.code == 409:
                raise CompatibilityError(msg) from None
            if e.code == 404:
                # same exception type the file-backed dict lookups raise
                raise KeyError(msg) from None
            if e.code == 422:
                raise ValueError(msg) from None
            raise

    # -- config ---------------------------------------------------------
    def set_compatibility(self, mode: str, subject: str | None = None) -> None:
        path = "/config" if subject is None else f"/config/{subject}"
        self._call("PUT", path, {"compatibility": mode})

    def compatibility(self, subject: str) -> str:
        out = self._call("GET", f"/config/{subject}?defaultToGlobal=true")
        return out["compatibilityLevel"]

    # -- registration ----------------------------------------------------
    def register(self, subject: str, schema: dict) -> int:
        # the protocol carries the schema as a JSON-escaped STRING field
        out = self._call(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": json.dumps(schema, sort_keys=True, separators=(",", ":"))},
        )
        return int(out["id"])

    def get_by_id(self, schema_id: int) -> dict:
        cached = self._id_cache.get(schema_id)
        if cached is not None:
            return cached
        out = self._call("GET", f"/schemas/ids/{schema_id}")
        schema = json.loads(out["schema"])
        self._id_cache[schema_id] = schema
        return schema

    def latest(self, subject: str) -> tuple[int, dict]:
        out = self._call("GET", f"/subjects/{subject}/versions/latest")
        return int(out["id"]), json.loads(out["schema"])

    def subjects(self) -> list[str]:
        return sorted(self._call("GET", "/subjects"))


def registry_for_url(url: str):
    """The ``value.converter.schema.registry.url`` factory:
    ``http(s)://`` → :class:`RestSchemaRegistryClient`, ``file://<path>``
    → file-backed :class:`SchemaRegistry`, empty → in-memory.

    A comma-separated list — the standard Kafka Connect multi-URL form
    — resolves to its FIRST URL (the client holds one base; failover
    across the list is the real client's transport concern). Any other
    non-empty value (bare host:port, a typo'd scheme like ``htp://``)
    raises instead of silently handing back an ephemeral in-memory
    registry whose registrations would vanish across restarts
    (r10 ADVICE #1)."""
    if "," in url:
        url = url.split(",", 1)[0].strip()
    if url.startswith(("http://", "https://")):
        return RestSchemaRegistryClient(url)
    if url.startswith("file://"):
        return SchemaRegistry(url[len("file://"):])
    if url:
        raise ValueError(
            f"unrecognized schema.registry.url {url!r}: expected "
            "http(s):// (REST registry), file://<path> (file-backed), "
            "or empty (in-memory)"
        )
    return SchemaRegistry(None)


def serve_registry(registry: SchemaRegistry, host: str = "127.0.0.1",
                   port: int = 0):
    """Expose ``registry`` over the Confluent REST protocol. Returns
    ``(server, url)``; the server runs on a daemon thread — call
    ``server.shutdown()`` when done. Registration is serialized with a
    lock (the file-backed registry document is read-modify-write)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # tests stay quiet
            pass

        def _send(self, code: int, payload: Any) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", CONTENT_TYPE)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _err(self, code: int, error_code: int, message: str) -> None:
            self._send(code, {"error_code": error_code, "message": message})

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):  # noqa: N802 -- BaseHTTPRequestHandler contract
            path = self.path.split("?")[0].rstrip("/")
            parts = [p for p in path.split("/") if p]
            try:
                # reads take the same lock that serializes POST/PUT:
                # under ThreadingHTTPServer a GET racing a register
                # could otherwise observe a torn subject/version view
                # (r10 ADVICE #2)
                if parts == ["subjects"]:
                    with lock:
                        out = registry.subjects()
                    self._send(200, out)
                elif (len(parts) == 4 and parts[0] == "subjects"
                        and parts[2] == "versions" and parts[3] == "latest"):
                    with lock:
                        sid, schema = registry.latest(parts[1])
                        version = registry.latest_version(parts[1])
                    self._send(200, {
                        "subject": parts[1],
                        "id": sid,
                        "version": version,
                        "schema": json.dumps(
                            schema, sort_keys=True, separators=(",", ":")
                        ),
                    })
                elif len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
                    with lock:
                        schema = registry.get_by_id(int(parts[2]))
                    self._send(200, {"schema": json.dumps(
                        schema, sort_keys=True, separators=(",", ":"))})
                elif parts[:1] == ["config"]:
                    subject = parts[1] if len(parts) > 1 else None
                    with lock:
                        level = (registry.compatibility(subject) if subject
                                 else registry.global_compatibility())
                    self._send(200, {"compatibilityLevel": level})
                else:
                    self._err(404, 404, f"unknown resource {path}")
            except KeyError:
                # Confluent codes: 40401 subject not found, 40403 schema id
                code = 40403 if parts[:1] == ["schemas"] else 40401
                self._err(404, code, f"not found: {path}")

        def do_POST(self):  # noqa: N802
            parts = [p for p in self.path.rstrip("/").split("/") if p]
            if (len(parts) == 3 and parts[0] == "subjects"
                    and parts[2] == "versions"):
                try:
                    schema = json.loads(self._body()["schema"])
                except (KeyError, ValueError):
                    self._err(422, 42201, "body must carry a schema string")
                    return
                try:
                    with lock:
                        sid = registry.register(parts[1], schema)
                    self._send(200, {"id": sid})
                except CompatibilityError as e:
                    self._err(409, 409, str(e))
            else:
                self._err(404, 404, f"unknown resource {self.path}")

        def do_PUT(self):  # noqa: N802
            parts = [p for p in self.path.rstrip("/").split("/") if p]
            if parts[:1] == ["config"]:
                subject = parts[1] if len(parts) > 1 else None
                mode = str(self._body().get("compatibility", ""))
                try:
                    with lock:
                        registry.set_compatibility(mode, subject)
                    self._send(200, {"compatibility": mode})
                except ValueError as e:
                    self._err(422, 42203, str(e))
            else:
                self._err(404, 404, f"unknown resource {self.path}")

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://{server.server_address[0]}:{server.server_address[1]}"
    return server, url
