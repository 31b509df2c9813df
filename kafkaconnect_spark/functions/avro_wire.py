"""C3 — AvroConverter + Schema Registry (SURVEY §2.5).

Reference behavior replicated (실습수행/Schema Registry 기반의 Connector
구성 실습.md): subjects named ``<topic>-key`` / ``<topic>-value``
(:146), schemas registered on first produce and fetched by id on
consume, global BACKWARD compatibility with per-subject override
(:533-537), and the Confluent wire format on every message: 1 magic
byte 0x00 + 4-byte big-endian schema id + Avro binary body.

This container ships no spark-avro jar, so the Avro *body* codec is a
pure-Python implementation of the Avro binary spec subset Connect
emits (null/boolean/int/long/float/double/string/bytes/record +
nullable unions + logical timestamp-millis/date/decimal). On a real
cluster the body encode/decode swaps to ``from_avro``/``to_avro``
(org.apache.spark:spark-avro) with identical framing — the framing
and registry logic here is the part Spark doesn't provide.

Spark integration is Arrow-batched pandas UDFs (the serde crosses to
Python once per batch, not per row); the registry client is
driver-side only (schema resolved once per pipeline start — SURVEY
§1.3), executors get the schema by closure.
"""

from __future__ import annotations

import io
import json
import struct
from pathlib import Path
from typing import Any, Union

import pandas as pd
from pyspark.sql import types as T

MAGIC_BYTE = b"\x00"

# ---------------------------------------------------------------------------
# Spark StructType <-> Avro schema
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO: list[tuple[type, str]] = [
    (T.BooleanType, "boolean"),
    (T.IntegerType, "int"),
    (T.ShortType, "int"),
    (T.ByteType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.StringType, "string"),
    (T.BinaryType, "bytes"),
]


def _avro_type(dt: T.DataType, name_hint: str = "nested") -> Any:
    for spark_t, avro_t in _SPARK_TO_AVRO:
        if isinstance(dt, spark_t):
            return avro_t
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-millis"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _avro_type(dt.elementType, name_hint + "_item")}
    if isinstance(dt, T.StructType):
        # Avro forbids redefining a record name — derive a unique name
        # from the field path (two 'nested' records would be invalid)
        return avro_schema_for(dt, name=name_hint or "nested")
    raise TypeError(f"no Avro mapping for Spark type {dt}")


def avro_schema_for(schema: T.StructType, name: str = "ConnectDefault") -> dict:
    """Record schema like Connect's AvroConverter generates: nullable
    fields become ["null", T] unions with null default."""
    fields = []
    for f in schema.fields:
        at = _avro_type(f.dataType, f"{name}_{f.name}")
        if f.nullable:
            fields.append({"name": f.name, "type": ["null", at], "default": None})
        else:
            fields.append({"name": f.name, "type": at})
    return {"type": "record", "name": name, "fields": fields}


def _spark_type(at: Any) -> tuple[T.DataType, bool]:
    """Inverse mapping: Avro type → (Spark type, nullable)."""
    if isinstance(at, list):  # [null, T]
        inner = next(b for b in at if b != "null")
        dt, _ = _spark_type(inner)
        return dt, True
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "timestamp-millis":
            return T.TimestampType(), False
        if lt == "date":
            return T.DateType(), False
        if lt == "decimal":
            return T.DecimalType(at["precision"], at["scale"]), False
        if at.get("type") == "array":
            dt, _ = _spark_type(at["items"])
            return T.ArrayType(dt), False
        if at.get("type") == "record":
            return spark_schema_for(at), False
        at = at["type"]
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }
    return prim[at], False


def spark_schema_for(avro: dict) -> T.StructType:
    """Avro record schema → Spark StructType (sink-side schema
    resolution from the registry)."""
    fields = []
    for f in avro["fields"]:
        dt, nullable = _spark_type(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Avro binary codec (spec subset)
# ---------------------------------------------------------------------------

def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _encode_value(t: Any, v: Any, out: io.BytesIO) -> None:
    if isinstance(t, list):  # union — Connect emits [null, T]
        # pandas null spellings (NaN/NaT) count as Avro null
        if v is None or (
            not isinstance(v, (list, tuple, dict, bytes, bytearray)) and pd.isna(v)
        ):
            out.write(_zigzag_encode(t.index("null")))
            return
        branch = next(i for i, b in enumerate(t) if b != "null")
        out.write(_zigzag_encode(branch))
        _encode_value(t[branch], v, out)
        return
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "timestamp-millis":
            import datetime

            if isinstance(v, datetime.datetime):
                # naive datetimes are session-UTC instants (session tz
                # pinned in session.py) — don't let .timestamp() apply
                # the host's local zone.
                # integer math end-to-end: total_seconds()/timestamp()
                # return doubles, which round the millisecond once the
                # epoch exceeds ~2^43 ms (post-2248... but the µs term
                # already wobbles by 2038)
                if v.tzinfo is None:
                    d = v - datetime.datetime(1970, 1, 1)
                else:
                    d = v - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
                ms = (d.days * 86_400 + d.seconds) * 1000 + d.microseconds // 1000
            else:
                ms = int(v)
            out.write(_zigzag_encode(ms))
            return
        if lt == "date":
            import datetime

            days = (v - datetime.date(1970, 1, 1)).days if hasattr(v, "year") else int(v)
            out.write(_zigzag_encode(days))
            return
        if lt == "decimal":
            from decimal import Decimal

            unscaled = int(Decimal(v).scaleb(t["scale"]).to_integral_value())
            blen = max(1, (unscaled.bit_length() + 8) // 8)
            body = unscaled.to_bytes(blen, "big", signed=True)
            out.write(_zigzag_encode(len(body)))
            out.write(body)
            return
        if t.get("type") == "record":
            _encode_record(t, v, out)
            return
        if t.get("type") == "array":
            if v:
                out.write(_zigzag_encode(len(v)))
                for item in v:
                    _encode_value(t["items"], item, out)
            out.write(_zigzag_encode(0))
            return
        t = t["type"]
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        out.write(_zigzag_encode(int(v)))
    elif t == "float":
        out.write(struct.pack("<f", float(v)))
    elif t == "double":
        out.write(struct.pack("<d", float(v)))
    elif t == "string":
        b = str(v).encode("utf-8")
        out.write(_zigzag_encode(len(b)))
        out.write(b)
    elif t == "bytes":
        out.write(_zigzag_encode(len(v)))
        out.write(bytes(v))
    else:
        raise TypeError(f"cannot encode Avro type {t!r}")


def _encode_record(schema: dict, record: dict, out: io.BytesIO) -> None:
    for f in schema["fields"]:
        _encode_value(f["type"], None if record is None else record.get(f["name"]), out)


def _decode_value(t: Any, buf: io.BytesIO) -> Any:
    if isinstance(t, list):
        branch = _zigzag_decode(buf)
        return _decode_value(t[branch], buf)
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "timestamp-millis":
            import datetime

            ms = _zigzag_decode(buf)
            # timedelta keeps ms exact; utcfromtimestamp(ms/1000.0)
            # would round through double
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(milliseconds=ms)
        if lt == "date":
            import datetime

            return datetime.date(1970, 1, 1) + datetime.timedelta(days=_zigzag_decode(buf))
        if lt == "decimal":
            from decimal import Decimal

            n = _zigzag_decode(buf)
            unscaled = int.from_bytes(buf.read(n), "big", signed=True)
            return Decimal(unscaled).scaleb(-t["scale"])
        if t.get("type") == "record":
            return _decode_record(t, buf)
        if t.get("type") == "array":
            out = []
            while True:
                n = _zigzag_decode(buf)
                if n == 0:
                    break
                if n < 0:  # block with byte size prefix
                    _zigzag_decode(buf)
                    n = -n
                for _ in range(n):
                    out.append(_decode_value(t["items"], buf))
            return out
        t = t["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _zigzag_decode(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return buf.read(_zigzag_decode(buf)).decode("utf-8")
    if t == "bytes":
        return buf.read(_zigzag_decode(buf))
    raise TypeError(f"cannot decode Avro type {t!r}")


def _decode_record(schema: dict, buf: io.BytesIO) -> dict:
    return {f["name"]: _decode_value(f["type"], buf) for f in schema["fields"]}


# ---------------------------------------------------------------------------
# Schema Registry (subject naming + compatibility + ids)
# ---------------------------------------------------------------------------

class CompatibilityError(ValueError):
    """New schema rejected under the subject's compatibility mode —
    mirrors the 409 the reference hits at Schema Registry
    실습.md:444-549 (adding a required field under BACKWARD)."""


class SchemaRegistry:
    """Minimal registry: monotonically increasing global ids, subject →
    version list, BACKWARD/NONE compatibility (global default BACKWARD
    like the reference :533; per-subject override supported).

    File-backed when ``path`` given (JSON document), else in-memory.
    The real REST registry maps 1:1: register = POST
    /subjects/<s>/versions, get_by_id = GET /schemas/ids/<id>,
    set_compatibility = PUT /config/<s>.
    """

    def __init__(self, path: str | Path | None = None):
        self.path = Path(path) if path else None
        self._data: dict[str, Any] = {"schemas": {}, "subjects": {}, "config": {}}
        if self.path and self.path.exists():
            self._data = json.loads(self.path.read_text())
        # global mode lives IN the persisted document, or a file-backed
        # registry would silently revert to BACKWARD on reload
        self._data.setdefault("global_compat", "BACKWARD")

    def _save(self) -> None:
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self.path.write_text(json.dumps(self._data))

    # -- config ---------------------------------------------------------
    def set_compatibility(self, mode: str, subject: str | None = None) -> None:
        if mode not in ("BACKWARD", "NONE"):
            raise ValueError("supported modes: BACKWARD, NONE")
        if subject is None:
            self._data["global_compat"] = mode
        else:
            self._data["config"][subject] = mode
        self._save()

    def compatibility(self, subject: str) -> str:
        return self._data["config"].get(subject, self._data["global_compat"])

    # -- registration ---------------------------------------------------
    @staticmethod
    def _is_backward_compatible(new: dict, old: dict) -> bool:
        """New schema must be able to read data written with old:
        every new field either exists in old or has a default."""
        old_fields = {f["name"] for f in old.get("fields", [])}
        for f in new.get("fields", []):
            if f["name"] not in old_fields and "default" not in f:
                return False
        return True

    def register(self, subject: str, schema: dict) -> int:
        canon = json.dumps(schema, sort_keys=True, separators=(",", ":"))
        versions = self._data["subjects"].setdefault(subject, [])
        for sid in versions:
            if self._data["schemas"][str(sid)] == canon:
                return sid  # idempotent re-register
        if versions and self.compatibility(subject) == "BACKWARD":
            latest = json.loads(self._data["schemas"][str(versions[-1])])
            if not self._is_backward_compatible(schema, latest):
                raise CompatibilityError(
                    f"schema for {subject!r} is not BACKWARD compatible with latest version"
                )
        sid = len(self._data["schemas"]) + 1
        self._data["schemas"][str(sid)] = canon
        versions.append(sid)
        self._save()
        return sid

    def get_by_id(self, schema_id: int) -> dict:
        return json.loads(self._data["schemas"][str(schema_id)])

    def latest(self, subject: str) -> tuple[int, dict]:
        sid = self._data["subjects"][subject][-1]
        return sid, self.get_by_id(sid)

    def latest_version(self, subject: str) -> int:
        """Version NUMBER (1-based count) of the subject's latest schema
        — the REST protocol's ``version`` field; public so the REST
        server never reaches into ``_data`` (r10 ADVICE)."""
        return len(self._data["subjects"][subject])

    def global_compatibility(self) -> str:
        """The registry-wide compatibility mode (GET /config)."""
        return self._data["global_compat"]

    def subjects(self) -> list[str]:
        return sorted(self._data["subjects"])


# ---------------------------------------------------------------------------
# Confluent wire format framing
# ---------------------------------------------------------------------------

def frame(schema_id: int, body: bytes) -> bytes:
    return MAGIC_BYTE + struct.pack(">I", schema_id) + body


def unframe(wire: bytes) -> tuple[int, bytes]:
    if not wire or wire[0:1] != MAGIC_BYTE:
        raise ValueError("not Confluent wire format (bad magic byte)")
    (schema_id,) = struct.unpack(">I", wire[1:5])
    return schema_id, wire[5:]


def encode_message(schema: dict, record: dict | None, schema_id: int) -> bytes | None:
    """Record dict → framed wire bytes; None record → tombstone (None)."""
    if record is None:
        return None
    out = io.BytesIO()
    _encode_record(schema, record, out)
    return frame(schema_id, out.getvalue())


def decode_message(wire: bytes | None, registry_lookup) -> dict | None:
    if wire is None:
        return None
    schema_id, body = unframe(bytes(wire))
    schema = registry_lookup(schema_id)
    return _decode_record(schema, io.BytesIO(body))


# ---------------------------------------------------------------------------
# Spark integration — Arrow-batched pandas UDFs
# ---------------------------------------------------------------------------

def avro_serialize_udf(avro_schema: dict, schema_id: int):
    """Returns a pandas UDF struct→binary producing framed wire bytes.
    The avro schema travels by closure (resolved once, driver-side) —
    it alone drives encoding; no Spark-side schema is needed."""
    from pyspark.sql.functions import pandas_udf

    # struct input arrives as pd.DataFrame; the hint checker wants the
    # Union spelling for that protocol
    import numpy as np

    def _clean(v):
        # Arrow->pandas hands back numpy scalars/arrays and NaN/NaT —
        # normalize to plain Python before the codec sees them
        if isinstance(v, np.ndarray):
            return [_clean(x) for x in v.tolist()]
        if isinstance(v, list):
            return [_clean(x) for x in v]
        if isinstance(v, np.generic):
            v = v.item()
        if v is None or v is pd.NaT:
            return None
        if isinstance(v, float) and pd.isna(v):
            return None
        return v

    @pandas_udf(T.BinaryType())
    def _ser(s: Union[pd.Series, pd.DataFrame]) -> pd.Series:
        out = []
        for rec in s.to_dict("records"):
            out.append(
                encode_message(avro_schema, {k: _clean(v) for k, v in rec.items()}, schema_id)
            )
        return pd.Series(out, dtype=object)

    return _ser


def avro_deserialize_udf(
    value_schema: T.StructType,
    avro_schema: dict,
    expected_id: int | None = None,
    permissive: bool = False,
):
    """Framed wire bytes → struct rows. Assumes a single writer schema
    per pipeline (SURVEY §1.3); when ``expected_id`` is given, a
    message carrying a DIFFERENT embedded schema id fails loudly —
    positional decode against the wrong field list would silently
    corrupt columns (evolved topics need a registry lookup in the
    reader, which is the restart-on-evolution path).

    ``permissive=True`` (KIP-298 errors.tolerance=all): the output
    struct gains a ``_corrupt_record`` string column and any
    per-record decode failure — bad framing, truncated body, wrong
    schema id — lands there as the error text instead of failing the
    batch, so the caller can dead-letter the record. NOTE a schema-id
    mismatch after topic evolution becomes a per-record DLQ entry in
    this mode (the loud restart-on-evolution signal is traded away;
    that is what tolerance=all means)."""
    from pyspark.sql.functions import pandas_udf

    out_schema = value_schema
    if permissive:
        out_schema = T.StructType(
            list(value_schema.fields)
            + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
    names = [f.name for f in out_schema.fields]

    @pandas_udf(out_schema)
    def _de(s: pd.Series) -> pd.DataFrame:
        rows = []
        for wire in s:
            if wire is None:
                rows.append({n: None for n in names})
                continue
            try:
                sid, body = unframe(bytes(wire))
                if expected_id is not None and sid != expected_id:
                    raise ValueError(
                        f"message written with schema id {sid}, reader bound "
                        f"to {expected_id} — schema evolved mid-stream; "
                        "restart the pipeline against the new version"
                    )
                rec = _decode_record(avro_schema, io.BytesIO(body))
                if permissive:
                    rec = dict(rec)
                    rec["_corrupt_record"] = None
                rows.append(rec)
            except Exception as e:  # noqa: BLE001
                if not permissive:
                    raise
                bad = {n: None for n in names}
                bad["_corrupt_record"] = f"{type(e).__name__}: {e}"
                rows.append(bad)
        return pd.DataFrame(rows, columns=names)

    return _de
