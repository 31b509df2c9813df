"""Temporal/decimal fidelity golden files (SURVEY §7 watch list):
exact wire shapes for timestamp/date/decimal through C1/C2 JSON and
the Avro codec, with the session pinned to UTC (the reference pins
Asia/Seoul for its labs; we pin UTC and convert at the sink edge, K7).

Divergence documented in SURVEY §7: Connect's JSON-with-schema mode
encodes decimals as base64 bytes; we emit plain numeric JSON and cast
back via DecimalType — asserted here so the choice stays visible."""

from __future__ import annotations

import datetime
import io
import json
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkaconnect_spark.functions.avro_wire import (
    _decode_record,
    _encode_record,
    avro_schema_for,
)
from kafkaconnect_spark.functions.serde import json_deserialize, json_serialize

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), True),       # instant (UTC)
        T.StructField("d", T.DateType(), True),
        T.StructField("price", T.DecimalType(10, 2), True),
    ]
)

ROW = (7, datetime.datetime(2023, 3, 15, 8, 30, 59), datetime.date(2023, 3, 15), Decimal("1234.50"))


def _wire(spark, schemas_enable):
    df = spark.createDataFrame([ROW], SCHEMA)
    rec = df.select(F.struct(*df.columns).alias("value"))
    return rec.select(
        json_serialize("value", SCHEMA, schemas_enable=schemas_enable).alias("raw")
    ).first()[0]


def test_c2_bare_json_golden(spark):
    raw = _wire(spark, schemas_enable=False)
    assert json.loads(raw) == {
        "id": 7,
        "ts": "2023-03-15T08:30:59.000Z",   # ISO-8601 UTC instant
        "d": "2023-03-15",
        "price": 1234.5,                     # plain numeric (documented divergence)
    }


def test_c1_schema_wrapper_golden(spark):
    raw = _wire(spark, schemas_enable=True)
    doc = json.loads(raw)
    assert set(doc) == {"schema", "payload"}
    fields = {f["field"]: f for f in doc["schema"]["fields"]}
    # Connect logical-type names preserved for temporal/decimal
    assert fields["ts"]["name"] == "org.apache.kafka.connect.data.Timestamp"
    assert fields["d"]["name"] == "org.apache.kafka.connect.data.Date"
    assert fields["price"]["name"] == "org.apache.kafka.connect.data.Decimal"
    assert fields["price"]["parameters"] == {"scale": "2"}
    assert doc["payload"]["ts"] == "2023-03-15T08:30:59.000Z"


def test_json_roundtrip_preserves_temporal_values(spark):
    df = spark.createDataFrame([ROW], SCHEMA)
    rec = df.select(F.struct(*df.columns).alias("value"))
    wire = rec.select(json_serialize("value", SCHEMA, schemas_enable=True).alias("raw"))
    back = wire.select(json_deserialize("raw", SCHEMA, schemas_enable=True).alias("value"))
    got = back.select("value.*").first()
    assert got.ts == ROW[1] and got.d == ROW[2] and got.price == ROW[3]


def test_avro_temporal_golden_bytes():
    """Avro body bytes are pinned: timestamp-millis/date/decimal encode
    deterministically (golden hex)."""
    avro = avro_schema_for(SCHEMA, "t")
    buf = io.BytesIO()
    _encode_record(avro, {"id": 7, "ts": ROW[1], "d": ROW[2], "price": ROW[3]}, buf)
    blob = buf.getvalue()
    back = _decode_record(avro, io.BytesIO(blob))
    assert back == {"id": 7, "ts": ROW[1], "d": ROW[2], "price": ROW[3]}
    # ts = 1678869059000 ms; date = 19431 days; decimal unscaled 123450
    assert blob.hex() == "0e02f0d6a6c6dc6102ceaf02020601e23a"


def test_session_timezone_is_utc(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # rendering at the sink edge shifts, the instant does not (K7)
    df = spark.createDataFrame([ROW], SCHEMA).select(
        F.date_format(F.from_utc_timestamp("ts", "Asia/Seoul"), "yyyy-MM-dd HH:mm:ss").alias("seoul")
    )
    assert df.first().seoul == "2023-03-15 17:30:59"


def test_table_reader_normalizes_both_timestamp_generations(spark, tmp_path):
    """The driver has regenerated testdata with a different timestamp
    encoding once already (timestamp[ns] -> naive timestamp[us]); _t
    must normalize BOTH to TimestampType for every table, so neither
    generation can break the catalog."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafkaconnect_spark.queries import _t

    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0, 123456)
    rows = [t0, t0 + datetime.timedelta(seconds=1)]

    ns_dir = tmp_path / "gen_ns"
    ns_dir.mkdir()
    pq.write_table(
        pa.table({"l_orderkey": [1, 2],
                  "l_shipdate": pa.array(rows, type=pa.timestamp("ns"))}),
        ns_dir / "lineitem.parquet",
    )
    us_dir = tmp_path / "gen_us"
    us_dir.mkdir()
    pq.write_table(
        pa.table({"l_orderkey": [1, 2],
                  "l_shipdate": pa.array(rows, type=pa.timestamp("us"))}),
        us_dir / "lineitem.parquet",
    )

    for d in (ns_dir, us_dir):
        df = _t(spark, str(d), "lineitem")
        assert dict(df.dtypes)["l_shipdate"] == "timestamp", (d, df.dtypes)
        got = [r.l_shipdate for r in df.orderBy("l_orderkey").collect()]
        assert got == rows, (d, got)
