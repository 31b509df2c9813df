"""Property-based serde/codec tests (hypothesis): arbitrary values
must survive the wire round-trips — JSON C1/C2 and the Avro body
codec — including unicode, control characters, quotes, numeric edges,
and nulls."""

from __future__ import annotations

import datetime
import io

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafkaconnect_spark.functions.avro_wire import (
    _decode_record,
    _encode_record,
    avro_schema_for,
)
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEXT = st.text(max_size=200)  # full unicode incl. control chars
MAYBE_TEXT = st.one_of(st.none(), TEXT)
INTS = st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1))
LONGS = st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1))
FLOATS = st.one_of(
    st.none(), st.floats(allow_nan=False, allow_infinity=False, width=64)
)
TS = st.one_of(
    st.none(),
    st.datetimes(
        min_value=datetime.datetime(1970, 1, 2),
        max_value=datetime.datetime(2200, 1, 1),
    ).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000)),
)

AVRO_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType(), True),
        T.StructField("l", T.LongType(), True),
        T.StructField("f", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
    ]
)
AVRO = avro_schema_for(AVRO_SPARK_SCHEMA, "prop")


@given(
    i=INTS, l=LONGS, f=FLOATS, s=MAYBE_TEXT, ts=TS,
    tags=st.one_of(st.none(), st.lists(TEXT, max_size=5)),
)
@settings(max_examples=200, deadline=None)
def test_avro_codec_roundtrip_property(i, l, f, s, ts, tags):
    rec = {"i": i, "l": l, "f": f, "s": s, "ts": ts, "tags": tags}
    buf = io.BytesIO()
    _encode_record(AVRO, rec, buf)
    assert _decode_record(AVRO, io.BytesIO(buf.getvalue())) == rec


JSON_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType(), True),
        T.StructField("i", T.LongType(), True),
    ]
)


@given(rows=st.lists(st.tuples(MAYBE_TEXT, LONGS), min_size=1, max_size=20))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_json_c1_roundtrip_property(spark, rows):
    from kafkaconnect_spark.functions.serde import json_deserialize, json_serialize

    df = spark.createDataFrame(rows, JSON_SCHEMA)
    rec = df.select(F.struct(*df.columns).alias("value"))
    wire = rec.select(json_serialize("value", JSON_SCHEMA, schemas_enable=True).alias("raw"))
    back = wire.select(
        json_deserialize("raw", JSON_SCHEMA, schemas_enable=True).alias("value")
    ).select("value.*")
    got = sorted([(r.s, r.i) for r in back.collect()], key=repr)
    assert got == sorted(rows, key=repr)
