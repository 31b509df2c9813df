"""Query catalog — every operator from SURVEY §2 + Phase E, as
(spark, sf_dir) -> DataFrame callables with DuckDB oracle SQL.

This is the correctness gate's surface (driver contract in
__spark_entry__.py): each entry exercises a real engine code path
(SMT functions, poller predicates, envelope wrap/unwrap, serde
round-trips, dedup/similarity/text operators) expressed over the
driver's parquet tables, and each oracle replays the exact semantics
in ANSI-ish DuckDB SQL.

Determinism rules shared by both sides:
- hashes are md5-derived (functions/text.hash64) — identical hex in
  Spark and DuckDB;
- double aggregations go through per-row rounding → DECIMAL sums
  (order-independent, exact) → final cast to double;
- per-row float math (cosine) is computed in double and rounded to 6.
"""

from __future__ import annotations

import math
import os
from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkaconnect_spark.functions import text as TX
from kafkaconnect_spark.functions.envelope import unwrap_envelope, wrap_as_envelope
from kafkaconnect_spark.functions.serde import json_deserialize, json_serialize
from kafkaconnect_spark.operators import dedup, pipeline, similarity
from kafkaconnect_spark.operators.transforms import (
    extract_field,
    regex_router,
    timestamp_converter,
    value_to_key,
)
from kafkaconnect_spark.session import conf_bytes
from kafkaconnect_spark.sources.jdbc_poller import Offset, incremental_predicate


# shared with the per-round catalog modules; re-exported here so
# existing imports (`from kafkaconnect_spark.queries import _t`) keep
# working — the definitions live in query_base to break the
# queries <-> queries_rN import cycle
from kafkaconnect_spark.query_base import (  # noqa: F401
    QueryDef,
    _MINHASH_AGGS,
    _NTOK_SQL,
    _SHINGLE_CTE,
    _SIG_LIST,
    _SIMHASH_BITSUMS,
    _SIMHASH_VALUE,
    _events,
    _hash64_sql,
    _path_bytes,
    _spread,
    _t,
)

# the op mapping used to view the events table as a CDC change stream:
# signup→c(reate), click/view/purchase→u(pdate), error→d(elete)
_OP_EXPR = (
    "CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END"
)


# ===========================================================================
# §2.1 sources — incremental scan modes (S1–S5)
# ===========================================================================

def s1_jdbc_incrementing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: resume scan WHERE inc_col > stored offset (real poller
    predicate; connector_configs/mysql_jdbc_om_source.json:14-15)."""
    ev = _t(spark, sf_dir, "events")
    pred = incremental_predicate("incrementing", "event_id", None, Offset(inc=500))
    return ev.where(pred).select("event_id", "user_id", "event_type")


S1_ORACLE = """
SELECT event_id, user_id, event_type FROM events WHERE event_id > 500
"""


def s2_jdbc_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: resume scan WHERE ts_col > stored timestamp offset."""
    ev = _t(spark, sf_dir, "events")
    pred = incremental_predicate("timestamp", None, "ts", Offset(ts="2024-01-10 00:00:00"))
    return ev.where(pred).select("event_id", "ts", "user_id")


# ts::TIMESTAMP (µs) — the parquet column is TIMESTAMP_NS; Spark reads
# it truncated to microseconds, so the oracle must compare at µs too
S2_ORACLE = """
SELECT event_id, ts::TIMESTAMP AS ts, user_id
FROM events WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
"""


def s3_jdbc_ts_incrementing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: lexicographic (ts, inc) resume — robust to equal
    timestamps (실습수행/JDBC Source Connector 실습.md:156-199)."""
    ev = _t(spark, sf_dir, "events")
    pred = incremental_predicate(
        "timestamp+incrementing", "event_id", "ts", Offset(inc=300, ts="2024-01-05 00:00:00")
    )
    return ev.where(pred).select("event_id", "ts")


S3_ORACLE = """
SELECT event_id, ts::TIMESTAMP AS ts FROM events
WHERE ts > TIMESTAMP '2024-01-05 00:00:00'
   OR (ts = TIMESTAMP '2024-01-05 00:00:00' AND event_id > 300)
"""


def s4_jdbc_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: bulk mode — full-table snapshot per poll."""
    return _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )


S4_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
"""


def s5_topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: multi-table whitelist fanout — topic.prefix + table
    (connector_configs/mysql_jdbc_om_source.json:9,12)."""
    parts = []
    for table in ("customer", "orders", "lineitem"):
        df = _t(spark, sf_dir, table)
        parts.append(
            df.agg(F.count(F.lit(1)).alias("n_records")).withColumn(
                "topic", F.lit("mysql_om_" + table)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("topic", "n_records")


S5_ORACLE = """
SELECT 'mysql_om_customer' AS topic, count(*) AS n_records FROM customer
UNION ALL SELECT 'mysql_om_orders', count(*) FROM orders
UNION ALL SELECT 'mysql_om_lineitem', count(*) FROM lineitem
"""


def s6_spooldir_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: SpoolDir CSV lifecycle as one batch-queryable shape —
    header + schema generation + PERMISSIVE parse + error routing
    (connector_configs/spooldir_source.json:5-14, 실습수행/Spool Dir
    Source Connector 실습.md:29-110).

    The spool directory is a deterministic fixture derived from the
    events table (every 5th event_id, value column; rows where
    event_id % 37 == 0 are written with an unparseable value — the
    corrupt-line drop). The CLEAN file is present at registration, so
    schema generation infers (bigint, string, double) exactly as the
    reference's schema.generation.enabled does; the corrupt file
    arrives afterwards, like a later drop. The REAL streaming path
    runs (generate_schema → read_spooldir_stream → availableNow →
    split_errors); the returned frame is per-type good-row counts +
    decimal-exact value sums + the global corrupt-routed count.

    Driver-side work is fixture construction only (bounded: ~2k rows
    written once per invocation into a fresh temp dir); parsing is
    distributed."""
    import shutil
    import tempfile

    from kafkaconnect_spark.sources.spooldir import (
        generate_schema,
        read_spooldir_stream,
        split_errors,
    )

    ev = _t(spark, sf_dir, "events")
    rows = (
        ev.where(F.col("event_id") % 5 == 0)
        .select("event_id", "event_type", "value")
        .collect()  # fixture construction — bounded, not the data plane
    )
    spool = tempfile.mkdtemp(prefix="kc_s6_spool_")
    finished = tempfile.mkdtemp(prefix="kc_s6_done_")
    try:
        header = "event_id,event_type,value"
        clean = [
            f"{r.event_id},{r.event_type},{r.value!r}"
            for r in rows
            if r.event_id % 37 != 0
        ]
        with open(f"{spool}/batch1.csv", "w") as fh:
            fh.write("\n".join([header] + clean) + "\n")
        # schema generation sees only the clean registration-time file
        schema = generate_schema(spark, spool, "*.csv")
        corrupt = [
            f"{r.event_id},{r.event_type},notanumber"
            for r in rows
            if r.event_id % 37 == 0
        ]
        with open(f"{spool}/batch2.csv", "w") as fh:
            fh.write("\n".join([header] + corrupt) + "\n")

        stream = read_spooldir_stream(
            spark, spool, schema, finished_path=finished, pattern="*.csv"
        )
        sink = f"s6_spool_{os.path.basename(spool)}"
        (
            stream.writeStream.format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        good, bad = split_errors(spark.table(sink))
        n_corrupt = bad.agg(F.count(F.lit(1)).alias("n_corrupt"))
        out = (
            good.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_good"),
                F.sum(
                    F.round(F.col("value"), 7).cast(T.DecimalType(20, 7))
                ).cast("double").alias("sum_value"),
            )
            .crossJoin(F.broadcast(n_corrupt))  # 1-row global denominator
        )
        # materialize before the temp spool dir disappears
        result = spark.createDataFrame(out.collect(), out.schema)
        return result
    finally:
        shutil.rmtree(spool, ignore_errors=True)
        shutil.rmtree(finished, ignore_errors=True)


S6_ORACLE = """
WITH src AS (
  SELECT event_id, event_type, value FROM events WHERE event_id % 5 = 0
),
bad AS (SELECT count(*) AS n_corrupt FROM src WHERE event_id % 37 = 0)
SELECT event_type,
       count(*) AS n_good,
       CAST(SUM(CAST(round(value, 7) AS DECIMAL(20,7))) AS DOUBLE) AS sum_value,
       (SELECT n_corrupt FROM bad) AS n_corrupt
FROM src WHERE event_id % 37 <> 0
GROUP BY event_type
"""


# ===========================================================================
# §2.4 transforms (T1–T5)
# ===========================================================================

def t1_t2_smt_key_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T2: ValueToKey(event_id) → ExtractField$Key(event_id) —
    the reference's standard key chain
    (jdbc_source_configs/mysql_jdbc_source_customers.json:18-22)."""
    ev = _t(spark, sf_dir, "events")
    rec = ev.select(F.struct("event_id", "user_id", "event_type").alias("value"))
    rec = value_to_key(["event_id"])(rec)
    rec = extract_field("event_id", "key")(rec)
    return rec.select(
        F.col("key").alias("key"), F.col("value.event_type").alias("event_type")
    )


T1_ORACLE = """
SELECT event_id AS key, event_type FROM events
"""


def t3_unwrap_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: Debezium envelope → flat after-row; deletes become null
    values (dropped here, as a sink would route them to DELETE)."""
    ev = _t(spark, sf_dir, "events").withColumn("op", F.expr(_OP_EXPR))
    env = wrap_as_envelope(
        ev, ["event_id", "user_id", "event_type", "value"], op_col="op", ts_col="ts",
        db="om", table="events",
    )
    flat = unwrap_envelope(env.select("value"))
    return flat.where(F.col("value").isNotNull()).select(
        F.col("value.event_id").alias("event_id"),
        F.col("value.user_id").alias("user_id"),
        F.col("op"),
    )


T3_ORACLE = f"""
SELECT event_id, user_id, {_OP_EXPR} AS op
FROM events WHERE event_type != 'error'
"""


def t4_regex_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: RegexRouter '(.*)\\.(.*)\\.(.*)' → '$1-$2-$3'
    (…실습 - 01.md:630-634) applied to server.db.table topics."""
    ev = _t(spark, sf_dir, "events")
    rec = ev.select(
        F.concat(F.lit("dbzsrc.om."), F.col("event_type")).alias("topic")
    )
    routed = regex_router(r"(.*)\.(.*)\.(.*)", "$1-$2-$3")(rec)
    return routed.groupBy("topic").agg(F.count(F.lit(1)).alias("n_records"))


T4_ORACLE = r"""
SELECT regexp_replace('dbzsrc.om.' || event_type, '^(?:(.*)\.(.*)\.(.*))$', '\1-\2-\3') AS topic,
       count(*) AS n_records
FROM events GROUP BY 1
"""


def t5_timestamp_converter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: TimestampConverter$Value — timestamp → ISO string → back
    (format yyyy-MM-dd'T'HH:mm:ss'Z', …실습 - 02.md:364-368)."""
    fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 200)
    rec = ev.select(F.struct("event_id", "ts").alias("value"))
    to_str = timestamp_converter("ts", "string", fmt)(rec)
    flat = to_str.select(
        F.col("value.event_id").alias("event_id"), F.col("value.ts").alias("ts_str")
    )
    rec2 = flat.select(
        F.struct("event_id", "ts_str", F.col("ts_str").alias("ts_parsed")).alias("value")
    )
    parsed = timestamp_converter("ts_parsed", "Timestamp", fmt)(rec2)
    return parsed.select(
        F.col("value.event_id").alias("event_id"),
        F.col("value.ts_str").alias("ts_str"),
        F.col("value.ts_parsed").alias("ts_parsed"),
    )


T5_ORACLE = """
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_str,
       strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%dT%H:%M:%SZ') AS ts_parsed
FROM events WHERE event_id < 200
"""


def t6_smt_standard_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-set SMTs beyond the reference labs, chained Connect-
    style: HoistField$Value → Flatten$Value('_') → Cast$Value
    (int64→int32) → MaskField$Value (PII null-out) → InsertField$Value
    (static + topic metadata) → ReplaceField$Value (renames) → Filter
    (TopicNameMatches drop). Every step is a narrow Column rebuild —
    one scan, zero shuffles, zero Python."""
    from kafkaconnect_spark.operators.transforms import (
        cast_fields,
        filter_records,
        flatten_value,
        hoist_field,
        insert_field,
        mask_field,
        replace_field,
    )

    ev = _t(spark, sf_dir, "events")
    rec = ev.select(
        F.struct("event_id", "user_id", "event_type", "props").alias("value"),
        F.concat(F.lit("om."), F.col("event_type")).alias("topic"),
    )
    rec = hoist_field("payload")(rec)
    rec = flatten_value("_")(rec)
    rec = cast_fields({"payload_user_id": "int32"})(rec)
    rec = mask_field(["payload_props"])(rec)
    rec = insert_field(
        static_field="src", static_value="om", topic_field="src_topic"
    )(rec)
    rec = replace_field(
        renames={
            "payload_event_id": "event_id",
            "payload_user_id": "user_id",
            "payload_event_type": "etype",
            "payload_props": "props",
        }
    )(rec)
    rec = filter_records("TopicNameMatches", r"om\.(click|view)")(rec)
    return rec.select(
        F.col("value.event_id").alias("event_id"),
        F.col("value.user_id").alias("user_id"),
        F.col("value.etype").alias("etype"),
        F.col("value.props").alias("props"),
        F.col("value.src").alias("src"),
        F.col("value.src_topic").alias("src_topic"),
    )


T6_ORACLE = """
SELECT event_id, user_id::INT AS user_id, event_type AS etype,
       NULL::VARCHAR AS props, 'om' AS src,
       'om.' || event_type AS src_topic
FROM events WHERE event_type NOT IN ('click', 'view')
"""


# ===========================================================================
# §2.5 converters (C1/C2) — serde round-trips
# ===========================================================================

_EVENT_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def c1_json_schema_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: JsonConverter schemas.enable=true round-trip — serialize
    {"schema":…,"payload":…}, parse back, values must survive
    (wrapper shape: 실습수행/JDBC Sink Connector 실습.md:349)."""
    ev = _t(spark, sf_dir, "events", spread=True)
    rec = ev.select(F.struct("event_id", "event_type", "value", "props").alias("value"))
    wire = rec.select(
        json_serialize("value", _EVENT_VALUE_SCHEMA, schemas_enable=True).alias("raw")
    )
    back = wire.select(
        json_deserialize("raw", _EVENT_VALUE_SCHEMA, schemas_enable=True).alias("value")
    )
    return back.select(
        F.col("value.event_id").alias("event_id"),
        F.col("value.event_type").alias("event_type"),
        F.col("value.value").alias("value"),
        F.get_json_object("value.props", "$.k").cast("int").alias("prop_k"),
    )


C1_ORACLE = """
SELECT event_id, event_type, value, json_extract(props, '$.k')::INT AS prop_k FROM events
"""


def c2_json_bare_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: schemas.enable=false — bare JSON round-trip
    (connector_configs/mysql_jdbc_om_source_noschema.json:22-25)."""
    ev = _t(spark, sf_dir, "events")
    rec = ev.select(F.struct("event_id", "event_type", "value", "props").alias("value"))
    wire = rec.select(
        json_serialize("value", _EVENT_VALUE_SCHEMA, schemas_enable=False).alias("raw")
    )
    back = wire.select(
        json_deserialize("raw", _EVENT_VALUE_SCHEMA, schemas_enable=False).alias("value")
    )
    return back.select(
        F.col("value.event_id").alias("event_id"),
        F.col("value.event_type").alias("event_type"),
        F.col("value.value").alias("value"),
    )


C2_ORACLE = """
SELECT event_id, event_type, value FROM events
"""


def c3_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: AvroConverter + Schema Registry — encode every event value
    to Confluent wire format (magic byte + schema id + Avro binary),
    decode back; values must survive bit-for-bit (Schema Registry 기반의
    Connector 구성 실습.md:90-93,146)."""
    from kafkaconnect_spark.functions.avro_wire import (
        SchemaRegistry,
        avro_deserialize_udf,
        avro_schema_for,
        avro_serialize_udf,
    )

    sub = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    avro = avro_schema_for(sub, "events")
    reg = SchemaRegistry()
    sid = reg.register("events-value", avro)
    ev = _t(spark, sf_dir, "events", spread=True)
    rec = ev.select(F.struct("event_id", "event_type", "value").alias("v"))
    wire = rec.select(avro_serialize_udf(avro, sid)(F.col("v")).alias("raw"))
    back = wire.select(avro_deserialize_udf(sub, avro)(F.col("raw")).alias("v"))
    return back.select(
        F.col("v.event_id").alias("event_id"),
        F.col("v.event_type").alias("event_type"),
        F.col("v.value").alias("value"),
    )


C3_ORACLE = """
SELECT event_id, event_type, value FROM events
"""


# ===========================================================================
# §2.2 sinks — upsert / tombstone-delete semantics (K1/K2)
# ===========================================================================

def k1_upsert_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: last-write-wins per key — the within-batch dedupe the
    upsert sink applies before MERGE
    (connector_configs/mysql_jdbc_sink_customers.json:10-12)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


K1_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
WHERE rn = 1
"""


def k2_tombstone_delete_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: delete.enabled=true — keys whose terminal record is a
    tombstone (here: op='d') vanish from the final state
    (실습수행/JDBC Sink Connector 실습.md:331-363)."""
    ev = _t(spark, sf_dir, "events").withColumn("op", F.expr(_OP_EXPR))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "d"))
        .select("user_id", F.col("event_id").alias("last_event_id"))
    )


K2_ORACLE = f"""
SELECT user_id, event_id AS last_event_id
FROM (SELECT *, {_OP_EXPR} AS op,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events)
WHERE rn = 1 AND op != 'd'
"""


# ===========================================================================
# analytics / streaming-shape queries (engine flagship + bench)
# ===========================================================================

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape over lineitem: the classic scan→partial-agg→
    final-agg plan; all sums go through per-row rounding → DECIMAL so
    they are order-independent and exact at any parallelism."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    # exact decimal pipeline: the source values are 2-dp decimals stored
    # as doubles; cast each factor (unambiguous) and multiply in decimal
    # space — no lossy round() whose half-way ties engines disagree on
    ep = F.col("l_extendedprice").cast(T.DecimalType(18, 2))
    dm = (F.lit(1) - F.col("l_discount")).cast(T.DecimalType(8, 2))
    tp = (F.lit(1) + F.col("l_tax")).cast(T.DecimalType(8, 2))
    return (
        f.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(T.DecimalType(18, 2))).cast("double").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.sum(ep * dm).cast("double").alias("sum_disc_price"),
            F.sum(ep * dm * tp).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
       sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
       sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(8,2))::DOUBLE AS sum_disc_price,
       sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(8,2) * (1 + l_tax)::DECIMAL(8,2))::DOUBLE AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, revenue agg,
    top-10. customer is broadcast (small dim); the orders⋈lineitem
    join shuffles on o_orderkey — the natural co-partitioning key."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue.cast(T.DecimalType(22, 4))).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


Q3_ORACLE = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       sum(round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(22,4))::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join chain. region/nation/supplier are
    broadcast dims; customer⋈orders⋈lineitem carries the bulk — at
    scale AQE picks shuffle-hash on the fact keys, the dims never
    shuffle. Revenue summed per nation via DECIMAL for exactness."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue.cast(T.DecimalType(22, 4))).cast("double").alias("revenue"))
    )


Q5_ORACLE = """
SELECT n_name,
       sum(round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(22,4))::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user — rank-in-group, the window-
    function shape (per-partition sort, no global sort)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("user_id", "rnk", "event_id", F.round("value", 2).alias("value"))
    )


TOPK_ORACLE = """
SELECT user_id, rnk, event_id, round(value, 2) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) rnk
      FROM events)
WHERE rnk <= 3
"""


def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (two-phase partial/final distinct
    agg; approx_count_distinct is the 100 TB variant — same plan shape,
    sketch merge instead of exact set)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


DISTINCT_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (p50/p95, linear interpolation).
    Exact percentile sorts within each group after one shuffle —
    deterministic under any partitioning; at 100 TB swap in
    approx_percentile (t-digest sketch, same plan shape, mergeable
    map-side). Both engines use the same q*(n-1) linear-interpolation
    rule; the result is rounded to 6 decimals on both sides to absorb
    last-ulp formula differences."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


PERCENTILE_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY event_type
"""


_PIVOT_TYPES = ["signup", "click", "view", "purchase", "error"]


def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one row per day, one count column per event type. The
    explicit value list matters twice: it skips the extra
    distinct-values job Spark otherwise runs, and it keeps the output
    schema static — mandatory for a streaming sink and for writing a
    stable table at scale. Plans as a single groupBy(day) with
    conditional aggregates (one shuffle, map-side partials)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PIVOT_TYPES)
    )


PIVOT_ORACLE = """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'view') AS view,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'error') AS error
FROM events GROUP BY 1
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (TPC-H Q22 shape): customers with no 1995 orders.
    Catalyst compiles this to a real anti join — no count trick."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
"""


def events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user value total over time — ordered window frame
    (rows unbounded preceding), the cumulative-metric shape."""
    ev = _events(spark, sf_dir).where(F.col("user_id") < 5)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.round(F.col("value"), 2).cast(T.DecimalType(18, 2)))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


RUNNING_ORACLE = """
SELECT user_id, event_id,
       sum(round(value, 2)::DECIMAL(18,2)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE AS running_value
FROM events WHERE user_id < 5
"""


def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: two-phase salted groupBy must equal the
    direct groupBy bit-for-bit (operators/skew.py; the hot-key path
    for 100 TB aggs)."""
    from kafkaconnect_spark.operators.skew import salted_agg

    ev = _events(spark, sf_dir).withColumn(
        "v2", F.round(F.col("value"), 2).cast(T.DecimalType(18, 2))
    )
    out = salted_agg(
        ev.select("event_type", "v2", "event_id"),
        keys=["event_type"],
        sums={"v2": "sum_value"},
        count_alias="n_events",
        salt_buckets=16,
        salt_from="event_id",  # deterministic, retry-safe salt
    )
    return out.select(
        "event_type", F.col("sum_value").cast("double").alias("sum_value"), "n_events"
    )


SALTED_ORACLE = """
SELECT event_type, sum(round(value, 2)::DECIMAL(18,2))::DOUBLE AS sum_value,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregate over the event stream — the
    batch shape of a Structured Streaming windowed agg (watermark +
    window in streaming mode; date_trunc here so the oracle matches)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast(T.DecimalType(18, 2))).cast("double").alias("sum_value"),
        )
    )


TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       sum(round(value, 2)::DECIMAL(18,2))::DOUBLE AS sum_value
FROM events GROUP BY 1, 2
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap — lag + running
    sum of session starts (the batch shape of
    applyInPandasWithState-style sessionization)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional epoch seconds as double — exact to the µs; a long cast
    # would truncate to whole seconds and disagree with the oracle's
    # epoch() (and with session_window) whenever a gap lands within
    # ~1s of the 1800s boundary
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    with_start = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return with_start.groupBy("user_id").agg(
        F.sum("is_new").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


SESSION_ORACLE = """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events)
SELECT user_id, sum(is_new)::BIGINT AS n_sessions, count(*) AS n_events
FROM g GROUP BY user_id
"""


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window (streaming state-store path; batch twin
    here) — 30-min gap, window end = last event + gap."""
    from kafkaconnect_spark.streaming.windows import session_window_stats

    return session_window_stats(_events(spark, sf_dir), gap="30 minutes")


SESSION_WINDOW_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events),
s AS (SELECT user_id, ts,
             -- event_id tiebreak: must replay the SAME total order the
             -- is_new flags were computed under, or tied-ts rows can
             -- accumulate into the wrong session
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
      FROM g)
SELECT user_id, min(ts)::TIMESTAMP AS session_start,
       (max(ts) + INTERVAL 30 MINUTE)::TIMESTAMP AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sess
"""


def k7_db_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7: db.timezone — timestamps rendered in the sink DB's zone at
    bind time (reference pins Asia/Seoul; …실습 - 02.md:408). Internal
    instants stay UTC; conversion happens only at the write edge."""
    ev = _events(spark, sf_dir).where(F.col("event_id") < 500)
    seoul = F.from_utc_timestamp(F.col("ts"), "Asia/Seoul")
    return ev.select(
        "event_id",
        F.date_format(seoul, "yyyy-MM-dd HH:mm:ss").alias("ts_seoul"),
    )


K7_ORACLE = """
SELECT event_id, strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_seoul
FROM events WHERE event_id < 500
"""


def k1_composite_key_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 with a composite PK (order_id, line_item_id analogue →
    (user_id, event_type)): last-write-wins per composite key
    (connector_configs/mysql_jdbc_sink_order_items.json:12)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.round("value", 2).alias("last_value"),
        )
    )


K1C_ORACLE = """
SELECT user_id, event_type, event_id AS last_event_id, round(value, 2) AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) rn FROM events)
WHERE rn = 1
"""


def asof_join_purchases_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event paired with the user's most
    recent click at-or-before it (trades⋈quotes pattern; one keyed
    shuffle via union+window — operators/joins.py)."""
    from kafkaconnect_spark.operators.joins import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases, clicks, on="ts", by="user_id",
        right_cols=["click_id"], tiebreak="click_id",
    )
    return out.select("user_id", "purchase_id", F.col("click_id_right").alias("click_id"))


ASOF_ORACLE = """
WITH u AS (
  SELECT user_id, ts, 0 AS side, event_id AS tb,
         event_id AS click_id, NULL::BIGINT AS purchase_id
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 1 AS side, 0 AS tb,
         NULL::BIGINT AS click_id, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT user_id, purchase_id, side,
         last_value(click_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, side, tb
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id
  FROM u)
SELECT user_id, purchase_id, click_id FROM m WHERE side = 1
"""


def range_join_signup_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events by the same user within 1 hour after each
    signup (bucketed interval join — candidates bounded by 2 time
    cells, never the whole user history)."""
    from kafkaconnect_spark.operators.joins import range_join

    ev = _events(spark, sf_dir)
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_id")
    )
    follow = ev.select("user_id", "ts", F.col("event_id").alias("follow_id"))
    pairs = range_join(
        signups, follow, by="user_id", left_ts="ts", right_ts="ts", window_seconds=3600
    )
    return pairs.groupBy(
        F.col("user_id_l").alias("user_id"), F.col("signup_id_l").alias("signup_id")
    ).agg(F.count(F.lit(1)).alias("n_followups"))


RANGE_ORACLE = """
SELECT s.user_id, s.event_id AS signup_id, count(*) AS n_followups
FROM events s
JOIN events e ON e.user_id = s.user_id
             AND e.ts >  s.ts
             AND e.ts <= s.ts + INTERVAL 1 HOUR
WHERE s.event_type = 'signup'
GROUP BY 1, 2
"""


# ===========================================================================
# Phase E — dedup
# ===========================================================================

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


DEDUP_EXACT_ORACLE = r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.2)


DEDUP_JACCARD_ORACLE = rf"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter
          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.2
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full minhash→band→bucket-join→verify pipeline (16 hashes, 4
    bands of 4 — LSH S-curve threshold ≈ 0.55)."""
    docs = _t(spark, sf_dir, "documents", spread=True)
    return dedup.minhash_dedup_pairs(docs, threshold=0.2, num_hashes=16, bands=4)


DEDUP_MINHASH_ORACLE = rf"""
WITH {_SHINGLE_CTE},
sigs0 AS (SELECT doc_id, {_MINHASH_AGGS} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {_SIG_LIST} AS sig FROM sigs0),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, 4)) AS b)),
cands AS (
  SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
  FROM banded a JOIN banded b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT id_a, id_b, count(*) inter
  FROM cands JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b AND a.shingle = b.shingle
  GROUP BY 1, 2)
SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.2
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the minhash-LSH near-dup pairs —
    iterative min-label propagation (distributed loop) vs the oracle's
    recursive transitive closure."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.2, num_hashes=16, bands=4)
    return dedup.duplicate_clusters(pairs)


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: docs with doc_id % 10 = 0 play the 'newly
    crawled batch', the rest the standing corpus — only new×corpus
    band collisions are verified (the corpus is never self-joined).

    Since r6 this DELEGATES to `dedup_incremental_indexed`
    (queries_r6.py): the corpus side is a PERSISTED LSH index
    (operators/lsh_index.py) built once per documents-file identity
    and never re-signed — the r5 sf1→sf10 ladder measured the old
    recompute-both-sides form at 10.78× on 10× data (171.98 s at
    sf10) purely from per-run corpus re-signing. Same pair semantics,
    same oracle; the single-pass `_within` recompute form survives as
    `dedup.minhash_dedup_pairs_within` for index-less one-shot use."""
    from kafkaconnect_spark.queries_r6 import dedup_incremental_indexed

    return dedup_incremental_indexed(spark, sf_dir)


DEDUP_INCR_ORACLE = rf"""
WITH {_SHINGLE_CTE},
sigs0 AS (SELECT doc_id, {_MINHASH_AGGS} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {_SIG_LIST} AS sig FROM sigs0),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, 4)) AS b)),
cands AS (
  SELECT DISTINCT a.doc_id id_new, b.doc_id id_corpus
  FROM banded a JOIN banded b USING (band, band_hash)
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0),
sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT id_new, id_corpus, count(*) inter
  FROM cands JOIN sh a ON a.doc_id = id_new JOIN sh b ON b.doc_id = id_corpus AND a.shingle = b.shingle
  GROUP BY 1, 2)
SELECT id_new, id_corpus, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_new JOIN sizes sb ON sb.doc_id = id_corpus
WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.2
"""


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same component labels via alternating large-star/small-star
    (O(log n) rounds — the extreme-scale variant); gated against the
    identical recursive-CTE oracle as dedup_clusters."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.2, num_hashes=16, bands=4)
    return dedup.duplicate_clusters_star(pairs)


DEDUP_CLUSTERS_ORACLE = rf"""
WITH RECURSIVE {_SHINGLE_CTE},
sigs0 AS (SELECT doc_id, {_MINHASH_AGGS} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {_SIG_LIST} AS sig FROM sigs0),
banded AS (
  SELECT doc_id, b AS band, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, 4)) AS b)),
cands AS (
  SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
  FROM banded a JOIN banded b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT id_a, id_b, count(*) inter
  FROM cands JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b AND a.shingle = b.shingle
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.2),
e AS (SELECT id_a AS a, id_b AS b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a AS n, a AS m FROM e
  UNION
  SELECT e.b, r.m FROM reach r JOIN e ON e.a = r.n)
SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents", spread=True)
    return dedup.simhash(docs, bits=32)


DEDUP_SIMHASH_ORACLE = rf"""
WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) tok FROM documents),
h AS (SELECT doc_id, ('0x'||substr(md5('simhash:'||tok),1,8))::BIGINT hv FROM t),
bs AS (SELECT doc_id, {_SIMHASH_BITSUMS} FROM h GROUP BY doc_id)
SELECT doc_id, ({_SIMHASH_VALUE}) AS simhash FROM bs
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucket-pruned (threshold tuned to
    the synthetic corpus where max cosine ≈ 0.46)."""
    emb = _t(spark, sf_dir, "embeddings", spread=True)
    return similarity.embedding_near_dup_pairs(emb, threshold=0.3, num_planes=4, dim=64)


# moved to query_base (r8) so per-round oracle builders can share it
from kafkaconnect_spark.query_base import _hyperplane_sql  # noqa: E402


DEDUP_EMB_ORACLE = f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] v,
                  {_hyperplane_sql('embedding', 4, 64)} AS bucket
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
"""


# ===========================================================================
# Phase E — similarity search
# ===========================================================================

def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 10 query vectors — the exact
    baseline every ANN variant is measured against."""
    emb = _t(spark, sf_dir, "embeddings", spread=True)
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.brute_force_topk(emb, q, k=10)


SIM_TOPK_ORACLE = """
WITH q AS (SELECT vec_id query_id, embedding::DOUBLE[] qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT query_id, e.vec_id neighbor_id,
         round(list_dot_product(qv, e.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) cosine
  FROM embeddings e, q WHERE e.vec_id != q.query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rank
           FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
"""


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-5: hyperplane signature equi-join + exact
    re-rank — the sub-linear scale path."""
    emb = _t(spark, sf_dir, "embeddings", spread=True)
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.lsh_ann_topk(emb, q, k=5, num_planes=4, dim=64)


SIM_ANN_ORACLE = f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] v,
                  {_hyperplane_sql('embedding', 4, 64)} AS bucket
           FROM embeddings),
q AS (SELECT vec_id query_id, v qv, bucket FROM c WHERE vec_id < 10),
scored AS (
  SELECT query_id, c.vec_id neighbor_id,
         round(list_dot_product(qv, c.v) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))), 6) cosine
  FROM c JOIN q USING (bucket) WHERE c.vec_id != q.query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rank
           FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5: deterministic centroids (lowest-id vectors),
    1-cell corpus assignment, 2-probe query search — the inverted-file
    scale path next to the hyperplane-LSH one."""
    emb = _t(spark, sf_dir, "embeddings", spread=True)
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivf_ann_topk(emb, q, k=5, n_cells=8, n_probe=2)


_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

SIM_IVF_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] vec FROM embeddings),
cents AS (SELECT vec_id AS cent_id, vec AS cent_vec FROM v ORDER BY vec_id LIMIT 8),
corpus_cells AS (
  SELECT vec_id, vec, cent_id AS cell FROM (
    SELECT v.vec_id, v.vec, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_COS.format(a='v.vec', b='c.cent_vec')} DESC, c.cent_id) rn
    FROM v CROSS JOIN cents c) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, vec AS qv FROM v WHERE vec_id < 10),
probes AS (
  SELECT query_id, qv, cent_id AS cell FROM (
    SELECT q.query_id, q.qv, c.cent_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_COS.format(a='q.qv', b='c.cent_vec')} DESC, c.cent_id) rn
    FROM q CROSS JOIN cents c) WHERE rn <= 2),
scored AS (
  SELECT query_id, vec_id AS neighbor_id, {_COS.format(a='qv', b='vec')} AS cosine
  FROM corpus_cells JOIN probes USING (cell)
  WHERE vec_id != query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (event_type → day → grand total) — the
    hypertable-rollup shape: one pass, partial aggs reused up the
    hierarchy by the ROLLUP operator."""
    ev = _events(spark, sf_dir)
    return (
        ev.rollup("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast(T.DecimalType(18, 2))).cast("double").alias("sum_value"),
        )
    )


ROLLUP_ORACLE = """
SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day,
       count(*) AS n_events,
       sum(round(value, 2)::DECIMAL(18,2))::DOUBLE AS sum_value
FROM events GROUP BY ROLLUP (event_type, day)
"""


# ===========================================================================
# Phase E — text analysis
# ===========================================================================

def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_token_count("text").alias("n_bpe_tokens"),
        F.length("text").alias("n_chars"),
    )


TEXT_TOKENS_ORACLE = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       length(text) AS n_chars
FROM documents
"""


def text_vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: corpus-wide token frequency, top 100. The
    groupBy key is the token itself (uniform hash — stopword skew is
    absorbed by map-side partial counts, which collapse each hot token
    to one row per task before the shuffle); the top-k is a
    TakeOrdered, not a global sort. (freq desc, token asc) is a total
    order, so the limit boundary is deterministic."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), TX.TOKEN_SPLIT_RE)).alias(
            "token"
        )
    )
    return (
        toks.where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(100)
    )


VOCAB_ORACLE = r"""
SELECT token, count(*) AS freq
FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents)
WHERE length(token) > 0
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 100
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        F.round(TX.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(TX.stopword_ratio("text"), 6).alias("stopword_ratio"),
        TX.quality_score("text").alias("quality"),
    )


TEXT_QUALITY_ORACLE = r"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE (length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g'))) * 1.0 / length(text) END AS praw,
         CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) = 0 THEN 0.0
              ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> list_contains(['the','and','of','to','a','in','is','it','you','that'], lower(t)))) * 1.0
                   / len(regexp_split_to_array(trim(text), '\s+')) END AS swraw
  FROM documents)
SELECT doc_id, round(praw, 6) AS punct_ratio, round(swraw, 6) AS stopword_ratio,
       round(0.4 * least(n_tok / 100.0, 1.0) + 0.3 * least(swraw * 5.0, 1.0)
             + 0.3 * (1.0 - least(praw * 4.0, 1.0)), 6) AS quality
FROM m
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents", spread=True)
    return docs.select("doc_id", TX.lang_id("text").alias("lang_pred"))


_LANGID_HITS = ", ".join(
    "len(list_filter(toks, t -> list_contains({words}, t))) AS hits_{code}".format(
        words="[" + ", ".join(f"'{w}'" for w in TX.LANG_STOPWORDS[code]) + "]",
        code=code,
    )
    for code in sorted(TX.LANG_STOPWORDS)
)

TEXT_LANGID_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\s+'), t -> lower(t)) AS toks
  FROM documents),
hits AS (SELECT doc_id, {_LANGID_HITS} FROM toks)
SELECT doc_id,
       CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) <= 0 THEN 'und'
            WHEN hits_de >= hits_en AND hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
            WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
            WHEN hits_es >= hits_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM hits
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 + rolling minhash fingerprints per document."""
    docs = _t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, num_hashes=4)
    fp = docs.select("doc_id", TX.fingerprint_md5("text").alias("fingerprint"))
    return fp.join(sigs, "doc_id").select(
        "doc_id", "fingerprint", F.col("sig")[0].alias("minhash0")
    )


TEXT_FP_ORACLE = rf"""
WITH {_SHINGLE_CTE},
mh AS (SELECT doc_id, min(('0x'||substr(md5('0:'||shingle),1,8))::BIGINT) AS minhash0
       FROM sh GROUP BY doc_id)
SELECT d.doc_id, md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')) AS fingerprint, mh.minhash0
FROM documents d JOIN mh ON d.doc_id = mh.doc_id
"""


# ===========================================================================
# Phase E — multimodal
# ===========================================================================

def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns + typed metadata (JVM-side: length/sha256);
    blobs here are deterministic fakes derived from text."""
    from kafkaconnect_spark.operators.multimodal import attach_media_meta, make_fake_media

    docs = _t(spark, sf_dir, "documents")
    media = make_fake_media(docs)
    return attach_media_meta(media).select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.sha256").alias("sha256"),
    )


MM_META_ORACLE = """
WITH a AS (SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7f]', '', 'g') AS text FROM documents)
SELECT doc_id, strlen(text)::BIGINT AS n_bytes, sha256(text) AS sha256 FROM a
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary blobs (decode step is
    a documented stub; Arrow plumbing is real). Mean intensity = mean
    byte value of the UTF-8 bytes; the corpus is ASCII, so the oracle
    replays it with per-char ord() — full value-hash gate, proving the
    Arrow round-trip is bit-faithful."""
    from kafkaconnect_spark.operators.multimodal import extract_image_features, make_fake_media

    docs = _t(spark, sf_dir, "documents")
    media = make_fake_media(docs)
    feats = extract_image_features(media)
    return feats.select("doc_id", F.round(F.col("mean_intensity"), 6).alias("mean_intensity"))


MM_FEATURES_ORACLE = """
WITH a AS (SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7f]', '', 'g') AS text FROM documents)
SELECT doc_id,
       CASE WHEN length(text) = 0 THEN NULL
            ELSE round(list_sum(list_transform(range(1, length(text) + 1),
                                i -> ord(text[i]))) / length(text), 6) END
       AS mean_intensity
FROM a
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per 64-byte chunk via
    mapInPandas; count per doc is oracle-checkable (ceil(bytes/64))."""
    from kafkaconnect_spark.operators.multimodal import frame_sample, make_fake_media

    docs = _t(spark, sf_dir, "documents")
    frames = frame_sample(make_fake_media(docs), every_n_bytes=64)
    return frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))


MM_FRAMES_ORACLE = """
WITH a AS (SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7f]', '', 'g') AS text FROM documents)
SELECT doc_id, CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS n_frames
FROM a WHERE strlen(text) > 0
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (binary→binary mapInPandas): output blob is
    exactly width×height bytes; sha of the result pins determinism."""
    from kafkaconnect_spark.operators.multimodal import make_fake_media, resize_image

    docs = _t(spark, sf_dir, "documents")
    resized = resize_image(make_fake_media(docs), width=32, height=32)
    return resized.select(
        "doc_id",
        F.length("media").alias("n_bytes"),
        F.lower(F.sha2("media", 256)).alias("sha256"),
        "width",
        "height",
    )


MM_RESIZE_ORACLE = """
WITH a AS (SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7f]', '', 'g') AS text FROM documents)
SELECT doc_id, 1024::INT AS n_bytes,
       sha256(rpad(substr(text, 1, 1024), 1024, chr(0))) AS sha256,
       32 AS width, 32 AS height
FROM a
"""


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the value-hash gate: each doc's text
    becomes a VALID binary P6 ppm (16-px rows, zero-padded —
    make_fake_ppm, JVM-side), the pure-numpy ppm decoder parses the
    header and pixel plane, and per-channel means come out as exact
    int/int divisions the oracle replays from the text bytes. Proves
    the decoder, the Arrow round-trip, and the header math — not just
    plumbing."""
    from kafkaconnect_spark.operators.multimodal import (
        decode_image_stats,
        make_fake_ppm,
    )

    docs = _t(spark, sf_dir, "documents", spread=True)
    return decode_image_stats(make_fake_ppm(docs))


MM_DECODE_ORACLE = r"""
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS t
           FROM documents),
d AS (SELECT doc_id, t, strlen(t) AS n,
             greatest(1, (strlen(t) + 47) // 48)::INT AS h
      FROM a),
s AS (SELECT doc_id, h,
             coalesce(list_sum([ascii(t[i]) FOR i IN range(1, n + 1)
                                IF (i - 1) % 3 = 0]), 0) AS s_r,
             coalesce(list_sum([ascii(t[i]) FOR i IN range(1, n + 1)
                                IF (i - 1) % 3 = 1]), 0) AS s_g,
             coalesce(list_sum([ascii(t[i]) FOR i IN range(1, n + 1)
                                IF (i - 1) % 3 = 2]), 0) AS s_b
      FROM d)
SELECT doc_id, 'ppm' AS format, 16 AS width, h AS height,
       s_r / (16.0 * h) AS mean_r,
       s_g / (16.0 * h) AS mean_g,
       s_b / (16.0 * h) AS mean_b
FROM s
"""


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL wav decode under the value-hash gate: each doc's text
    becomes a VALID PCM-16 mono RIFF/WAVE blob (samples = an affine
    map of the text bytes — make_fake_wav), the pure-numpy wav decoder
    walks the chunk list, and duration/peak/RMS come out as exact
    integer folds with one IEEE division the oracle replays from the
    text."""
    from kafkaconnect_spark.operators.multimodal import audio_stats, make_fake_wav

    docs = _t(spark, sf_dir, "documents", spread=True)
    return audio_stats(make_fake_wav(docs))


MM_AUDIO_ORACLE = r"""
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS t
           FROM documents),
d AS (SELECT doc_id, t, strlen(t) AS n FROM a),
s AS (SELECT doc_id,
             CASE WHEN n = 0 THEN [0]
                  ELSE [ascii(t[i]) * 256 - 16384
                        FOR i IN range(1, n + 1)] END AS sm
      FROM d)
SELECT doc_id, 8000 AS sample_rate, len(sm)::BIGINT AS n_frames,
       (len(sm) * 1000) / 8000.0 AS duration_ms,
       list_max(list_transform(sm, x -> abs(x)))::INT AS peak,
       sqrt(list_sum(list_transform(sm, x -> x * x)) / len(sm)) AS rms
FROM s
"""


def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling under the value-hash gate: each doc's
    text becomes a VALID minimal AVI of 4×4 24-bit DIB frames
    (make_fake_avi), the pure-numpy container parser walks the RIFF
    tree (hdrl→strf dims, movi→00db payloads, bottom-up BGR rows),
    and every 2nd frame's P6 sha256 comes out — replayable from the
    text bytes by the oracle."""
    from kafkaconnect_spark.operators.multimodal import (
        extract_video_frames,
        make_fake_avi,
    )

    docs = _t(spark, sf_dir, "documents", spread=True)
    return extract_video_frames(make_fake_avi(docs), every_n=2)


MM_VIDEO_ORACLE = r"""
WITH a AS (SELECT doc_id,
                  regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS t
           FROM documents),
d AS (SELECT doc_id, t,
             greatest(1, (strlen(t) + 47) // 48)::INT AS nf
      FROM a),
f AS (SELECT doc_id, t,
             unnest([i FOR i IN range(0, nf) IF i % 2 = 0]) AS i
      FROM d)
SELECT doc_id, i::INT AS frame_index, 4 AS width, 4 AS height,
       sha256('P6' || chr(10) || '4 4' || chr(10) || '255' || chr(10) ||
              rpad(substr(t, (i * 48 + 1)::INT, 48), 48, chr(0)))
         AS frame_sha256
FROM f
"""


# ===========================================================================
# Phase E — training-data pipeline ops (operators/pipeline.py)
# ===========================================================================

# DuckDB replay of functions.text.hash64 (same md5-hex-prefix bigint;
# 15 hex chars = 60 bits, the widest signed-bigint-safe prefix)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split (14/1/1 of 16 buckets) + per-split
    corpus stats. Membership is stable under corpus growth — appending
    docs never moves old docs between splits (unlike rand() splits)."""
    docs = pipeline.split_assign(_t(spark, sf_dir, "documents"), "doc_id")
    return docs.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum(TX.token_count("text")).alias("n_tokens"),
        F.sum("n_chars").alias("sum_chars"),
    )


SPLIT_ORACLE = rf"""
WITH d AS (SELECT *, {_hash64_sql('doc_id', 'split')} % 16 AS b FROM documents)
SELECT CASE WHEN b <= 13 THEN 'train' WHEN b = 14 THEN 'valid' ELSE 'test' END AS split,
       count(*) AS n_docs,
       sum({_NTOK_SQL})::BIGINT AS n_tokens,
       sum(n_chars)::BIGINT AS sum_chars
FROM d GROUP BY 1
"""


def sampling_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic 20% sample audit: hash-bucket
    sampling is uniform within every stratum, reproducible across
    runs/retries (rand() is neither)."""
    docs = pipeline.stratified_sample_flag(
        _t(spark, sf_dir, "documents"), "doc_id", num=2, den=10
    )
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("sampled").cast("long")).alias("n_sampled"),
    )


SAMPLE_ORACLE = rf"""
SELECT lang, count(*) AS n_total,
       sum(CASE WHEN {_hash64_sql('doc_id', 'sample')} % 10 < 2 THEN 1 ELSE 0 END)::BIGINT AS n_sampled
FROM documents GROUP BY lang
"""


def sampling_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-source sample (50 docs/source): hash-rank
    reservoir — deterministic, one keyed window."""
    return pipeline.reservoir_sample(
        _t(spark, sf_dir, "documents"), group_col="source", k=50
    )


RESERVOIR_ORACLE = rf"""
WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_hash64_sql('doc_id', 'reservoir')}, doc_id) AS sample_rank
  FROM documents)
SELECT source, doc_id, sample_rank FROM r WHERE sample_rank <= 50
"""


def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 64-token windows every 48 tokens
    (16-token overlap) — context-window packing prep. Chunk content is
    compared by md5 so the wire stays narrow."""
    return pipeline.chunk_documents(
        _t(spark, sf_dir, "documents"), window=64, stride=48
    )


CHUNK_ORACLE = r"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks
           FROM documents WHERE length(trim(text)) > 0),
c AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start FROM t)
SELECT doc_id, (start // 48)::INT AS chunk_idx,
       len(toks[start+1 : start+64])::INT AS n_chunk_tokens,
       md5(array_to_string(toks[start+1 : start+64], ' ')) AS chunk_hash
FROM c
"""


def decontaminate_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test 8-gram decontamination report: distinct-shingle
    overlap of each test doc against the whole train split, joined on
    64-bit shingle hashes (narrow shuffle, pre-distinct'd build side)."""
    docs = pipeline.split_assign(_t(spark, sf_dir, "documents"), "doc_id")
    train = docs.where(F.col("split") == "train")
    test = docs.where(F.col("split") == "test")
    return pipeline.ngram_contamination(train, test, n=8)


_SHINGLE8 = (
    "[" + _hash64_sql("array_to_string(toks[i:i+7], ' ')", "contam")
    + " FOR i IN range(1, greatest(len(toks)-6, 1))]"
)

DECONTAM_ORACLE = rf"""
WITH d AS (SELECT doc_id, {_hash64_sql('doc_id', 'split')} % 16 AS b,
                  regexp_split_to_array(trim(text), '\s+') toks
           FROM documents),
tr AS (SELECT DISTINCT h FROM
        (SELECT unnest({_SHINGLE8}) AS h FROM d WHERE b <= 13 AND len(toks) >= 8)),
te AS (SELECT doc_id, unnest(list_distinct({_SHINGLE8})) AS h
       FROM d WHERE b = 15 AND len(toks) >= 8)
SELECT te.doc_id, count(*) AS n_shingles, count(tr.h) AS n_contaminated,
       round(count(tr.h) / count(*), 6) AS contamination
FROM te LEFT JOIN tr ON te.h = tr.h
GROUP BY te.doc_id
"""


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over synthesized contact lines (the corpus itself is
    clean, so each doc gets a deterministic email+phone appended, then
    redacted): regex is RE2-compatible so the oracle replays it."""
    docs = _t(spark, sf_dir, "documents")
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    emails, phones = pipeline.pii_counts(full)
    return docs.select(
        "doc_id",
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        F.md5(pipeline.redact_pii(full)).alias("redacted_hash"),
    )


_PII_FULL = ("text || ' contact user' || doc_id || '@mail.example.com or call +1-555-' "
             "|| lpad((doc_id % 10000)::VARCHAR, 4, '0')")
_EMAIL_SQL = r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'"
_PHONE_SQL = r"'\+?[0-9][0-9-]{5,}[0-9]'"

PII_ORACLE = rf"""
WITH s AS (SELECT doc_id, {_PII_FULL} AS full_text FROM documents)
SELECT doc_id,
       len(regexp_extract_all(full_text, {_EMAIL_SQL}))::INT AS n_emails,
       len(regexp_extract_all(regexp_replace(full_text, {_EMAIL_SQL}, '[EMAIL]', 'g'),
                              {_PHONE_SQL}))::INT AS n_phones,
       md5(regexp_replace(regexp_replace(full_text, {_EMAIL_SQL}, '[EMAIL]', 'g'),
                          {_PHONE_SQL}, '[PHONE]', 'g')) AS redacted_hash
FROM s
"""


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (long form): decimal-exact
    per-dim means — identical at any parallelism. The reduce output is
    |labels|×64 rows however large the input is."""
    return pipeline.embedding_centroids(_t(spark, sf_dir, "embeddings"))


CENTROID_ORACLE = """
WITH e AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
                  unnest(embedding::DOUBLE[]) AS v
           FROM embeddings)
SELECT label, dim,
       round(sum(round(v, 7)::DECIMAL(20,7))::DOUBLE / count(*), 6) AS centroid,
       count(*) AS n_vectors
FROM e GROUP BY label, dim
"""


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization (scale = max|v|/127)
    with reconstruction-error report — narrow per-row folds, no
    shuffle."""
    return pipeline.quantize_int8(_t(spark, sf_dir, "embeddings", spread=True))


QUANT_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
           WHERE len(embedding) > 0),
s AS (SELECT vec_id, vec,
             greatest(list_max(list_transform(vec, x -> abs(x))), 1e-12) / 127.0 AS scale
      FROM v),
e AS (SELECT vec_id, scale, unnest(vec) AS x FROM s),
q AS (SELECT vec_id, scale, x, round(x / scale, 0)::INT AS qv FROM e)
SELECT vec_id, round(scale, 6) AS scale, count(*)::INT AS n_dims,
       min(qv) AS q_min, max(qv) AS q_max,
       sum(round(abs(x - qv * scale), 7)::DECIMAL(20,7))::DOUBLE / count(*) AS recon_mae
FROM q GROUP BY vec_id, scale
"""


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64→16-dim Johnson–Lindenstrauss projection with a deterministic
    md5-derived ±1 matrix folded into the row expression (no join, no
    shuffle)."""
    return pipeline.random_projection(
        _t(spark, sf_dir, "embeddings", spread=True), out_dims=16, dim=64
    )


RPROJ_ORACLE = """
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                  round(unnest(embedding::DOUBLE[]), 7)::DECIMAL(20,7) AS v
           FROM embeddings WHERE len(embedding) = 64),
j AS (SELECT unnest(range(0, 16)) AS out_dim),
s AS (SELECT vec_id, out_dim,
             sum(v * (CASE WHEN ('0x' || substr(md5(out_dim::VARCHAR || ':' || i::VARCHAR), 1, 8))::BIGINT % 2 = 0
                           THEN 1 ELSE -1 END)) AS acc
      FROM e, j GROUP BY 1, 2)
SELECT vec_id, out_dim::INT AS out_dim, acc::DOUBLE / 4.0 AS value FROM s
"""


def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc token-distribution Shannon entropy (+ length-
    normalized form) — repetition/boilerplate detector; narrow per-row
    fold at scan speed."""
    return pipeline.token_entropy(_t(spark, sf_dir, "documents"))


TOKEN_ENTROPY_ORACLE = r"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM d WHERE length(trim(text)) > 0),
c AS (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id, tok),
tot AS (SELECT doc_id, sum(n)::BIGINT AS n_tokens, count(*)::INT AS n_distinct
        FROM c GROUP BY doc_id),
e AS (SELECT c.doc_id,
             sum(round(-(c.n / tot.n_tokens::DOUBLE) * log2(c.n / tot.n_tokens::DOUBLE), 7)::DECIMAL(20,7)) AS ent
      FROM c JOIN tot ON c.doc_id = tot.doc_id GROUP BY c.doc_id)
SELECT tot.doc_id, tot.n_tokens, tot.n_distinct,
       ent::DOUBLE AS entropy,
       CASE WHEN tot.n_distinct > 1 THEN round(ent::DOUBLE / log2(tot.n_distinct), 6)
            ELSE 0.0 END AS norm_entropy
FROM tot JOIN e ON tot.doc_id = e.doc_id
UNION ALL
SELECT doc_id, 0, 0, 0.0, 0.0 FROM d WHERE length(trim(text)) = 0
"""


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut packing into 2048-token bins per language
    stream — per-bin doc counts and fill ratios."""
    return pipeline.pack_sequences(_t(spark, sf_dir, "documents"), budget=2048)


PACK_ORACLE = rf"""
WITH r AS (SELECT lang, doc_id, {_NTOK_SQL} AS n_tok FROM documents),
b AS (SELECT lang,
             ((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) - n_tok) // 2048)::BIGINT AS bin_id,
             n_tok
      FROM r)
SELECT lang, bin_id, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
       round(sum(n_tok) / 2048.0, 6) AS fill_ratio
FROM b GROUP BY lang, bin_id
"""


def quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel report (single scan, one row): how many docs
    survive each stage of a lang → quality → length → exact-dedup
    pipeline. At 100 TB this is the daily data-health dashboard query:
    conditional aggregates, no per-stage rescans."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = TX.token_count("text")
    lang_ok = F.col("lang").isin("en", "de", "es", "fr")
    quality_ok = lang_ok & (TX.quality_score("text") >= 0.5)
    len_ok = quality_ok & n_tok.between(20, 2000)
    fp = TX.fingerprint_md5("text")
    return docs.agg(
        F.count("*").alias("n_total"),
        F.sum(lang_ok.cast("long")).alias("n_lang_ok"),
        F.sum(quality_ok.cast("long")).alias("n_quality_ok"),
        F.sum(len_ok.cast("long")).alias("n_len_ok"),
        F.count_distinct(F.when(len_ok, fp)).alias("n_unique"),
    )


QUALITY_FUNNEL_ORACLE = r"""
WITH m AS (
  SELECT doc_id, lang, text,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE (length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g'))) * 1.0 / length(text) END AS praw,
         CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) = 0 THEN 0.0
              ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   t -> list_contains(['the','and','of','to','a','in','is','it','you','that'], lower(t)))) * 1.0
                   / len(regexp_split_to_array(trim(text), '\s+')) END AS swraw
  FROM documents),
f AS (
  SELECT *,
         lang IN ('en','de','es','fr') AS lang_ok,
         lang IN ('en','de','es','fr')
           AND round(0.4 * least(n_tok / 100.0, 1.0) + 0.3 * least(swraw * 5.0, 1.0)
                     + 0.3 * (1.0 - least(praw * 4.0, 1.0)), 6) >= 0.5 AS quality_ok
  FROM m),
g AS (SELECT *, quality_ok AND n_tok BETWEEN 20 AND 2000 AS len_ok FROM f)
SELECT count(*) AS n_total,
       sum(CASE WHEN lang_ok THEN 1 ELSE 0 END)::BIGINT AS n_lang_ok,
       sum(CASE WHEN quality_ok THEN 1 ELSE 0 END)::BIGINT AS n_quality_ok,
       sum(CASE WHEN len_ok THEN 1 ELSE 0 END)::BIGINT AS n_len_ok,
       count(DISTINCT CASE WHEN len_ok
             THEN md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) END) AS n_unique
FROM g
"""


def events_dedup_redelivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.windows.dedup_within_watermark: an
    at-least-once source re-delivers a slice of the stream; exact
    dedup by event key restores effectively-once. (The streaming path
    is dropDuplicatesWithinWatermark — test_streaming_windows.py.)"""
    from kafkaconnect_spark.streaming.windows import dedup_within_watermark

    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type")
    redelivered = ev.unionAll(ev.where(F.col("event_id") % 7 == 0))
    return dedup_within_watermark(redelivered, keys=["event_id"])


DEDUP_REDELIVERY_ORACLE = """
WITH redelivered AS (
  SELECT event_id, user_id, event_type FROM events
  UNION ALL
  SELECT event_id, user_id, event_type FROM events WHERE event_id % 7 = 0)
SELECT DISTINCT event_id, user_id, event_type FROM redelivered
"""


def events_enrich_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.windows.enrich_with_dimension: fact
    stream left-joined to a broadcast customer dimension, rolled up by
    segment (null segment = unmatched users kept, not dropped)."""
    from kafkaconnect_spark.streaming.windows import enrich_with_dimension

    ev = _events(spark, sf_dir)
    dim = _t(spark, sf_dir, "customer")
    return (
        enrich_with_dimension(ev, dim, dim_cols=["c_mktsegment"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


ENRICH_ORACLE = """
SELECT c_mktsegment, count(*) AS n_events
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history from the events-as-CDC stream (op mapping
    per _OP_EXPR): every non-delete change becomes a version with
    [valid_from, valid_to) and a current flag; deletes close the last
    interval. One keyed window — operators/scd.py."""
    from kafkaconnect_spark.operators.scd import scd2_history

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("key"),
        "ts",
        F.col("event_id").alias("change_id"),
        F.expr(_OP_EXPR).alias("op"),
        F.round("value", 4).alias("value"),
    )
    return scd2_history(ev)


SCD2_ORACLE = """
WITH ch AS (
  SELECT user_id AS key, ts::TIMESTAMP AS ts, event_id AS change_id,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
         round(value, 4) AS value
  FROM events),
v AS (
  SELECT *, ts AS valid_from,
         lead(ts) OVER (PARTITION BY key ORDER BY ts, change_id) AS valid_to
  FROM ch)
SELECT key, ts, change_id, value, valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM v WHERE op != 'd'
"""


def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted per week-offset of later activity. Two aggregations + one
    broadcastable join on user — the canonical product-analytics
    shape; all-integer arithmetic so the hash gate is exact."""
    ev = _events(spark, sf_dir)
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the labeled lang
    column vs the stopword-vote prediction — the eval loop a pipeline
    runs on any heuristic classifier. One tiny aggregation over the
    narrow per-row predictor."""
    docs = _t(spark, sf_dir, "documents", spread=True)
    return (
        docs.select("lang", TX.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


LANGID_CONFUSION_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         list_transform(regexp_split_to_array(trim(text), '\s+'), t -> lower(t)) AS toks
  FROM documents),
hits AS (SELECT doc_id, lang, {_LANGID_HITS} FROM toks),
pred AS (
  SELECT lang,
         CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) <= 0 THEN 'und'
              WHEN hits_de >= hits_en AND hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
              WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
              WHEN hits_es >= hits_fr THEN 'es'
              ELSE 'fr' END AS lang_pred
  FROM hits)
SELECT lang, lang_pred, count(*) AS n_docs FROM pred GROUP BY 1, 2
"""


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): per user, each stage
    counts only if it happens strictly after the previous stage's
    first occurrence. One conditional aggregation per user computes
    all stage times in a single shuffle (no per-stage self-joins),
    then a tiny unpivoted count. The standard product-analytics
    funnel, exact-arithmetic oracle."""
    ev = _events(spark, sf_dir)
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    per_user = ev.groupBy("user_id").agg(
        t1.alias("t_view"),
        F.collect_list(
            F.when(F.col("event_type").isin("click", "purchase"),
                   F.struct("ts", "event_type"))
        ).alias("__later"),
    )
    # first click after t_view; first purchase after that click
    t_click = F.expr(
        "array_min(transform(filter(__later, x -> x.event_type = 'click' AND x.ts > t_view), x -> x.ts))"
    )
    t_purchase = F.expr(
        "array_min(transform(filter(__later, x -> x.event_type = 'purchase' AND x.ts > t_click), x -> x.ts))"
    )
    stages = (
        per_user.withColumn("t_click", t_click)
        .withColumn("t_purchase", t_purchase)
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )


FUNNEL_ORACLE = """
WITH per AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY 1),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN per USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > per.t_view
  GROUP BY 1),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY 1)
SELECT count(*) AS n_users,
       count(t_view) AS n_view,
       count(t_click) AS n_click,
       count(t_purchase) AS n_purchase
FROM per LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


RETENTION_ORACLE = """
WITH weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week FROM events),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY 1)
SELECT cohort_week, (date_diff('day', cohort_week, week) // 7)::INT AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM weeks JOIN cohort USING (user_id)
GROUP BY 1, 2
"""


def text_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf·(N/df) salient terms per doc — keyword extraction
    (operators/pipeline.salient_terms). Integer-ratio weights keep
    the value hash engine-exact (no log-idf ulp drift)."""
    return pipeline.salient_terms(_t(spark, sf_dir, "documents"), k=3)


SALIENT_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents WHERE text IS NOT NULL),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
       FROM toks WHERE token != '' GROUP BY 1, 2),
dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM documents WHERE text IS NOT NULL),
ranked AS (
  SELECT doc_id, token, tf, df, tf * (n_docs / df) AS weight,
         row_number() OVER (PARTITION BY doc_id ORDER BY tf * (n_docs / df) DESC, token ASC)::INT AS rank
  FROM tf JOIN dfreq USING (token) CROSS JOIN nd)
SELECT doc_id, token, tf, df, weight, rank FROM ranked WHERE rank <= 3
"""


def events_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a K-Minimum-Values sketch
    (operators/sketches.kmv_cardinality_sketch): O(k) state per
    (group, partition), exchange bounded at k rows per partition.
    Unlike HLL++/percentile_approx (group_cardinality_sketch /
    group_quantile_sketch — the built-in production variants, error-
    bound-tested in tests/test_sketches.py), KMV over the shared md5
    hash64 is engine-deterministic, so this sketch carries a full
    value-hash oracle."""
    from kafkaconnect_spark.operators import sketches

    ev = _events(spark, sf_dir)
    return sketches.kmv_cardinality_sketch(ev, "event_type", "user_id", k=256)


CARDINALITY_KMV_ORACLE = f"""
WITH h AS (SELECT DISTINCT event_type,
                  {_hash64_sql('user_id', 'kmv')} AS h FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h),
s AS (SELECT event_type, count(*) AS n_seen, max(h) AS kth
      FROM r WHERE rn <= 256 GROUP BY 1),
n AS (SELECT event_type, count(*) AS n_rows FROM events GROUP BY 1)
SELECT n.event_type, n.n_rows,
       coalesce(CASE WHEN s.n_seen < 256 THEN s.n_seen
                     ELSE round(255.0::DOUBLE * 1152921504606846976.0::DOUBLE
                                / s.kth)::BIGINT END,
                0)::BIGINT AS kmv_distinct
FROM n LEFT JOIN s USING (event_type)
"""


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality rules — fully narrow per-row
    folds (operators/pipeline.gopher_repetition_stats)."""
    stats = pipeline.gopher_repetition_stats(_t(spark, sf_dir, "documents"))
    return stats.withColumn("keep", F.col("keep").cast("int"))


GOPHER_ORACLE = r"""
WITH t AS (
  SELECT doc_id, COALESCE(text, '') AS text,
         CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(COALESCE(text, '')), '\s+') END AS toks,
         str_split(COALESCE(text, ''), chr(10)) AS lines
  FROM documents),
g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram
      FROM t, unnest(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2),
gm AS (SELECT doc_id, max(cnt) AS best, sum(cnt) AS ngrams
       FROM (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
       GROUP BY 1),
s AS (
  SELECT t.doc_id,
         len(toks)::INT AS word_count,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE list_sum(list_transform(toks, x -> length(x))) / len(toks) END AS mean_word_len,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE ((length(text) - length(replace(text, '#', '')))
                    + (length(text) - length(replace(text, '...', ''))) / 3) / len(toks) END
              AS symbol_word_ratio,
         1.0 - len(list_distinct(lines)) / len(lines) AS dup_line_frac,
         COALESCE(gm.best / gm.ngrams, 0.0) AS top_2gram_frac
  FROM t LEFT JOIN gm USING (doc_id))
SELECT *,
       CASE WHEN word_count >= 5 AND word_count <= 100000
                 AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
                 AND symbol_word_ratio < 0.1 AND dup_line_frac < 0.3
                 AND top_2gram_frac < 0.2 THEN 1 ELSE 0 END AS keep
FROM s
"""


def sampling_balance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture balancing: every source hash-downsampled to the
    smallest source's size in expectation (integer-exact thresholds,
    md5 membership — operators/pipeline.balance_sources)."""
    return pipeline.balance_sources(_t(spark, sf_dir, "documents"))


BALANCE_ORACLE = rf"""
WITH c AS (SELECT source, count(*) AS c FROM documents GROUP BY 1),
r AS (SELECT source, (min(c) OVER ()) * 1000000 // c AS thr FROM c)
SELECT d.doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE {_hash64_sql('doc_id', 'mix')} % 1000000 < thr
"""


def docs_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 64 training shards with
    within-shard positions (operators/pipeline.shard_assignment)."""
    return pipeline.shard_assignment(_t(spark, sf_dir, "documents"), shards=64)


SHARD_ORACLE = rf"""
WITH h AS (SELECT doc_id, {_hash64_sql('doc_id', 'shard')} AS h FROM documents)
SELECT doc_id, h % 64 AS shard_id,
       row_number() OVER (PARTITION BY h % 64 ORDER BY h, doc_id)::INT AS pos
FROM h
"""


def dedup_span_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-granular exact-substring dedup: per-doc fraction of
    20-token windows occurring in ≥2 docs corpus-wide
    (operators/dedup.span_dup_stats)."""
    return dedup.span_dup_stats(_t(spark, sf_dir, "documents"), k=20)


SPAN_DUP_ORACLE = r"""
WITH spans AS (
  SELECT doc_id, unnest(list_distinct([md5(array_to_string(toks[i:i+19], ' '))
      FOR i IN range(1, len(toks) - 18)])) AS span
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks FROM documents)
  WHERE len(toks) >= 20),
dup AS (SELECT span FROM spans GROUP BY span HAVING count(*) >= 2),
totals AS (SELECT doc_id, count(*) n_spans FROM spans GROUP BY doc_id),
dups AS (SELECT doc_id, count(*) n_dup FROM spans JOIN dup USING (span) GROUP BY doc_id)
SELECT t.doc_id, t.n_spans,
       coalesce(d.n_dup, 0) AS n_dup_spans,
       coalesce(d.n_dup, 0) / t.n_spans AS dup_frac
FROM totals t LEFT JOIN dups d USING (doc_id)
"""


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment |A∩B|/|A| ≥ 0.4 over ordered
    pairs — catches short-doc-quoted-in-long-doc near-dups Jaccard
    dilutes (operators/dedup.containment_pairs)."""
    return dedup.containment_pairs(_t(spark, sf_dir, "documents"), threshold=0.4)


CONTAINMENT_ORACLE = rf"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter
          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id != b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b, round(inter / sa.sz, 6) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = id_a
WHERE round(inter / sa.sz, 6) >= 0.4
"""


def similarity_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: deterministic clustering + within-cell cosine ≥ 0.3
    prunes the higher id (operators/similarity.semdedup_prune).

    n_cells scales with the corpus — max(8, n/250) — so per-cell
    pairwise work stays O(n · cell_size), not O(n²/k_fixed): the r5
    sf0.1→sf1 ladder caught the hardcoded 8-cell version going 16×
    on 10× vectors (time superlinear, shuffle linear — the quadratic
    was all in-cell compare work). The count() is one control-plane
    scalar; the oracle replays the same formula via a scalar-subquery
    LIMIT. At the gate scales (≤2k vectors) the formula still yields
    8, so history stays comparable."""
    emb = _t(spark, sf_dir, "embeddings", spread=True)
    n_cells = max(8, emb.count() // 250)
    return similarity.semdedup_prune(emb, threshold=0.3, n_cells=n_cells)


SEMDEDUP_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] vec FROM embeddings),
cents AS (SELECT vec_id AS cent_id, vec AS cent_vec FROM v ORDER BY vec_id
          LIMIT (SELECT greatest(8, count(*) // 250) FROM v)),
cells AS (
  SELECT vec_id, vec, cent_id AS cell FROM (
    SELECT v.vec_id, v.vec, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_COS.format(a='v.vec', b='c.cent_vec')} DESC, c.cent_id) rn
    FROM v CROSS JOIN cents c) WHERE rn = 1),
pruned AS (
  SELECT DISTINCT b.vec_id FROM cells a JOIN cells b USING (cell)
  WHERE a.vec_id < b.vec_id
    AND {_COS.format(a='a.vec', b='b.vec')} >= 0.3)
SELECT c.vec_id, c.cell, (p.vec_id IS NOT NULL) AS pruned
FROM cells c LEFT JOIN pruned p ON c.vec_id = p.vec_id
"""


def sampling_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) source-mixture weights — the
    multilingual sampling rule (operators/pipeline.temperature_weights)."""
    return pipeline.temperature_weights(_t(spark, sf_dir, "documents"), alpha=0.5)


TEMPERATURE_ORACLE = """
WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
w AS (SELECT source, n_docs,
             CAST(round(pow(n_docs, 0.5), 7) AS DECIMAL(20,7)) AS w7 FROM c),
d AS (SELECT SUM(w7) AS dw, SUM(n_docs) AS total FROM w)
SELECT source, n_docs,
       round(CAST(w7 AS DOUBLE) / CAST(dw AS DOUBLE), 6) AS weight,
       round(CAST(w7 AS DOUBLE) / CAST(dw AS DOUBLE) * CAST(total AS DOUBLE), 4)
         AS expected_docs
FROM w CROSS JOIN d
"""


def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE: learn 10 merges from the corpus (iterative
    vocab-table rounds — operators/bpe.learn_bpe_merges), then segment
    every doc with the learned table (narrow constant-folded merge
    chain). The fixed round count makes the training mechanically
    unrollable, so the oracle replays all 10 (count → argmax → merge)
    rounds in SQL (_bpe_oracle); exactness is additionally pinned
    against a pure-Python reference in tests/test_bpe.py."""
    from kafkaconnect_spark.operators.bpe import apply_bpe, learn_bpe_merges

    docs = _t(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, num_merges=10)
    return apply_bpe(docs, merges)


def _bpe_oracle(num_merges: int) -> str:
    """Unrolled DuckDB replay of operators/bpe: each of the fixed
    merge rounds is (pair-count → argmax → greedy merge) over the
    word-frequency table, then the learned merges apply to every doc.

    The greedy left-to-right merge fold is replayed as a string
    replace over a boundary-safe encoding: each symbol wrapped in
    single spaces (' s1  s2 ... sn '), adjacency = double space.
    Symbols come from whitespace-split words so they contain no
    spaces; a match of ' a  b ' therefore aligns exactly with an
    adjacent symbol pair, and non-overlapping left-to-right
    replacement (scan resumes after the replaced input, replaced
    output never re-matched) is precisely the engine's fold
    semantics (operators/bpe._MERGE_FOLD)."""
    eow = "▁"
    # wrapped-string round trip helpers
    wrap = "' ' || array_to_string(syms, '  ') || ' '"
    pat = "' ' || replace(b.pair, ' ', '  ') || ' '"
    rep = "' ' || replace(b.pair, ' ', '') || ' '"
    sql = rf"""
WITH w AS (
  SELECT word, count(*) AS cnt FROM (
    SELECT unnest(list_filter(
        regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
        x -> length(x) > 0)) AS word
    FROM documents)
  GROUP BY word),
s0 AS (SELECT cnt, list_append([word[i] FOR i IN range(1, length(word) + 1)],
                               '{eow}') AS syms
       FROM w)"""
    for t in range(num_merges):
        sql += f""",
p{t} AS (SELECT cnt, unnest([syms[i] || ' ' || syms[i + 1]
                            FOR i IN range(1, len(syms))]) AS pair
         FROM s{t} WHERE len(syms) >= 2),
f{t} AS (SELECT pair, sum(cnt)::BIGINT AS freq FROM p{t} GROUP BY pair),
b{t} AS (SELECT pair FROM f{t} ORDER BY freq DESC, pair ASC LIMIT 1),
s{t + 1} AS (SELECT cnt,
    str_split(trim(replace({wrap}, {pat}, {rep})), '  ') AS syms
  FROM s{t} CROSS JOIN b{t} b)"""
    # apply the learned merges to every document, word by word
    sql += rf""",
tk AS (SELECT doc_id, list_filter(
           regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
           x -> length(x) > 0) AS words
       FROM documents),
d0 AS (SELECT doc_id, list_transform(words,
           w -> ' ' || array_to_string(
                    list_append([w[i] FOR i IN range(1, length(w) + 1)],
                                '{eow}'), '  ') || ' ') AS wstrs
       FROM tk)"""
    for t in range(num_merges):
        sql += f""",
d{t + 1} AS (SELECT doc_id, list_transform(wstrs,
        s -> replace(s, ' ' || replace(b.pair, ' ', '  ') || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ')) AS wstrs
    FROM d{t} CROSS JOIN b{t} b)"""
    return sql + f"""
SELECT doc_id, len(wstrs)::INT AS n_words,
       coalesce(list_sum(list_transform(wstrs,
                s -> len(str_split(trim(s), '  ')))), 0)::INT AS n_tokens
FROM d{num_merges}
"""


BPE_TOKENIZE_ORACLE = _bpe_oracle(10)


def text_bigram_lm_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-family quality score: bits-per-bigram under the
    corpus's own add-one-smoothed bigram LM
    (operators/pipeline.bigram_lm_score)."""
    return pipeline.bigram_lm_score(_t(spark, sf_dir, "documents"))


BIGRAM_LM_ORACLE = r"""
WITH d AS (SELECT doc_id, trim(lower(coalesce(text, ''))) AS t FROM documents),
tk AS (SELECT doc_id, regexp_split_to_array(t, '\s+') AS toks
       FROM d WHERE length(t) > 0),
p2 AS (SELECT doc_id, g.a AS a, g.b AS b FROM (
         SELECT doc_id,
                unnest([{'a': toks[i], 'b': toks[i + 1]}
                        FOR i IN range(1, len(toks))]) AS g
         FROM tk WHERE len(toks) >= 2)),
bc AS (SELECT a, b, count(*) AS bcount FROM p2 GROUP BY a, b),
uc AS (SELECT a, sum(bcount) AS ucount FROM bc GROUP BY a),
v AS (SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(toks) AS tok FROM tk)),
terms AS (SELECT p2.doc_id,
                 round(log2((bc.bcount + 1) / (uc.ucount + v.v)::DOUBLE),
                       7)::DECIMAL(20,7) AS term
          FROM p2 JOIN bc USING (a, b) JOIN uc USING (a) CROSS JOIN v),
sc AS (SELECT doc_id, count(*) AS n_bigrams, sum(term) AS s
       FROM terms GROUP BY doc_id)
SELECT doc_id, n_bigrams, -(s::DOUBLE) / n_bigrams AS bits_per_bigram
FROM sc
UNION ALL
SELECT doc_id, 0, 0.0 FROM d
WHERE len(regexp_split_to_array(t, '\s+')) < 2 OR length(t) = 0
"""


def docs_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-100 word 2-grams — n-gram LM counting
    (operators/pipeline.bigram_topk): narrow per-row bigram arrays,
    map-side-combined count, TakeOrdered top-k."""
    return pipeline.bigram_topk(_t(spark, sf_dir, "documents"), k=100)


BIGRAM_ORACLE = r"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS t
  FROM documents),
grams AS (
  SELECT unnest([t[i] || ' ' || t[i + 1] FOR i IN range(1, len(t))]) AS bigram
  FROM toks WHERE len(t) >= 2)
SELECT bigram, count(*) AS freq
FROM grams
GROUP BY bigram
ORDER BY freq DESC, bigram ASC
LIMIT 100
"""


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding sanity screen: Tukey-fence L2-norm outlier flags from
    exact quartiles (operators/pipeline.norm_outliers)."""
    return pipeline.norm_outliers(_t(spark, sf_dir, "embeddings", spread=True))


NORM_OUTLIER_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
           WHERE len(embedding) > 0),
n AS (SELECT vec_id, round(sqrt(list_dot_product(vec, vec)), 6) AS norm FROM v),
u AS (SELECT vec_id, norm, round(norm * 1000000.0)::BIGINT AS nu FROM n),
p AS (SELECT quantile_cont(nu, 0.25) AS plo, quantile_cont(nu, 0.75) AS phi
      FROM u),
f AS (SELECT plo - 1.5 * (phi - plo) AS lo, phi + 1.5 * (phi - plo) AS hi FROM p)
SELECT vec_id, norm,
       lo / 1000000.0 AS fence_lo, hi / 1000000.0 AS fence_hi,
       (nu < lo OR nu > hi) AS is_outlier
FROM u CROSS JOIN f
"""


def events_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per hourly window — the continuous
    heavy-hitters shape. The rank window partitions BY WINDOW (keyed —
    never global), so at scale each hour ranks independently; counts
    reduce map-side first."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        F.col("event_type"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("window_start", "event_type", "n_events", "rank")
    )


WINDOWED_TOPK_ORACLE = """
WITH c AS (SELECT date_trunc('hour', ts) AS window_start, event_type,
                  count(*) AS n_events
           FROM events GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY n_events DESC, event_type ASC) AS rank
      FROM c)
SELECT window_start, event_type, n_events, rank FROM r WHERE rank <= 3
"""


def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order volume and revenue growth — the lag
    window runs over the MONTH-AGGREGATED frame (tens of rows), never
    the fact table; growth is an int/int and decimal/decimal division
    emitted unrounded (bit-identical; rounding rational quotients is
    the engine-divergent trap)."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice"), 2).cast(T.DecimalType(18, 2)))
        .cast("double")
        .alias("revenue"),
    )
    w = Window.orderBy("month")
    return (
        m.withColumn("__pn", F.lag("n_orders").over(w))
        .withColumn("__pr", F.lag("revenue").over(w))
        .select(
            "month",
            "n_orders",
            "revenue",
            (
                (F.col("n_orders") - F.col("__pn")) / F.col("__pn")
            ).alias("orders_growth"),
            ((F.col("revenue") - F.col("__pr")) / F.col("__pr")).alias(
                "revenue_growth"
            ),
        )
    )


MONTHLY_GROWTH_ORACLE = """
WITH m AS (SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
                  count(*) AS n_orders,
                  sum(round(o_totalprice, 2)::DECIMAL(18,2))::DOUBLE AS revenue
           FROM orders GROUP BY 1),
l AS (SELECT *, lag(n_orders) OVER (ORDER BY month) AS pn,
             lag(revenue) OVER (ORDER BY month) AS pr
      FROM m)
SELECT month, n_orders, revenue,
       (n_orders - pn) / pn AS orders_growth,
       (revenue - pr) / pr AS revenue_growth
FROM l
"""


def lineitem_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency histogram: days between order date and
    line ship date, fixed 30-day bins — the binning/profiling shape.
    The fact-fact join is keyed on the order key; the histogram
    reduces map-side to a handful of bins."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.floor(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
                / 30
            ).alias("latency_bin_30d")
        )
        .groupBy("latency_bin_30d")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


LATENCY_HIST_ORACLE = """
SELECT floor(date_diff('day', o_orderdate::DATE, l_shipdate::DATE) / 30)::BIGINT
         AS latency_bin_30d,
       count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def orders_diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the validation pass a CDC MERGE pipeline runs
    between table versions: FULL OUTER join on the key, classifying
    rows added / removed / changed / unchanged. v2 is derived
    deterministically in-query (every 97th key deleted, every 101st
    repriced) so the diff is self-contained and oracle-replayable.
    Scale shape: one keyed full-outer join (both sides co-partition on
    the key), classification is a narrow expression; output is the
    per-class count summary, not the row-level diff."""
    v1 = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    v2 = v1.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 101 == 0, F.round(F.col("price") + 10.0, 2)
        ).otherwise(F.col("price")).alias("price"),
    )
    j = v1.select(F.col("o_orderkey"), F.col("price").alias("p1")).join(
        v2.select(F.col("o_orderkey"), F.col("price").alias("p2")),
        "o_orderkey",
        "full_outer",
    )
    cls = (
        F.when(F.col("p1").isNull(), F.lit("added"))
        .when(F.col("p2").isNull(), F.lit("removed"))
        .when(F.col("p1") != F.col("p2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(cls.alias("diff_class"))
        .groupBy("diff_class")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


DIFF_ORACLE = """
WITH v1 AS (SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders),
v2 AS (SELECT o_orderkey,
              CASE WHEN o_orderkey % 101 = 0 THEN round(price + 10.0, 2)
                   ELSE price END AS price
       FROM v1 WHERE o_orderkey % 97 != 0),
j AS (SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
             a.price AS p1, b.price AS p2
      FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey)
SELECT CASE WHEN p1 IS NULL THEN 'added'
            WHEN p2 IS NULL THEN 'removed'
            WHEN p1 != p2 THEN 'changed'
            ELSE 'unchanged' END AS diff_class,
       count(*) AS n_rows
FROM j GROUP BY 1
"""


def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-interarrival profile: median / p90 / max gap in
    seconds. The lag is a PER-USER window (keyed — never global).

    Quantiles are NEAREST-RANK order statistics over integer
    microseconds, selected from the sorted per-user gap array — no
    interpolation anywhere. Interpolated midpoints land on exact
    .xxxxx5 values where Spark (rounds the decimal repr, HALF_UP) and
    DuckDB (rounds the binary double) disagree by construction;
    selecting an actual element and dividing the exact integer by 1e6
    is bit-identical in any engine. State is the per-user gap array
    (bounded by per-user activity); for pathological hot users swap
    in the sketches module's approx quantiles — the keyed plan shape
    is unchanged."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("__prev", F.lag("ts").over(w))
        .where(F.col("__prev").isNotNull())
        .select(
            "user_id",
            (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("__prev"))
            ).alias("gap_us"),
        )
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sort_array(F.collect_list("gap_us")).alias("__sorted"),
    )
    med_idx = "cast(floor((n_gaps - 1) / 2) + 1 as int)"  # lower median
    p90_idx = (
        "cast(greatest(1, least(n_gaps, cast(ceil(0.9 * n_gaps) as bigint))) as int)"
    )
    return agg.select(
        "user_id",
        "n_gaps",
        (F.expr(f"element_at(__sorted, {med_idx})") / F.lit(1000000.0)).alias(
            "median_gap_s"
        ),
        (F.expr(f"element_at(__sorted, {p90_idx})") / F.lit(1000000.0)).alias(
            "p90_gap_s"
        ),
        (F.expr("element_at(__sorted, cast(n_gaps as int))") / F.lit(1000000.0)).alias(
            "max_gap_s"
        ),
    )


INTERARRIVAL_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts - lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) AS gap_us
  FROM events),
a AS (SELECT user_id, count(*) AS n_gaps,
             list_sort(list(gap_us)) AS srt
      FROM g WHERE gap_us IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps,
       srt[(floor((n_gaps - 1) / 2))::INT + 1] / 1000000.0 AS median_gap_s,
       srt[greatest(1, least(n_gaps, ceil(0.9 * n_gaps)::INT))] / 1000000.0
         AS p90_gap_s,
       srt[n_gaps] / 1000000.0 AS max_gap_s
FROM a
"""


def parts_copurchase_edges(
    spark: SparkSession, sf_dir: str, max_basket: int | None = 256
) -> DataFrame:
    """Co-purchase graph build: parts appearing in the same order,
    weighted by co-occurrence count (≥ 2 to prune noise). One
    self-equi-join on the order key (pairs per order ≈ lines², map-
    side-combined count) — the standard market-basket edge list.

    ``max_basket`` (default 256, None to opt out) drops baskets with
    more items than the cap BEFORE the self-join — the basket-size
    guard mirroring the dedup hot-shingle cap: on adversarial data a
    single bot/bulk order with 10⁵ items would alone explode into
    10¹⁰ pairs; a real co-purchase signal never needs megabaskets.
    On TPC-H shapes (≤ 7 lines/order) the cap is a no-op —
    tests/test_graph.py pins that surviving edges are unchanged —
    so the oracle needs no mirror."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    if max_basket is not None:
        sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("__bsz"))
        li = li.join(
            sizes.where(F.col("__bsz") <= max_basket), "l_orderkey"
        ).drop("__bsz")
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )


COPURCHASE_ORACLE = """
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
WHERE a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def parts_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank power iteration over the symmetrized co-purchase
    graph (uniform init, d = 0.85): contributions explode along edges,
    reduce per target, rank = 0.15 + 0.85·Σ pr/deg. The per-edge term
    rounds to 7 and DECIMAL-sums (order-independent ⇒ engine-exact).
    Iterating to convergence is this same shape in a loop with the
    connected-components checkpoint discipline; one oracled step pins
    the semantics."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )
    edges = und.select(
        F.explode(
            F.array(
                F.struct(F.col("part_a"), F.col("part_b")),
                F.struct(
                    F.col("part_b").alias("part_a"), F.col("part_a").alias("part_b")
                ),
            )
        ).alias("e")
    ).select("e.part_a", "e.part_b")
    # degree via a keyed window over the SAME shuffle as the
    # contribution grouping's input — one pass over the (expensive)
    # self-join output; a groupBy-then-join-back would execute the
    # basket self-join twice (or force a persist)
    deg_w = Window.partitionBy("part_a")
    contrib = edges.withColumn("deg", F.count(F.lit(1)).over(deg_w)).select(
        F.col("part_b").alias("node"),
        F.expr("cast(round(cast(1.0 as double) / deg, 7) as decimal(20,7))").alias("__c"),
    )
    return (
        contrib.groupBy("node")
        .agg(F.sum("__c").alias("__s"))
        .select(
            "node",
            F.round(
                F.lit(0.15) + F.lit(0.85) * F.col("__s").cast("double"), 6
            ).alias("pagerank"),
        )
    )


PAGERANK_ORACLE = """
WITH und AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS (SELECT part_a, part_b FROM und
          UNION ALL SELECT part_b, part_a FROM und),
deg AS (SELECT part_a AS node, count(*) AS deg FROM edges GROUP BY 1),
contrib AS (SELECT e.part_b AS node,
                   round(1.0::DOUBLE / d.deg, 7)::DECIMAL(20,7) AS c
            FROM edges e JOIN deg d ON e.part_a = d.node)
SELECT node, round(0.15 + 0.85 * sum(c)::DOUBLE, 6) AS pagerank
FROM contrib GROUP BY node
"""


def parts_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full PageRank (3 rounds) over the symmetrized co-purchase graph
    (operators/graph.pagerank): per round one contribution join + one
    keyed reduce, decimal-exact, rank vector lineage-truncated.
    Iterative ⇒ rows-only at the driver; exactness pinned against a
    pure-Python reference in tests/test_graph.py."""
    from kafkaconnect_spark.operators.graph import pagerank as pr

    und = parts_copurchase_edges(spark, sf_dir).select("part_a", "part_b")
    # symmetrize by EXPLODE, not union: a union's two arms each
    # re-execute the expensive co-purchase self-join (or force a
    # persist); explode emits both directions in the same single pass
    edges = und.select(
        F.explode(
            F.array(
                F.struct(F.col("part_a").alias("src"), F.col("part_b").alias("dst")),
                F.struct(F.col("part_b").alias("src"), F.col("part_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return pr(edges, n_rounds=3)


def _pagerank_full_oracle(n_rounds: int, p: int = 85) -> str:
    """Unrolled DuckDB replay of operators/graph.pagerank: the engine
    iterates in FIXED-POINT INTEGER units (1e-6 ranks, 1e-7 edge
    contributions, round-half-up as ``(2a+b) // (2b)``), so each
    round is a pure-integer (contrib → left-join) CTE pair and the
    replay is bit-exact with no float-rounding convention to match."""
    base6 = (100 - p) * 10**4
    sql = """
WITH und AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS (SELECT part_a AS src, part_b AS dst FROM und
          UNION ALL SELECT part_b, part_a FROM und),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM edges),
r0 AS (SELECT node, 1000000::BIGINT AS r6 FROM nodes)"""
    for t in range(n_rounds):
        sql += f""",
c{t} AS (SELECT ed.dst AS node,
                sum((20 * r.r6 + ed.deg) // (2 * ed.deg))::BIGINT AS s7
         FROM ed JOIN r{t} r ON ed.src = r.node GROUP BY ed.dst),
r{t + 1} AS (SELECT n.node,
                  ({base6} + ({2 * p} * coalesce(c.s7, 0) + 1000) // 2000
                  )::BIGINT AS r6
           FROM nodes n LEFT JOIN c{t} c USING (node))"""
    return sql + (
        f"\nSELECT node, r6::DOUBLE / 1000000.0::DOUBLE AS pagerank"
        f" FROM r{n_rounds}"
    )


PARTS_PAGERANK_ORACLE = _pagerank_full_oracle(3)


def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table in long format — per
    column: null fraction, EXACT distinct count, min/max (as strings).

    r4 rework: one two-phase distinct pipeline PER COLUMN (groupBy the
    value with map-side partial counts, then fold the group frame to
    one row), unioned — instead of a single 5-way `countDistinct`
    aggregate, which compiles to an Expand (5× row multiplication)
    and shuffles full rows including the PK column. Per-column
    pipelines shuffle only Σ distinct-values-per-column narrow rows,
    each scan prunes to ONE parquet column, and every metric (n,
    nulls, min/max, distinct) falls out of the same grouped frame —
    the exact plan now scales the same way the HLL++ twin
    (`orders_profile_approx`) does, just with exact counts and
    value-sized (not sketch-sized) shuffle state."""
    orders = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    per_col = []
    for c in cols:
        g = (
            orders.groupBy(F.col(c).alias("__v"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .agg(
                F.sum("__cnt").alias("n_rows"),
                F.sum(
                    F.when(F.col("__v").isNull(), F.col("__cnt")).otherwise(
                        F.lit(0)
                    )
                ).alias("n_nulls"),
                F.sum(F.col("__v").isNotNull().cast("long")).alias("n_distinct"),
                F.min(F.col("__v").cast("string")).alias("min_str"),
                F.max(F.col("__v").cast("string")).alias("max_str"),
            )
            .select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_str",
                "max_str",
            )
        )
        per_col.append(g)
    out = per_col[0]
    for g in per_col[1:]:
        out = out.unionAll(g)
    return out.withColumn(
        "null_frac", F.round(F.col("n_nulls") / F.col("n_rows"), 6)
    )


def orders_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch variant of orders_profile: approx_count_distinct
    (HLL++) in a single 1-row aggregate — one pass over the table,
    constant sketch state per column, no shuffle proportional to the
    value space. Since the r4 rework the EXACT twin is also
    Expand-free (per-column two-phase distinct pipelines), so the
    remaining trade is shuffle state: the exact plan shuffles
    Σ distinct-values narrow rows, this one shuffles fixed-size
    sketches — the difference that matters when a column's value
    space itself is 10^10 (operators/sketches module rationale).
    Approximate → not in the driver catalog; accuracy pinned vs the
    exact profile in tests/test_pipeline_ops.py."""
    orders = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, rsd=0.02).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    row = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_str, max_str)"
        )
    ).withColumn(
        "null_frac", F.round(F.col("n_nulls") / F.col("n_rows"), 6)
    )


PROFILE_ORACLE = """
WITH s AS (SELECT
  count(*) AS n,
  sum((o_orderkey IS NULL)::INT)::BIGINT AS k_nulls, count(DISTINCT o_orderkey) AS k_d,
  min(o_orderkey::VARCHAR) AS k_min, max(o_orderkey::VARCHAR) AS k_max,
  sum((o_custkey IS NULL)::INT)::BIGINT AS c_nulls, count(DISTINCT o_custkey) AS c_d,
  min(o_custkey::VARCHAR) AS c_min, max(o_custkey::VARCHAR) AS c_max,
  sum((o_orderstatus IS NULL)::INT)::BIGINT AS s_nulls, count(DISTINCT o_orderstatus) AS s_d,
  min(o_orderstatus::VARCHAR) AS s_min, max(o_orderstatus::VARCHAR) AS s_max,
  sum((o_totalprice IS NULL)::INT)::BIGINT AS p_nulls, count(DISTINCT o_totalprice) AS p_d,
  min(o_totalprice::VARCHAR) AS p_min, max(o_totalprice::VARCHAR) AS p_max,
  sum((o_orderdate IS NULL)::INT)::BIGINT AS d_nulls, count(DISTINCT o_orderdate) AS d_d,
  min(o_orderdate::VARCHAR) AS d_min, max(o_orderdate::VARCHAR) AS d_max
  FROM orders)
SELECT u.* , round(u.n_nulls / u.n_rows, 6) AS null_frac FROM (
  SELECT 'o_orderkey' AS column_name, n AS n_rows, k_nulls AS n_nulls,
         k_d AS n_distinct, k_min AS min_str, k_max AS max_str FROM s
  UNION ALL SELECT 'o_custkey', n, c_nulls, c_d, c_min, c_max FROM s
  UNION ALL SELECT 'o_orderstatus', n, s_nulls, s_d, s_min, s_max FROM s
  UNION ALL SELECT 'o_totalprice', n, p_nulls, p_d, p_min, p_max FROM s
  UNION ALL SELECT 'o_orderdate', n, d_nulls, d_d, d_min, d_max FROM s) u
"""


def customers_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage: candidate duplicate
    customers via BLOCKED pairwise edit distance — the blocking key
    is COMPOUND: (nation, segment, name-prefix) where the name
    component is the name minus its last 3 characters. A fixed-
    cardinality key like (nation, segment) alone is a scale-killer:
    125 blocks means block size grows linearly with the corpus and
    pairwise volume quadratically; the name-derived component bounds
    block membership by name-space density, so Σ block² stays linear
    in the corpus. The recall tradeoff (pairs whose edits touch the
    blocked prefix are not candidates) is the standard blocking-
    predicate contract in record linkage (Fellegi–Sunter practice);
    widening recall = more blocking passes OR'd, or the LSH
    machinery in operators/dedup. levenshtein is the JVM built-in
    (codegen'd, no Python); the compound equi-join key is pinned in
    tests/test_plan_shapes.py."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        F.expr(
            "substring(c_name, 1, greatest(length(c_name) - 3, 1))"
        ).alias("name_blk"),
    )
    a = cust.select(
        F.col("c_nationkey"), F.col("c_mktsegment"), F.col("name_blk"),
        F.col("c_custkey").alias("id_a"), F.col("c_name").alias("name_a"),
    )
    b = cust.select(
        F.col("c_nationkey"), F.col("c_mktsegment"), F.col("name_blk"),
        F.col("c_custkey").alias("id_b"), F.col("c_name").alias("name_b"),
    )
    return (
        a.join(b, ["c_nationkey", "c_mktsegment", "name_blk"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_dist") <= 3)
        .select("id_a", "id_b", "name_a", "name_b", "edit_dist")
    )


ENTITY_RES_ORACLE = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS name_a, b.c_name AS name_b,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
  AND substr(a.c_name, 1, greatest(length(a.c_name) - 3, 1))
      = substr(b.c_name, 1, greatest(length(b.c_name) - 3, 1))
WHERE a.c_custkey < b.c_custkey
  AND levenshtein(a.c_name, b.c_name) <= 3
"""


def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation with SCALE-CORRECT quartiles: per-customer
    recency/frequency/monetary reduce in one groupBy, then each
    metric's exact {p25, p50, p75} — one 9-double aggregate — comes
    back as a broadcast fence and the quartile is a narrow comparison
    sum. A global ntile() would serialize every customer through one
    task (the q15 anti-pattern); thresholds keep every stage
    distributed. Decimal money sums; percentiles rounded to 6 before
    comparison so bucket edges replay engine-exact."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice"), 2).cast(T.DecimalType(18, 2)))
        .cast("double")
        .alias("monetary"),
    ).withColumn("rec_days", F.datediff(F.lit("1999-01-01").cast("date"), F.col("last_order")))
    fence = m.agg(
        *[
            F.round(F.expr(f"percentile({c}, cast({q} as double))"), 6).alias(
                f"__{c}_{int(q * 100)}"
            )
            for c in ("rec_days", "frequency", "monetary")
            for q in (0.25, 0.5, 0.75)
        ]
    )
    with_f = m.crossJoin(F.broadcast(fence))
    # quartile 1..4 = 1 + fences crossed (recency: more days = worse
    # = higher bucket; frequency/monetary: more = better = bucket 1)
    return with_f.select(
        "custkey",
        "last_order",
        "frequency",
        "monetary",
        (
            F.lit(1)
            + (F.col("rec_days") > F.col("__rec_days_25")).cast("int")
            + (F.col("rec_days") > F.col("__rec_days_50")).cast("int")
            + (F.col("rec_days") > F.col("__rec_days_75")).cast("int")
        ).alias("r_quartile"),
        (
            F.lit(4)
            - (F.col("frequency") > F.col("__frequency_25")).cast("int")
            - (F.col("frequency") > F.col("__frequency_50")).cast("int")
            - (F.col("frequency") > F.col("__frequency_75")).cast("int")
        ).alias("f_quartile"),
        (
            F.lit(4)
            - (F.col("monetary") > F.col("__monetary_25")).cast("int")
            - (F.col("monetary") > F.col("__monetary_50")).cast("int")
            - (F.col("monetary") > F.col("__monetary_75")).cast("int")
        ).alias("m_quartile"),
    )


RFM_ORACLE = """
WITH m AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate::DATE) AS last_order,
         count(*) AS frequency,
         sum(round(o_totalprice, 2)::DECIMAL(18,2))::DOUBLE AS monetary
  FROM orders GROUP BY 1),
m2 AS (SELECT *, date_diff('day', last_order, DATE '1999-01-01') AS rec_days FROM m),
f AS (SELECT round(quantile_cont(rec_days, 0.25), 6) AS r25,
             round(quantile_cont(rec_days, 0.5), 6) AS r50,
             round(quantile_cont(rec_days, 0.75), 6) AS r75,
             round(quantile_cont(frequency, 0.25), 6) AS f25,
             round(quantile_cont(frequency, 0.5), 6) AS f50,
             round(quantile_cont(frequency, 0.75), 6) AS f75,
             round(quantile_cont(monetary, 0.25), 6) AS m25,
             round(quantile_cont(monetary, 0.5), 6) AS m50,
             round(quantile_cont(monetary, 0.75), 6) AS m75
      FROM m2)
SELECT custkey, last_order, frequency, monetary,
       1 + (rec_days > r25)::INT + (rec_days > r50)::INT + (rec_days > r75)::INT
         AS r_quartile,
       4 - (frequency > f25)::INT - (frequency > f50)::INT - (frequency > f75)::INT
         AS f_quartile,
       4 - (monetary > m25)::INT - (monetary > m50)::INT - (monetary > m75)::INT
         AS m_quartile
FROM m2 CROSS JOIN f
"""


def events_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval attribution: every purchase, matched to
    same-user clicks in the preceding hour or emitted unattributed
    with NULL click columns — the batch twin of the watermarked outer
    stream-stream join (streaming/windows.
    interval_attribution_join_outer; stream==batch pinned in
    tests/test_streaming_windows.py)."""
    from kafkaconnect_spark.streaming.windows import interval_attribution_join_outer

    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    return interval_attribution_join_outer(clicks, purchases, lookback="1 hour")


ATTRIBUTION_OUTER_ORACLE = """
WITH c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase')
SELECT p.purchase_id, p.user_id, p.purchase_ts, c.click_ts,
       p.purchase_value, (c.click_ts IS NOT NULL) AS attributed
FROM p LEFT JOIN c ON p.user_id = c.user_id
  AND c.click_ts <= p.purchase_ts
  AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
"""


def events_zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key over two bucketed event
    dimensions (operators/layout.zorder_code) — the multi-column
    row-group-skipping layout trick, as a narrow constant-unrolled
    bit expression the oracle replays bit-for-bit."""
    from kafkaconnect_spark.operators.layout import zorder_code

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 1024).alias("user_bucket"),
        F.least(
            F.greatest(F.floor(F.col("value")), F.lit(0)), F.lit(1023)
        ).cast("bigint").alias("value_bucket"),
    )
    return ev.withColumn(
        "zcode", zorder_code(["user_bucket", "value_bucket"], bits=10)
    )


ZORDER_ORACLE = """
WITH b AS (SELECT event_id,
                  user_id % 1024 AS user_bucket,
                  least(greatest(floor(value)::BIGINT, 0), 1023) AS value_bucket
           FROM events)
SELECT event_id, user_bucket, value_bucket,
       list_sum([(((user_bucket >> i) & 1)::BIGINT << (2 * i))
                 + (((value_bucket >> i) & 1)::BIGINT << (2 * i + 1))
                 FOR i IN range(0, 10)])::BIGINT AS zcode
FROM b
"""


def embedding_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One engine-exact Lloyd iteration over the embeddings: folded-
    centroid argmax assignment (narrow), then per-cell per-dim
    decimal-exact means (operators/similarity.kmeans_step)."""
    emb = _t(spark, sf_dir, "embeddings", spread=True)
    return similarity.kmeans_step(emb, n_cells=8)


KMEANS_STEP_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] vec FROM embeddings
           WHERE len(embedding) > 0),
cents AS (SELECT vec_id AS cent_id, vec AS cent_vec FROM v ORDER BY vec_id LIMIT 8),
cells AS (
  SELECT vec_id, vec, cent_id AS cell FROM (
    SELECT v.vec_id, v.vec, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_COS.format(a='v.vec', b='c.cent_vec')} DESC, c.cent_id) rn
    FROM v CROSS JOIN cents c) WHERE rn = 1),
n AS (SELECT cell, count(*) AS n_members FROM cells GROUP BY cell),
e AS (SELECT cell, generate_subscripts(vec, 1) - 1 AS dim,
             round(unnest(vec), 7)::DECIMAL(20,7) AS x
      FROM cells),
m AS (SELECT cell, dim, sum(x) AS s FROM e GROUP BY cell, dim)
SELECT m.cell, m.dim::INT AS dim, n.n_members,
       s::DOUBLE / n.n_members AS centroid_value
FROM m JOIN n USING (cell)
"""


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 5-round Lloyd's k-means (deterministic lowest-id init) —
    the clustering pass production SemDeDup runs first
    (operators/similarity.kmeans_lloyd). Iterative: rows-only at the
    driver; exactness pinned vs a numpy reference in tests."""
    emb = _t(spark, sf_dir, "embeddings", spread=True)
    return similarity.kmeans_lloyd(emb, n_cells=8, n_rounds=5)


def _kmeans_lloyd_oracle(n_cells: int, n_rounds: int) -> str:
    """Unrolled DuckDB replay of operators/similarity.kmeans_lloyd —
    the loop is a fixed count of deterministic steps (squared-
    Euclidean argmin rounded to 6, tie → lowest cell; per-cell
    per-dim round-7 decimal means; empty cells keep their centroid),
    so each round becomes an (assign → update) CTE chain. Early
    convergence in the engine is a fixpoint, so unrolling the full
    count yields the identical final assignment."""
    dist = (
        "round(list_dot_product("
        "[v.vec[i] - c.cvec[i] FOR i IN range(1, len(v.vec) + 1)], "
        "[v.vec[i] - c.cvec[i] FOR i IN range(1, len(v.vec) + 1)]), 6)"
    )
    sql = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
           WHERE len(embedding) > 0),
c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, vec AS cvec
       FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT {n_cells}))"""
    for t in range(n_rounds + 1):
        sql += f""",
a{t} AS (SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cell,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {dist} ASC, c.cell ASC) AS rn
    FROM v CROSS JOIN c{t} c) WHERE rn = 1)"""
        if t == n_rounds:
            break
        sql += f""",
e{t} AS (SELECT a.cell, generate_subscripts(v.vec, 1) - 1 AS dim,
                round(unnest(v.vec), 7)::DECIMAL(20,7) AS x
         FROM a{t} a JOIN v USING (vec_id)),
m{t} AS (SELECT cell, dim, sum(x) AS s, count(*) AS n
         FROM e{t} GROUP BY cell, dim),
nc{t} AS (SELECT cell, list(s::DOUBLE / n ORDER BY dim) AS cvec
          FROM m{t} GROUP BY cell),
c{t + 1} AS (SELECT c.cell, coalesce(n.cvec, c.cvec) AS cvec
           FROM c{t} c LEFT JOIN nc{t} n USING (cell))"""
    return sql + f"\nSELECT vec_id, cell::INT AS cell FROM a{n_rounds}"


KMEANS_LLOYD_ORACLE = _kmeans_lloyd_oracle(8, 5)


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly window sliding every 15 min over the event stream — the
    overlapping-window shape of a Structured Streaming agg (each event
    lands in 4 windows). Runs the SAME operator the streaming engine
    uses (streaming/windows.sliding_event_counts — native ``F.window``
    slide, JVM-side window expansion, map-side partial combine); the
    DuckDB oracle replays the expansion as an explicit ×4 slot cross
    join. Decimal sum for engine-exact values (same rule as
    events_tumbling_window)."""
    from kafkaconnect_spark.streaming.windows import sliding_event_counts

    return sliding_event_counts(_t(spark, sf_dir, "events"))


SLIDING_ORACLE = """
WITH k AS (SELECT unnest([0, 1, 2, 3]) AS k),
-- epoch_us + integer floor-division: epoch(ts)::BIGINT would ROUND
-- fractional seconds and shift events near a slot boundary into the
-- wrong bucket
w AS (SELECT make_timestamp(((epoch_us(ts) // 900000000) - k.k) * 900000000)
               AS window_start,
             event_type, value
      FROM events CROSS JOIN k)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n_events,
       sum(round(value, 2)::DECIMAL(18,2))::DOUBLE AS sum_value
FROM w GROUP BY 1, 2, 3
"""


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier flags (|z| > 3) — the cheap screen a
    training pipeline runs over metric streams before trusting them.

    Scale shape: the per-type moments reduce to one row per type via
    map-side-combined DECIMAL sums (order-independent ⇒ engine-exact),
    then broadcast back onto the events — one shuffle for a few-row
    aggregate, never a window over the full stream. mean/std are
    derived from the exact decimal sums with the SAME double formula
    the oracle uses, so flags replay bit-for-bit."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "v2", F.round(F.col("value"), 2).cast(T.DecimalType(18, 2))
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("v2").alias("__s1"),
        F.sum(F.col("v2") * F.col("v2")).alias("__s2"),
    )
    joined = ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.col("v2").cast("double").alias("value2"),
        (F.col("__s1").cast("double") / F.col("__n")).alias("__mean"),
        (F.col("__s2").cast("double") / F.col("__n")).alias("__msq"),
    )
    z = joined.withColumn(
        "__std",
        F.sqrt(F.col("__msq") - F.col("__mean") * F.col("__mean")),
    ).withColumn(
        "z",
        F.round(
            (F.col("value2") - F.col("__mean")) / F.nullif(F.col("__std"), F.lit(0.0)),
            6,
        ),
    )
    return z.select(
        "event_id",
        "event_type",
        "value2",
        F.round("__mean", 6).alias("type_mean"),
        F.round("__std", 6).alias("type_std"),
        "z",
        F.coalesce(F.abs(F.col("z")) > 3, F.lit(False)).alias("is_anomaly"),
    )


ZSCORE_ORACLE = """
WITH e AS (SELECT event_id, event_type, round(value, 2)::DECIMAL(18,2) AS v2
           FROM events),
s AS (SELECT event_type, count(*) AS n, sum(v2) AS s1, sum(v2 * v2) AS s2
      FROM e GROUP BY event_type),
j AS (SELECT e.event_id, e.event_type, e.v2::DOUBLE AS value2,
             s.s1::DOUBLE / s.n AS mean, s.s2::DOUBLE / s.n AS msq
      FROM e JOIN s USING (event_type)),
d AS (SELECT *, sqrt(msq - mean * mean) AS std FROM j),
z AS (SELECT *, round((value2 - mean) / nullif(std, 0.0), 6) AS z FROM d)
SELECT event_id, event_type, value2,
       round(mean, 6) AS type_mean, round(std, 6) AS type_std, z,
       coalesce(abs(z) > 3, false) AS is_anomaly
FROM z
"""


# ===========================================================================
# catalog
# ===========================================================================

QUERY_CATALOG: dict[str, QueryDef] = {
    # §2.1 sources
    "s1_jdbc_incrementing": QueryDef(s1_jdbc_incrementing, S1_ORACLE),
    "s2_jdbc_timestamp": QueryDef(s2_jdbc_timestamp, S2_ORACLE),
    "s3_jdbc_ts_incrementing": QueryDef(s3_jdbc_ts_incrementing, S3_ORACLE),
    "s4_jdbc_bulk": QueryDef(s4_jdbc_bulk, S4_ORACLE),
    "s5_topic_routing": QueryDef(s5_topic_routing, S5_ORACLE),
    "s6_spooldir_parse": QueryDef(s6_spooldir_parse, S6_ORACLE),
    # §2.4 transforms
    "t1_t2_smt_key_chain": QueryDef(t1_t2_smt_key_chain, T1_ORACLE),
    "t3_unwrap_envelope": QueryDef(t3_unwrap_envelope, T3_ORACLE),
    "t4_regex_router": QueryDef(t4_regex_router, T4_ORACLE),
    "t5_timestamp_converter": QueryDef(t5_timestamp_converter, T5_ORACLE),
    # §2.5 converters
    "c1_json_schema_roundtrip": QueryDef(c1_json_schema_roundtrip, C1_ORACLE),
    "c2_json_bare_roundtrip": QueryDef(c2_json_bare_roundtrip, C2_ORACLE),
    "c3_avro_roundtrip": QueryDef(c3_avro_roundtrip, C3_ORACLE),
    # §2.2 sinks
    "k1_upsert_final_state": QueryDef(k1_upsert_final_state, K1_ORACLE),
    "k2_tombstone_delete_state": QueryDef(k2_tombstone_delete_state, K2_ORACLE),
    # analytics
    "q1_pricing_summary": QueryDef(q1_pricing_summary, Q1_ORACLE),
    "q3_top_revenue_orders": QueryDef(q3_top_revenue_orders, Q3_ORACLE),
    "q5_supplier_volume": QueryDef(q5_supplier_volume, Q5_ORACLE),
    "events_topk_per_user": QueryDef(events_topk_per_user, TOPK_ORACLE),
    "events_distinct_users": QueryDef(events_distinct_users, DISTINCT_ORACLE),
    "events_value_percentiles": QueryDef(events_value_percentiles, PERCENTILE_ORACLE),
    "events_daily_pivot": QueryDef(events_daily_pivot, PIVOT_ORACLE),
    "events_salted_agg": QueryDef(events_salted_agg, SALTED_ORACLE),
    "customers_without_orders": QueryDef(customers_without_orders, ANTI_ORACLE),
    "events_running_total": QueryDef(events_running_total, RUNNING_ORACLE),
    "events_tumbling_window": QueryDef(events_tumbling_window, TUMBLING_ORACLE),
    "events_sessionization": QueryDef(events_sessionization, SESSION_ORACLE),
    "events_session_window": QueryDef(events_session_window, SESSION_WINDOW_ORACLE),
    "k7_db_timezone": QueryDef(k7_db_timezone, K7_ORACLE),
    "k1_composite_key_upsert": QueryDef(k1_composite_key_upsert, K1C_ORACLE),
    # Phase E dedup
    "dedup_exact": QueryDef(dedup_exact, DEDUP_EXACT_ORACLE),
    "dedup_ngram_jaccard": QueryDef(dedup_ngram_jaccard, DEDUP_JACCARD_ORACLE),
    "dedup_minhash_lsh": QueryDef(dedup_minhash_lsh, DEDUP_MINHASH_ORACLE),
    "dedup_simhash": QueryDef(dedup_simhash, DEDUP_SIMHASH_ORACLE),
    "dedup_clusters": QueryDef(dedup_clusters, DEDUP_CLUSTERS_ORACLE),
    "dedup_clusters_star": QueryDef(dedup_clusters_star, DEDUP_CLUSTERS_ORACLE),
    "dedup_incremental": QueryDef(dedup_incremental, DEDUP_INCR_ORACLE),
    "dedup_embedding_cosine": QueryDef(dedup_embedding_cosine, DEDUP_EMB_ORACLE),
    # Phase E similarity
    "similarity_topk": QueryDef(similarity_topk, SIM_TOPK_ORACLE),
    "similarity_ann_lsh": QueryDef(similarity_ann_lsh, SIM_ANN_ORACLE),
    "similarity_ivf": QueryDef(similarity_ivf, SIM_IVF_ORACLE),
    "events_rollup": QueryDef(events_rollup, ROLLUP_ORACLE),
    "asof_join_purchases_clicks": QueryDef(asof_join_purchases_clicks, ASOF_ORACLE),
    "range_join_signup_followups": QueryDef(range_join_signup_followups, RANGE_ORACLE),
    # Phase E text
    "text_token_stats": QueryDef(text_token_stats, TEXT_TOKENS_ORACLE),
    "text_vocabulary_topk": QueryDef(text_vocabulary_topk, VOCAB_ORACLE),
    "text_quality": QueryDef(text_quality, TEXT_QUALITY_ORACLE),
    "text_langid": QueryDef(text_langid, TEXT_LANGID_ORACLE),
    "text_fingerprint": QueryDef(text_fingerprint, TEXT_FP_ORACLE),
    # Phase E multimodal
    "multimodal_meta": QueryDef(multimodal_meta, MM_META_ORACLE),
    "multimodal_features": QueryDef(multimodal_features, MM_FEATURES_ORACLE),
    "multimodal_frame_sample": QueryDef(multimodal_frame_sample, MM_FRAMES_ORACLE),
    "multimodal_resize": QueryDef(multimodal_resize, MM_RESIZE_ORACLE),
    # Phase E training-data pipeline
    "split_train_valid_test": QueryDef(split_train_valid_test, SPLIT_ORACLE),
    "sampling_stratified": QueryDef(sampling_stratified, SAMPLE_ORACLE),
    "sampling_reservoir": QueryDef(sampling_reservoir, RESERVOIR_ORACLE),
    "docs_chunk_overlap": QueryDef(docs_chunk_overlap, CHUNK_ORACLE),
    "decontaminate_test_split": QueryDef(decontaminate_test_split, DECONTAM_ORACLE),
    "pii_redaction": QueryDef(pii_redaction, PII_ORACLE),
    "embedding_label_centroids": QueryDef(embedding_label_centroids, CENTROID_ORACLE),
    "embedding_quantize_int8": QueryDef(embedding_quantize_int8, QUANT_ORACLE),
    "embedding_random_projection": QueryDef(embedding_random_projection, RPROJ_ORACLE),
    "text_token_entropy": QueryDef(text_token_entropy, TOKEN_ENTROPY_ORACLE),
    "docs_pack_sequences": QueryDef(docs_pack_sequences, PACK_ORACLE),
    "quality_funnel": QueryDef(quality_funnel, QUALITY_FUNNEL_ORACLE),
    "text_gopher_rules": QueryDef(text_gopher_rules, GOPHER_ORACLE),
    "text_salient_terms": QueryDef(text_salient_terms, SALIENT_ORACLE),
    "events_weekly_retention": QueryDef(events_weekly_retention, RETENTION_ORACLE),
    "events_funnel_conversion": QueryDef(events_funnel_conversion, FUNNEL_ORACLE),
    "text_langid_confusion": QueryDef(text_langid_confusion, LANGID_CONFUSION_ORACLE),
    "events_cardinality_sketch": QueryDef(
        events_cardinality_sketch, CARDINALITY_KMV_ORACLE
    ),
    "sampling_balance_sources": QueryDef(sampling_balance_sources, BALANCE_ORACLE),
    "docs_shard_assignment": QueryDef(docs_shard_assignment, SHARD_ORACLE),
    "dedup_span_frac": QueryDef(dedup_span_frac, SPAN_DUP_ORACLE),
    "dedup_containment": QueryDef(dedup_containment, CONTAINMENT_ORACLE),
    "similarity_semdedup": QueryDef(similarity_semdedup, SEMDEDUP_ORACLE),
    "sampling_temperature": QueryDef(sampling_temperature, TEMPERATURE_ORACLE),
    # streaming batch twins
    "events_dedup_redelivery": QueryDef(events_dedup_redelivery, DEDUP_REDELIVERY_ORACLE),
    "events_enrich_dimension": QueryDef(events_enrich_dimension, ENRICH_ORACLE),
    "scd2_user_history": QueryDef(scd2_user_history, SCD2_ORACLE),
}

def _merge(new: dict[str, QueryDef]) -> None:
    """Append a round catalog. A name collision would silently replace
    the fn/oracle while keeping the OLD insertion position — and the
    driver-window ordering (__spark_entry__._ordered_names) is derived
    from insertion order — so key-disjointness is a hard invariant,
    asserted at every merge site (and pairwise-tested in
    tests/test_entry_ordering.py)."""
    dup = QUERY_CATALOG.keys() & new.keys()
    if dup:
        raise AssertionError(f"catalog name collision: {sorted(dup)}")
    QUERY_CATALOG.update(new)


# extended TPC-H-shape analytics (queries_tpch.py)
from kafkaconnect_spark.queries_tpch import TPCH_CATALOG as _TPCH  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _TPCH.items()})

# round-2 additions (deferred in __spark_entry__ ordering until the
# r1 backlog has driver rows — see _DEFER_NEW there)
_merge(
    {
        "docs_bigram_topk": QueryDef(docs_bigram_topk, BIGRAM_ORACLE),
        "embedding_norm_outliers": QueryDef(
            embedding_norm_outliers, NORM_OUTLIER_ORACLE
        ),
        "events_sliding_window": QueryDef(events_sliding_window, SLIDING_ORACLE),
        "events_anomaly_zscore": QueryDef(events_anomaly_zscore, ZSCORE_ORACLE),
        "multimodal_decode_stats": QueryDef(multimodal_decode_stats, MM_DECODE_ORACLE),
        "multimodal_audio_stats": QueryDef(multimodal_audio_stats, MM_AUDIO_ORACLE),
        "t6_smt_standard_chain": QueryDef(t6_smt_standard_chain, T6_ORACLE),
        "multimodal_video_frames": QueryDef(multimodal_video_frames, MM_VIDEO_ORACLE),
        "text_bpe_tokenize": QueryDef(text_bpe_tokenize, BPE_TOKENIZE_ORACLE),
        "text_bigram_lm_bits": QueryDef(text_bigram_lm_bits, BIGRAM_LM_ORACLE),
        "embedding_kmeans_step": QueryDef(embedding_kmeans_step, KMEANS_STEP_ORACLE),
        "embedding_kmeans": QueryDef(embedding_kmeans, KMEANS_LLOYD_ORACLE),
        "events_zorder_code": QueryDef(events_zorder_code, ZORDER_ORACLE),
        "events_attribution_outer": QueryDef(
            events_attribution_outer, ATTRIBUTION_OUTER_ORACLE
        ),
        "customers_entity_resolution": QueryDef(
            customers_entity_resolution, ENTITY_RES_ORACLE
        ),
        "customers_rfm_segments": QueryDef(customers_rfm_segments, RFM_ORACLE),
        "parts_copurchase_edges": QueryDef(parts_copurchase_edges, COPURCHASE_ORACLE),
        "parts_pagerank_step": QueryDef(parts_pagerank_step, PAGERANK_ORACLE),
        "orders_profile": QueryDef(orders_profile, PROFILE_ORACLE),
        "parts_pagerank": QueryDef(parts_pagerank, PARTS_PAGERANK_ORACLE),
        "orders_diff_snapshots": QueryDef(orders_diff_snapshots, DIFF_ORACLE),
        "events_interarrival_stats": QueryDef(
            events_interarrival_stats, INTERARRIVAL_ORACLE
        ),
        "events_windowed_topk": QueryDef(events_windowed_topk, WINDOWED_TOPK_ORACLE),
        "orders_monthly_growth": QueryDef(
            orders_monthly_growth, MONTHLY_GROWTH_ORACLE
        ),
        "lineitem_latency_histogram": QueryDef(
            lineitem_latency_histogram, LATENCY_HIST_ORACLE
        ),
    }
)

# per-round additions are APPENDED here, in round order — catalog
# insertion order is the driver-window ordering contract
# (__spark_entry__._ordered_names, tests/test_entry_ordering.py)
from kafkaconnect_spark.queries_r3 import R3_CATALOG as _R3  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R3.items()})

from kafkaconnect_spark.queries_r3b import R3B_CATALOG as _R3B  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R3B.items()})

from kafkaconnect_spark.queries_r4 import R4_CATALOG as _R4  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R4.items()})

from kafkaconnect_spark.queries_r5 import R5_CATALOG as _R5  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R5.items()})

from kafkaconnect_spark.queries_r6 import R6_CATALOG as _R6  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R6.items()})

# r6 batch 3 — the catalog is a function (not a module dict) because
# two of its oracles wrap fragments defined ABOVE in this module
# (_bpe_oracle, BIGRAM_LM_ORACLE); the deferred import inside
# _catalog() keeps queries_r6b directly importable by tests without a
# circular-init hazard (same motivation as query_base's docstring)
from kafkaconnect_spark import queries_r6b as _r6b  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _r6b._catalog().items()})

from kafkaconnect_spark.queries_r6c import R6C_CATALOG as _R6C  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R6C.items()})

from kafkaconnect_spark.queries_r7 import R7_CATALOG as _R7  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R7.items()})

from kafkaconnect_spark.queries_r7b import R7B_CATALOG as _R7B  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R7B.items()})

from kafkaconnect_spark.queries_r8 import R8_CATALOG as _R8  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R8.items()})

from kafkaconnect_spark.queries_r9 import R9_CATALOG as _R9  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R9.items()})

from kafkaconnect_spark.queries_r10 import R10_CATALOG as _R10  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R10.items()})

from kafkaconnect_spark.queries_r11 import R11_CATALOG as _R11  # noqa: E402

_merge({k: QueryDef(fn, sql) for k, (fn, sql) in _R11.items()})
