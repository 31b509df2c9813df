"""Topic transport — Kafka when available, file-backed topics otherwise.

Every reference pipeline ends (source) or begins (sink) at a Kafka
topic. On a real deployment this module emits
``spark.readStream/writeStream.format("kafka")`` with the canonical
record schema (key/value binary, topic, partition, offset, timestamp).

This container ships no Kafka broker and no spark-kafka connector jar,
so the same contract is also implemented over a directory-per-topic
parquet log ("file transport"): each append writes a parquet file of
records carrying monotonically increasing per-topic offsets; readers
use Spark's file streaming source, whose file-name checkpointing gives
the same resume semantics as Kafka consumer offsets (SURVEY §2.6 O1).

The transport choice is a URL scheme in the spec's bootstrap/brokers
field: ``file:///path/to/topics`` → file transport, anything else →
kafka format. Engine code upstream/downstream is identical — the
record schema is the Kafka source schema either way.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)


def is_file_transport(servers: str) -> bool:
    return str(servers).startswith("file://")


def _topic_dir(servers: str, topic: str) -> Path:
    return Path(servers[len("file://"):]) / topic


class TopicTransport:
    """Append / stream-read / batch-read named topics."""

    def __init__(self, spark: SparkSession, servers: str):
        self.spark = spark
        self.servers = servers
        self.is_file = is_file_transport(servers)

    # ---- write ---------------------------------------------------------
    def append(self, records: DataFrame, default_topic: str | None = None) -> None:
        """Batch append (one micro-batch of records). ``records`` must
        have string/binary key+value; topic column optional if
        ``default_topic`` given."""
        df = records
        if "topic" not in df.columns:
            if not default_topic:
                raise ValueError("records need a topic column or a default_topic")
            df = df.withColumn("topic", F.lit(default_topic))
        if not self.is_file:
            (
                df.selectExpr(
                    "CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value", "topic"
                )
                .write.format("kafka")
                .option("kafka.bootstrap.servers", self.servers)
                .save()
            )
            return
        # file transport: per-topic dir; offsets = stored base + row_number
        topics = [r[0] for r in df.select("topic").distinct().collect()]
        for topic in topics:
            tdir = _topic_dir(self.servers, topic)
            tdir.mkdir(parents=True, exist_ok=True)
            base = self._next_offset(tdir)
            part = df.where(F.col("topic") == topic)
            w = (
                part.withColumn(
                    "offset",
                    F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
                    + F.lit(base - 1),
                )
                .withColumn("partition", F.lit(0))
                .withColumn(
                    "timestamp",
                    F.col("timestamp") if "timestamp" in part.columns else F.current_timestamp(),
                )
                .select(
                    F.col("key").cast("string"),
                    F.col("value").cast("string"),
                    "topic",
                    "partition",
                    "offset",
                    "timestamp",
                )
            )
            n = w.count()
            w.coalesce(1).write.mode("append").parquet(str(tdir / "log"))
            self._set_next_offset(tdir, base + n)

    # ---- read ----------------------------------------------------------
    def read_stream(self, topics: list[str], starting_offsets: str = "earliest") -> DataFrame:
        if not self.is_file:
            return (
                self.spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", self.servers)
                .option("subscribe", ",".join(topics))
                .option("startingOffsets", starting_offsets)
                .load()
                .select(
                    F.col("key").cast("string"),
                    F.col("value").cast("string"),
                    "topic",
                    "partition",
                    "offset",
                    "timestamp",
                )
            )
        # file transport: union of per-topic parquet streams.
        # startingOffsets=latest maps to ignoring files present at start
        # (snapshot.mode=schema_only analogue, SURVEY §2.1 S7).
        dfs = []
        for topic in topics:
            tdir = _topic_dir(self.servers, topic) / "log"
            tdir.mkdir(parents=True, exist_ok=True)
            reader = self.spark.readStream.schema(RECORD_SCHEMA).format("parquet")
            if starting_offsets == "latest":
                reader = reader.option("latestFirst", "false").option(
                    "maxFileAge", "0ms"
                )
            dfs.append(reader.load(str(tdir)))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read_batch(self, topics: list[str]) -> DataFrame:
        """Whole-topic batch read (test/verify path — kafkacat analogue,
        scripts/show_topic_messages:1-7)."""
        if not self.is_file:
            return (
                self.spark.read.format("kafka")
                .option("kafka.bootstrap.servers", self.servers)
                .option("subscribe", ",".join(topics))
                .load()
                .select(
                    F.col("key").cast("string"),
                    F.col("value").cast("string"),
                    "topic",
                    "partition",
                    "offset",
                    "timestamp",
                )
            )
        dfs = []
        for topic in topics:
            tdir = _topic_dir(self.servers, topic) / "log"
            if any(tdir.glob("*.parquet")):
                dfs.append(self.spark.read.schema(RECORD_SCHEMA).parquet(str(tdir)))
        if not dfs:
            return self.spark.createDataFrame([], RECORD_SCHEMA)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # ---- file-transport offset counter ----------------------------------
    @staticmethod
    def _next_offset(tdir: Path) -> int:
        meta = tdir / "meta.json"
        if meta.exists():
            return int(json.loads(meta.read_text())["next_offset"])
        return 0

    @staticmethod
    def _set_next_offset(tdir: Path, n: int) -> None:
        (tdir / "meta.json").write_text(json.dumps({"next_offset": int(n)}))
