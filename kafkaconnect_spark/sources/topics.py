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
        # file transport: per-topic dir; offsets = stored base + row_number.
        # df's lineage can carry serde UDFs / transform chains — persist
        # it so topic discovery + the per-topic filters read the cache
        # instead of re-executing the whole plan per pass
        df = df.persist()
        try:
            self._append_per_topic(df)
        finally:
            df.unpersist()

    def _append_per_topic(self, df: DataFrame) -> None:
        import fcntl

        topics = [r[0] for r in df.select("topic").distinct().collect()]
        for topic in topics:
            tdir = _topic_dir(self.servers, topic)
            tdir.mkdir(parents=True, exist_ok=True)
            # exclusive advisory lock for the offset read→write window:
            # concurrent appenders (two started pipelines, two CLI
            # processes) would otherwise both read base=N and assign
            # duplicate offsets, then undercount next_offset
            lock_f = open(tdir / ".lock", "w")
            fcntl.flock(lock_f, fcntl.LOCK_EX)
            try:
                self._append_one_topic(df, topic, tdir)
            finally:
                fcntl.flock(lock_f, fcntl.LOCK_UN)
                lock_f.close()

    def _append_one_topic(self, df: DataFrame, topic: str, tdir: Path) -> None:
        base = self._next_offset(tdir)
        n_parts = self._partitions(tdir)
        # keyed partition assignment like Kafka's default partitioner
        # (hash(key) % partitions; null keys → partition 0). NB: the
        # shim keeps ONE offset sequence per topic (Kafka has one per
        # partition) — ordering consumers need (partition, offset).
        part_expr = (
            F.when(F.col("key").isNull(), F.lit(0))
            .otherwise(F.pmod(F.xxhash64(F.col("key")), F.lit(n_parts)))
            .cast("int")
            if n_parts > 1
            else F.lit(0)
        )
        part = df.where(F.col("topic") == topic)
        w = (
            part.withColumn(
                "offset",
                F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
                + F.lit(base - 1),
            )
            .withColumn("partition", part_expr)
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
        # one evaluation: the lineage includes serde UDFs/transform
        # chains, and the offset accounting must match the rows
        # actually written
        w = w.persist()
        try:
            n = w.count()
            w.coalesce(1).write.mode("append").parquet(str(tdir / "log"))
            self._set_next_offset(tdir, base + n)
        finally:
            w.unpersist()

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
        # startingOffsets=latest = skip records that exist when the
        # stream is built (snapshot.mode=schema_only analogue, SURVEY
        # §2.1 S7): snapshot the topic's end offset now and filter —
        # exactly Kafka's latest semantics, robust to file timestamps.
        dfs = []
        for topic in topics:
            tdir = _topic_dir(self.servers, topic) / "log"
            tdir.mkdir(parents=True, exist_ok=True)
            reader = self.spark.readStream.schema(RECORD_SCHEMA).format("parquet")
            df = reader.load(str(tdir))
            if starting_offsets == "latest":
                start_at = self._next_offset(tdir.parent)
                df = df.where(
                    (F.col("topic") != topic) | (F.col("offset") >= start_at)
                )
            dfs.append(df)
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

    # ---- topic admin (O5) ------------------------------------------------
    def create_topic(self, topic: str, partitions: int = 1, replication: int = 1) -> None:
        """topic.creation.default.partitions/replication.factor
        (connector_configs/mysql_jdbc_om_source.json:10-11). On Kafka
        this is an AdminClient create_topics call; the file shim
        records partition count in the topic meta (replication is
        meaningless on a filesystem and recorded for parity only)."""
        if not self.is_file:
            # kafka-python/AdminClient not shipped in this container;
            # on a real deployment: KafkaAdminClient.create_topics.
            return
        tdir = _topic_dir(self.servers, topic)
        tdir.mkdir(parents=True, exist_ok=True)
        meta = self._meta(tdir)
        meta.setdefault("next_offset", 0)
        meta["partitions"] = int(partitions)
        meta["replication.factor"] = int(replication)
        (tdir / "meta.json").write_text(json.dumps(meta))

    # ---- file-transport offset counter ----------------------------------
    @staticmethod
    def _meta(tdir: Path) -> dict:
        meta = tdir / "meta.json"
        if meta.exists():
            return json.loads(meta.read_text())
        return {}

    def _next_offset(self, tdir: Path) -> int:
        return int(self._meta(tdir).get("next_offset", 0))

    def _partitions(self, tdir: Path) -> int:
        return int(self._meta(tdir).get("partitions", 1))

    def _set_next_offset(self, tdir: Path, n: int) -> None:
        meta = self._meta(tdir)
        meta["next_offset"] = int(n)
        (tdir / "meta.json").write_text(json.dumps(meta))
