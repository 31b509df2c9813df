"""TopicTransport contract — the three record-level properties the
JDBC sink's two-phase dedupe (operators/upsert.py) depends on:

1. keyed append: every record with the same key lands in ONE partition;
2. per-partition ordering: within a partition, later appends get
   strictly larger offsets (the dedupe's "latest wins" tiebreak);
3. tombstones: a null-value record round-trips with its key intact
   (delete.enabled parity, SURVEY §2.2 K2).

The contract is asserted once, against both implementations:

- file transport: always (this container ships no broker);
- real Kafka: only when ``KAFKA_BOOTSTRAP`` is set. Run recipe::

      # needs the spark-sql-kafka package on the session classpath:
      #   spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>
      # or spark.jars.packages in get_spark(extra_conf=...)
      KAFKA_BOOTSTRAP=broker:9092 python -m pytest \
          tests/test_kafka_transport_contract.py -k real_kafka

  The broker must allow topic auto-creation (the shim's create_topic
  is an AdminClient no-op in this container), and the test topic name
  is unique per run, so reruns never collide.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import Row

from kafkaconnect_spark.sources.topics import TopicTransport


def _records(spark, topic: str, batch: int):
    """Deterministic keyed batch: 4 keys × 5 records + one tombstone
    per even key. Batch number is embedded in the value so ordering
    across appends is observable."""
    rows = [
        Row(key=f"k{k}", value=f"b{batch}:k{k}:{i}", topic=topic)
        for k in range(4)
        for i in range(5)
    ]
    rows += [Row(key=f"k{k}", value=None, topic=topic) for k in (0, 2)]
    return spark.createDataFrame(rows)


def _assert_contract(spark, transport: TopicTransport, topic: str) -> None:
    transport.create_topic(topic, partitions=3)
    transport.append(_records(spark, topic, batch=1))
    transport.append(_records(spark, topic, batch=2))

    got = transport.read_batch([topic]).collect()
    assert len(got) == 2 * (4 * 5 + 2)

    # 1. keyed append: one partition per key
    parts_by_key: dict[str, set[int]] = {}
    for r in got:
        parts_by_key.setdefault(r.key, set()).add(r.partition)
    assert all(len(parts) == 1 for parts in parts_by_key.values()), parts_by_key

    # 2. per-partition ordering: batch-2 offsets all beat batch-1
    # offsets for the same key (appends are sequential)
    for key in {r.key for r in got}:
        b1 = [r.offset for r in got if r.key == key and (r.value or "").startswith("b1")]
        b2 = [r.offset for r in got if r.key == key and (r.value or "").startswith("b2")]
        if b1 and b2:
            assert max(b1) < min(b2), (key, b1, b2)
    # offsets unique within a partition
    seen = [(r.partition, r.offset) for r in got]
    assert len(seen) == len(set(seen))

    # 3. tombstones: null values survive with keys intact
    tombs = [r for r in got if r.value is None]
    assert len(tombs) == 2 * 2
    assert {r.key for r in tombs} == {"k0", "k2"}


def test_file_transport_contract(spark, tmp_path):
    transport = TopicTransport(spark, f"file://{tmp_path}")
    _assert_contract(spark, transport, f"contract_{uuid.uuid4().hex[:8]}")


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="KAFKA_BOOTSTRAP not set — no broker in this environment",
)
def test_real_kafka_contract(spark):
    transport = TopicTransport(spark, os.environ["KAFKA_BOOTSTRAP"])
    _assert_contract(spark, transport, f"contract_{uuid.uuid4().hex[:8]}")
