"""kafkaconnect_spark — a PySpark-native streaming-ETL engine.

Re-implements the capability surface of the reference repo
(chulminkw/KafkaConnect: Kafka Connect JDBC source/sink, Debezium CDC,
SpoolDir CSV source, SMT transforms, JSON/Avro converters, offset
management) as idiomatic Spark Structured Streaming, plus the
large-scale training-data-pipeline extensions (dedup, similarity
search, k-means, text analysis incl. BPE tokenizer training, real
uncompressed-media codecs, graph analytics, Z-order layout).

Design stance (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst does the optimizing.
- Structured Streaming micro-batches replace the Connect poll loop.
- `foreachBatch` + dialect-aware MERGE replaces the JDBC sink task.
- Checkpoint locations replace the `connect-offsets` topic.
"""

__version__ = "0.1.0"

from kafkaconnect_spark.session import get_spark  # noqa: F401
