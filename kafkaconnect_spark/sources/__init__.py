from kafkaconnect_spark.sources.jdbc_poller import IncrementalPoller, OffsetStore  # noqa: F401
