from kafkaconnect_spark.streaming.engine import Engine  # noqa: F401
