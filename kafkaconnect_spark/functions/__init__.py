from kafkaconnect_spark.functions.serde import (  # noqa: F401
    connect_schema_for,
    json_deserialize,
    json_serialize,
)
