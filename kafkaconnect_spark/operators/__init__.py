from kafkaconnect_spark.operators.transforms import TRANSFORM_REGISTRY, build_transform_chain  # noqa: F401
