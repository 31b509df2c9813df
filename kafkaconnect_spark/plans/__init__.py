from kafkaconnect_spark.plans.spec import PipelineSpec, SpecError  # noqa: F401
