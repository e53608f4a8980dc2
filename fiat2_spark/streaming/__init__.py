from fiat2_spark.streaming.maintenance import MaterializedView  # noqa: F401
