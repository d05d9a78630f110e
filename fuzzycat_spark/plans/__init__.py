from fuzzycat_spark.plans.checkpoint import StageCheckpointer  # noqa: F401
