from gigapipe_spark.promql.parser import parse  # noqa: F401
