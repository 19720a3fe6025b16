from gigapipe_spark.traceql.parser import parse  # noqa: F401
