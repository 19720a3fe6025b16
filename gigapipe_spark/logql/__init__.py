from gigapipe_spark.logql.parser import parse  # noqa: F401
