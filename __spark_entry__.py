"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check at sf0.001.
queries()     — one entry per implemented operator (SURVEY §2), each
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — matching DuckDB ANSI SQL per query key.

The real catalog lives in gigapipe_spark/registry.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LogQL selector + line filter + rate + sum by + topk,
    end-to-end through the engine, on sf0.001."""
    from gigapipe_spark.logql.compiler import LogQLContext, query
    from pyspark.sql import functions as F

    res = query(
        LogQLContext(spark, "/root/testdata/sf0.001"),
        'topk(2, sum by (app) (rate({level="info"} |= "k" [10m])))',
    )
    return res.df.select(
        F.col("labels").getItem("app").alias("app"),
        "timestamp_ns",
        F.round("value", 6).alias("value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gigapipe_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from gigapipe_spark import registry

    return registry.oracle_sql()
