"""Local replica of the driver's DuckDB-oracle compare.

Runs a Spark DataFrame and a DuckDB SQL string over the same sf dir,
sorts columns by name, rounds floats, and compares the multisets of rows.
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def compare(spark_df, sql: str, sf_dir: str, check_schema: bool = True):
    """Returns (ok, message). Order-insensitive, column-name-sorted."""
    sdf = spark_df.toPandas()
    con = duck_conn(sf_dir)
    odf = con.execute(sql).df()
    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    if check_schema and s_cols != o_cols:
        return False, f"columns differ: spark={s_cols} oracle={o_cols}"
    if len(sdf) != len(odf):
        return False, f"row counts differ: spark={len(sdf)} oracle={len(odf)}"
    srows = sorted(
        [tuple(_norm(v) for v in row) for row in sdf[s_cols].itertuples(index=False)],
        key=repr,
    )
    orows = sorted(
        [tuple(_norm(v) for v in row) for row in odf[o_cols].itertuples(index=False)],
        key=repr,
    )
    if srows != orows:
        diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        return False, f"values differ, first diffs: {diff}"
    return True, f"ok ({len(sdf)} rows)"


def assert_match(spark_df, sql: str, sf_dir: str):
    ok, msg = compare(spark_df, sql, sf_dir)
    assert ok, msg
