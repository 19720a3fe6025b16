"""DuckDB CTE snippets that mirror sources/views.py exactly.

Each oracle_sql() entry in __spark_entry__.py composes these WITH-clause
bodies so the oracle derives the identical observability inputs from the
same parquet views (events/orders/lineitem/...). Keep in lockstep with
views.py — the mapping contract lives there.
"""

from __future__ import annotations

TYPE_CODE_SQL = (
    "CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1 "
    "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'error' THEN 4 ELSE 7 END"
)

# Carries app/instance/level alongside so label-grouping oracles don't
# need a map type (DuckDB maps hash differently from Spark maps anyway —
# final SELECTs always project plain columns).
SAMPLES_CTE = f"""
samples AS (
  SELECT user_id * 8 + {TYPE_CODE_SQL} AS fingerprint,
         epoch_ns(ts) AS timestamp_ns,
         CAST(value AS DOUBLE) AS value,
         props AS string,
         event_type AS app,
         'u' || CAST(user_id AS VARCHAR) AS instance,
         CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END AS level
  FROM events
)
"""

METRIC_SAMPLES_CTE = f"""
metric_samples AS (
  SELECT fingerprint, timestamp_ns, app, instance, level,
         fmod(SUM(value) OVER (PARTITION BY fingerprint ORDER BY timestamp_ns
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1000.0) AS value
  FROM (
    SELECT user_id * 8 + {TYPE_CODE_SQL} AS fingerprint,
           epoch_ns(ts) AS timestamp_ns,
           CAST(value AS DOUBLE) AS value,
           event_type AS app,
           'u' || CAST(user_id AS VARCHAR) AS instance,
           CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END AS level
    FROM events
  )
)
"""

# span ordinal disambiguates duplicate (orderkey, linenumber) pairs in the
# synthetic lineitem — keep the ORDER BY list in lockstep with
# views._lineitem_with_span_no
SPANS_CTE = """
spans AS (
  SELECT 't' || CAST(o_orderkey AS VARCHAR) AS trace_id,
         's' || CAST(o_orderkey AS VARCHAR) || '_0' AS span_id,
         '' AS parent_id,
         'order' AS name,
         epoch_ns(o_orderdate) AS timestamp_ns,
         CAST(floor(o_totalprice * 1000) AS BIGINT) AS duration_ns,
         'svc-' || o_orderpriority AS service_name,
         o_orderstatus AS status,
         o_orderpriority AS priority,
         NULL AS returnflag,
         NULL AS linestatus,
         NULL AS quantity
  FROM orders
  UNION ALL
  SELECT 't' || CAST(l_orderkey AS VARCHAR),
         's' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
             || '_' || CAST(row_number() OVER (
                  PARTITION BY l_orderkey, l_linenumber
                  ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice,
                           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
                ) AS VARCHAR),
         's' || CAST(l_orderkey AS VARCHAR) || '_0',
         'item',
         epoch_ns(l_shipdate),
         CAST(floor(l_extendedprice * 1000) AS BIGINT),
         'svc-item',
         NULL, NULL,
         l_returnflag, l_linestatus,
         CAST(l_quantity AS VARCHAR) AS quantity
  FROM lineitem
)
"""


# Keep in lockstep with views.profiles_series (every order is a profile
# series) and views.profiles (the fact: only orders with lineitems; the
# tree is 1 root + one node per distinct returnflag).
PROF_SERIES_CTE = """
prof_series AS (
  SELECT o_orderkey AS fingerprint,
         'svc-' || o_orderpriority AS service_name,
         o_orderstatus AS status,
         o_orderpriority AS priority
  FROM orders
)
"""

PROF_CTE = """
prof AS (
  SELECT o.o_orderkey AS fingerprint,
         epoch_ns(o.o_orderdate) AS timestamp_ns,
         'svc-' || o.o_orderpriority AS service_name,
         o.o_orderstatus AS status,
         o.o_orderpriority AS priority,
         CAST(floor(o.o_totalprice * 1000) AS BIGINT) AS value,
         1 + li.nflags AS nodes
  FROM orders o JOIN (
    SELECT l_orderkey, count(DISTINCT l_returnflag) AS nflags
    FROM lineitem GROUP BY 1
  ) li ON li.l_orderkey = o.o_orderkey
)
"""


def counter_cte(rng_ns: int, where: str) -> str:
    """Per-bucket consecutive-pair window over metric_samples — the
    oracle-side mirror of the PromQL counter computation."""
    return f"""
    WITH {METRIC_SAMPLES_CTE}, d AS (
      SELECT fingerprint, timestamp_ns, value, app, instance, level,
             (timestamp_ns - timestamp_ns % {rng_ns}) AS bucket,
             lag(value) OVER (PARTITION BY fingerprint, (timestamp_ns - timestamp_ns % {rng_ns})
                              ORDER BY timestamp_ns) AS prev
      FROM metric_samples WHERE {where}
    )
    """


def with_samples(body: str) -> str:
    return f"WITH {SAMPLES_CTE} {body}"


def with_metric_samples(body: str) -> str:
    return f"WITH {METRIC_SAMPLES_CTE} {body}"


def with_spans(body: str) -> str:
    return f"WITH {SPANS_CTE} {body}"
