"""Template-driven differential fuzzing: LogQL queries and their DuckDB
oracles are BOTH mechanically derived from one random parameter draw, so
every seed exercises a fresh combination of matcher ops / line filters /
range functions / vector aggregations against the engine — the
conformance net under the hand-paired registry entries (same idea as the
reference's parser corpus tests, SURVEY §5, but end-to-end with values).

Seeds are fixed: failures reproduce exactly, and a new seed range is a
new corpus. Oracles compose the shared fingerprint/label mapping from
sources/oracle.py so they stay in lockstep with the views contract.
"""

import random

import pytest
from pyspark.sql import functions as F

from gigapipe_spark.logql.compiler import LogQLContext
from gigapipe_spark.logql.compiler import query as logql_query
from gigapipe_spark.sources.oracle import TYPE_CODE_SQL
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match

APPS = ["view", "click", "error", "signup", "purchase"]
LEVEL_SQL = "CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END"
FP_SQL = f"user_id*8 + {TYPE_CODE_SQL}"


def gen_case(seed: int) -> tuple[str, str, list]:
    """One draw → (logql_text, oracle_sql, spark_out_cols)."""
    rng = random.Random(seed)

    # --- stream selector -------------------------------------------------
    op = rng.choice(["=", "!=", "=~", "!~"])
    if op in ("=", "!="):
        val = rng.choice(APPS)
        matchers = [f'app{op}"{val}"']
        where = [f"event_type {'=' if op == '=' else '!='} '{val}'"]
    else:
        rx = "|".join(rng.sample(APPS, 2))
        matchers = [f'app{op}"{rx}"']
        neg = "NOT " if op == "!~" else ""
        where = [f"{neg}regexp_full_match(event_type, '{rx}')"]
    if rng.random() < 0.5:
        lv, lop = rng.choice(["info", "error"]), rng.choice(["=", "!="])
        matchers.append(f'level{lop}"{lv}"')
        where.append(f"{LEVEL_SQL} {'=' if lop == '=' else '!='} '{lv}'")
    sel = "{" + ", ".join(matchers) + "}"

    # --- line filter -----------------------------------------------------
    if rng.random() < 0.5:
        tok = rng.choice(["a", "e", "0", "k", "zz"])
        lf = rng.choice(["|=", "!="])
        sel += f' {lf} "{tok}"'
        where.append(f"strpos(props, '{tok}') {'>' if lf == '|=' else '='} 0")

    # --- range aggregation ----------------------------------------------
    rng_min = rng.choice([1, 5, 10, 30])
    rng_ns = rng_min * 60 * 10**9
    fn = rng.choice(["count_over_time", "bytes_over_time", "rate"])
    inner_val = {
        "count_over_time": "CAST(count(*) AS DOUBLE)",
        "bytes_over_time": "CAST(sum(length(props)) AS DOUBLE)",
        "rate": f"count(*)/{rng_min * 60}.0",
    }[fn]
    text = f"{fn}({sel} [{rng_min}m])"
    bucket = f"(epoch_ns(ts) - epoch_ns(ts) % {rng_ns})"
    where_sql = " AND ".join(where)

    # --- optional vector aggregation ------------------------------------
    if rng.random() < 0.45:
        agg = rng.choice(["sum", "max", "min", "avg", "count"])
        text = f"{agg} by (app) ({text})"
        outer_val = {
            "sum": "sum(value)",
            "max": "max(value)",
            "min": "min(value)",
            "avg": "avg(value)",
            "count": "CAST(count(*) AS DOUBLE)",
        }[agg]
        sql = f"""
        WITH per_series AS (
          SELECT event_type AS app, {FP_SQL} AS fingerprint,
                 {bucket} AS timestamp_ns, {inner_val} AS value
          FROM events WHERE {where_sql} GROUP BY 1, 2, 3
        )
        SELECT app, timestamp_ns, {outer_val} AS value
        FROM per_series GROUP BY 1, 2
        """
        cols = [lambda: F.col("labels")["app"].alias("app"), "timestamp_ns", "value"]
    else:
        sql = (
            f"SELECT {FP_SQL} AS fingerprint, {bucket} AS timestamp_ns,"
            f" {inner_val} AS value FROM events WHERE {where_sql} GROUP BY 1, 2"
        )
        cols = ["fingerprint", "timestamp_ns", "value"]
    return text, sql, cols


@pytest.mark.parametrize("seed", range(24))
def test_logql_differential(spark, seed):
    text, sql, cols = gen_case(seed)
    res = logql_query(LogQLContext(spark, SF_DIR), text)
    df = res.df.select(*[c() if callable(c) else c for c in cols])
    assert_match(df, sql, SF_DIR)


# --- PromQL: counter/gauge range functions over metric_samples ------------

from gigapipe_spark.promql.compiler import PromQLContext
from gigapipe_spark.promql.compiler import query as promql_query
from gigapipe_spark.sources.oracle import counter_cte

PROM_FNS = {
    # fn -> (aggregate expr over the in-bucket pair window d, divide_by_range)
    "rate": (
        "(max_by(value, timestamp_ns) - min_by(value, timestamp_ns)"
        " + sum(CASE WHEN prev > value THEN prev ELSE 0 END))",
        True,
    ),
    "increase": (
        "(max_by(value, timestamp_ns) - min_by(value, timestamp_ns)"
        " + sum(CASE WHEN prev > value THEN prev ELSE 0 END))",
        False,
    ),
    "delta": ("(max_by(value, timestamp_ns) - min_by(value, timestamp_ns))", False),
    "resets": (
        "CAST(sum(CASE WHEN prev IS NOT NULL AND prev > value THEN 1 ELSE 0 END) AS DOUBLE)",
        False,
    ),
    "changes": (
        "CAST(sum(CASE WHEN prev IS NOT NULL AND prev != value THEN 1 ELSE 0 END) AS DOUBLE)",
        False,
    ),
    "sum_over_time": ("sum(value)", False),
    "avg_over_time": ("avg(value)", False),
    "min_over_time": ("min(value)", False),
    "max_over_time": ("max(value)", False),
    "count_over_time": ("CAST(count(*) AS DOUBLE)", False),
}


def gen_prom_case(seed: int) -> tuple[str, str, list]:
    rng = random.Random(10_000 + seed)
    op = rng.choice(["=", "=~", "!="])
    if op == "=~":
        rx = "|".join(rng.sample(APPS, 2))
        matcher, where = f'app=~"{rx}"', f"regexp_full_match(app, '{rx}')"
    else:
        val = rng.choice(APPS)
        matcher = f'app{op}"{val}"'
        where = f"app {'=' if op == '=' else '!='} '{val}'"
    rng_min = rng.choice([10, 30, 60])
    rng_ns = rng_min * 60 * 10**9
    fn = rng.choice(list(PROM_FNS))
    val_expr, per_sec = PROM_FNS[fn]
    if per_sec:
        val_expr = f"{val_expr} / {rng_min * 60}.0"
    text = f"{fn}({{{matcher}}}[{rng_min}m])"
    base = counter_cte(rng_ns, where)
    if rng.random() < 0.45:
        agg = rng.choice(["sum", "max", "min", "avg"])
        text = f"{agg} by (app) ({text})"
        sql = (
            base
            + f""", per_series AS (
              SELECT any_value(app) AS app, fingerprint, bucket AS timestamp_ns,
                     {val_expr} AS value
              FROM d GROUP BY 2, 3
            )
            SELECT app, timestamp_ns, {agg}(value) AS value
            FROM per_series GROUP BY 1, 2
            """
        )
        cols = [lambda: F.col("labels")["app"].alias("app"), "timestamp_ns", "value"]
    else:
        sql = (
            base
            + f"""
            SELECT fingerprint, bucket AS timestamp_ns, {val_expr} AS value
            FROM d GROUP BY 1, 2
            """
        )
        cols = ["fingerprint", "timestamp_ns", "value"]
    return text, sql, cols


@pytest.mark.parametrize("seed", range(24))
def test_promql_differential(spark, seed):
    text, sql, cols = gen_prom_case(seed)
    df = promql_query(PromQLContext(spark, SF_DIR, step_ns=60_000_000_000), text)
    out = df.select(*[c() if callable(c) else c for c in cols])
    assert_match(out, sql, SF_DIR)


# --- TraceQL: attr/intrinsic spanset selectors over the spans CTE ---------

from gigapipe_spark.sources.oracle import with_spans
from gigapipe_spark.traceql.compiler import TraceQLContext
from gigapipe_spark.traceql.compiler import query as traceql_query

# (traceql_atom_template, sql_condition_template) pairs over the span
# attrs the fixture carries; {v} substituted per draw
TRACE_ATOMS = [
    ('returnflag = "{v}"', "returnflag = '{v}'", ["R", "A", "N"]),
    ('returnflag != "{v}"', "returnflag IS NOT NULL AND returnflag != '{v}'", ["R", "A"]),
    ('status = "{v}"', "status = '{v}'", ["F", "P", "O"]),
    ('priority =~ "{v}"', "regexp_matches(priority, '{v}')", ["1-.*", "2-.*|3-.*"]),
    ("duration > {v}ms", "duration_ns > {v}000000", ["50", "120", "200"]),
    ("duration < {v}ms", "duration_ns < {v}000000", ["80", "150"]),
    ('name = "{v}"', "name = '{v}'", ["order", "item"]),
    ('linestatus = "{v}"', "linestatus = '{v}'", ["O", "F"]),
]


def gen_trace_case(seed: int) -> tuple[str, str]:
    rng = random.Random(20_000 + seed)
    n_atoms = rng.choice([1, 2, 2, 3])
    atoms = rng.sample(TRACE_ATOMS, n_atoms)
    parts_q, parts_sql = [], []
    for tq, tsql, vals in atoms:
        v = rng.choice(vals)
        parts_q.append(tq.format(v=v))
        parts_sql.append("(" + tsql.format(v=v) + ")")
    ops = [rng.choice(["&&", "||"]) for _ in range(n_atoms - 1)]
    q_body, sql_body = parts_q[0], parts_sql[0]
    for op, pq, ps in zip(ops, parts_q[1:], parts_sql[1:]):
        q_body = f"{q_body} {op} {pq}"
        sql_body = f"{sql_body} {'AND' if op == '&&' else 'OR'} {ps}"
    text = "{ " + q_body + " }"
    sql = with_spans(f"SELECT trace_id, span_id FROM spans WHERE {sql_body}")
    return text, sql


@pytest.mark.parametrize("seed", range(16))
def test_traceql_differential(spark, seed):
    text, sql = gen_trace_case(seed)
    df = traceql_query(TraceQLContext(spark, SF_DIR), text).select(
        "trace_id", "span_id"
    )
    assert_match(df, sql, SF_DIR)


# --- LogQL json pipeline: numeric label filters + unwrap aggregations -----

UNWRAP_FNS = {
    "sum_over_time": "sum({v})",
    "avg_over_time": "avg({v})",
    "max_over_time": "max({v})",
    "min_over_time": "min({v})",
}
NUM_OPS = {">": ">", ">=": ">=", "<": "<", "<=": "<=", "==": "="}


def gen_json_case(seed: int) -> tuple[str, str, list]:
    rng = random.Random(30_000 + seed)
    app = rng.choice(APPS)
    sel = f'{{app="{app}"}}'
    where = [f"event_type = '{app}'"]
    k_sql = "CAST(json_extract_string(props, '$.k') AS DOUBLE)"
    flt = ""
    if rng.random() < 0.6:
        op = rng.choice(list(NUM_OPS))
        n = rng.randrange(10, 90)
        flt = f" | k {op} {n}"
        where.append(f"{k_sql} {NUM_OPS[op]} {n}")
    where_sql = " AND ".join(where)
    if rng.random() < 0.5:
        # log-line form: parser + numeric label filter
        text = f"{sel} | json{flt}"
        sql = (
            f"SELECT {FP_SQL} AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
            f" props AS string FROM events WHERE {where_sql}"
        )
        return text, sql, ["fingerprint", "timestamp_ns", "string"]
    fn = rng.choice(list(UNWRAP_FNS))
    rng_min = rng.choice([5, 10, 30])
    rng_ns = rng_min * 60 * 10**9
    text = f"{fn}({sel} | json{flt} | unwrap k [{rng_min}m]) by (app)"
    val = UNWRAP_FNS[fn].format(v=k_sql)
    sql = (
        f"SELECT '{app}' AS app,"
        f" (epoch_ns(ts) - epoch_ns(ts) % {rng_ns}) AS timestamp_ns,"
        f" {val} AS value FROM events WHERE {where_sql} GROUP BY 2"
    )
    return text, sql, [lambda: F.col("labels")["app"].alias("app"), "timestamp_ns", "value"]


@pytest.mark.parametrize("seed", range(16))
def test_logql_json_differential(spark, seed):
    text, sql, cols = gen_json_case(seed)
    res = logql_query(LogQLContext(spark, SF_DIR), text)
    df = res.df.select(*[c() if callable(c) else c for c in cols])
    assert_match(df, sql, SF_DIR)


# --- TraceQL structural ops: parent/child/sibling joins -------------------

PARENT_CONDS = [
    ('priority = "{v}"', "priority = '{v}'", ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
    ('status = "{v}"', "status = '{v}'", ["F", "O", "P"]),
]
CHILD_CONDS = [
    ('returnflag = "{v}"', "returnflag = '{v}'", ["R", "A", "N"]),
    ('linestatus = "{v}"', "linestatus = '{v}'", ["O", "F"]),
]


def _draw(rng, conds):
    tq, tsql, vals = rng.choice(conds)
    v = rng.choice(vals)
    return tq.format(v=v), tsql.format(v=v)


def gen_structural_case(seed: int) -> tuple[str, str]:
    rng = random.Random(40_000 + seed)
    op = rng.choice(["&>>", "!>>", "<<&", "~"])
    if op in ("&>>", "!>>"):
        pq, psql = _draw(rng, PARENT_CONDS)
        cq, csql = _draw(rng, CHILD_CONDS)
        text = f"{{ {pq} }} {op} {{ {cq} }}"
        pcond = psql if op == "&>>" else f"NOT ({psql})"
        sql = with_spans(
            f"""
            SELECT c.trace_id, c.span_id FROM spans c
            JOIN spans p ON c.trace_id = p.trace_id AND c.parent_id = p.span_id
            WHERE ({csql.replace("returnflag", "c.returnflag").replace("linestatus", "c.linestatus")})
              AND ({pcond.replace("priority", "p.priority").replace("status", "p.status")})
            """
        )
    elif op == "<<&":
        cq, csql = _draw(rng, CHILD_CONDS)
        pq, psql = _draw(rng, PARENT_CONDS)
        text = f"{{ {cq} }} <<& {{ {pq} }}"
        sql = with_spans(
            f"""
            SELECT DISTINCT p.trace_id, p.span_id FROM spans p
            JOIN spans c ON c.trace_id = p.trace_id AND c.parent_id = p.span_id
            WHERE ({psql.replace("priority", "p.priority").replace("status", "p.status")})
              AND ({csql.replace("returnflag", "c.returnflag").replace("linestatus", "c.linestatus")})
            """
        )
    else:  # sibling: both sides child-attr conds
        aq, asql = _draw(rng, CHILD_CONDS)
        bq, bsql = _draw(rng, CHILD_CONDS)
        text = f"{{ {aq} }} ~ {{ {bq} }}"
        sql = with_spans(
            f"""
            SELECT DISTINCT b.trace_id, b.span_id FROM spans b
            JOIN spans a ON a.trace_id = b.trace_id AND a.parent_id = b.parent_id
                        AND a.span_id != b.span_id
            WHERE ({bsql.replace("returnflag", "b.returnflag").replace("linestatus", "b.linestatus")})
              AND ({asql.replace("returnflag", "a.returnflag").replace("linestatus", "a.linestatus")})
              AND a.parent_id != '' AND b.parent_id != ''
            """
        )
    return text, sql


@pytest.mark.parametrize("seed", range(16))
def test_traceql_structural_differential(spark, seed):
    text, sql = gen_structural_case(seed)
    df = traceql_query(TraceQLContext(spark, SF_DIR), text).select(
        "trace_id", "span_id"
    )
    assert_match(df, sql, SF_DIR)


# --- LogQL offset modifier over random ranges/apps ------------------------


def gen_offset_case(seed: int) -> tuple[str, str]:
    rng = random.Random(50_000 + seed)
    app = rng.choice(APPS)
    rng_min = rng.choice([5, 10, 30])
    off_min = rng.choice([1, 5, 60])
    fn = rng.choice(["count_over_time", "rate", "bytes_over_time"])
    inner_val = {
        "count_over_time": "CAST(count(*) AS DOUBLE)",
        "bytes_over_time": "CAST(sum(length(props)) AS DOUBLE)",
        "rate": f"count(*)/{rng_min * 60}.0",
    }[fn]
    rng_ns, off_ns = rng_min * 60 * 10**9, off_min * 60 * 10**9
    text = f'{fn}({{app="{app}"}} [{rng_min}m] offset {off_min}m)'
    # ref bucket: (ts - offset) snapped to the range grid
    sql = (
        f"SELECT {FP_SQL} AS fingerprint,"
        f" ((epoch_ns(ts) - {off_ns}) - (epoch_ns(ts) - {off_ns}) % {rng_ns}) AS timestamp_ns,"
        f" {inner_val} AS value FROM events WHERE event_type = '{app}' GROUP BY 1, 2"
    )
    return text, sql


@pytest.mark.parametrize("seed", range(8))
def test_logql_offset_differential(spark, seed):
    text, sql = gen_offset_case(seed)
    res = logql_query(LogQLContext(spark, SF_DIR), text)
    assert_match(res.df.select("fingerprint", "timestamp_ns", "value"), sql, SF_DIR)


from gigapipe_spark.sources.oracle import METRIC_SAMPLES_CTE


def gen_prom_offset_case(seed: int) -> tuple[str, str]:
    rng = random.Random(60_000 + seed)
    app = rng.choice(APPS)
    rng_min = rng.choice([10, 30])
    off_min = rng.choice([5, 15, 60])
    fn = rng.choice(["sum_over_time", "max_over_time", "count_over_time"])
    val = {
        "sum_over_time": "sum(value)",
        "max_over_time": "max(value)",
        "count_over_time": "CAST(count(*) AS DOUBLE)",
    }[fn]
    rng_ns, off_ns = rng_min * 60 * 10**9, off_min * 60 * 10**9
    text = f'{fn}({{app="{app}"}}[{rng_min}m] offset {off_min}m)'
    # PromQL offset shifts the series FORWARD: the sample surfaces at
    # eval time ts+offset, then snaps to the range grid
    sql = (
        f"WITH {METRIC_SAMPLES_CTE} "
        f"SELECT fingerprint,"
        f" ((timestamp_ns + {off_ns}) - (timestamp_ns + {off_ns}) % {rng_ns}) AS timestamp_ns,"
        f" {val} AS value FROM metric_samples WHERE app = '{app}' GROUP BY 1, 2"
    )
    return text, sql


@pytest.mark.parametrize("seed", range(8))
def test_promql_offset_differential(spark, seed):
    text, sql = gen_prom_offset_case(seed)
    df = promql_query(PromQLContext(spark, SF_DIR, step_ns=60_000_000_000), text)
    assert_match(df.select("fingerprint", "timestamp_ns", "value"), sql, SF_DIR)


# --- textstats / paragraph dedup: Python-reference differential -----------
#
# The repetition/quality/paragraph operators claim exact, closed-form
# semantics; here an INDEPENDENT pure-Python implementation recomputes
# them over random multi-line corpora with planted duplicate lines,
# repeated n-grams and cross-doc boilerplate paragraphs.

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "of",
         "and", "x1", "y2", "#", "..."]


def _gen_corpus(rng: random.Random, n_docs: int) -> list[tuple[int, str]]:
    boiler = " ".join(rng.sample(WORDS, 4))
    docs = []
    for i in range(n_docs):
        lines = []
        for _ in range(rng.randint(1, 6)):
            ws = [rng.choice(WORDS) for _ in range(rng.randint(0, 12))]
            if rng.random() < 0.4 and ws:  # plant a repeated bigram run
                ws += ws[:2] * rng.randint(1, 3)
            lines.append(" ".join(ws))
        if rng.random() < 0.5:
            lines.append(boiler)  # cross-doc boilerplate paragraph
        if rng.random() < 0.4 and lines:
            lines.append(rng.choice(lines))  # within-doc duplicate line
        docs.append((i, "\n".join(lines)))
    return docs


def _round6(x: float) -> float:
    """Half-up rounding to 6 places (Spark/DuckDB semantics; Python's
    round() is banker's and disagrees on exact ties like 13/128)."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def _py_repetition(text: str) -> dict:
    import re

    nonspace = len(re.sub(r"\s+", "", text))
    lines = [l for l in text.split("\n") if l != ""]
    from collections import Counter

    lc = Counter(lines)
    n_lines = len(lines)
    dup_line_frac = (n_lines - len(lc)) / max(n_lines, 1)
    dup_chars = sum(c * len(l) for l, c in lc.items() if c > 1)
    all_chars = sum(c * len(l) for l, c in lc.items())
    out = {
        "n_lines": n_lines,
        "dup_line_frac": _round6(dup_line_frac),
        "dup_line_char_frac": _round6(dup_chars / max(all_chars, 1)),
    }
    ws = [w for w in re.split(r"\s+", text) if w != ""]
    for n in (2, 3, 4, 5):
        grams = [" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)]
        gc = Counter(grams)
        glen = {g: len(re.sub(r"\s+", "", g)) for g in gc}
        if n < 5:
            top = max((c * glen[g] for g, c in gc.items()), default=0)
            out[f"top_{n}gram_char_frac"] = _round6(top / max(nonspace, 1))
        else:
            dup = sum(c * glen[g] for g, c in gc.items() if c > 1)
            out["dup_5gram_char_frac"] = _round6(
                min(dup / max(nonspace, 1), 1.0)
            )
    return out


@pytest.mark.parametrize("seed", range(6))
def test_textstats_repetition_python_differential(spark, seed):
    from gigapipe_spark.datapipe import textstats

    rng = random.Random(40_000 + seed)
    docs = _gen_corpus(rng, 12)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in textstats.repetition_stats(d).collect()}
    for i, text in docs:
        want = _py_repetition(text)
        for k, v in want.items():
            assert abs(got[i][k] - v) < 1e-9, (seed, i, k, got[i][k], v, text)


@pytest.mark.parametrize("seed", range(6))
def test_paragraph_dedup_python_differential(spark, seed):
    from collections import Counter

    from gigapipe_spark.datapipe import dedup as dd

    rng = random.Random(50_000 + seed)
    docs = _gen_corpus(rng, 15)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in dd.paragraph_dedup(d).collect()}
    global_counts = Counter(
        p for _, text in docs for p in text.split("\n") if p != ""
    )
    for i, text in docs:
        paras = [p for p in text.split("\n") if p != ""]
        if not paras:
            assert i not in got
            continue
        n_dup = sum(1 for p in paras if global_counts[p] > 1)
        dup_chars = sum(len(p) for p in paras if global_counts[p] > 1)
        assert got[i]["n_paras"] == len(paras)
        assert abs(got[i]["dup_para_frac"] - _round6(n_dup / len(paras))) < 1e-9
        assert abs(
            got[i]["dup_para_char_frac"]
            - _round6(dup_chars / max(sum(len(p) for p in paras), 1))
        ) < 1e-9


# --- quantile functions: random φ against DuckDB quantile_cont ------------
#
# Spark percentile() and DuckDB quantile_cont() both implement linear
# interpolation at rank φ·(n−1) — the Prometheus/Loki quantile contract —
# so any (φ, selector, range) draw must agree to rounding.

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]


def gen_quantile_case(seed: int) -> tuple[str, str, bool]:
    rng = random.Random(60_000 + seed)
    q = rng.choice(QS)
    rng_min = rng.choice([10, 30, 60])
    rng_ns = rng_min * 60 * 10**9
    bucket = f"(epoch_ns(ts) - epoch_ns(ts) % {rng_ns})"
    if rng.random() < 0.5:
        # LogQL: unwrap a json field. Always regroup by (app): `| json`
        # re-fingerprints streams on the parsed label set (unwrapped
        # label removed — Loki semantics), so the bare per-series form
        # has no closed-form oracle fingerprint.
        apps = rng.sample(APPS, 2)
        by = True
        text = (
            f"quantile_over_time({q}, {{app=~\"{'|'.join(apps)}\"}}"
            f" | json | unwrap k [{rng_min}m]) by (app)"
        )
        sql = f"""
        SELECT event_type AS app, {bucket} AS timestamp_ns,
               round(quantile_cont(CAST(json_extract_string(props, '$.k') AS DOUBLE), {q}), 4) AS value
        FROM events WHERE event_type IN ('{apps[0]}','{apps[1]}')
        GROUP BY 1, 2
        """
        return text, sql, by
    # PromQL over metric samples
    val = rng.choice(APPS)
    text = f'quantile_over_time({q}, {{app="{val}"}}[{rng_min}m])'
    base = counter_cte(rng_ns, f"app = '{val}'")
    sql = (
        base
        + f"""
        SELECT fingerprint, bucket AS timestamp_ns,
               round(quantile_cont(value, {q}), 4) AS value
        FROM d GROUP BY 1, 2
        """
    )
    return text, sql, None


@pytest.mark.parametrize("seed", range(10))
def test_quantile_differential(spark, seed):
    text, sql, by = gen_quantile_case(seed)
    if by is None:
        df = promql_query(PromQLContext(spark, SF_DIR, step_ns=60_000_000_000), text)
        out = df.select(
            "fingerprint", "timestamp_ns", F.round("value", 4).alias("value")
        )
    else:
        res = logql_query(LogQLContext(spark, SF_DIR), text)
        key = (
            F.col("labels")["app"].alias("app")
            if by
            else F.col("fingerprint")
        )
        out = res.df.select(key, "timestamp_ns", F.round("value", 4).alias("value"))
    assert_match(out, sql, SF_DIR)


# --- TraceQL metrics: random filter × agg × by() against SPANS_CTE -------

from gigapipe_spark.sources.oracle import with_spans
from gigapipe_spark.traceql.compiler import TraceQLContext
from gigapipe_spark.traceql.compiler import query as traceql_query

TM_AGGS = {
    # metrics fn text -> (sql value expr, needs round)
    "rate()": ("round(count(*) / {step_s}.0, 6)", True),
    "count_over_time()": ("CAST(count(*) AS DOUBLE)", False),
    "avg_over_time(quantity)": ("round(avg(CAST(quantity AS DOUBLE)), 6)", True),
    "max_over_time(quantity)": ("round(CAST(max(CAST(quantity AS DOUBLE)) AS DOUBLE), 6)", True),
    "min_over_time(duration)": ("round(CAST(min(duration_ns) AS DOUBLE), 6)", True),
    "sum_over_time(quantity)": ("round(CAST(sum(CAST(quantity AS DOUBLE)) AS DOUBLE), 6)", True),
}
TM_BYS = [None, ("returnflag", "returnflag"), ("linestatus", "linestatus")]


def gen_trace_metrics_case(seed: int):
    rng = random.Random(70_000 + seed)
    tq, tsql, vals = rng.choice(
        [a for a in TRACE_ATOMS if not a[0].startswith("duration")]
    )
    v = rng.choice(vals)
    fn = rng.choice(sorted(TM_AGGS))
    # quantity/returnflag/linestatus live on 'item' spans only: pin name
    # so attr targets and by() groups are non-null (null-group semantics
    # are covered by the hand-paired registry entries)
    sel = f'name = "item" && {tq.format(v=v)}'
    where = f"name = 'item' AND ({tsql.format(v=v)})"
    step_h = rng.choice([1, 2])
    step_ns = step_h * 3600 * 10**9
    by = rng.choice(TM_BYS)
    val_sql, needs_round = TM_AGGS[fn]
    val_sql = val_sql.format(step_s=step_h * 3600)
    text = f"{{ {sel} }} | {fn}"
    by_cols = ""
    if by is not None:
        text += f" by ({by[0]})"
        by_cols = f"{by[1]}, "
    sql = with_spans(
        f"""
        SELECT {by_cols}(timestamp_ns - timestamp_ns % {step_ns}) AS timestamp_ns,
               {val_sql} AS value
        FROM spans WHERE {where} GROUP BY {"1, 2" if by is not None else "1"}
        """
    )
    cols = ([by[0]] if by is not None else []) + ["timestamp_ns"]
    return text, sql, cols, needs_round, step_ns


@pytest.mark.parametrize("seed", range(12))
def test_traceql_metrics_differential(spark, seed):
    text, sql, cols, needs_round, step_ns = gen_trace_metrics_case(seed)
    df = traceql_query(TraceQLContext(spark, SF_DIR, step_ns=step_ns), text)
    val = F.round("value", 6).alias("value") if needs_round else F.col("value")
    assert_match(df.select(*cols, val), sql, SF_DIR)


# --- histogram_quantile: random bucket layouts vs a Python Prometheus ----
#
# Reference algorithm: prometheus/promql/quantile.go bucketQuantile —
# rank = q·total over the cumulative counts, first bucket whose count
# reaches the rank, linear interpolation inside it, +Inf bucket returns
# the previous upper bound.


def _py_bucket_quantile(q: float, les: list, counts: list) -> float:
    total = counts[-1]  # +Inf cumulative = observation count
    rank = q * total
    for i, (le, c) in enumerate(zip(les, counts)):
        if c >= rank:
            prev_le = les[i - 1] if i > 0 else 0.0
            prev_c = counts[i - 1] if i > 0 else 0.0
            if les[i] == float("inf"):
                return prev_le
            denom = max(c - prev_c, 1e-12)
            return prev_le + (le - prev_le) * (rank - prev_c) / denom
    return les[-2] if len(les) > 1 else 0.0


@pytest.mark.parametrize("seed", range(8))
def test_histogram_quantile_python_differential(spark, seed):
    from gigapipe_spark.promql.functions import histogram_quantile

    rng = random.Random(90_000 + seed)
    q = rng.choice([0.5, 0.9, 0.95, 0.99, 0.1])
    n_buckets = rng.randint(2, 6)
    bounds = sorted(rng.sample([0.005, 0.01, 0.05, 0.1, 0.5, 1.0, 5.0, 10.0], n_buckets))
    les = bounds + [float("inf")]
    rows, expected = [], {}
    for series in ("api", "web"):
        for ts in (0, 60_000_000_000):
            counts, c = [], 0.0
            for _ in les:
                c += rng.randint(0, 20)
                counts.append(c)
            if counts[-1] == 0:
                counts[-1] = 1.0
            for le, cnt in zip(les, counts):
                le_str = "+Inf" if le == float("inf") else str(le)
                rows.append(({"job": series, "le": le_str}, ts, float(cnt)))
            expected[(series, ts)] = _py_bucket_quantile(q, les, counts)
    df = spark.createDataFrame(
        rows, "labels map<string,string>, timestamp_ns long, value double"
    )
    got = {
        (r["labels"]["job"], r["timestamp_ns"]): r["value"]
        for r in histogram_quantile(df, q).collect()
    }
    assert set(got) == set(expected), (seed, sorted(got), sorted(expected))
    for k, want in expected.items():
        assert abs(got[k] - want) < 1e-9, (seed, k, got[k], want)


def test_histogram_quantile_out_of_range_q(spark):
    """Upstream bucketQuantile: q<0 -> -Inf, q>1 -> +Inf, NaN -> NaN,
    one row per series/timestamp."""
    import math

    from gigapipe_spark.promql.functions import histogram_quantile

    rows = [
        ({"job": "api", "le": "1.0"}, 0, 3.0),
        ({"job": "api", "le": "+Inf"}, 0, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "labels map<string,string>, timestamp_ns long, value double"
    )
    low = histogram_quantile(df, -0.5).collect()
    assert len(low) == 1 and low[0]["value"] == float("-inf")
    high = histogram_quantile(df, 1.5).collect()
    assert len(high) == 1 and high[0]["value"] == float("inf")
    nan = histogram_quantile(df, float("nan")).collect()
    assert len(nan) == 1 and math.isnan(nan[0]["value"])


# --- deriv / predict_linear: random selector × range × horizon -----------

from gigapipe_spark.sources.oracle import METRIC_SAMPLES_CTE


@pytest.mark.parametrize("seed", range(8))
def test_deriv_predict_linear_differential(spark, seed):
    rng = random.Random(95_000 + seed)
    val = rng.choice(APPS)
    rng_min = rng.choice([30, 60, 120])
    rng_ns = rng_min * 60 * 10**9
    if rng.random() < 0.5:
        horizon = rng.choice([60, 300, 900])
        text = f'predict_linear({{app="{val}"}}[{rng_min}m], {horizon})'
        val_sql = (
            f"round(regr_intercept(value, timestamp_ns / 1e9)"
            f" + regr_slope(value, timestamp_ns / 1e9)"
            f" * (max(timestamp_ns / 1e9) + {horizon}.0), 4)"
        )
    else:
        text = f'deriv({{app="{val}"}}[{rng_min}m])'
        val_sql = "round(regr_slope(value, timestamp_ns / 1e9), 4)"
    sql = f"""
    WITH {METRIC_SAMPLES_CTE}
    SELECT fingerprint, (timestamp_ns - timestamp_ns % {rng_ns}) AS timestamp_ns,
           {val_sql} AS value
    FROM metric_samples WHERE app = '{val}' GROUP BY 1, 2
    """
    df = promql_query(PromQLContext(spark, SF_DIR, step_ns=rng_ns), text)
    out = df.select("fingerprint", "timestamp_ns", F.round("value", 4).alias("value"))
    assert_match(out, sql, SF_DIR)


# --- curation-operator differentials: random corpora vs pure-Python -------
#
# The registry oracles pin these ops at sf0.01; these seeds re-derive the
# math in plain Python over random corpora so corpus shape (empty docs,
# boilerplate, one-word docs, label skew) can't hide a semantics drift.


@pytest.mark.parametrize("seed", range(6))
def test_word_entropy_python_differential(spark, seed):
    import math
    import re
    from collections import Counter

    from gigapipe_spark.datapipe import textstats

    rng = random.Random(60_000 + seed)
    docs = _gen_corpus(rng, 12)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["entropy"] for r in textstats.word_entropy(d).collect()}
    for i, text in docs:
        ws = [w for w in re.split(r"\s+", text) if w]
        if not ws:
            assert i not in got
            continue
        c = Counter(ws)
        n = len(ws)
        want = -sum((k / n) * math.log(k / n) for k in c.values())
        assert abs(got[i] - _round6(want)) < 1e-9, (seed, i)


@pytest.mark.parametrize("seed", range(6))
def test_bigram_logprob_python_differential(spark, seed):
    import math
    import re
    from collections import Counter

    from gigapipe_spark.datapipe import textstats

    rng = random.Random(70_000 + seed)
    docs = _gen_corpus(rng, 12)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in textstats.bigram_logprob(d).collect()
    }
    tokenized = {
        i: [w for w in re.split(r"\s+", text) if w] for i, text in docs
    }
    uni = Counter(w for ws in tokenized.values() for w in ws)
    total = sum(uni.values())
    bg = Counter(
        (ws[j], ws[j + 1])
        for ws in tokenized.values()
        for j in range(len(ws) - 1)
    )
    starts = Counter(w1 for (w1, _), c in bg.items() for _ in range(c))
    for i, ws in tokenized.items():
        if not ws:
            assert i not in got
            continue
        lp = math.log(uni[ws[0]] / total)
        for j in range(len(ws) - 1):
            lp += math.log(bg[(ws[j], ws[j + 1])] / starts[ws[j]])
        want = lp / len(ws)
        assert got[i]["n_tokens"] == len(ws), (seed, i)
        assert abs(got[i]["mean_logprob"] - _round6(want)) < 1e-6, (seed, i)


@pytest.mark.parametrize("seed", range(6))
def test_nb_classifier_python_differential(spark, seed):
    """Full NB train+apply re-derived in Python: bounded vocabulary with
    (count desc, word) tie-break, add-one smoothing, OOV skip,
    prior-only fallback, (score, label) argmax."""
    import math
    import re
    from collections import Counter

    from gigapipe_spark.datapipe import textstats

    rng = random.Random(80_000 + seed)
    corpus = _gen_corpus(rng, 14)
    labels = {i: rng.choice(["good", "junk", "meh"]) for i, _ in corpus}
    rows = [(i, text, labels[i]) for i, text in corpus]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    max_vocab = 8  # small: exercises the bound and the OOV path hard
    got = {
        r["doc_id"]: r.asDict()
        for r in textstats.nb_classifier(d, max_vocab=max_vocab).collect()
    }
    tokenized = {
        i: [w for w in re.split(r"\s+", t) if w]
        for i, t in corpus
        if [w for w in re.split(r"\s+", t) if w]
    }
    uni = Counter(w for ws in tokenized.values() for w in ws)
    vocab = {
        w for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    }
    v = len(vocab)
    lab_docs = Counter(labels[i] for i in tokenized)
    t = sum(lab_docs.values())
    wl = Counter(
        (labels[i], w) for i, ws in tokenized.items() for w in ws if w in vocab
    )
    ltot = Counter()
    for (lab, _), c in wl.items():
        ltot[lab] += c
    for i, ws in tokenized.items():
        scores = {}
        for lab in lab_docs:
            s = math.log(lab_docs[lab] / t)
            for w in ws:
                if w in vocab:
                    s += math.log((wl[(lab, w)] + 1) / (ltot[lab] + v))
            scores[lab] = s
        want = max(scores, key=lambda lab: (scores[lab], lab))
        assert got[i]["predicted"] == want, (seed, i, scores, got[i])
        assert abs(got[i]["score"] - _round6(scores[want])) < 1e-6, (seed, i)
        assert got[i]["label"] == labels[i]


@pytest.mark.parametrize("seed", range(6))
def test_trigram_backoff_python_differential(spark, seed):
    """Stupid backoff (Brants 2007) with a count-pruning floor,
    re-derived in Python: trigram MLE when the trigram count clears
    min_count, else 0.4 x bigram level, else 0.16 x unigram."""
    import math
    import re
    from collections import Counter

    from gigapipe_spark.datapipe import textstats

    rng = random.Random(90_000 + seed)
    docs = _gen_corpus(rng, 12)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    mc = 2
    got = {
        r["doc_id"]: r.asDict()
        for r in textstats.trigram_backoff_logprob(d, min_count=mc).collect()
    }
    tokenized = {
        i: [w for w in re.split(r"\s+", t) if w] for i, t in docs
    }
    uni = Counter(w for ws in tokenized.values() for w in ws)
    n = sum(uni.values())
    bi = Counter(
        (ws[j], ws[j + 1])
        for ws in tokenized.values()
        for j in range(len(ws) - 1)
    )
    tri = Counter(
        (ws[j], ws[j + 1], ws[j + 2])
        for ws in tokenized.values()
        for j in range(len(ws) - 2)
    )

    def s_uni(w):
        return uni[w] / n

    def s_bi(v, w):
        if bi[(v, w)] >= mc:
            return bi[(v, w)] / uni[v]
        return 0.4 * s_uni(w)

    def s_tri(u, v, w):
        if tri[(u, v, w)] >= mc:
            return tri[(u, v, w)] / bi[(u, v)]
        return 0.4 * s_bi(v, w)

    for i, ws in tokenized.items():
        if not ws:
            assert i not in got
            continue
        lp = math.log(s_uni(ws[0]))
        if len(ws) > 1:
            lp += math.log(s_bi(ws[0], ws[1]))
        for j in range(2, len(ws)):
            lp += math.log(s_tri(ws[j - 2], ws[j - 1], ws[j]))
        want = lp / len(ws)
        assert got[i]["n_tokens"] == len(ws), (seed, i)
        assert abs(got[i]["mean_logprob"] - _round6(want)) < 1e-6, (
            seed, i, got[i]["mean_logprob"], want,
        )


@pytest.mark.parametrize("seed", range(4))
def test_bm25_python_differential(spark, seed):
    """BM25 (k1=1.2, b=0.75, Lucene +1 IDF) re-derived in Python over
    random corpora and random 2-3 word queries; ranks compare on the
    rounded score with doc-id ties, exactly the operator's contract."""
    import math
    import re
    from collections import Counter

    from gigapipe_spark.datapipe import textstats

    rng = random.Random(95_000 + seed)
    docs = _gen_corpus(rng, 15)
    queries = [
        (qid, " ".join(rng.sample(WORDS, rng.randint(2, 3))))
        for qid in range(3)
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    k = 5
    got = [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in textstats.bm25_topk(d, queries, k=k).collect()
    ]
    tokenized = {
        i: [w for w in re.split(r"\s+", t) if w]
        for i, t in docs
        if [w for w in re.split(r"\s+", t) if w]
    }
    n = len(tokenized)
    avgdl = sum(len(ws) for ws in tokenized.values()) / n
    df = Counter()
    for ws in tokenized.values():
        for t in set(ws):
            df[t] += 1
    want = []
    for qid, q in queries:
        scores = {}
        for i, ws in tokenized.items():
            tf = Counter(ws)
            s = 0.0
            hit = False
            for t in set(q.split()):
                if tf[t] == 0:
                    continue
                hit = True
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += idf * (tf[t] * 2.2) / (
                    tf[t] + 1.2 * (1 - 0.75 + 0.75 * len(ws) / avgdl)
                )
            if hit:
                scores[i] = _round6(s)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        want += [(qid, r + 1, i, s) for r, (i, s) in enumerate(ranked)]
    assert sorted(got) == sorted(want), (seed, got, want)


@pytest.mark.parametrize("seed", range(4))
def test_span_removal_python_differential(spark, seed):
    """detect+remove re-derived in Python: mark every position whose
    k-gram recurs corpus-wide, merge marked positions into maximal
    covered intervals, drop covered words, rejoin."""
    import re
    from collections import Counter

    from gigapipe_spark.datapipe.dedup import (
        remove_spans,
        repeated_substring_spans,
    )

    k = 4  # small k so random corpora actually contain repeats
    rng = random.Random(97_000 + seed)
    docs = _gen_corpus(rng, 12)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_spans(d, repeated_substring_spans(d, k=k)).collect()
    }
    tokenized = {
        i: [w for w in re.split(r"\s+", t) if w] for i, t in docs
    }
    grams = Counter(
        tuple(ws[j:j + k])
        for ws in tokenized.values()
        for j in range(len(ws) - k + 1)
    )
    for i, ws in tokenized.items():
        covered = set()
        for j in range(len(ws) - k + 1):
            if grams[tuple(ws[j:j + k])] > 1:
                covered.update(range(j, j + k))
        kept = [w for p, w in enumerate(ws) if p not in covered]
        assert got[i]["clean_text"] == " ".join(kept), (seed, i)
        assert got[i]["n_removed_words"] == len(covered), (seed, i)


@pytest.mark.parametrize("seed", range(4))
def test_tfidf_keywords_python_differential(spark, seed):
    import math
    import re
    from collections import Counter

    from gigapipe_spark.datapipe import textstats

    rng = random.Random(98_000 + seed)
    docs = _gen_corpus(rng, 12)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    k = 4
    got = [
        (r["doc_id"], r["rank"], r["term"], r["tfidf"])
        for r in textstats.tfidf_keywords(d, k=k).collect()
    ]
    tokenized = {
        i: [w for w in re.split(r"\s+", t) if w]
        for i, t in docs
        if [w for w in re.split(r"\s+", t) if w]
    }
    n = len(tokenized)
    df = Counter()
    for ws in tokenized.values():
        for t in set(ws):
            df[t] += 1
    want = []
    for i, ws in tokenized.items():
        tf = Counter(ws)
        scores = {
            t: _round6((c / len(ws)) * math.log(n / df[t]))
            for t, c in tf.items()
        }
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        want += [(i, r + 1, t, s) for r, (t, s) in enumerate(ranked)]
    assert sorted(got) == sorted(want), (seed,)
