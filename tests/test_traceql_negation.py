"""Negated structural ops (!>> not-descendant, <<~ not-ancestor) and the
|> line-filter pattern — previously implemented but unexercised."""

from gigapipe_spark.logql.compiler import LogQLContext
from gigapipe_spark.logql.compiler import query as logql_query
from gigapipe_spark.traceql.compiler import TraceQLContext, query
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match
from gigapipe_spark.sources.oracle import with_spans


def ids(df):
    return df.select("trace_id", "span_id")


def test_not_descendant(spark):
    # R-flagged items NOT under an urgent order
    df = ids(query(TraceQLContext(spark, SF_DIR), '{ priority = "1-URGENT" } !>> { returnflag = "R" }'))
    assert_match(
        df,
        with_spans(
            """
            SELECT c.trace_id, c.span_id FROM spans c
            JOIN spans p ON c.trace_id = p.trace_id AND c.parent_id = p.span_id
            WHERE c.returnflag = 'R' AND p.priority != '1-URGENT'
            """
        ),
        SF_DIR,
    )


def test_descendant_plus_negation_partition(spark):
    # &>> and !>> partition the right-hand span set
    c = TraceQLContext(spark, SF_DIR)
    pos = query(c, '{ priority = "1-URGENT" } &>> { returnflag = "R" }').count()
    neg = query(c, '{ priority = "1-URGENT" } !>> { returnflag = "R" }').count()
    allr = query(c, '{ returnflag = "R" }').count()
    assert pos + neg == allr


def test_not_ancestor(spark):
    c = TraceQLContext(spark, SF_DIR)
    pos = query(c, '{ returnflag = "R" } <<& { name = "order" }').count()
    neg = query(c, '{ returnflag = "R" } <<~ { name = "order" }').count()
    allorders = query(c, '{ name = "order" }').count()
    assert pos + neg == allorders
    assert 0 < pos < allorders


def test_logql_pattern_filter(spark):
    # |> with <_> wildcards compiles to an anchored regex
    res = logql_query(LogQLContext(spark, SF_DIR), '{app="view"} |> "{\\"k\\": 8<_>}"')
    assert_match(
        res.df.select("fingerprint", "timestamp_ns", "string"),
        "SELECT user_id*8+1 AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
        " props AS string FROM events WHERE event_type='view'"
        " AND regexp_matches(props, '^\\{\"k\": 8.*\\}$')",
        SF_DIR,
    )
