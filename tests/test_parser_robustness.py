"""Garbage-in robustness: mutated query strings must raise the
parser's own syntax error (a ValueError subclass), never an internal
IndexError/KeyError/AttributeError/TypeError — a query frontend
rejects bad input with a 400, it does not crash."""

import random

import pytest

from gigapipe_spark.logql.parser import parse as logql_parse
from gigapipe_spark.promql.parser import parse as promql_parse
from gigapipe_spark.traceql.parser import parse as traceql_parse

SEEDS = [
    ('logql', logql_parse, 'sum by (app) (rate({app="view", level=~"a|b"} |= "x" | json | k > 5 [5m]))'),
    ('logql', logql_parse, '{a="b"} | logfmt x, y="z" | line_format "{{.x}}" | unwrap k [1m]'),
    ('promql', promql_parse, 'histogram_quantile(0.9, sum by (le) (rate(http_total{app!="x"}[5m])))'),
    ('promql', promql_parse, 'clamp_max(avg_over_time(up{job=~"a.*"}[10m] offset 5m), 1)'),
    ('traceql', traceql_parse, '{ name = "item" && duration > 50ms } | avg_over_time(quantity) by (returnflag)'),
    ('traceql', traceql_parse, '{ .a = "x" } &>> { resource.b != "y" }'),
]

ALLOWED = (ValueError,)  # LogQLSyntaxError / TraceQLSyntaxError subclass it


def _mutations(rng, q):
    yield q[: rng.randrange(len(q))]                      # truncate
    i = rng.randrange(len(q))
    yield q[:i] + rng.choice('()[]{}|="~,') + q[i:]       # insert
    i = rng.randrange(len(q))
    yield q[:i] + q[i + 1:]                               # delete
    yield q.replace('"', "", rng.randint(1, 2))           # unbalance quotes
    chars = list(q)
    rng.shuffle(chars)
    yield "".join(chars[: rng.randrange(1, len(q))])      # full scramble


@pytest.mark.parametrize("idx", range(len(SEEDS)))
def test_parser_never_crashes(idx):
    name, fn, q = SEEDS[idx]
    rng = random.Random(31_000 + idx)
    for round_ in range(40):
        for m in _mutations(rng, q):
            try:
                fn(m)
            except ALLOWED:
                pass
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"{name} parser crashed with {type(e).__name__} on {m!r}"
                ) from e
