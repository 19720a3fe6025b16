"""Hand-rolled PromQL parser (pushdown-first subset).

The reference embeds the upstream Prometheus engine and pushes eligible
subtrees down to SQL (ref: reader/promql/promql_transpiler/
transpiler_v2.go + optimizer/vector_range.go, vector_agg.go). There is no
embeddable Prometheus engine in Python, so this rebuild parses PromQL
itself and compiles the full supported surface natively to DataFrames —
the reference's pushdown planners become the primary execution path
(SURVEY §2.4 note).

Grammar subset:
  expr     := term (binop term)*
  term     := number | fn '(' expr ')' | agg [grp] '(' expr ')' [grp]
            | selector ['[' dur ']'] ['offset' dur]
  selector := metric? '{' matcher* '}' | metric
"""

from __future__ import annotations

from dataclasses import dataclass, field

from gigapipe_spark.logql.ast import Matcher
from gigapipe_spark.logql.parser import (
    LogQLSyntaxError,
    parse_duration_ns,
    tokenize,
    unquote,
)

RANGE_FNS = {
    "rate",
    "increase",
    "delta",
    "idelta",
    "irate",
    "resets",
    "changes",
    "sum_over_time",
    "count_over_time",
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "last_over_time",
    "first_over_time",
    "present_over_time",
    "absent_over_time",
    "stddev_over_time",
    "stdvar_over_time",
    "quantile_over_time",
    "deriv",
    "predict_linear",
    "holt_winters",
    "double_exponential_smoothing",  # Prometheus 3 name for holt_winters
    "mad_over_time",  # experimental upstream; native here
    "ts_of_min_over_time",  # experimental upstream; native here
    "ts_of_max_over_time",
    "ts_of_last_over_time",
}

# Upstream --enable-feature=promql-experimental-functions surface the
# reference inherits from its embedded engine
# (reader/router/prometheus_query_range.go:24-45 just proxies the
# engine, so whatever the linked Prometheus build enables works there).
# ALL of it is now implemented natively (each name is also a member of
# RANGE_FNS / SCALAR_FNS / AGG_FNS, which parse first); the set is kept
# as the guard for any FUTURE upstream experimental name so an
# unimplemented one raises a CLEAR unsupported error instead of
# mis-parsing as a metric selector named like the function.
EXPERIMENTAL_FNS = {
    "mad_over_time",
    "sort_by_label",
    "sort_by_label_desc",
    "limitk",
    "limit_ratio",
    "ts_of_min_over_time",
    "ts_of_max_over_time",
    "ts_of_last_over_time",
}

AGG_FNS = {
    "sum", "min", "max", "avg", "count", "stddev", "stdvar", "group",
    "topk", "bottomk", "count_values", "quantile",
    "limitk", "limit_ratio",  # experimental parametric aggs; native
}

SCALAR_FNS = {
    "abs", "ceil", "floor", "exp", "ln", "log2", "log10", "sqrt", "round",
    "clamp", "clamp_min", "clamp_max", "sgn",
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
    "asinh", "acosh", "atanh", "deg", "rad",
    # sample-timestamp / value-as-unix-seconds extractors
    "timestamp", "hour", "minute", "month", "year",
    "day_of_month", "day_of_week", "day_of_year", "days_in_month",
    "sort", "sort_desc", "sort_by_label", "sort_by_label_desc",
    "histogram_quantile", "label_replace", "label_join", "absent",
    "time", "scalar", "vector", "pi",
}


@dataclass
class VectorSelector:
    name: str | None
    matchers: list[Matcher]
    range_ns: int | None = None
    offset_ns: int = 0
    at_ns: int | None = None  # @-modifier: pin evaluation time
    at_ref: str | None = None  # "start" | "end": resolve from the window


@dataclass
class FnCall:
    fn: str
    args: list["PromExpr"] = field(default_factory=list)
    param: float | None = None  # quantile_over_time φ, round to-nearest, clamp lo
    param2: float | None = None  # clamp(v, lo, hi) second bound
    str_args: list[str] = field(default_factory=list)  # label_replace/join strings


@dataclass
class AggExpr:
    fn: str
    inner: "PromExpr"
    by: list[str] | None = None
    without: list[str] | None = None
    param: float | None = None  # topk/bottomk k
    sparam: str | None = None  # count_values target label


@dataclass
class Subquery:
    """expr[range:step] — re-evaluate expr on the step grid, then treat
    the points as a range vector of width `range`."""

    inner: "PromExpr"
    range_ns: int
    step_ns: int


@dataclass
class PromBinOp:
    op: str
    left: "PromExpr"
    right: "PromExpr"
    bool_modifier: bool = False
    on: list[str] | None = None  # on(labels) vector matching
    ignoring: list[str] | None = None
    group_side: str | None = None  # "left" | "right" (many-to-one)
    group_labels: list[str] | None = None  # group_left(lbls): copied from one side


@dataclass
class PromScalar:
    value: float


PromExpr = VectorSelector | FnCall | AggExpr | PromBinOp | PromScalar | Subquery


class PromQLParser:
    _PREC = {
        "or": 1, "unless": 1,
        "and": 2,
        "==": 3, "!=": 3, ">": 3, ">=": 3, "<": 3, "<=": 3,
        "+": 4, "-": 4,
        "*": 5, "/": 5, "%": 5, "atan2": 5,
        "^": 6,
    }

    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0

    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        if self.i >= len(self.toks):
            raise LogQLSyntaxError("unexpected end of query")
        t = self.toks[self.i]
        if t[0] == "eof":
            raise LogQLSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, v: str):
        t = self.next()
        if t[1] != v:
            raise LogQLSyntaxError(f"expected {v!r}, got {t[1]!r}")

    def at(self, v: str) -> bool:
        return self.peek()[1] == v

    def parse(self) -> PromExpr:
        e = self.parse_binop(0)
        if self.peek()[0] != "eof":
            raise LogQLSyntaxError(f"trailing input: {self.peek()[1]!r}")
        return e

    def parse_binop(self, min_prec: int) -> PromExpr:
        left = self.parse_term()
        while True:
            _, val = self.peek()
            prec = self._PREC.get(val)
            if prec is None or prec < min_prec:
                return left
            self.next()
            bool_mod = False
            if self.at("bool"):
                self.next()
                bool_mod = True
            on = ignoring = None
            group_side = None
            group_labels = None
            if self.peek()[1] in ("on", "ignoring"):
                _, kw = self.next()
                labels = self._label_list()
                if kw == "on":
                    on = labels
                else:
                    ignoring = labels
                if self.peek()[1] in ("group_left", "group_right"):
                    _, g = self.next()
                    group_side = "left" if g == "group_left" else "right"
                    if self.at("("):  # extra labels copied from the one side
                        group_labels = self._label_list()
            # ^ is right-associative (upstream promql); all others left
            right = self.parse_binop(prec if val == "^" else prec + 1)
            left = PromBinOp(
                op=val, left=left, right=right, bool_modifier=bool_mod,
                on=on, ignoring=ignoring, group_side=group_side,
                group_labels=group_labels,
            )

    def parse_term(self) -> PromExpr:
        term = self._parse_term_inner()
        # subquery suffix: expr[range:step]
        if self.at("[") and self.peek(2)[1] == ":":
            self.next()
            _, rng = self.next()
            self.expect(":")
            _, step = self.next()
            self.expect("]")
            return Subquery(
                inner=term,
                range_ns=parse_duration_ns(rng),
                step_ns=parse_duration_ns(step),
            )
        return term

    def _parse_term_inner(self) -> PromExpr:
        kind, val = self.peek()
        if kind == "number":
            self.next()
            return PromScalar(float(val))
        if val == "-":
            self.next()
            kind2, v2 = self.next()
            if kind2 != "number":
                raise LogQLSyntaxError("unary minus expects a number")
            return PromScalar(-float(v2))
        if val == "(":
            self.next()
            e = self.parse_binop(0)
            self.expect(")")
            return e
        if val == "{":
            return self.parse_selector(None)
        if kind == "ident":
            if val in RANGE_FNS or val in SCALAR_FNS:
                return self.parse_fn()
            if val in AGG_FNS:
                return self.parse_agg()
            if val in EXPERIMENTAL_FNS and self.peek(1)[1] == "(":
                # unimplemented experimental fns would otherwise parse
                # as a metric SELECTOR named like the function and
                # silently return empty — fail loudly instead
                raise LogQLSyntaxError(
                    f"experimental PromQL function {val!r} is not "
                    "supported by this engine"
                )
            return self.parse_selector(None if self.peek(1)[1] == "(" else val)
        raise LogQLSyntaxError(f"unexpected token {val!r}")

    def parse_selector(self, name_hint: str | None) -> VectorSelector:
        name = None
        if self.peek()[0] == "ident" and self.peek()[1] != "{":
            _, name = self.next()
        matchers = []
        if self.at("{"):
            self.next()
            while not self.at("}"):
                _, lbl = self.next()
                _, op = self.next()
                if op not in ("=", "!=", "=~", "!~"):
                    raise LogQLSyntaxError(f"bad matcher op {op!r}")
                kind, v = self.next()
                if kind != "string":
                    raise LogQLSyntaxError("matcher value must be a string")
                matchers.append(Matcher(label=lbl, op=op, value=unquote(v)))
                if self.at(","):
                    self.next()
            self.expect("}")
        sel = VectorSelector(name=name, matchers=matchers)
        # plain range `[5m]` binds to the selector; `[30m:5m]` is a
        # subquery suffix handled by parse_term
        if self.at("[") and self.peek(2)[1] != ":":
            self.next()
            _, d = self.next()
            sel.range_ns = parse_duration_ns(d)
            self.expect("]")
        while self.peek()[1] in ("offset", "@"):
            _, mod = self.next()
            if mod == "offset":
                _, d = self.next()
                sel.offset_ns = parse_duration_ns(d)
            else:  # @ <unix seconds> | @ start() | @ end()
                kind, v = self.next()
                if kind == "ident" and v in ("start", "end"):
                    self.expect("(")
                    self.expect(")")
                    sel.at_ref = v  # resolved against the request window
                elif kind == "number":
                    sel.at_ns = int(float(v) * 1e9)
                else:
                    raise LogQLSyntaxError("@ expects a unix timestamp or start()/end()")
        return sel

    def parse_fn(self) -> FnCall:
        import math

        _, fn = self.next()
        self.expect("(")
        if fn == "pi":  # constant — fold at parse time
            self.expect(")")
            return PromScalar(math.pi)
        if self.at(")"):  # zero-arg: time()
            self.next()
            return FnCall(fn=fn)
        args = []
        param = None
        if fn in ("quantile_over_time", "histogram_quantile"):
            _, v = self.next()
            param = float(v)
            self.expect(",")
        args.append(self.parse_binop(0))
        param2 = None
        str_args: list[str] = []
        while self.at(","):
            self.next()
            kind, v = self.peek()
            if kind == "number":
                self.next()
                if param is None:
                    param = float(v)
                else:
                    param2 = float(v)
            elif kind == "string":
                self.next()
                str_args.append(unquote(v))
            else:
                args.append(self.parse_binop(0))
        self.expect(")")
        return FnCall(fn=fn, args=args, param=param, param2=param2, str_args=str_args)

    def parse_agg(self) -> AggExpr:
        _, fn = self.next()
        by = without = None
        param = None
        if self.peek()[1] in ("by", "without"):
            by, without = self._grouping()
        self.expect("(")
        sparam = None
        if fn in ("topk", "bottomk", "quantile", "limitk", "limit_ratio"):
            _, k = self.next()
            if k == "-":  # limit_ratio(-0.3, v): complement selection
                _, k = self.next()
                param = -float(k)
            else:
                param = float(k)
            self.expect(",")
        elif fn == "count_values":
            kind, lbl = self.next()
            if kind != "string":
                raise LogQLSyntaxError("count_values expects a quoted label name")
            sparam = unquote(lbl)
            self.expect(",")
        inner = self.parse_binop(0)
        self.expect(")")
        if self.peek()[1] in ("by", "without"):
            by, without = self._grouping()
        return AggExpr(
            fn=fn, inner=inner, by=by, without=without, param=param, sparam=sparam
        )

    def _label_list(self) -> list[str]:
        self.expect("(")
        labels = []
        while not self.at(")"):
            _, lbl = self.next()
            labels.append(lbl)
            if self.at(","):
                self.next()
        self.expect(")")
        return labels

    def _grouping(self):
        _, kw = self.next()
        labels = self._label_list()
        return (labels, None) if kw == "by" else (None, labels)


def parse(text: str) -> PromExpr:
    return PromQLParser(text).parse()
