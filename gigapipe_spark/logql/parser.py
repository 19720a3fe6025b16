"""Hand-rolled LogQL lexer + recursive-descent parser.

Covers the reference grammar surface exercised by its 48-query parser
corpus (ref: reader/logql/logql_parser/parser_test.go and model.go):
stream selectors, line filters with and/or nesting, label filters,
json/logfmt/regexp parsers, line_format/label_format, unwrap, drop/keep,
range + vector aggregations with by/without, topk/bottomk,
quantile_over_time, offsets, comparisons and binary arithmetic.
"""

from __future__ import annotations

import re

from gigapipe_spark.logql.ast import (
    BinOp,
    Drop,
    DURATION_UNITS_NS,
    Expr,
    Keep,
    LabelCmp,
    LabelExpr,
    LabelFilter,
    LabelFormat,
    LabelNode,
    LFLeaf,
    LFNode,
    LineFilter,
    LineFormat,
    LogExpr,
    Matcher,
    MetricExpr,
    ParserStage,
    RANGE_FNS,
    RangeAgg,
    Scalar,
    Selector,
    TopK,
    Unwrap,
    VECTOR_FNS,
    VectorAgg,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<duration>\d+(?:\.\d+)?(?:ns|us|µs|ms|s|m|h|d|w)(?:\d+(?:\.\d+)?(?:ns|us|µs|ms|s|m|h|d|w))*)
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<string>"(?:\\.|[^"\\])*"|`[^`]*`)
  | (?P<op>\|=|\|~|\|>|!=|!~|=~|==|>=|<=|->|[{}(),\[\]|=<>+\-*/%:@^])
  | (?P<ident>[a-zA-Z_][a-zA-Z0-9_]*)
    """,
    re.VERBOSE,
)


class LogQLSyntaxError(ValueError):
    pass


def tokenize(s: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise LogQLSyntaxError(f"unexpected character at {pos}: {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


def unquote(tok: str) -> str:
    if tok.startswith("`"):
        return tok[1:-1]
    # double-quoted: standard escapes
    body = tok[1:-1]
    return (
        body.replace(r"\"", '"')
        .replace(r"\\", "\\")
        .replace(r"\n", "\n")
        .replace(r"\t", "\t")
    )


def parse_duration_ns(tok: str) -> int:
    total = 0
    for m in re.finditer(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w)", tok):
        total += int(float(m.group(1)) * DURATION_UNITS_NS[m.group(2)])
    return total


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0

    # --- token helpers ---
    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise LogQLSyntaxError("unexpected end of query")
        t = self.toks[self.i]
        if t[0] == "eof":
            raise LogQLSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, val: str) -> tuple[str, str]:
        t = self.next()
        if t[1] != val:
            raise LogQLSyntaxError(f"expected {val!r}, got {t[1]!r}")
        return t

    def at(self, val: str) -> bool:
        return self.peek()[1] == val

    # --- entry ---
    def parse(self) -> Expr:
        e = self.parse_expr()
        if self.peek()[0] != "eof":
            raise LogQLSyntaxError(f"trailing input: {self.peek()[1]!r}")
        return e

    def parse_expr(self) -> Expr:
        return self.parse_binop(0)

    # precedence: or < and < comparison < +- < */% (Prom-style)
    _PREC = {
        "or": 1,
        "and": 2,
        "==": 3, "!=": 3, ">": 3, ">=": 3, "<": 3, "<=": 3,
        "+": 4, "-": 4,
        "*": 5, "/": 5, "%": 5,
    }

    def parse_binop(self, min_prec: int) -> Expr:
        left = self.parse_atom()
        while True:
            kind, val = self.peek()
            prec = self._PREC.get(val)
            if prec is None or prec < min_prec:
                return left
            self.next()
            right = self.parse_binop(prec + 1)
            left = BinOp(op=val, left=left, right=right)

    def parse_atom(self) -> Expr:
        kind, val = self.peek()
        if val == "{":
            return self.parse_log_expr()
        if val == "(":
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return e
        if kind == "number":
            self.next()
            return Scalar(float(val))
        if val == "-":  # unary minus
            self.next()
            kind2, val2 = self.next()
            if kind2 != "number":
                raise LogQLSyntaxError("unary minus expects a number")
            return Scalar(-float(val2))
        if kind == "ident":
            if val in RANGE_FNS:
                return self.parse_range_agg()
            if val in VECTOR_FNS:
                return self.parse_vector_agg()
            if val in ("topk", "bottomk"):
                return self.parse_topk()
        raise LogQLSyntaxError(f"unexpected token {val!r}")

    # --- log expr: selector + pipeline ---
    def parse_log_expr(self) -> LogExpr:
        sel = self.parse_selector()
        stages = []
        while True:
            kind, val = self.peek()
            if val in ("|=", "|~", "!=", "!~", "|>"):
                stages.append(self.parse_line_filter())
            elif val == "|":
                self.next()
                stages.append(self.parse_pipe_stage())
            else:
                break
        return LogExpr(selector=sel, stages=stages)

    def parse_selector(self) -> Selector:
        self.expect("{")
        matchers = []
        while not self.at("}"):
            _, label = self.next()
            _, op = self.next()
            if op not in ("=", "!=", "=~", "!~"):
                raise LogQLSyntaxError(f"bad matcher op {op!r}")
            kind, v = self.next()
            if kind != "string":
                raise LogQLSyntaxError(f"matcher value must be string, got {v!r}")
            matchers.append(Matcher(label=label, op=op, value=unquote(v)))
            if self.at(","):
                self.next()
        self.expect("}")
        return Selector(matchers=matchers)

    def parse_line_filter(self) -> LineFilter:
        _, op = self.next()
        return LineFilter(op=op, expr=self.parse_lf_or())

    # |= "a" and ("b" or "c")  (ref model.go LineFilter nesting)
    def parse_lf_or(self):
        left = self.parse_lf_and()
        while self.at("or"):
            self.next()
            left = LFNode(op="or", left=left, right=self.parse_lf_and())
        return left

    def parse_lf_and(self):
        left = self.parse_lf_atom()
        while self.at("and"):
            self.next()
            left = LFNode(op="and", left=left, right=self.parse_lf_atom())
        return left

    def parse_lf_atom(self):
        kind, val = self.next()
        if val == "(":
            e = self.parse_lf_or()
            self.expect(")")
            return e
        if kind != "string":
            raise LogQLSyntaxError(f"line filter expects string, got {val!r}")
        return LFLeaf(value=unquote(val))

    # --- pipe stages after '|' ---
    def parse_pipe_stage(self):
        kind, val = self.peek()
        if val == "json":
            self.next()
            params = {}
            while self.peek()[0] == "ident":
                if self.peek(1)[1] == "=" and self.peek(2)[0] == "string":
                    _, lbl = self.next()
                    self.next()
                    _, path = self.next()
                    params[lbl] = unquote(path)
                else:
                    # bare form: | json key (ref grammar ParserParam
                    # with no alias — label = path = key)
                    _, key = self.next()
                    params[key] = key
                if self.at(","):
                    self.next()
                else:
                    break
            return ParserStage(kind="json", params=params)
        if val == "logfmt":
            self.next()
            # parameterized form: | logfmt key1, lbl="key2"
            # (ref grammar model.go:269 ParserParams; the handler keys
            # output by the LOGFMT key, ignoring any alias —
            # parameterLogfmtHelper.HandleLogfmt)
            params = {}
            while self.peek()[0] == "ident":
                if self.peek(1)[1] == "=" and self.peek(2)[0] == "string":
                    _, lbl = self.next()
                    self.next()
                    _, key = self.next()
                    params[lbl] = unquote(key)
                else:
                    _, key = self.next()
                    params[key] = key
                if self.at(","):
                    self.next()
                else:
                    break
            return ParserStage(kind="logfmt", params=params)
        if val == "regexp":
            self.next()
            kind, pat = self.next()
            if kind != "string":
                raise LogQLSyntaxError("regexp expects a pattern string")
            return ParserStage(kind="regexp", pattern=unquote(pat))
        if val == "line_format":
            self.next()
            _, tpl = self.next()
            return LineFormat(template=unquote(tpl))
        if val == "label_format":
            self.next()
            actions = []
            while self.peek()[0] == "ident":
                _, new = self.next()
                self.expect("=")
                k, src = self.next()
                if k == "string":
                    actions.append((new, ("template", unquote(src))))
                else:
                    actions.append((new, ("label", src)))
                if self.at(","):
                    self.next()
            return LabelFormat(actions=actions)
        if val == "unwrap_value":
            # qryn extension (model.go:335): the sample's stored numeric
            # value becomes the unwrapped value — no label lookup
            self.next()
            return Unwrap(label="__value__")
        if val == "unwrap":
            self.next()
            _, lbl = self.next()
            # conversion form: unwrap duration(lbl) / bytes(lbl) —
            # ref: planner_unwrap.go:10
            if lbl in ("duration", "duration_seconds", "bytes") and self.at("("):
                self.next()
                _, inner = self.next()
                self.expect(")")
                return Unwrap(label=inner, fn=lbl)
            return Unwrap(label=lbl)
        if val in ("drop", "keep"):
            self.next()
            params = self.parse_drop_params()
            if not params:
                raise LogQLSyntaxError(f"| {val} requires at least one parameter")
            return Drop(params=params) if val == "drop" else Keep(params=params)
        # otherwise: label filter expression
        return LabelFilter(expr=self.parse_label_or())

    def parse_drop_params(self):
        params = []
        while self.peek()[0] == "ident":
            _, lbl = self.next()
            if self.at("="):
                self.next()
                _, v = self.next()
                params.append((lbl, unquote(v)))
            else:
                params.append((lbl, None))
            if self.at(","):
                self.next()
            else:
                break
        return params

    def parse_label_or(self) -> LabelExpr:
        left = self.parse_label_and()
        while self.at("or"):
            self.next()
            left = LabelNode(op="or", left=left, right=self.parse_label_and())
        return left

    def parse_label_and(self) -> LabelExpr:
        left = self.parse_label_atom()
        while self.at("and"):
            self.next()
            left = LabelNode(op="and", left=left, right=self.parse_label_atom())
        return left

    def parse_label_atom(self) -> LabelExpr:
        if self.at("("):
            self.next()
            e = self.parse_label_or()
            self.expect(")")
            return e
        kind, label = self.next()
        if kind != "ident":
            raise LogQLSyntaxError(f"label filter expects label name, got {label!r}")
        _, op = self.next()
        vkind, v = self.next()
        if vkind == "string":
            if op not in ("=", "!=", "=~", "!~"):
                raise LogQLSyntaxError(f"bad string label op {op!r}")
            return LabelCmp(label=label, op=op, value=unquote(v), numeric=False)
        if vkind in ("number", "duration"):
            if op not in ("==", "!=", ">", ">=", "<", "<="):
                raise LogQLSyntaxError(f"bad numeric label op {op!r}")
            value = str(parse_duration_ns(v)) if vkind == "duration" else v
            return LabelCmp(label=label, op=op, value=value, numeric=True)
        raise LogQLSyntaxError(f"bad label filter value {v!r}")

    # --- metric exprs ---
    def parse_grouping(self):
        """Optional by/without (a, b)."""
        if self.peek()[1] not in ("by", "without"):
            return None, None
        _, kw = self.next()
        self.expect("(")
        labels = []
        while not self.at(")"):
            _, lbl = self.next()
            labels.append(lbl)
            if self.at(","):
                self.next()
        self.expect(")")
        return (labels, None) if kw == "by" else (None, labels)

    def parse_range_agg(self) -> RangeAgg:
        _, fn = self.next()
        self.expect("(")
        param = None
        if fn == "quantile_over_time":
            kind, v = self.next()
            param = float(v)
            self.expect(",")
        inner = self.parse_log_expr()
        self.expect("[")
        _, dur = self.next()
        range_ns = parse_duration_ns(dur)
        self.expect("]")
        offset_ns = 0
        if self.at("offset"):
            self.next()
            _, od = self.next()
            offset_ns = parse_duration_ns(od)
        self.expect(")")
        by, without = self.parse_grouping()
        return RangeAgg(
            fn=fn, inner=inner, range_ns=range_ns, offset_ns=offset_ns,
            by=by, without=without, param=param,
        )

    def parse_vector_agg(self) -> VectorAgg:
        _, fn = self.next()
        by = without = None
        if self.peek()[1] in ("by", "without"):
            by, without = self.parse_grouping()
        self.expect("(")
        inner = self.parse_expr()
        self.expect(")")
        if self.peek()[1] in ("by", "without"):
            by, without = self.parse_grouping()
        return VectorAgg(fn=fn, inner=inner, by=by, without=without)

    def parse_topk(self) -> TopK:
        _, fn = self.next()
        self.expect("(")
        _, k = self.next()
        self.expect(",")
        inner = self.parse_expr()
        self.expect(")")
        return TopK(fn=fn, k=int(float(k)), inner=inner)


def parse(text: str) -> Expr:
    return Parser(text).parse()
