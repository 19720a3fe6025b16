"""Hand-rolled TraceQL parser.

Covers the reference surface (ref: reader/traceql/traceql_parser/
model_v2.go, lexer v2): span selectors with && / || / parens, string/
number/duration/bool values, structural ops between spansets
(&>> descendant, <<& ancestor, ~ sibling, and, or), spanset aggregate
filters (| count() > N, | avg(attr) cmp X), and the metrics second stage
(| rate(), | count_over_time(), | quantile_over_time(attr, φ),
| histogram_over_time(attr), | compare({sel})).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from gigapipe_spark.logql.ast import DURATION_UNITS_NS


class TraceQLSyntaxError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<duration>\d+(?:\.\d+)?(?:ns|us|µs|ms|s|m|h))
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<string>"(?:\\.|[^"\\])*"|`[^`]*`)
  | (?P<op>&>>|<<&|!>>|<<~|&&|\|\||!=|=~|!~|>=|<=|[{}()|=<>~,])
  | (?P<ident>\.?[a-zA-Z_][a-zA-Z0-9_.\-]*)
    """,
    re.VERBOSE,
)


def tokenize(s: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise TraceQLSyntaxError(f"unexpected character at {pos}: {s[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


@dataclass
class AttrCmp:
    attr: str  # normalized: leading span./resource./. stripped
    op: str  # = != < <= > >= =~ !~
    value: str | float | bool
    kind: str  # "string" | "number" | "duration" | "bool"


@dataclass
class AttrNode:
    op: str  # && | ||
    left: "AttrExpr"
    right: "AttrExpr"


AttrExpr = AttrCmp | AttrNode


@dataclass
class SpanSelector:
    expr: AttrExpr | None  # None = {} (all spans)


@dataclass
class Structural:
    op: str  # &>> <<& ~ and or
    left: "SpansetExpr"
    right: "SpansetExpr"


@dataclass
class ScriptedSpanset:
    """A selector together with ITS OWN aggregate-filter stage, usable
    as one operand of a spanset op — the reference attaches Aggregator
    to Selector (model_v2.go:63-66 `Selector{AttrSelector, Aggregator,
    …}`; script level is Head Op Tail), so
    ``{A} | count() > 2 || {B}`` is (filtered-A) union B."""

    spanset: "SpansetExpr"
    agg_filters: list  # list[AggFilter]


SpansetExpr = SpanSelector | Structural | ScriptedSpanset


@dataclass
class AggFilter:
    fn: str  # count sum min max avg
    attr: str | None  # None for count()
    op: str
    value: float


@dataclass
class MetricsStage:
    fn: str  # rate count_over_time quantile_over_time histogram_over_time avg_over_time min_over_time max_over_time compare
    attr: str | None = None
    param: float | None = None
    by: list[str] = field(default_factory=list)
    step_ns: int | None = None


@dataclass
class TraceQLScript:
    spanset: SpansetExpr
    agg_filters: list[AggFilter] = field(default_factory=list)
    metrics: MetricsStage | None = None
    sample: float | None = None  # with(sample=0.1) hint
    select_attrs: list[str] = field(default_factory=list)  # | select(a, b)
    topk: tuple[str, int] | None = None  # | topk(n) / bottomk(n) second stage
    compare: tuple | None = None  # compare({sel}[, topN[, bFrom, bTo]]) → (SpansetExpr, n, (bFrom, bTo)|None)


def _norm_attr(name: str) -> str:
    for prefix in ("span.", "resource.", "."):
        if name.startswith(prefix) and name not in ("span.", "resource."):
            rest = name[len(prefix):]
            if rest:
                return rest
    return name


class TraceQLParser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0

    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        if t[0] == "eof":
            raise TraceQLSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, v: str):
        t = self.next()
        if t[1] != v:
            raise TraceQLSyntaxError(f"expected {v!r}, got {t[1]!r}")

    def at(self, v: str) -> bool:
        return self.peek()[1] == v

    _SPANSET_OPS = ("&>>", "<<&", "~", "and", "or", "!>>", "<<~", "&&", "||")

    def parse(self) -> TraceQLScript:
        script = self._parse_unit()
        # reference grammar is Head Op Tail at SCRIPT level
        # (model_v2.go:9-17, lexer And=`&&` Or=`||`): the unit parsed so
        # far — selector PLUS its aggregate filters — can be the left
        # operand of a spanset op, and the Tail is a full script whose
        # trailing metrics/hints apply to the combination
        # (ResolvedMetricsFn). Right-recursive like the reference.
        if self.peek()[1] in self._SPANSET_OPS:
            _, op = self.next()
            op = {"&&": "and", "||": "or"}.get(op, op)
            if (
                script.metrics is not None
                or script.compare is not None
                or script.select_attrs
                or script.topk is not None
            ):
                raise TraceQLSyntaxError(
                    "metrics/select/topk stage cannot precede a spanset "
                    f"op {op!r} — put it after the combined expression"
                )
            left = (
                ScriptedSpanset(script.spanset, script.agg_filters)
                if script.agg_filters
                else script.spanset
            )
            rhs = self.parse()  # consumes the rest incl. eof check
            right = (
                ScriptedSpanset(rhs.spanset, rhs.agg_filters)
                if rhs.agg_filters
                else rhs.spanset
            )
            return TraceQLScript(
                spanset=Structural(op=op, left=left, right=right),
                agg_filters=[],
                metrics=rhs.metrics,
                sample=rhs.sample if rhs.sample is not None else script.sample,
                select_attrs=rhs.select_attrs,
                topk=rhs.topk,
                compare=rhs.compare,
            )
        if self.peek()[0] != "eof":
            raise TraceQLSyntaxError(f"trailing input {self.peek()[1]!r}")
        return script

    def _parse_unit(self) -> TraceQLScript:
        spanset = self.parse_spanset_expr()
        script = TraceQLScript(spanset=spanset)
        while self.at("|"):
            self.next()
            self.parse_pipeline_stage(script)
        # trailing hint: with(sample=0.1)  (ref: WithClause model_v2.go:243)
        if self.peek()[1] == "with":
            self.next()
            self.expect("(")
            _, key = self.next()
            if key != "sample":
                raise TraceQLSyntaxError(f"unknown hint {key!r}")
            self.expect("=")
            _, v = self.next()
            script.sample = float(v)
            self.expect(")")
        return script

    def parse_spanset_expr(self, allow_symbols: bool = False) -> SpansetExpr:
        # `&&`/`||` (the reference's And/Or lexemes) are consumed here
        # only INSIDE parens; at top level they bind looser than a
        # selector's aggregate filter (Selector{…, Aggregator} Op Tail,
        # model_v2.go:9-17,63-66) and are handled by parse()
        ops = ("&>>", "<<&", "~", "and", "or", "!>>", "<<~")
        if allow_symbols:
            ops = ops + ("&&", "||")
        left = self.parse_spanset_atom()
        while self.peek()[1] in ops:
            _, op = self.next()
            op = {"&&": "and", "||": "or"}.get(op, op)
            right = self.parse_spanset_atom()
            left = Structural(op=op, left=left, right=right)
        return left

    def parse_spanset_atom(self) -> SpansetExpr:
        if self.at("("):
            self.next()
            e = self.parse_spanset_expr(allow_symbols=True)
            self.expect(")")
            return e
        self.expect("{")
        if self.at("}"):
            self.next()
            return SpanSelector(expr=None)
        e = self.parse_attr_or()
        self.expect("}")
        return SpanSelector(expr=e)

    def parse_attr_or(self) -> AttrExpr:
        left = self.parse_attr_and()
        while self.at("||"):
            self.next()
            left = AttrNode(op="||", left=left, right=self.parse_attr_and())
        return left

    def parse_attr_and(self) -> AttrExpr:
        left = self.parse_attr_atom()
        while self.at("&&"):
            self.next()
            left = AttrNode(op="&&", left=left, right=self.parse_attr_atom())
        return left

    def parse_attr_atom(self) -> AttrExpr:
        if self.at("("):
            self.next()
            e = self.parse_attr_or()
            self.expect(")")
            return e
        kind, attr = self.next()
        if kind != "ident":
            raise TraceQLSyntaxError(f"expected attribute name, got {attr!r}")
        _, op = self.next()
        if op not in ("=", "!=", "<", "<=", ">", ">=", "=~", "!~"):
            raise TraceQLSyntaxError(f"bad attr op {op!r}")
        vkind, v = self.next()
        if vkind == "string":
            value, k = v[1:-1], "string"
        elif vkind == "duration":
            m = re.fullmatch(r"(\d+(?:\.\d+)?)(\D+)", v)
            value, k = float(m.group(1)) * DURATION_UNITS_NS[m.group(2)], "duration"
        elif vkind == "number":
            value, k = float(v), "number"
        elif vkind == "ident" and v in ("true", "false"):
            value, k = v == "true", "bool"
        elif vkind == "ident":
            # unquoted enum values: { status = error }, { kind != server }
            # — string semantics, = / != only (ref: attr_condition.go:229
            # "Unquoted enum values ... Respect the operator just like
            # quoted strings", non-equality ops rejected)
            if op not in ("=", "!="):
                raise TraceQLSyntaxError(
                    f"unsupported operator {op!r} for unquoted value {v!r}"
                )
            value, k = v, "string"
        else:
            raise TraceQLSyntaxError(f"bad attr value {v!r}")
        return AttrCmp(attr=_norm_attr(attr), op=op, value=value, kind=k)

    def _maybe_metrics_by(self, script: TraceQLScript) -> None:
        """Optional `by (attr, ...)` grouping after a metrics function
        (ref: metrics_query.go resolvedByLabels)."""
        if not self.at("by"):
            return
        self.next()
        self.expect("(")
        labels: list[str] = []
        while not self.at(")"):
            _, lbl = self.next()
            labels.append(_norm_attr(lbl))
            if self.at(","):
                self.next()
        self.expect(")")
        script.metrics.by = labels

    def parse_pipeline_stage(self, script: TraceQLScript) -> None:
        kind, fn = self.next()
        if fn == "select":
            # second-stage projection (ref: select_tags_planner.go:8)
            self.expect("(")
            while not self.at(")"):
                _, a = self.next()
                script.select_attrs.append(_norm_attr(a))
                if self.at(","):
                    self.next()
            self.expect(")")
            return
        if fn in ("count", "sum", "min", "max", "avg"):
            self.expect("(")
            attr = None
            if not self.at(")"):
                _, attr = self.next()
                attr = _norm_attr(attr)
            self.expect(")")
            _, op = self.next()
            vkind, v = self.next()
            if vkind == "duration":
                m = re.fullmatch(r"(\d+(?:\.\d+)?)(\D+)", v)
                val = float(m.group(1)) * DURATION_UNITS_NS[m.group(2)]
            else:
                val = float(v)
            script.agg_filters.append(AggFilter(fn=fn, attr=attr, op=op, value=val))
            return
        if fn in ("rate", "count_over_time", "avg_over_time", "min_over_time", "max_over_time"):
            self.expect("(")
            attr = None
            if not self.at(")"):
                _, attr = self.next()
                attr = _norm_attr(attr)
            self.expect(")")
            script.metrics = MetricsStage(fn=fn, attr=attr)
            self._maybe_metrics_by(script)
            return
        if fn in ("quantile_over_time", "histogram_over_time"):
            self.expect("(")
            _, attr = self.next()
            param = None
            if self.at(","):
                self.next()
                _, p = self.next()
                param = float(p)
            self.expect(")")
            script.metrics = MetricsStage(fn=fn, attr=_norm_attr(attr), param=param)
            self._maybe_metrics_by(script)
            return
        if fn == "sum_over_time":
            self.expect("(")
            _, attr = self.next()
            self.expect(")")
            script.metrics = MetricsStage(fn=fn, attr=_norm_attr(attr))
            self._maybe_metrics_by(script)
            return
        if fn in ("topk", "bottomk"):
            # second stage over metrics series (ref: SecondPipelineStage,
            # topk applied at the service layer over the matrix)
            self.expect("(")
            _, k = self.next()
            self.expect(")")
            script.topk = (fn, int(float(k)))
            return
        if fn == "compare":
            # | compare({sel}[, topN[, baselineStartNs, baselineEndNs]])
            # — selection-vs-baseline attr frequency diff with an
            # optional explicit baseline window
            # (ref: CompareSelector model_v2.go:204-209)
            self.expect("(")
            sel = self.parse_spanset_atom()
            args: list[int] = []
            while self.at(","):
                self.next()
                _, v = self.next()
                args.append(int(float(v)))
            self.expect(")")
            if len(args) not in (0, 1, 3):
                raise TraceQLSyntaxError(
                    "compare() takes ({sel}), ({sel}, N) or"
                    " ({sel}, N, baselineStartNs, baselineEndNs)"
                )
            n = args[0] if args else 10
            baseline = (args[1], args[2]) if len(args) == 3 else None
            script.compare = (sel, n, baseline)
            return
        raise TraceQLSyntaxError(f"unknown pipeline stage {fn!r}")


def parse(text: str) -> TraceQLScript:
    return TraceQLParser(text).parse()
