"""LogQL AST.

Fresh design mirroring the *shape* of the reference grammar
(ref: reader/logql/logql_parser/model.go — StrSelector, LineFilter,
LabelFilter, Parser, LineFormat, LabelFormat, Unwrap, Drop/Keep,
LRAOrUnwrap, AggOperator, TopK, QuantileOverTime, Comparison,
LogQLScript binary ops) as plain dataclasses.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Matcher:
    label: str
    op: str  # = != =~ !~
    value: str


@dataclass
class Selector:
    matchers: list[Matcher]


# --- line filter boolean tree (ref model.go:172-216 LineFilter nesting) ---
@dataclass
class LFLeaf:
    value: str


@dataclass
class LFNode:
    op: str  # and | or
    left: "LFExpr"
    right: "LFExpr"


LFExpr = LFLeaf | LFNode


@dataclass
class LineFilter:
    op: str  # |= != |~ !~ |>
    expr: LFExpr


# --- label filter boolean tree (ref model.go:218-266) ---
@dataclass
class LabelCmp:
    label: str
    op: str  # = != =~ !~ == > >= < <= (numeric ones)
    value: str  # raw string or number literal
    numeric: bool = False


@dataclass
class LabelNode:
    op: str  # and | or
    left: "LabelExpr"
    right: "LabelExpr"


LabelExpr = LabelCmp | LabelNode


@dataclass
class LabelFilter:
    expr: LabelExpr


@dataclass
class ParserStage:
    kind: str  # json | logfmt | regexp
    params: dict[str, str] = field(default_factory=dict)  # json label="path"
    pattern: str | None = None  # regexp


@dataclass
class LineFormat:
    template: str


@dataclass
class LabelFormat:
    # list of (new_label, source) where source is ("label", name) or ("template", tpl)
    actions: list[tuple[str, tuple[str, str]]]


@dataclass
class Unwrap:
    label: str  # "_entry" unwraps the line; otherwise a label name
    # conversion function: None (numeric cast), "duration" /
    # "duration_seconds" (Go duration string → seconds) or "bytes"
    # (humanized size → bytes). Ref: planner_unwrap.go:10, unwrap.go:9.
    fn: str | None = None


@dataclass
class Drop:
    # (label, optional value) — with value, drop only when label equals it
    params: list[tuple[str, str | None]]


@dataclass
class Keep:
    params: list[tuple[str, str | None]]


Stage = LineFilter | LabelFilter | ParserStage | LineFormat | LabelFormat | Unwrap | Drop | Keep


@dataclass
class LogExpr:
    selector: Selector
    stages: list[Stage] = field(default_factory=list)


@dataclass
class RangeAgg:
    fn: str  # rate count_over_time bytes_rate ... sum_over_time etc
    inner: LogExpr
    range_ns: int
    offset_ns: int = 0
    by: list[str] | None = None
    without: list[str] | None = None
    param: float | None = None  # quantile_over_time φ


@dataclass
class VectorAgg:
    fn: str  # sum min max avg stddev stdvar count
    inner: "MetricExpr"
    by: list[str] | None = None
    without: list[str] | None = None


@dataclass
class TopK:
    fn: str  # topk | bottomk
    k: int
    inner: "MetricExpr"


@dataclass
class BinOp:
    op: str  # + - * / % == != > >= < <=
    left: "Expr"
    right: "Expr"


@dataclass
class Scalar:
    value: float


MetricExpr = RangeAgg | VectorAgg | TopK | BinOp | Scalar
Expr = LogExpr | MetricExpr

DURATION_UNITS_NS = {
    "ns": 1,
    "us": 1_000,
    "µs": 1_000,
    "ms": 1_000_000,
    "s": 1_000_000_000,
    "m": 60_000_000_000,
    "h": 3_600_000_000_000,
    "d": 86_400_000_000_000,
    "w": 604_800_000_000_000,
}

RANGE_FNS = {
    "rate",
    "count_over_time",
    "bytes_rate",
    "bytes_over_time",
    "absent_over_time",
    "sum_over_time",
    "avg_over_time",
    "max_over_time",
    "min_over_time",
    "first_over_time",
    "last_over_time",
    "stdvar_over_time",
    "stddev_over_time",
    "quantile_over_time",
}

VECTOR_FNS = {"sum", "min", "max", "avg", "stddev", "stdvar", "count"}
