r"""Go-template / sprig evaluator for LogQL line_format & label_format.

The reference renders templates with Go ``text/template`` plus a
registered function set (ref: reader/logql/logql_transpiler/shared/
template_funcs.go:29-66 — the Trim*/Replace/regexReplaceAll* builtins
and an explicit sprig allowlist — and :17-25 the per-entry ``__line__``
/ ``__timestamp__`` bindings, missingkey=zero). This module mirrors
that surface for the Arrow-UDF fallback path: the COMMON templates
compile to JVM columns (compiler._template_col); everything else lands
here, one Python pass per line.

Supported expression grammar (the template body between ``{{ }}``):
  atom      := ".label" | "label" | quoted | number | "(" expr ")"
              | "_entry" | "__line__" | "." | "__timestamp__" | "now"
  call      := fn atom*
  expr      := call ("|" call)*        -- Go pipelines: previous value
                                          appended as the LAST argument
Control structures ({{if}}, {{range}}) are not supported — neither
path claims them; the reference's observed query corpus uses only
value pipelines.

Values are typed (str/int/float/bool/datetime/parsed-JSON) and
stringified Go-style at the boundary: bools ``true``/``false``, floats
collapse to ints when integral, time.Time renders as
``2006-01-02 15:04:05 +0000 UTC``.
"""

from __future__ import annotations

import json
import math
import re
from datetime import datetime, timezone

from gigapipe_spark.logql.parser import parse_duration_ns

__all__ = ["render_template", "validate_template", "TOKEN_RE"]

TOKEN_RE = re.compile(r"\{\{\s*([^}]*?)\s*\}\}")

_NUM = re.compile(r"-?\d+(\.\d+)?")
_INT = re.compile(r"-?\d+")

# Go reference-time layout → strftime (longest tokens first)
_GO_LAYOUT = [
    ("2006", "%Y"), ("-0700", "%z"), ("15", "%H"), ("05", "%S"),
    ("04", "%M"), ("02", "%d"), ("01", "%m"), ("Jan", "%b"),
    ("Mon", "%a"), ("MST", "%Z"), ("PM", "%p"),
]


def _go_layout_to_strftime(layout: str) -> str:
    for go, st in _GO_LAYOUT:
        layout = layout.replace(go, st)
    return layout


def _go_str(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "+Inf" if v > 0 else "-Inf"
        return str(int(v)) if v == int(v) else str(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S") + " +0000 UTC"
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    return str(v)


def _to_int(v) -> int:
    # sprig toInt64: full base-10 integers only, everything else 0
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return int(v)
    s = _go_str(v)
    return int(s) if _INT.fullmatch(s) else 0


def _to_float(v) -> float:
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    s = _go_str(v)
    return float(s) if _NUM.fullmatch(s) else 0.0


def _go_duration(seconds) -> str:
    """sprig `duration`: integer seconds → Go ``time.Duration.String()``.

    Go prints the leading unit only when non-zero, but once a higher
    unit appears every LOWER unit is always printed: 3600 → "1h0m0s",
    60 → "1m0s", 95 → "1m35s", 0 → "0s" (time/format.go fmtFrac rules
    for whole-second durations).
    """
    total = _to_int(seconds)
    sign = "-" if total < 0 else ""
    total = abs(total)
    h, rem = divmod(total, 3600)
    m, s = divmod(rem, 60)
    if h:
        return f"{sign}{h}h{m}m{s}s"
    if m:
        return f"{sign}{m}m{s}s"
    return f"{sign}{s}s"


def _go_title(s: str) -> str:
    """Go ``strings.Title``: upper-case any letter that follows a
    non-letter (not just whitespace) — "foo-bar" → "Foo-Bar"; letters
    inside a word are left unchanged ("fOO" → "FOO")."""
    out = []
    prev_letter = False
    for ch in s:
        is_letter = ch.isalpha()
        out.append(ch.upper() if is_letter and not prev_letter else ch)
        prev_letter = is_letter
    return "".join(out)


def _go_replace(ev, a):
    # Go strings.Replace(s, old, new, n) registered DIRECTLY
    # (template_funcs.go:33) — subject FIRST, and the count arg is
    # REQUIRED (n<0 → all, n≥0 → at most n). Wrong arity is a
    # text/template execute error → the reference fails the query.
    if len(a) != 4:
        raise ValueError(
            "template: wrong number of args for Replace: want 4 got "
            f"{len(a)}"
        )
    s, old, new, n = _s(a[0]), _s(a[1]), _s(a[2]), _to_int(a[3])
    return s.replace(old, new) if n < 0 else s.replace(old, new, n)


def _fn_unix_epoch(ev, a):
    # sprig unixEpoch(date time.Time) — a non-time argument is a
    # text/template execute error in the reference, not a coercion
    if not isinstance(a[0], datetime):
        raise ValueError(
            "template: unixEpoch: expected time.Time argument, got "
            f"{type(a[0]).__name__}"
        )
    return str(int(a[0].timestamp()))


def _tokenize(expr: str) -> list[str]:
    """Split a template expression into atoms, '|' separators, and
    balanced '('…')' groups (quotes respected)."""
    out: list[str] = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
            continue
        if c == '"':
            j = i + 1
            while j < n and expr[j] != '"':
                j += 2 if expr[j] == "\\" else 1
            out.append(expr[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth, j = 1, i + 1
            while j < n and depth:
                if expr[j] == "(":
                    depth += 1
                elif expr[j] == ")":
                    depth -= 1
                j += 1
            out.append(expr[i:j])
            i = j
            continue
        if c == "|":
            out.append("|")
            i += 1
            continue
        j = i
        while j < n and not expr[j].isspace() and expr[j] not in "|()":
            j += 1
        out.append(expr[i:j])
        i = j
    return out


class _Evaluator:
    def __init__(self, line: str, labels: dict, ts_ns: int | None):
        self.line = line if line is not None else ""
        self.labels = labels or {}
        self.ts = (
            datetime.fromtimestamp((ts_ns or 0) / 1e9, tz=timezone.utc)
            if ts_ns is not None
            else None
        )

    # ---- atoms ------------------------------------------------------
    def atom(self, tok: str):
        if tok in ("_entry", "__line__", "."):
            return self.line
        if tok == "__timestamp__":
            return self.ts
        if tok == "now":
            return datetime.now(tz=timezone.utc)
        if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
            return tok[1:-1].replace('\\"', '"')
        if tok.startswith("(") and tok.endswith(")"):
            return self.expr(tok[1:-1])
        if _NUM.fullmatch(tok):
            return int(tok) if _INT.fullmatch(tok) else float(tok)
        if tok.startswith("."):
            return self.labels.get(tok[1:], "")
        return self.labels.get(tok, "")

    # ---- expressions ------------------------------------------------
    def expr(self, text: str):
        toks = _tokenize(text)
        # split on top-level pipes
        segs: list[list[str]] = [[]]
        for t in toks:
            if t == "|":
                segs.append([])
            else:
                segs[-1].append(t)
        val = self.segment(segs[0], piped=None, has_pipe=len(segs) > 1)
        for seg in segs[1:]:
            val = self.segment(seg, piped=val, has_pipe=True)
        return val

    def segment(self, toks: list[str], piped, has_pipe: bool):
        if not toks:
            return piped
        if len(toks) == 1 and piped is None and toks[0] not in _FNS:
            return self.atom(toks[0])
        fn = toks[0]
        if fn not in _FNS:
            if len(toks) == 1 and piped is not None:
                # `x | .label` etc: not a registered function; Go
                # text/template fails Parse → the reference errors the
                # whole query (PrepareLineFormatTemplate caller)
                raise ValueError(
                    f"template: function {fn!r} not defined"
                )
            if len(toks) == 1:
                return self.atom(fn)
            raise ValueError(f"template: function {fn!r} not defined")
        args = [self.atom(t) for t in toks[1:]]
        if piped is not None:
            args.append(piped)
        return _FNS[fn](self, args)

    def render(self, tpl: str) -> str:
        out = []
        pos = 0
        for m in TOKEN_RE.finditer(tpl):
            out.append(tpl[pos : m.start()])
            out.append(_go_str(self.expr(m.group(1))))
            pos = m.end()
        out.append(tpl[pos:])
        return "".join(out)


def render_template(
    tpl: str, line: str, labels: dict, ts_ns: int | None = None
) -> str:
    return _Evaluator(line, labels, ts_ns).render(tpl)


def _validate_expr(text: str) -> None:
    toks = _tokenize(text)
    segs: list[list[str]] = [[]]
    for t in toks:
        if t == "|":
            segs.append([])
        else:
            segs[-1].append(t)
    for i, seg in enumerate(segs):
        for t in seg:
            if t.startswith("(") and t.endswith(")"):
                _validate_expr(t[1:-1])
        if not seg:
            continue
        head = seg[0]
        is_call = len(seg) > 1 or i > 0  # has args, or is a pipe target
        if is_call and head not in _FNS and not head.startswith("("):
            raise ValueError(f"template: function {head!r} not defined")


def validate_template(tpl: str) -> None:
    """Plan-time mirror of Go ``text/template`` Parse errors: raise for
    any call-position name outside the registered function set
    (template_funcs.go:29-66 allowlist — e.g. sprig ``default`` is NOT
    in it), so a bad template fails the query at compile time exactly
    like the reference (PrepareLineFormatTemplate returns the parse
    error before any entry is processed), instead of per-row inside the
    Arrow UDF."""
    for m in TOKEN_RE.finditer(tpl):
        _validate_expr(m.group(1))


# ---- function table (the reference's registered set) -----------------


def _s(v) -> str:
    return _go_str(v)


def _fn_divide(ev, a):
    d = _to_int(a[1])
    if d == 0:
        # Go template panic → reference fails the query (internal/
        # planner/line_format.go:23); surface the same failure
        raise ValueError("line_format: integer divide by zero")
    q = _to_int(a[0]) / d
    return int(q)  # truncate toward zero, Go semantics


def _fn_regex_replace(ev, a, literal: bool):
    from gigapipe_spark.model.re2py import go_replacement, replace_all

    pat, s, repl = _s(a[0]), _s(a[1]), _s(a[2])
    if literal:
        # ReplaceAllLiteralString: repl is literal, no $ expansion
        from gigapipe_spark.model.re2py import compile_re2

        out = []
        last = 0
        search = 0
        subject = s
        cre = compile_re2(pat)
        while search <= len(subject):
            m = cre.search(subject, search)
            if not m:
                break
            a0, a1 = m.span()
            out.append(subject[last:a0])
            if a1 > last or a1 == 0:
                out.append(repl)
            last = a1
            search = a0 + 1 if a0 == a1 else a1
        out.append(subject[last:])
        return "".join(out)
    return replace_all(pat, repl, s)


def _fn_round(ev, a):
    # sprig round(value, digits): half away from zero
    v = _to_float(a[0])
    d = _to_int(a[1]) if len(a) > 1 else 0
    mult = 10**d
    return math.floor(abs(v) * mult + 0.5) / mult * (1 if v >= 0 else -1)


def _fn_date(ev, a):
    # date layout t  (t: time.Time or unix seconds)
    layout, t = _s(a[0]), a[1]
    if not isinstance(t, datetime):
        t = datetime.fromtimestamp(_to_float(t), tz=timezone.utc)
    return t.strftime(_go_layout_to_strftime(layout))


def _fn_to_date(ev, a):
    layout, v = _s(a[0]), _s(a[1])
    return datetime.strptime(v, _go_layout_to_strftime(layout)).replace(
        tzinfo=timezone.utc
    )


def _fn_to_date_zone(ev, a):
    # toDateInZone layout tz value — zone applied as UTC-equivalent
    # (zoneinfo data is environment-dependent; documented limitation)
    layout, _tz, v = _s(a[0]), _s(a[1]), _s(a[2])
    return datetime.strptime(v, _go_layout_to_strftime(layout)).replace(
        tzinfo=timezone.utc
    )


def _fn_duration_seconds(ev, a):
    try:
        return parse_duration_ns(_s(a[0])) / 1e9
    except Exception:
        return 0.0


def _fn_indent(ev, a, leading_nl: bool):
    n, s = _to_int(a[0]), _s(a[1])
    pad = " " * n
    out = "\n".join(pad + ln for ln in s.split("\n"))
    return ("\n" + out) if leading_nl else out


_FNS = {
    # Go strings.* builtins registered DIRECTLY (template_funcs.go:31-39)
    # — Go signatures, so the SUBJECT string comes FIRST (the sprig
    # lowercase twins below keep sprig's subject-last order)
    "ToLower": lambda ev, a: _s(a[0]).lower(),
    "ToUpper": lambda ev, a: _s(a[0]).upper(),
    "Replace": _go_replace,
    "Trim": lambda ev, a: _s(a[0]).strip(_s(a[1])),
    "TrimLeft": lambda ev, a: _s(a[0]).lstrip(_s(a[1])),
    "TrimRight": lambda ev, a: _s(a[0]).rstrip(_s(a[1])),
    "TrimPrefix": lambda ev, a: _s(a[0])[len(_s(a[1])):]
    if _s(a[0]).startswith(_s(a[1]))
    else _s(a[0]),
    "TrimSuffix": lambda ev, a: _s(a[0])[: -len(_s(a[1]))]
    if _s(a[1]) and _s(a[0]).endswith(_s(a[1]))
    else _s(a[0]),
    "TrimSpace": lambda ev, a: _s(a[0]).strip(),
    "regexReplaceAll": lambda ev, a: _fn_regex_replace(ev, a, False),
    "regexReplaceAllLiteral": lambda ev, a: _fn_regex_replace(ev, a, True),
    # sprig allowlist (template_funcs.go:51-57; sprig arg order)
    "lower": lambda ev, a: _s(a[0]).lower(),
    "upper": lambda ev, a: _s(a[0]).upper(),
    "title": lambda ev, a: _go_title(_s(a[0])),
    "trunc": lambda ev, a: _s(a[1])[: _to_int(a[0])]
    if _to_int(a[0]) >= 0
    else _s(a[1])[_to_int(a[0]):],
    "substr": lambda ev, a: _s(a[2])[_to_int(a[0]): _to_int(a[1])],
    "contains": lambda ev, a: _s(a[0]) in _s(a[1]),
    "hasPrefix": lambda ev, a: _s(a[1]).startswith(_s(a[0])),
    "hasSuffix": lambda ev, a: _s(a[1]).endswith(_s(a[0])),
    "indent": lambda ev, a: _fn_indent(ev, a, False),
    "nindent": lambda ev, a: _fn_indent(ev, a, True),
    "replace": lambda ev, a: _s(a[2]).replace(_s(a[0]), _s(a[1])),
    "repeat": lambda ev, a: _s(a[1]) * _to_int(a[0]),
    "trim": lambda ev, a: _s(a[0]).strip(),
    "trimAll": lambda ev, a: _s(a[1]).strip(_s(a[0])),
    "trimPrefix": lambda ev, a: _s(a[1])[len(_s(a[0])):]
    if _s(a[1]).startswith(_s(a[0]))
    else _s(a[1]),
    "trimSuffix": lambda ev, a: _s(a[1])[: -len(_s(a[0]))]
    if _s(a[0]) and _s(a[1]).endswith(_s(a[0]))
    else _s(a[1]),
    "int": lambda ev, a: _to_int(a[0]),
    "float64": lambda ev, a: _to_float(a[0]),
    "add": lambda ev, a: sum(_to_int(x) for x in a),
    "sub": lambda ev, a: _to_int(a[0]) - _to_int(a[1]),
    "mul": lambda ev, a: math.prod(_to_int(x) for x in a),
    "div": _fn_divide,
    "divide": _fn_divide,
    "mod": lambda ev, a: int(math.fmod(_to_int(a[0]), _to_int(a[1]))),
    "addf": lambda ev, a: sum(_to_float(x) for x in a),
    "subf": lambda ev, a: _to_float(a[0]) - _to_float(a[1]),
    "mulf": lambda ev, a: math.prod(_to_float(x) for x in a),
    "divf": lambda ev, a: (
        _to_float(a[0]) / _to_float(a[1])
        if _to_float(a[1]) != 0
        else (
            float("nan")
            if _to_float(a[0]) == 0
            else math.copysign(float("inf"), _to_float(a[0]))
        )
    ),
    "max": lambda ev, a: max(_to_int(x) for x in a),
    "min": lambda ev, a: min(_to_int(x) for x in a),
    "maxf": lambda ev, a: max(_to_float(x) for x in a),
    "minf": lambda ev, a: min(_to_float(x) for x in a),
    "ceil": lambda ev, a: float(math.ceil(_to_float(a[0]))),
    "floor": lambda ev, a: float(math.floor(_to_float(a[0]))),
    "round": _fn_round,
    "fromJson": lambda ev, a: json.loads(_s(a[0])),
    "date": _fn_date,
    "toDate": _fn_to_date,
    "toDateInZone": _fn_to_date_zone,
    "unixEpoch": _fn_unix_epoch,
    "duration": lambda ev, a: _go_duration(a[0]),
    "duration_seconds": _fn_duration_seconds,
    "len": lambda ev, a: len(a[0])
    if isinstance(a[0], (dict, list))
    else len(_s(a[0])),
    "eq": lambda ev, a: a[0] == a[1],
    "ne": lambda ev, a: a[0] != a[1],
    "and": lambda ev, a: a[1] if a[0] else a[0],
    "or": lambda ev, a: a[0] if a[0] else a[1],
    "not": lambda ev, a: not a[0],
    # NOTE: sprig `default` is deliberately ABSENT — it is not in the
    # reference's allowlist (template_funcs.go:50-55); a template using
    # it fails text/template Parse there, so using it here must error
    # too (segment() raises for unknown call-position names).
}
