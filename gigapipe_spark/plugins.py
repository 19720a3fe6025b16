"""Plugin registry — the engine's extension seams.

The reference's extension model is Go plugin registries swapping whole
planners/services (ref: reader/plugins/plugins.go:13-27 —
RegisterLogQLPlannerPlugin / GetLogQLPlannerPlugins, consulted before
the built-in planner at logql_transpiler/planner.go:134-139 with an
ErrPluginNotApplicable fall-through) plus the LogQL `_macro(...)`
surface routed through the same registry (ref: logql_parser/model.go:485
MacrosOp). SURVEY §2.9: in Spark these seams become strategy-pattern
callables consulted first, falling back to the built-in compiler.

Seams are string-named lists; a plugin raises NotApplicable to pass.
Macros are plain query-text rewrites: `_name("p1", "p2")` → a LogQL
fragment produced by the registered expander. Everything here is
driver-side control flow — nothing touches the executors, so plugin
dispatch adds zero per-row cost at any scale.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Any


class NotApplicable(Exception):
    """Raised by a plugin that declines the input; the next plugin (or
    the built-in path) is consulted (ref: plugins.go ErrPluginNotApplicable)."""


_registries: dict[str, list[tuple[str, Callable[..., Any]]]] = {}

# Seam names mirroring the reference's per-surface registries
# (logs_planners.go, metrics_planners.go, traces_planners.go).
LOGQL_PLANNER = "logql_planner"
PROMQL_PLANNER = "promql_planner"
TRACEQL_PLANNER = "traceql_planner"
MACRO = "logql_macro"


def register_plugin(seam: str, name: str, fn: Callable[..., Any]) -> None:
    """Append a plugin to a seam. Later registrations are consulted later
    (reference appends too, plugins.go:21-23)."""
    _registries.setdefault(seam, []).append((name, fn))


def unregister_plugin(seam: str, name: str) -> None:
    _registries[seam] = [
        (n, f) for n, f in _registries.get(seam, []) if n != name
    ]


def get_plugins(seam: str) -> list[tuple[str, Callable[..., Any]]]:
    return list(_registries.get(seam, []))


def consult(seam: str, *args: Any, **kwargs: Any) -> Any | None:
    """First plugin that does not raise NotApplicable wins (ref:
    planner.go:134-139). Returns None when no plugin applies."""
    for _, fn in _registries.get(seam, []):
        try:
            return fn(*args, **kwargs)
        except NotApplicable:
            continue
    return None


# ---------------------------------------------------------------------------
# LogQL macros
# ---------------------------------------------------------------------------

_MACRO_RE = re.compile(r"\b(_[a-zA-Z][a-zA-Z0-9_]*)\(([^()]*)\)")
_PARAM_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')


def register_macro(name: str, expand: Callable[..., str]) -> None:
    """Register `_name(...)` → LogQL-text expansion. The expander gets
    the unquoted string params and returns replacement query text."""
    if not name.startswith("_"):
        raise ValueError("macro names start with '_' (ref: model.go:485)")

    def plugin(match_name: str, params: list[str]) -> str:
        if match_name != name:
            raise NotApplicable(match_name)
        return expand(*params)

    register_plugin(MACRO, name, plugin)


def expand_macros(text: str) -> str:
    """Rewrite every registered `_macro("p", ...)` call in a query. An
    unregistered macro name is an error, like the reference's parser
    rejecting unknown Macros_function tokens."""

    def repl(m: re.Match) -> str:
        name = m.group(1)
        params = [p.group(1) for p in _PARAM_RE.finditer(m.group(2))]
        out = consult(MACRO, name, params)
        if out is None:
            # not a registered macro — leave untouched (it may be a
            # macro-shaped literal inside a line-filter string; the
            # parser decides whether the query is valid)
            return m.group(0)
        return out

    prev = None
    # expand iteratively so macros may expand to macro-bearing text
    for _ in range(10):
        if text == prev:
            return text
        prev, text = text, _MACRO_RE.sub(repl, text)
    return text
