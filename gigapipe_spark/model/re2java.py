r"""RE2 → java.util.regex pattern translation.

The reference evaluates every user-supplied regex in RE2 — stream
selectors, line filters, and label filters all compile to ClickHouse
``match()`` / ``extractAllGroups`` which embed RE2 (ref:
reader/logql/logql_transpiler/clickhouse_planner/planner_line_filter.go:55-151,
sql_misc.go:33).  Spark's ``rlike`` / ``regexp_extract`` evaluate in
java.util.regex.  The two dialects agree on the common surface but
diverge in documented corners; a Grafana-written RE2 pattern must not
silently change meaning when executed here.

``translate(pattern)`` rewrites an RE2 pattern into a Java pattern with
identical match semantics, and raises ``Re2UnsupportedError`` for RE2
constructs that cannot be expressed (or for constructs that RE2 itself
rejects — the reference would fail the query, so we do too, instead of
silently applying Java-only semantics).

Divergence table (see docs/REGEX.md for the full discussion; each row
is pinned by tests/test_regex_dialect.py against DuckDB's RE2):

| RE2 construct        | Java meaning              | action              |
|----------------------|---------------------------|---------------------|
| ``(?P<name>…)``      | syntax error              | → plain ``(…)``     |
| ``(?<name>…)``       | named group (no ``_``)    | → plain ``(…)``     |
| ``.`` (no ``(?s)``)  | also excludes \r …        | → ``[^\n]``         |
| ``$`` (no ``(?m)``)  | matches before final \n   | → ``\z``            |
| ``[[:alpha:]]`` etc. | literal chars ``[:alph…`` | → ``\p{Alpha}``     |
| ``[a&&b]``           | class intersection        | → ``&`` escaped     |
| ``[a[b]``            | nested class union        | → ``[`` escaped     |
| ``\p{Greek}``        | syntax error (needs Is)   | → ``\p{IsGreek}``   |
| ``a{`` (bad rep)     | syntax error              | → ``a\{``           |
| ``(?U)`` ungreedy    | UNICODE_CHARACTER_CLASS!  | raise (silent flip) |
| ``\1`` backref       | backreference             | raise (RE2 rejects) |
| ``a*+`` possessive   | possessive quantifier     | raise (RE2 rejects) |
| ``(?=…)`` lookaround | lookaround                | raise (RE2 rejects) |
| ``\Z``               | before final terminator   | raise (RE2 rejects) |

Inline flags are tracked with their exact RE2 scope: ``(?m)`` applies
from its position to the end of the enclosing group, ``(?m:…)`` only
inside that group — so a pattern mixing flagged and unflagged dots or
anchors rewrites each occurrence under the flags active at ITS
position.  The ``s``/``m`` flags are consumed by the rewrites and
stripped from the emitted Java pattern (a leaked ``(?m)`` would
re-widen Java's ``$`` to fire before ``\r\n``/U+0085/U+2028 where RE2
only fires before ``\n``).  Flag-like text inside a character class or
a ``\Q…\E`` literal span is data, not a flag.
"""

from __future__ import annotations

import functools

__all__ = [
    "translate",
    "group_index",
    "group_count",
    "Re2UnsupportedError",
]


class Re2UnsupportedError(ValueError):
    """User pattern uses a construct RE2 rejects or Java cannot mimic.

    The reference fails such queries at plan time (RE2 compile error in
    ClickHouse); surfacing the same failure beats silently evaluating
    Java-only semantics.
    """


# POSIX bracket classes (RE2 `[[:name:]]`) → Java \p equivalents.
_POSIX = {
    "alnum": r"\p{Alnum}",
    "alpha": r"\p{Alpha}",
    "ascii": r"\p{ASCII}",
    "blank": r"\p{Blank}",
    "cntrl": r"\p{Cntrl}",
    "digit": r"\p{Digit}",
    "graph": r"\p{Graph}",
    "lower": r"\p{Lower}",
    "print": r"\p{Print}",
    "punct": r"\p{Punct}",
    "space": r"\p{Space}",
    "upper": r"\p{Upper}",
    "word": r"\w",
    "xdigit": r"\p{XDigit}",
}
_POSIX_NEG = {
    "word": r"\W",
}

# Unicode general-category names Java accepts verbatim (\p{L}, \p{Lu},
# …).  Anything NOT in this set is an RE2 script name — including the
# two-letter scripts Yi and Vai — which Java spells \p{IsGreek}.
_GENERAL_CATEGORIES = frozenset(
    "C L M N P S Z "
    "Cc Cf Cn Co Cs Ll Lm Lo Lt Lu Mc Me Mn Nd Nl No "
    "Pc Pd Pe Pf Pi Po Ps Sc Sk Sm So Zl Zp Zs".split()
)

import re as _re

_REPETITION = _re.compile(r"\{\d+(,\d*)?\}")
# (?flags) or (?flags:  or plain (?:  — spec may be empty (for "(?:").
_FLAG_GROUP = _re.compile(r"\(\?([a-zA-Z]*(?:-[a-zA-Z]*)?)([:)])")


def _translate_p_class(pattern: str, i: int, out: list[str]) -> int:
    """Handle ``\\p…`` / ``\\P…`` starting at pattern[i] == 'p'/'P'.

    Returns the new index. RE2 spells negation either \\P{X} or
    \\p{^X}; Java only \\P{X}. Script names gain the Is prefix.
    """
    kind = pattern[i]  # 'p' or 'P'
    if i + 1 < len(pattern) and pattern[i + 1] != "{":
        # single-letter form \pL — identical in both dialects
        out.append("\\" + kind + pattern[i + 1])
        return i + 2
    end = pattern.find("}", i)
    if end < 0:
        raise Re2UnsupportedError(f"unterminated \\{kind}{{ in pattern")
    name = pattern[i + 2 : end]
    if name.startswith("^"):
        kind = "p" if kind == "P" else "P"
        name = name[1:]
    if name == "Any":
        out.append(r"[\s\S]" if kind == "p" else r"[^\s\S]")
        return end + 1
    if name not in _GENERAL_CATEGORIES:
        # RE2 script name (Greek, Han, two-letter Yi/Vai, …) →
        # Java \p{IsGreek}.  Membership in the general-category set,
        # not name length, decides: \p{Yi} is a script, \p{Lu} is not.
        name = "Is" + name
    out.append("\\" + kind + "{" + name + "}")
    return end + 1


@functools.lru_cache(maxsize=4096)
def group_index(pattern: str) -> dict[str, int]:
    """Named-group name → 1-based group index, by walking the pattern.

    Python ``re`` cannot compile RE2 patterns containing ``\\pL`` etc.,
    so the index is computed lexically: every unescaped ``(`` that is a
    capturing group (plain, ``(?P<name>`` or ``(?<name>``) increments
    the index; ``(?:``/``(?i)``-style groups do not.  ``\\Q…\\E``
    literal spans are skipped whole — a literal ``(`` inside one is
    data, not a group (mirrors translate()'s handling).
    """
    out: dict[str, int] = {}
    idx = 0
    i = 0
    n = len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            if pattern.startswith("\\Q", i):
                end = pattern.find("\\E", i + 2)
                i = n if end < 0 else end + 2
                continue
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(":
            named = None
            if pattern.startswith("(?P<", i):
                named = i + 4
            elif (
                pattern.startswith("(?<", i)
                and not pattern.startswith("(?<=", i)
                and not pattern.startswith("(?<!", i)
            ):
                named = i + 3
            if named is not None:
                close = pattern.find(">", named)
                if close < 0:
                    raise Re2UnsupportedError("unterminated group name")
                idx += 1
                out[pattern[named:close]] = idx
                i = close + 1
                continue
            if not pattern.startswith("(?", i):
                idx += 1
            i += 1
            continue
        i += 1
    return out


@functools.lru_cache(maxsize=4096)
def group_count(pattern: str) -> int:
    """Total number of capturing groups (plain + named), lexically —
    same \\Q/class-aware walk as group_index."""
    named = group_index(pattern)
    count = len(named)
    # re-walk counting PLAIN groups (group_index counts only named)
    i = 0
    n = len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            if pattern.startswith("\\Q", i):
                end = pattern.find("\\E", i + 2)
                i = n if end < 0 else end + 2
                continue
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(" and not pattern.startswith("(?", i):
            count += 1
        i += 1
    return count


@functools.lru_cache(maxsize=4096)
def translate(pattern: str) -> str:
    """Rewrite an RE2 pattern into java.util.regex with RE2 semantics.

    Raises Re2UnsupportedError for constructs RE2 rejects (lookaround,
    backreferences, possessive quantifiers, ``\\Z``) or that Java cannot
    express with the same meaning (``(?U)`` ungreedy-toggle).
    """
    out: list[str] = []
    i = 0
    n = len(pattern)
    in_class = False
    prev_quant = False  # previous token was a quantifier (possessive check)
    flags: frozenset[str] = frozenset()  # flags active at this position
    stack: list[frozenset[str]] = []  # enclosing groups' flag states
    while i < n:
        c = pattern[i]
        dotall = "s" in flags
        multiline = "m" in flags
        if c == "\\":
            if i + 1 >= n:
                raise Re2UnsupportedError("trailing backslash")
            nxt = pattern[i + 1]
            if nxt == "Q":
                # \Q…\E literal span: identical semantics in both
                # dialects — copy verbatim, no rewrites inside
                end = pattern.find("\\E", i + 2)
                if end < 0:
                    out.append(pattern[i:])
                    i = n
                else:
                    out.append(pattern[i : end + 2])
                    i = end + 2
                prev_quant = False
                continue
            if nxt in "pP":
                i = _translate_p_class(pattern, i + 1, out)
                prev_quant = False
                continue
            if not in_class and nxt.isdigit() and nxt != "0":
                raise Re2UnsupportedError(
                    f"backreference \\{nxt} is not valid RE2"
                )
            if nxt == "Z":
                raise Re2UnsupportedError(r"\Z is not valid RE2 (use \z)")
            out.append(c + nxt)
            i += 2
            prev_quant = False
            continue
        if in_class:
            if c == "[":
                m = _re.match(r"\[:(\^?)([a-z]+):\]", pattern[i:])
                if m:
                    neg, name = m.group(1), m.group(2)
                    if name not in _POSIX:
                        raise Re2UnsupportedError(
                            f"unknown POSIX class [:{name}:]"
                        )
                    if neg:
                        repl = _POSIX_NEG.get(
                            name, _POSIX[name].replace("\\p", "\\P")
                        )
                    else:
                        repl = _POSIX[name]
                    out.append(repl)
                    i += m.end()
                    continue
                out.append(r"\[")
                i += 1
                continue
            if c == "&":
                # [a&&b] is intersection in Java, literal '&' in RE2
                out.append(r"\&")
                i += 1
                continue
            if c == "]":
                in_class = False
                out.append("]")
                i += 1
                prev_quant = False
                continue
            out.append(c)
            i += 1
            continue
        # ---- outside character class
        if c == "[":
            in_class = True
            out.append("[")
            i += 1
            if i < n and pattern[i] == "^":
                out.append("^")
                i += 1
            continue
        if c == "(":
            if pattern.startswith("(?P<", i) or (
                pattern.startswith("(?<", i)
                and not pattern.startswith("(?<=", i)
                and not pattern.startswith("(?<!", i)
            ):
                # named group → plain group: Java rejects RE2-legal names
                # (underscores); callers that extract by name compute the
                # group INDEX from the original pattern (group_index).
                close = pattern.find(">", i)
                if close < 0:
                    raise Re2UnsupportedError("unterminated group name")
                out.append("(")
                stack.append(flags)
                i = close + 1
                prev_quant = False
                continue
            if (
                pattern.startswith("(?=", i)
                or pattern.startswith("(?!", i)
                or pattern.startswith("(?<=", i)
                or pattern.startswith("(?<!", i)
            ):
                raise Re2UnsupportedError("lookaround is not valid RE2")
            if pattern.startswith("(?P=", i):
                raise Re2UnsupportedError("backreference is not valid RE2")
            m = _FLAG_GROUP.match(pattern, i)
            if m:
                spec, term = m.group(1), m.group(2)
                if term == ")" and spec == "":
                    raise Re2UnsupportedError("(?) is not valid RE2")
                on, _, off = spec.partition("-")
                if "U" in on:
                    raise Re2UnsupportedError(
                        "RE2 (?U) ungreedy flag has no Java equivalent "
                        "(Java (?U) means unicode character classes)"
                    )
                new = frozenset((flags | set(on)) - set(off))
                # s/m are consumed by our dot/$/^ rewrites — strip them
                # from the emitted Java flags (leaking (?m) would widen
                # Java's own $ behind the rewrite's back).
                emit_on = "".join(sorted(set(on) - {"s", "m"}))
                emit_off = "".join(sorted(set(off) - {"s", "m"}))
                if term == ")":
                    # (?flags): applies to end of the enclosing group
                    flags = new
                    if emit_on or emit_off:
                        out.append(
                            "(?"
                            + emit_on
                            + ("-" + emit_off if emit_off else "")
                            + ")"
                        )
                else:
                    # (?flags:…) — scoped: push, restore at ')'
                    stack.append(flags)
                    flags = new
                    out.append(
                        "(?"
                        + emit_on
                        + ("-" + emit_off if emit_off else "")
                        + ":"
                    )
                i += m.end() - m.start()
                prev_quant = False
                continue
            out.append("(")
            stack.append(flags)
            i += 1
            prev_quant = False
            continue
        if c == ")":
            if stack:
                flags = stack.pop()
            out.append(")")
            i += 1
            prev_quant = False
            continue
        if c == ".":
            # RE2 dot excludes only \n; Java dot also excludes \r,
            # U+0085, U+2028, U+2029.  With (?s) RE2's dot matches any
            # char — spelled [\s\S] since the s-flag itself is
            # stripped from the emitted pattern (scope handling).
            out.append(r"[\s\S]" if dotall else "[^\n]")
            i += 1
            prev_quant = False
            continue
        if c == "$":
            # RE2 $ (no m-flag) = end of text; Java $ also matches
            # before a final line terminator → \z. With (?m), RE2 $
            # matches only before \n (or at end) while Java's also
            # fires before \r\n / U+0085 / U+2028 / U+2029 — the exact
            # RE2 semantics ARE expressible in Java as a lookahead
            # (lookaround is a Java-side construct; the USER pattern
            # still can't contain one, translate() rejects that above).
            out.append(r"(?=\n|\z)" if multiline else r"\z")
            i += 1
            prev_quant = False
            continue
        if c == "^" and multiline:
            # same story at line starts: Java (?m)^ fires after every
            # line terminator, RE2 only after \n
            out.append(r"(?:\A|(?<=\n))")
            i += 1
            prev_quant = False
            continue
        if c == "{":
            m = _REPETITION.match(pattern, i)
            if m:
                out.append(m.group(0))
                i = m.end()
                if i < n and pattern[i] == "+":
                    raise Re2UnsupportedError(
                        "possessive quantifier is not valid RE2"
                    )
                prev_quant = True
                continue
            # `{` not opening a repetition: literal in RE2, syntax
            # error in Java
            out.append(r"\{")
            i += 1
            prev_quant = False
            continue
        if c in "*+?":
            if prev_quant:
                if c == "+":
                    raise Re2UnsupportedError(
                        "possessive quantifier is not valid RE2"
                    )
                # c == '?' or '*': lazy modifier / double-rep (Java
                # errors on the latter at compile, same as RE2)
                out.append(c)
                i += 1
                prev_quant = False
                continue
            out.append(c)
            i += 1
            prev_quant = True
            continue
        out.append(c)
        i += 1
        prev_quant = False
    if in_class:
        raise Re2UnsupportedError("unterminated character class")
    return "".join(out)
