r"""RE2 → Python ``re`` translation for template regexes.

The one place the engine evaluates a user regex in PYTHON rather than
on the JVM is the ``| line_format`` Arrow-UDF fallback's
``regexReplaceAll`` (Go-template sprig function; ref:
shared/template_funcs.go — the reference evaluates it in Go's regexp,
i.e. genuine RE2).  Python's ``re`` dialect is CLOSE to RE2 — dot
excludes only ``\n``, ``(?m)^/$`` consider only ``\n`` — but diverges
in corners that must not silently change meaning:

| RE2 construct         | Python meaning             | action            |
|-----------------------|----------------------------|-------------------|
| ``$`` (no ``(?m)``)   | also before final ``\n``   | → ``\Z``          |
| ``\z``                | syntax error               | → ``\Z``          |
| ``(?<name>…)``        | syntax error               | → ``(?P<name>…)`` |
| ``[[:alpha:]]`` etc.  | literal chars              | → ASCII ranges    |
| ``\Q…\E``             | syntax error               | → ``re.escape``   |
| ``\p{…}`` / ``\pL``   | syntax error               | raise             |
| ``(?U)``              | (?u) = unicode (≠)         | raise             |
| ``a*+`` possessive    | VALID in Python ≥3.11!     | raise (RE2 rejects)|
| ``\1`` backref        | backreference              | raise (RE2 rejects)|
| ``(?=…)`` lookaround  | lookaround                 | raise (RE2 rejects)|
| mid-pattern ``(?s)``  | error in Python ≥3.11      | raise unless at 0 |

Go's ``ReplaceAllString`` replacement syntax (``$1``, ``$name``,
``${name}``, ``$$``) also differs from Python's (``\1``,
``\g<name>``): ``go_replacement`` converts it, resolving Go's
out-of-range-ref-to-empty-string rule statically (Python would raise).

Differentially pinned against DuckDB's embedded RE2
(tests/test_regex_dialect.py::test_template_replace_differential).
"""

from __future__ import annotations

import functools
import re

from gigapipe_spark.model.re2java import (
    Re2UnsupportedError,
    group_count,
    group_index,
)

__all__ = [
    "translate_py",
    "compile_re2",
    "go_replacement",
    "replace_all",
]

# RE2 POSIX classes are ASCII-only; Python has no [[:name:]], so expand
# to explicit ASCII ranges valid INSIDE a character class.
_POSIX_ASCII = {
    "alnum": "0-9A-Za-z",
    "alpha": "A-Za-z",
    "ascii": "\\x00-\\x7f",
    "blank": "\\t ",
    "cntrl": "\\x00-\\x1f\\x7f",
    "digit": "0-9",
    "graph": "\\x21-\\x7e",
    "lower": "a-z",
    "print": "\\x20-\\x7e",
    "punct": "!-/:-@\\[-`{-~",
    "space": "\\t\\n\\x0b\\f\\r ",
    "upper": "A-Z",
    "word": "0-9A-Za-z_",
    "xdigit": "0-9A-Fa-f",
}

_REPETITION = re.compile(r"\{\d+(,\d*)?\}")
_FLAG_GROUP = re.compile(r"\(\?([a-zA-Z]*(?:-[a-zA-Z]*)?)([:)])")


@functools.lru_cache(maxsize=4096)
def translate_py(pattern: str) -> str:
    """Rewrite an RE2 pattern into a Python ``re`` pattern with RE2
    semantics, or raise Re2UnsupportedError (for constructs RE2 itself
    rejects, or RE2 constructs Python cannot express — \\p classes,
    mid-pattern global flags)."""
    out: list[str] = []
    i = 0
    n = len(pattern)
    in_class = False
    prev_quant = False
    at_start = True  # only a leading run of (?flags) groups is allowed
    while i < n:
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n:
                raise Re2UnsupportedError("trailing backslash")
            nxt = pattern[i + 1]
            if nxt == "Q":
                end = pattern.find("\\E", i + 2)
                span = pattern[i + 2 :] if end < 0 else pattern[i + 2 : end]
                out.append(re.escape(span))
                i = n if end < 0 else end + 2
                prev_quant = False
                at_start = False
                continue
            if nxt in "pP":
                raise Re2UnsupportedError(
                    "\\p classes are not supported in template regexes "
                    "(Python re has no Unicode property classes)"
                )
            if not in_class and nxt.isdigit() and nxt != "0":
                raise Re2UnsupportedError(
                    f"backreference \\{nxt} is not valid RE2"
                )
            if nxt == "Z":
                raise Re2UnsupportedError(r"\Z is not valid RE2 (use \z)")
            if nxt == "z" and not in_class:
                out.append(r"\Z")  # RE2 \z = absolute end = Python \Z
                i += 2
                prev_quant = False
                at_start = False
                continue
            out.append(c + nxt)
            i += 2
            prev_quant = False
            at_start = False
            continue
        if in_class:
            if c == "[":
                m = re.match(r"\[:(\^?)([a-z]+):\]", pattern[i:])
                if m:
                    neg, name = m.group(1), m.group(2)
                    if name not in _POSIX_ASCII:
                        raise Re2UnsupportedError(
                            f"unknown POSIX class [:{name}:]"
                        )
                    if neg:
                        raise Re2UnsupportedError(
                            f"negated POSIX class [:^{name}:] inside a "
                            "class is not expressible in Python re"
                        )
                    out.append(_POSIX_ASCII[name])
                    i += m.end()
                    continue
                out.append(r"\[")
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
            at_start = False
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
                close = pattern.find(">", i)
                if close < 0:
                    raise Re2UnsupportedError("unterminated group name")
                start = i + (4 if pattern.startswith("(?P<", i) else 3)
                name = pattern[start:close]
                out.append(f"(?P<{name}>")
                i = close + 1
                prev_quant = False
                at_start = False
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
                if "U" in spec.partition("-")[0]:
                    raise Re2UnsupportedError(
                        "RE2 (?U) ungreedy flag has no Python equivalent "
                        "(Python (?U) means unicode mode)"
                    )
                if term == ")":
                    # global flag group: RE2 scopes it from HERE to the
                    # end of the enclosing group; Python ≥3.11 only
                    # allows (and applies globally) at position 0 —
                    # identical semantics only for a leading run
                    if not at_start:
                        raise Re2UnsupportedError(
                            "mid-pattern global flag group "
                            f"{pattern[i:m.end()]!r} is not "
                            "expressible in Python re (use the scoped "
                            "'(?flags:…)' form)"
                        )
                    out.append(pattern[i : i + (m.end() - m.start())])
                else:
                    # scoped (?flags:…): same meaning in both dialects
                    # for i/s/m given the dot/$ equivalences
                    out.append(pattern[i : i + (m.end() - m.start())])
                    at_start = False
                i += m.end() - m.start()
                prev_quant = False
                continue
            out.append("(")
            i += 1
            prev_quant = False
            at_start = False
            continue
        if c == "$":
            # RE2 $ (no m) = absolute end; Python $ also matches before
            # a final \n → \Z.  Under (?m) both fire before every \n
            # and at end — same, keep. Scoped (?m:…) containing $ also
            # matches Python's scoped behavior, so only the UNflagged
            # rewrite is needed; detecting "am I under an m flag here"
            # mirrors re2java's stack — reuse a cheap scan: a leading
            # global (?m) or an enclosing (?m: covers the template
            # surface; full scope tracking matches re2java.translate.
            out.append("$" if _m_active(pattern, i) else r"\Z")
            i += 1
            prev_quant = False
            at_start = False
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
            out.append(r"\{")
            i += 1
            prev_quant = False
            at_start = False
            continue
        if c in "*+?":
            if prev_quant:
                if c == "+":
                    raise Re2UnsupportedError(
                        "possessive quantifier is not valid RE2"
                    )
                out.append(c)
                i += 1
                prev_quant = False
                continue
            out.append(c)
            i += 1
            prev_quant = True
            at_start = False
            continue
        out.append(c)
        i += 1
        prev_quant = False
        at_start = False
    if in_class:
        raise Re2UnsupportedError("unterminated character class")
    return "".join(out)


def _m_active(pattern: str, pos: int) -> bool:
    """Is the m flag active at pattern[pos]? Stack-tracked walk, the
    same scope rules as re2java.translate."""
    flags: set[str] = set()
    stack: list[set[str]] = []
    i = 0
    in_class = False
    while i < pos:
        c = pattern[i]
        if c == "\\":
            if pattern.startswith("\\Q", i):
                end = pattern.find("\\E", i + 2)
                i = len(pattern) if end < 0 else end + 2
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
            m = _FLAG_GROUP.match(pattern, i)
            if m and not pattern.startswith("(?P<", i):
                spec, term = m.group(1), m.group(2)
                on, _, off = spec.partition("-")
                new = (flags | set(on)) - set(off)
                if term == ")":
                    flags = new
                else:
                    stack.append(set(flags))
                    flags = new
                i += m.end() - m.start()
                continue
            stack.append(set(flags))
            i += 1
            continue
        if c == ")":
            if stack:
                flags = stack.pop()
            i += 1
            continue
        i += 1
    return "m" in flags


@functools.lru_cache(maxsize=1024)
def compile_re2(pattern: str) -> "re.Pattern[str]":
    """Compile an RE2 pattern for Python execution with RE2 semantics."""
    return re.compile(translate_py(pattern))


def replace_all(pattern: str, go_repl: str, subject: str) -> str:
    """Go ``regexp.ReplaceAllString`` over an RE2 pattern, evaluated in
    Python with GO's global-replace semantics.

    Python ``re.sub`` (≥3.7) REPLACES an empty match that abuts the end
    of the previous non-empty match; Go/RE2 skip it (regexp/regexp.go
    replaceAll: the replacement fires only when ``a[1] > lastMatchEnd
    || a[1] == 0``) — found by the replace fuzz: ``([a-c]+)?`` over
    ``"aab1"`` is ``X1X`` in RE2 but ``XX1X`` under re.sub. The manual
    scan below mirrors Go's loop exactly; everything else (pattern
    dialect, $-replacement syntax) goes through translate_py /
    go_replacement."""
    cre = compile_re2(pattern)
    template = go_replacement(go_repl, pattern)
    out: list[str] = []
    last_match_end = 0
    search_pos = 0
    n = len(subject)
    while search_pos <= n:
        m = cre.search(subject, search_pos)
        if not m:
            break
        a0, a1 = m.span()
        out.append(subject[last_match_end:a0])
        if a1 > last_match_end or a1 == 0:
            out.append(m.expand(template))
        last_match_end = a1
        search_pos = a0 + 1 if a0 == a1 else a1
    out.append(subject[last_match_end:])
    return "".join(out)


_GO_REF = re.compile(r"\$(\$|\{([^}]*)\}|[0-9A-Za-z_]+)?")


@functools.lru_cache(maxsize=1024)
def go_replacement(repl: str, pattern: str) -> str:
    """Convert a Go ReplaceAllString replacement ($1, $name, ${name},
    $$) into a Python re.sub replacement, resolving Go's
    undefined-ref→empty-string rule statically (Python raises on
    unknown group names instead)."""
    names = group_index(pattern)
    ngroups = group_count(pattern)
    out: list[str] = []
    pos = 0
    for m in _GO_REF.finditer(repl):
        out.append(repl[pos : m.start()].replace("\\", "\\\\"))
        pos = m.end()
        tok = m.group(1)
        if tok is None:  # lone trailing '$': Go keeps it literal
            out.append("$")
            continue
        if tok == "$":
            out.append("$")
            continue
        name = m.group(2) if tok.startswith("{") else tok
        if name == "":
            continue  # ${}: Go → empty
        if name.isdigit():
            idx = int(name)
            # $0 is the whole match in Go and Python alike
            out.append(f"\\g<{idx}>" if 0 <= idx <= ngroups else "")
        elif name in names:
            out.append(f"\\g<{name}>")
        else:
            # Go: $name with the LONGEST ident run; unknown → ""
            out.append("")
    out.append(repl[pos:].replace("\\", "\\\\"))
    return "".join(out)
