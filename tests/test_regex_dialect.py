r"""RE2 ↔ Java regex differential tests (VERDICT r7 task 2).

The reference evaluates user regexes in RE2 via ClickHouse ``match()``
(ref: reader/logql/logql_transpiler/clickhouse_planner/
planner_line_filter.go:55-151); the rebuild evaluates them in Java via
``rlike`` after ``model.re2java.translate``.  DuckDB embeds genuine RE2
(``regexp_matches`` = partial match, exactly ClickHouse ``match``), so
it is the oracle: for every (pattern, subject) pair the translated Java
pattern must match iff DuckDB's RE2 matches.

The corpus deliberately concentrates on the dialect-divergent surface:
dot-vs-newline, ``$`` vs trailing newline, POSIX bracket classes,
``&&``/``[`` inside classes, ``\p`` script names, literal braces,
inline flags, alternation/grouping precedence, unicode classes.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from gigapipe_spark.model.re2java import (
    Re2UnsupportedError,
    group_index,
    translate,
)

# ---------------------------------------------------------------- corpus

SUBJECTS = [
    "",
    "foo",
    "foo\n",
    "foo\nbar",
    "foo\r\nbar",
    "foo\r",
    "FOO",
    "Foo Bar",
    "  padded  ",
    "123",
    "a1b2c3",
    "-42.5e3",
    "tab\there",
    "x" * 50,
    "abc}def",
    "a{2}",
    "[bracket]",
    "a&&b",
    "a&b",
    "100&&200",
    "status=200 method=GET",
    'level=error msg="boom failed"',
    "GET /api/v1/query?x=1 200",
    "αβγ δέζ",  # Greek script
    "Ωmega",
    "héllo wörld",
    "日本語テキスト",
    "mixed ascii και ελληνικά",
    "under_score_name",
    "CamelCaseWord",
    "line1\nline2\nline3",
    "trailing space ",
    "\nleading newline",
    "a.b.c",
    "192.168.0.1",
    ".",
    "$",
    "^start",
    "end$",
    "a|b",
    "()",
]

# Patterns valid in BOTH dialects after translation; each exercises a
# divergence row or precedence corner from the module docstring table.
PATTERNS = [
    # dot vs newline / \r
    "foo.",
    "foo.$",
    ".+",
    "^.*$",
    "a.c",
    ".",
    "(?s)foo.",
    "(?s).+",
    # $ vs trailing newline
    "foo$",
    "bar$",
    "^foo$",
    "3$",
    "(?m)line1$",
    "(?m)^line2$",
    "(?m)foo$",
    "(?m)^bar",
    "(?m)^foo$",
    "(?m)3$",
    "e $",
    # POSIX classes
    "[[:digit:]]+",
    "^[[:alpha:]]+$",
    "[[:alnum:]_]+",
    "[[:space:]]",
    "[[:^digit:]]",
    "[[:punct:]]+",
    "[[:upper:]][[:lower:]]+",
    "[[:xdigit:]]{2}",
    "[[:word:]]+",
    "[[:^word:]]",
    # class quirks: && and [ literal, ranges, negation
    "[a&&b]+",
    "[&]",
    "[a[b]",
    "[]a]?x",
    "[^a-z]+",
    "[-a-c]",
    "[a-c-]",
    "[\\]]",
    # \p classes and scripts
    "\\pL+",
    "\\p{L}+",
    "\\p{Lu}\\p{Ll}+",
    "\\p{Greek}+",
    "\\p{^Greek}",
    "\\P{L}",
    "\\p{N}+",
    "\\p{Han}",
    # literal braces / malformed repetition
    "a{",
    "a{foo}",
    "x{1,2}",
    "x{2}",
    "a{2,}",
    "}x",
    "a{,2}",
    # inline flags
    "(?i)foo",
    "(?i)FOO$",
    "(?i:foo)bar",
    "(?i)(?-i:foo)",
    "(?is)a.c",
    # flag SCOPE: the rewrite must track where a flag is active —
    # (?m:…) must not widen an unflagged trailing $, (?s:…) must not
    # leak dotall onto a dot outside the group (ADVICE r8)
    "(?m:^line2$)|foo$",
    "(?m:3$)|foo$",
    "(?s:foo.)x|foo.",
    "(?s:.).",
    "(?m)x$|(?-m)foo$",
    "a(?s)..",
    "((?s).).",
    # flag-like text inside \Q…\E or a char class is data, not a flag
    "\\Q(?s)\\E.",
    "[(?s)].",
    "[(?m)$]*foo$",
    # named groups (match-only semantics here)
    "(?P<name>foo|bar) (?P<rest>.*)",
    "(?P<under_score>\\d+)",
    # alternation / grouping precedence
    "ab|cd",
    "^ab|cd$",
    "a(b|c)d",
    "(a|b)*c",
    "x|",
    "|x",
    # escapes & word boundaries
    "\\bfoo\\b",
    "\\Boo",
    "\\d+\\.\\d+",
    "\\w+=\\w+",
    "\\s{2,}",
    "\\Afoo",
    "foo\\z",
    "\\Qa.b\\E",
    "\\$",
    "\\.",
    "a\\|b",
    # lazy quantifiers
    "a.*?b",
    "<(.+?)>",
    "x??y",
    # anchors inside alternation
    "^a|b$",
    # real-world-ish log patterns
    "level=(error|warn)",
    'msg="[^"]*"',
    "status=[45][0-9][0-9]",
    "/api/v[0-9]+/",
    "(GET|POST) /\\S+",
    "[0-9]{1,3}(\\.[0-9]{1,3}){3}",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _re2_matches(con, pattern: str, subjects: list[str]) -> list[bool]:
    return [
        bool(
            con.execute(
                "SELECT regexp_matches(?, ?)", [s, pattern]
            ).fetchone()[0]
        )
        for s in subjects
    ]


def test_differential_vs_duckdb_re2(spark, duck):
    """Every corpus pattern agrees with RE2 on every subject."""
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SUBJECTS)], "i int, s string"
    )
    cols = [
        F.col("s").rlike(translate(p)).alias(f"p{j}")
        for j, p in enumerate(PATTERNS)
    ]
    rows = sdf.select("i", *cols).orderBy("i").collect()
    mismatches = []
    for j, pat in enumerate(PATTERNS):
        want = _re2_matches(duck, pat, SUBJECTS)
        got = [bool(r[f"p{j}"]) for r in rows]
        for k, (w, g) in enumerate(zip(want, got)):
            if w != g:
                mismatches.append(
                    f"pattern {pat!r} subject {SUBJECTS[k]!r}: "
                    f"re2={w} java={g} (translated {translate(pat)!r})"
                )
    assert not mismatches, "\n".join(mismatches[:25])


def test_unsupported_constructs_raise_like_re2(duck):
    """Constructs RE2 rejects raise Re2UnsupportedError here, matching
    the reference's query-time RE2 compile failure."""
    for pat in [
        "a*+",
        "a?+",
        "x{2}+",
        "(?=foo)",
        "(?!foo)",
        "(?<=foo)x",
        "(?<!foo)x",
        "(a)\\1",
        "(?P<g>a)(?P=g)",
        "x\\Z",
    ]:
        # confirm RE2 really rejects it (oracle errors)…
        with pytest.raises(Exception):
            duck.execute("SELECT regexp_matches('x', ?)", [pat]).fetchone()
        # …and so do we, at plan time
        with pytest.raises(Re2UnsupportedError):
            translate(pat)
    # (?U) is VALID RE2 (ungreedy toggle) but Java's (?U) means unicode
    # character classes — untranslatable, so it must raise loudly rather
    # than silently flip greediness
    duck.execute("SELECT regexp_matches('x', '(?U)a+')").fetchone()
    with pytest.raises(Re2UnsupportedError):
        translate("(?U)a+")


def test_group_index_lexical():
    assert group_index("(?P<a>x)(?P<b>y)") == {"a": 1, "b": 2}
    assert group_index("(x)(?P<a>y)") == {"a": 2}
    assert group_index("(?:x)(?P<a>y)") == {"a": 1}
    assert group_index("(?i)(?P<a>y)") == {"a": 1}
    assert group_index(r"\((?P<a>y)") == {"a": 1}
    assert group_index("[(](?P<a>y)") == {"a": 1}
    assert group_index("(?<k>v)(plain)(?P<z>w)") == {"k": 1, "z": 3}
    # RE2-legal names Java would reject still index fine
    assert group_index("(?P<foo_bar>x)") == {"foo_bar": 1}
    # \Q…\E literal spans: a literal '(' inside one is data (ADVICE r8)
    assert group_index(r"\Q(\E(?P<x>a)") == {"x": 1}
    assert group_index(r"\Q((\E(a)(?P<y>b)") == {"y": 2}
    assert group_index(r"\Q(") == {}


def test_two_letter_script_names():
    # Yi/Vai are two-letter RE2 SCRIPT names (not general categories)
    # and need Java's Is prefix; \p{Lu} etc. must stay bare (ADVICE r8)
    assert translate(r"\p{Yi}") == r"\p{IsYi}"
    assert translate(r"\p{Vai}+") == r"\p{IsVai}+"
    assert translate(r"\p{Lu}") == r"\p{Lu}"
    assert translate(r"\p{Zs}") == r"\p{Zs}"


def test_logql_user_regex_paths(spark, duck):
    """End-to-end: RE2-flavored patterns flow through LogQL line filter,
    label matcher, and regexp parser with RE2 semantics."""
    from gigapipe_spark.logql.parser import parse
    from gigapipe_spark.logql.compiler import _lf_col

    # regexp parser with an underscore group name (Java would reject the
    # name; we extract by index)
    ast = parse('{app="x"} | regexp "(?P<status_code>[[:digit:]]{3})"')
    assert ast is not None

    df = spark.createDataFrame(
        [("status 200 ok",), ("no digits here",), ("code 4045 long",)],
        "string string",
    )
    from gigapipe_spark.logql import ast as A

    # line filter |~ with POSIX class
    col = _lf_col("|~", A.LFLeaf(value="[[:digit:]]{3}"))
    got = [r[0] for r in df.select(col).collect()]
    want = [
        bool(
            duck.execute(
                "SELECT regexp_matches(?, '[[:digit:]]{3}')", [s]
            ).fetchone()[0]
        )
        for s in ["status 200 ok", "no digits here", "code 4045 long"]
    ]
    assert got == want


def test_label_matcher_dollar_newline(spark):
    """`val=~"foo$"` must NOT match 'foo\n' (RE2 $ = end of text)."""
    df = spark.createDataFrame([("foo\n",), ("foo",)], "v string")
    got = [
        r[0] for r in df.select(F.col("v").rlike(translate("foo$"))).collect()
    ]
    assert got == [False, True]


def test_fuzz_random_compositions(spark, duck):
    """Seeded random compositions of divergence-prone atoms: every
    pattern both engines accept must agree on every subject."""
    import random

    rng = random.Random(0xE2D)
    ATOMS = [
        "a", "b", "foo", "1", ".", "\\d", "\\w", "\\s", "[[:digit:]]",
        "[[:alpha:]]", "\\pL", "\\p{N}", "[a-c]", "[^x]", "[&]",
        "a{1,2}", "x{2}", "\\.", "\\$", "(?:ab)", "(a|b)", "$",
    ]
    QUANT = ["", "", "*", "+", "?", "*?", "+?"]
    pats = []
    for _ in range(300):
        n_atoms = rng.randint(1, 4)
        parts = []
        for _ in range(n_atoms):
            a = rng.choice(ATOMS)
            q = rng.choice(QUANT)
            # quantifying a bare anchor is a syntax error in both —
            # skip the quantifier there
            if a in ("$",) and q:
                q = ""
            parts.append(a + q)
        pat = "".join(parts)
        if rng.random() < 0.15:
            pat = "(?i)" + pat
        if rng.random() < 0.1:
            pat = "^" + pat
        pats.append(pat)

    valid = []
    for pat in pats:
        try:
            duck.execute("SELECT regexp_matches('x', ?)", [pat]).fetchone()
        except Exception:
            # RE2 rejects (e.g. double repetition) — the reference would
            # error the query; nothing to compare
            continue
        valid.append(pat)
    assert len(valid) > 200, f"generator mostly invalid: {len(valid)}"

    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SUBJECTS)], "i int, s string"
    )
    cols = [
        F.col("s").rlike(translate(p)).alias(f"p{j}")
        for j, p in enumerate(valid)
    ]
    rows = sdf.select("i", *cols).orderBy("i").collect()
    mismatches = []
    for j, pat in enumerate(valid):
        want = _re2_matches(duck, pat, SUBJECTS)
        got = [bool(r[f"p{j}"]) for r in rows]
        for k, (w, g) in enumerate(zip(want, got)):
            if w != g:
                mismatches.append(
                    f"pattern {pat!r} subject {SUBJECTS[k]!r}: "
                    f"re2={w} java={g} (translated {translate(pat)!r})"
                )
    assert not mismatches, "\n".join(mismatches[:25])


# ------------------- round-9: template regexReplaceAll (RE2 → Python re)


REPLACE_CASES = [
    # (pattern, go_replacement, subject)
    (r"u(\d+)", "id=$1", "u42 and u7"),
    (r"(\w+)=(\w+)", "$2:$1", "a=1 b=2"),
    (r"(?P<k>[a-z]+)(?P<v>\d+)", "${v}-${k}", "abc123 x9"),
    (r"(?<k>[a-z]+)", "[$k]", "one two"),
    (r"foo", "bar", "foo\nfoo"),
    (r"o$", "X", "foo\n"),          # RE2 $: absolute end only
    (r"(?m)o$", "X", "foo\nboo"),   # multiline: before every \n
    (r"o\z", "X", "foo\n"),
    (r".", "_", "a\nb"),            # dot excludes \n in both
    (r"(?s).", "_", "a\nb"),
    (r"[[:digit:]]+", "#", "a12b345"),
    (r"[[:alpha:]_]+", "w", "héllo_x 42"),  # POSIX classes are ASCII
    (r"\Qa.b\E", "X", "a.b axb"),
    (r"(a)(b)?", "<$1|$2>", "ab a"),        # unmatched group → ""
    (r"x", "a$$b", "x"),                    # $$ → literal $
    (r"(a+)", "$1$1", "aa b a"),
    (r"(?i)go", "-", "Go gO GO"),
    (r"a{", "{", "xa{y"),                   # literal brace
    (r"(\d+)px", "$1 px$", "10px"),         # trailing lone $
    # Go/RE2 skip an empty match abutting the previous non-empty match;
    # Python re.sub replaces it — replace_all mirrors Go's loop
    (r"([a-c]+)?", "X", "aab1"),
    (r"x*", "-", "axbxx"),
]


def test_template_replace_differential(duck):
    """regexReplaceAll evaluates in Python; its user dialect is RE2.
    Pin translate_py + go_replacement against DuckDB's RE2
    regexp_replace (global) for every corpus case."""
    from gigapipe_spark.model.re2py import replace_all

    mismatches = []
    for pat, repl, subj in REPLACE_CASES:
        got = replace_all(pat, repl, subj)
        # DuckDB regexp_replace uses RE2's Rewrite syntax: \1..\9 only;
        # map the Go numeric refs for the oracle side (named refs and
        # $$ are checked by the Python-side expectations below)
        duck_repl = re.sub(r"\$(\d)", r"\\\1", repl).replace("$$", "$")
        if "$" in duck_repl or "{" in repl:
            continue  # named/brace refs: RE2 Rewrite can't express
        want = duck.execute(
            "SELECT regexp_replace(?, ?, ?, 'g')", [subj, pat, duck_repl]
        ).fetchone()[0]
        if got != want:
            mismatches.append(
                f"pattern {pat!r} repl {repl!r} subj {subj!r}: "
                f"py={got!r} re2={want!r}"
            )
    assert not mismatches, "\n".join(mismatches)


def test_template_replace_named_and_edge_refs():
    from gigapipe_spark.model.re2py import replace_all as sub
    # named groups via ${name} and bare $name (longest-ident-run rule)
    assert sub(r"(?P<k>[a-z]+)(?P<v>\d+)", "${v}-${k}", "ab12") == "12-ab"
    assert sub(r"(?P<k>[a-z]+)", "[$k]", "ab cd") == "[ab] [cd]"
    # Go gotcha: $1x parses as group name "1x" (undefined) → ""
    assert sub(r"(a)", "$1x", "a") == ""
    # out-of-range numeric ref → "" (Go rule; DuckDB's RE2 Rewrite
    # differs here — it refuses the rewrite — so this is pinned against
    # Go semantics, the reference's actual template engine)
    assert sub(r"x", "$9", "x") == ""
    assert sub(r"(a)", "${1}x", "a") == "ax"
    # unmatched optional group → empty, not an error
    assert sub(r"(a)(b)?", "<$2>", "a") == "<>"
    # $0 = whole match
    assert sub(r"ab", "[$0]", "xaby") == "x[ab]y"
    # literal backslash in replacement stays literal
    assert sub(r"a", r"\n", "a") == "\\n"


def test_template_replace_unsupported_raise():
    import pytest as _pt

    from gigapipe_spark.model.re2py import translate_py

    for pat in [r"\pL+", r"a*+", r"(?=x)", r"\1", r"(?U)a+", "x(?s)y"]:
        with _pt.raises(Re2UnsupportedError):
            translate_py(pat)


def test_fuzz_template_replace(duck):
    """Seeded random (pattern, replacement, subject) triples: every
    pattern BOTH dialects accept must substitute identically to
    DuckDB's RE2 regexp_replace('g')."""
    import random

    from gigapipe_spark.model.re2java import Re2UnsupportedError as _Err
    from gigapipe_spark.model.re2py import compile_re2, replace_all

    rng = random.Random(0x9E2B)
    ATOMS = [
        "a", "b", "fo", "1", ".", "\\d", "\\w", "[[:digit:]]",
        "[a-c]", "[^x]", "(a)", "(b|1)", "([a-c]+)", "\\.", "$",
    ]
    QUANT = ["", "", "*", "+", "?", "+?"]
    REPLS = ["<$1>", "$1$1", "X", "", "$1-", "a$$b", "[$0]"]
    subjects = ["aab1", "foo\nfo", "a b c", "", "111", "fo.a", "xa\n"]
    checked = 0
    for _ in range(300):
        parts = []
        for _ in range(rng.randint(1, 3)):
            a = rng.choice(ATOMS)
            q = rng.choice(QUANT)
            if a == "$" and q:
                q = ""
            parts.append(a + q)
        pat = "".join(parts)
        repl = rng.choice(REPLS)
        try:
            duck.execute("SELECT regexp_matches('x', ?)", [pat]).fetchone()
        except Exception:
            continue  # RE2 itself rejects → reference errors the query
        try:
            compile_re2(pat)
        except _Err:
            continue
        duck_repl = re.sub(r"\$(\d)", r"\\\1", repl).replace("$$", "$")
        # DuckDB's Rewrite refuses out-of-range refs (Go yields "");
        # only compare when every numeric ref is in range
        from gigapipe_spark.model.re2java import group_count

        max_ref = max(
            (int(m) for m in re.findall(r"\$(\d)", repl)), default=0
        )
        if max_ref > group_count(pat):
            continue
        for subj in subjects:
            got = replace_all(pat, repl, subj)
            want = duck.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')",
                [subj, pat, duck_repl],
            ).fetchone()[0]
            assert got == want, (
                f"pattern {pat!r} repl {repl!r} subj {subj!r}: "
                f"py={got!r} re2={want!r}"
            )
            checked += 1
    assert checked > 500, f"fuzz mostly skipped: {checked}"


def test_named_group_angle_syntax_is_reference_faithful(spark):
    """`(?<name>…)` is valid RE2 in the REFERENCE (go.mod `go 1.26.5`;
    Go regexp accepts the angle syntax since 1.22), so the engine
    accepts it — the DuckDB oracle's bundled RE2 predates the syntax
    and rejects it, which is an ORACLE limitation, not a divergence
    from the reference. Pinned differentially: the angle and P-syntax
    spellings translate identically and match identically."""
    import duckdb

    from gigapipe_spark.model.re2java import translate
    from gigapipe_spark.model.re2py import replace_all

    assert translate("(?<x>ab)c") == translate("(?P<x>ab)c")
    # oracle RE2 rejects the angle spelling (documented), accepts P
    try:
        duckdb.sql(r"SELECT regexp_matches('abc', '(?<x>ab)c')").fetchall()
        raise AssertionError("oracle RE2 grew (?<name>) support — "
                             "retire this pin and the REGEX.md note")
    except duckdb.Error:
        pass
    # behavior parity through the Go-replacement path too
    assert replace_all("(?<x>a+)", "<$x>", "aa b aaa") == \
        replace_all("(?P<x>a+)", "<$x>", "aa b aaa") == "<aa> b <aaa>"
