"""Pyroscope profile selector grammar and query planners.

The reference plans every Pyroscope read endpoint from a `{label op
"val", ...}` selector (grammar: reader/prof/prof_parser/model.go:8-16;
planners: reader/prof/prof_transpiler/transpiler.go — PlanLabelNames
:10, PlanLabelValues :18, PlanSelectSeries :42, PlanMergeProfiles :63,
PlanSeries :74, PlanAnalyzeQuery :103). This module re-derives those
plans on DataFrames:

  - pseudo-labels __name__ / __period_type__ / __period_unit__ match
    against the series table's type_id parts and service_name matches
    its own column (the reference's "global" matchers,
    planner_selector.go getMatchers); every other label resolves
    through the profiles GIN with the one-scan bitmask trick — the
    same shape as the LogQL stream selector (bitSetAnd == 2^n-1,
    planner_selector.go:30-37).
  - the fingerprint set is dimension-sized and broadcasts into the
    profile fact scan, so a 100 TB profile store is touched only
    through one semi-join per query.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gigapipe_spark.model.re2java import translate as _re2
from gigapipe_spark.sources import views


class ProfSelectorError(ValueError):
    pass


@dataclass
class Selector:
    name: str
    op: str  # = != =~ !~
    val: str


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<name>[a-zA-Z_][a-zA-Z0-9_.]*)
      | (?P<op>=~|!~|!=|=)
      | (?P<str>"(?:\\.|[^"\\])*"|`[^`]*`)
      | (?P<punct>[{},])
    )""",
    re.VERBOSE,
)

# pseudo-labels matched on series-table columns, not the GIN
# (ref: planner_selector.go getMatchers cases)
_GLOBAL_LABELS = {
    "__name__",
    "__period_type__",
    "__period_unit__",
    "__sample_type__",
    "__sample_unit__",
    "__profile_type__",
    "service_name",
}


def _unquote(tok: str) -> str:
    if tok.startswith("`"):
        return tok[1:-1]
    body = tok[1:-1]
    return body.replace(r"\"", '"').replace(r"\\", "\\")


def parse_profile_selector(text: str) -> list[Selector]:
    """`{label op "value", ...}` → selectors (model.go:8-16). `{}` and
    the empty string select everything."""
    text = text.strip()
    if text in ("", "{}"):
        return []
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            raise ProfSelectorError(f"bad selector at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        toks.append((kind, m.group(kind)))
    sels: list[Selector] = []
    i = 0

    def expect(kind: str, val: str | None = None) -> str:
        nonlocal i
        if i >= len(toks) or toks[i][0] != kind or (val is not None and toks[i][1] != val):
            got = toks[i] if i < len(toks) else ("eof", "")
            raise ProfSelectorError(f"expected {val or kind}, got {got[1]!r}")
        i += 1
        return toks[i - 1][1]

    expect("punct", "{")
    while not (i < len(toks) and toks[i] == ("punct", "}")):
        name = expect("name")
        op = expect("op")
        val = _unquote(expect("str"))
        sels.append(Selector(name=name, op=op, val=val))
        if i < len(toks) and toks[i] == ("punct", ","):
            i += 1
    expect("punct", "}")
    if i != len(toks):
        raise ProfSelectorError(f"trailing input: {toks[i][1]!r}")
    return sels


@dataclass
class TypeId:
    """Parsed `tp:sample_type:sample_unit:period_type:period_unit`
    (ref: shared.ParseTypeId, reader/prof/shared/types.go:20)."""

    tp: str
    sample_type: str
    sample_unit: str
    period_type: str
    period_unit: str

    @property
    def sample_type_unit(self) -> str:
        return f"{self.sample_type}:{self.sample_unit}"


def parse_type_id(text: str) -> TypeId:
    parts = text.split(":", 4)
    if len(parts) != 5:
        raise ProfSelectorError(f"invalid profile type id: {text!r}")
    return TypeId(*parts)


def populate_type_id(sels: list[Selector], tid: TypeId) -> list[Selector]:
    """Append the five type-id pseudo-label matchers to a selector list
    (ref: populateTypeId, prof_transpiler/transpiler.go:115-123) — the
    planner-side scoping every type-id-aware endpoint applies."""
    return sels + [
        Selector(name="__name__", op="=", val=tid.tp),
        Selector(name="__period_type__", op="=", val=tid.period_type),
        Selector(name="__period_unit__", op="=", val=tid.period_unit),
        Selector(name="__sample_type__", op="=", val=tid.sample_type),
        Selector(name="__sample_unit__", op="=", val=tid.sample_unit),
    ]


def detach_type_id(query: str) -> tuple[str | None, str]:
    """Split `tp:st:su:pt:pu{selector}` into (type_id, selector) — the
    /pyroscope/render query format (ref: detachTypeId,
    reader/service/prof.go:686). No `{` → the whole string is a
    selector-less type id; no type part → (None, selector)."""
    if "{" not in query:
        return (query.strip() or None), "{}"
    tid, sel = query.split("{", 1)
    tid = tid.strip()
    return (tid or None), "{" + sel.strip()


def _cond(col: Column, sel: Selector) -> Column:
    if sel.op == "=":
        return col == sel.val
    if sel.op == "!=":
        return col != sel.val
    if sel.op == "=~":
        return col.rlike(_re2(sel.val))
    if sel.op == "!~":
        return ~col.rlike(_re2(sel.val))
    raise ProfSelectorError(f"bad op {sel.op!r}")


def _global_cond(sel: Selector) -> Column:
    """Condition for a pseudo-label (planner_selector.go:44-106):
    __name__/__period_type__/__period_unit__ match type_id parts;
    __sample_type__/__sample_unit__/__profile_type__ are arrayExists
    over the row's sample_types_units (one profile payload carries
    several sample types, profiles.sql:23)."""
    if sel.name == "service_name":
        return _cond(F.col("service_name"), sel)
    part = {"__name__": 0, "__period_type__": 1, "__period_unit__": 2}.get(sel.name)
    if part is not None:
        return _cond(F.split(F.col("type_id"), ":").getItem(part), sel)
    if sel.name == "__sample_type__":
        return F.exists("sample_types_units", lambda x: _cond(x["tp"], sel))
    if sel.name == "__sample_unit__":
        return F.exists("sample_types_units", lambda x: _cond(x["unit"], sel))
    # __profile_type__ = name:sample_type:sample_unit:period_type:period_unit
    p = F.split(F.col("type_id"), ":")
    return F.exists(
        "sample_types_units",
        lambda x: _cond(
            F.concat_ws(
                ":", p.getItem(0), x["tp"], x["unit"], p.getItem(1), p.getItem(2)
            ),
            sel,
        ),
    )


def profile_fingerprints(
    spark: SparkSession, sf_dir: str, scripts: list[list[Selector]] | None
) -> DataFrame:
    """Selector scripts → DF[fingerprint] over the FIXTURE views
    (StreamSelectorPlanner + UnionAllPlanner, planner_selector.go:16 /
    planner_union_all.go). None / empty → every profile series."""
    return profile_fingerprints_frames(
        views.profiles_series(spark, sf_dir),
        views.profiles_gin(spark, sf_dir),
        scripts,
    )


def profile_fingerprints_frames(
    series: DataFrame, gin: DataFrame, scripts: list[list[Selector]] | None
) -> DataFrame:
    """Frame-based selector core shared by the fixture views and the
    STORED profiles_series / profiles_series_gin tables (same planner,
    planner_selector.go:12): global pseudo-labels filter the series
    frame (needs type_id / sample_types_units / service_name columns),
    kv matchers resolve through one GIN bitmask scan."""
    if not scripts:
        return series.select("fingerprint")
    outs: list[DataFrame] = []
    for sels in scripts:
        glob = [s for s in sels if s.name in _GLOBAL_LABELS]
        kv_pos = [s for s in sels if s.name not in _GLOBAL_LABELS and s.op in ("=", "=~")]
        kv_neg = [s for s in sels if s.name not in _GLOBAL_LABELS and s.op in ("!=", "!~")]
        fps = series
        for s in glob:
            fps = fps.filter(_global_cond(s))
        # kv matchers evaluate against the series tag map directly —
        # the GIN is explode(map), so "∃ GIN row (key, matching val)"
        # ≡ "map[key] matches" (NULL for a missing key ⇒ false) and the
        # bitmask collapse (bitSetAnd == 2^n - 1, planner_selector.go:
        # 30-37) ≡ AND of the per-key conditions. This keeps selector
        # resolution a single zero-shuffle dim scan instead of a
        # groupBy(fingerprint) Exchange + per-negation anti-joins per
        # query (the r14 LogQL fingerprints() finding, applied here).
        map_col = "labels" if "labels" in series.columns else "tags"
        lab = F.col(map_col)
        for s in kv_pos:
            fps = fps.filter(_cond(lab.getItem(s.name), s))
        for s in kv_neg:
            # qualifies unless the tag EXISTS with a matching value
            flip = Selector(name=s.name, op="=" if s.op == "!=" else "=~", val=s.val)
            fps = fps.filter(
                ~F.coalesce(_cond(lab.getItem(s.name), flip), F.lit(False))
            )
        fps = fps.select("fingerprint")
        outs.append(fps)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.distinct() if len(outs) > 1 else out


def label_names(
    spark: SparkSession, sf_dir: str, scripts: list[list[Selector]] | None = None
) -> DataFrame:
    """PlanLabelNames over the fixture views."""
    return label_names_frames(
        views.profiles_series(spark, sf_dir),
        views.profiles_gin(spark, sf_dir),
        scripts,
    )


def label_names_frames(
    series: DataFrame, gin: DataFrame, scripts: list[list[Selector]] | None = None
) -> DataFrame:
    """PlanLabelNames (transpiler.go:10): distinct GIN keys, optionally
    restricted to the selectors' fingerprints. Frame-based core shared
    by the fixture views and the stored profiles_series_gin table."""
    if scripts:
        fps = profile_fingerprints_frames(series, gin, scripts)
        gin = gin.join(F.broadcast(fps), "fingerprint", "left_semi")
    return gin.select("key").distinct()


def label_values(
    spark: SparkSession,
    sf_dir: str,
    label: str,
    scripts: list[list[Selector]] | None = None,
) -> DataFrame:
    """PlanLabelValues over the fixture views."""
    return label_values_frames(
        views.profiles_series(spark, sf_dir),
        views.profiles_gin(spark, sf_dir),
        label,
        scripts,
    )


def label_values_frames(
    series: DataFrame,
    gin: DataFrame,
    label: str,
    scripts: list[list[Selector]] | None = None,
) -> DataFrame:
    """PlanLabelValues (transpiler.go:18): distinct values of one key."""
    if scripts:
        fps = profile_fingerprints_frames(series, gin, scripts)
        gin = gin.join(F.broadcast(fps), "fingerprint", "left_semi")
    return gin.filter(F.col("key") == label).select("val").distinct()


def select_series(
    spark: SparkSession,
    sf_dir: str,
    selector: str,
    group_by: list[str],
    step_ns: int,
    agg: str = "sum",
) -> DataFrame:
    """PlanSelectSeries (transpiler.go:42 + planner_select_series.go):
    per (group labels, step bucket) aggregate of the profiles' sample
    value. `sum` totals the per-profile value; `avg` divides by the
    profile count (the reference's TIME_SERIES_AGGREGATION_TYPE_AVERAGE).
    The fingerprint set broadcasts into the fact scan; ONE shuffle on
    (group, bucket)."""
    return select_series_frames(
        views.profiles(spark, sf_dir),
        views.profiles_series(spark, sf_dir),
        views.profiles_gin(spark, sf_dir),
        selector,
        group_by,
        step_ns,
        agg,
    )


def select_series_frames(
    prof: DataFrame,
    series: DataFrame,
    gin: DataFrame,
    selector: str,
    group_by: list[str],
    step_ns: int,
    agg: str = "sum",
) -> DataFrame:
    """Frame-based core of PlanSelectSeries (planner_select_series.go)."""
    sels = parse_profile_selector(selector)
    fps = profile_fingerprints_frames(series, gin, [sels] if sels else None)
    prof = prof.join(F.broadcast(fps), "fingerprint", "left_semi")
    prof = prof.join(
        F.broadcast(series.select("fingerprint", "labels")),
        "fingerprint",
        "left",
    )
    bucket = (
        F.col("timestamp_ns") - F.pmod(F.col("timestamp_ns"), F.lit(step_ns))
    ).alias("timestamp_ns")
    group_cols = [
        F.col("labels").getItem(g).alias(g.replace(".", "_")) for g in group_by
    ]
    value = (
        F.avg(F.col("duration_ns")).alias("value")
        if agg == "avg"
        else F.sum(F.col("duration_ns")).cast("double").alias("value")
    )
    return prof.groupBy(*group_cols, bucket).agg(value)


def series(
    spark: SparkSession,
    sf_dir: str,
    scripts: list[list[Selector]] | None = None,
    label_names: list[str] | None = None,
) -> DataFrame:
    """PlanSeries (transpiler.go:74): the label sets of matching series;
    `label_names` projects the maps down (FilterLabelsPlanner)."""
    return series_frames(
        views.profiles_series(spark, sf_dir),
        views.profiles_gin(spark, sf_dir),
        scripts,
        label_names,
    )


def series_frames(
    series: DataFrame,
    gin: DataFrame,
    scripts: list[list[Selector]] | None = None,
    label_names: list[str] | None = None,
) -> DataFrame:
    """Frame-based core of PlanSeries (transpiler.go:74)."""
    s = series
    if scripts:
        fps = profile_fingerprints_frames(series, gin, scripts)
        s = s.join(F.broadcast(fps), "fingerprint", "left_semi")
    s = s.select("fingerprint", "labels")
    if label_names:
        keep = F.array(*[F.lit(x) for x in label_names])
        s = s.withColumn(
            "labels", F.map_filter(F.col("labels"), lambda k, v: F.array_contains(keep, k))
        )
    return s


def profile_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuerierService/ProfileTypes (ref: service/prof.go:33): distinct
    type_id × sample type/unit, split into ProfileType components. The
    fixture stores one sample type per profile == the period type/unit
    (type_id = name:period_type:period_unit)."""
    p = F.split(F.col("type_id"), ":")
    return (
        views.profiles_series(spark, sf_dir)
        .select("type_id")
        .distinct()
        .select(
            p.getItem(0).alias("name"),
            p.getItem(1).alias("sample_type"),
            p.getItem(2).alias("sample_unit"),
            p.getItem(1).alias("period_type"),
            p.getItem(2).alias("period_unit"),
            F.concat_ws(
                ":", p.getItem(0), p.getItem(1), p.getItem(2), p.getItem(1), p.getItem(2)
            ).alias("profile_type_id"),
        )
    )


def profile_types_frames(series: DataFrame) -> DataFrame:
    """ProfileTypes over a STORED profiles_series frame (service/
    prof.go:33): distinct (type_id × carried sample type/unit) combos —
    one profile payload carries several sample types (profiles.sql:23),
    so the stu array explodes into one ProfileType per slot. (The
    fixture wrapper above keeps its one-type simplification because its
    oracle is locked to it.)"""
    p = F.split(F.col("type_id"), ":")
    return (
        series.select("type_id", F.explode("sample_types_units").alias("stu"))
        .select(
            p.getItem(0).alias("name"),
            F.col("stu")["tp"].alias("sample_type"),
            F.col("stu")["unit"].alias("sample_unit"),
            p.getItem(1).alias("period_type"),
            p.getItem(2).alias("period_unit"),
        )
        .distinct()
        .select(
            "*",
            F.concat_ws(
                ":", "name", "sample_type", "sample_unit",
                "period_type", "period_unit",
            ).alias("profile_type_id"),
        )
    )


def profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuerierService/GetProfileStats (ref: service/prof.go:334): one row
    (data_ingested, oldest/newest profile time in ms)."""
    return profile_stats_frames(views.profiles(spark, sf_dir))


def profile_stats_frames(prof: DataFrame) -> DataFrame:
    return prof.agg(
        (F.count(F.lit(1)) > 0).alias("data_ingested"),
        (F.min("timestamp_ns") / F.lit(1_000_000)).cast("long").alias(
            "oldest_profile_time_ms"
        ),
        (F.max("timestamp_ns") / F.lit(1_000_000)).cast("long").alias(
            "newest_profile_time_ms"
        ),
    )


def analyze(spark: SparkSession, sf_dir: str, selector: str) -> DataFrame:
    """PlanAnalyzeQuery (transpiler.go:103 + planner_profiles_size.go):
    one row (profile_size, fingerprint_count) for the selection. The
    fixture's payload-size proxy is the tree node count (the stored
    payload is the serialized tree; length(payload) in the reference)."""
    return analyze_frames(
        views.profiles(spark, sf_dir),
        views.profiles_series(spark, sf_dir),
        views.profiles_gin(spark, sf_dir),
        selector,
    )


def analyze_frames(
    prof: DataFrame, series: DataFrame, gin: DataFrame, selector: str
) -> DataFrame:
    """Frame-based core of PlanAnalyzeQuery. Size proxy: tree node
    count when the tree layout is present, else stored payload bytes
    (length(payload) — what planner_profiles_size.go sums)."""
    sels = parse_profile_selector(selector)
    fps = profile_fingerprints_frames(series, gin, [sels] if sels else None)
    prof = prof.join(F.broadcast(fps), "fingerprint", "left_semi")
    size = (
        F.size("tree") if "tree" in prof.columns else F.length("payload")
    )
    return prof.agg(
        F.sum(size).cast("long").alias("profile_size"),
        F.count_distinct("fingerprint").alias("fingerprint_count"),
    )
