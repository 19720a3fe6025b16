"""Profiling (Pyroscope) tree algebra.

The reference stores call trees as Array(Tuple(parent, id, fn_id,
values)) per profile row and merges them Go-side (ref:
reader/service/prof_tree.go — MergeTrie :80-143, BFS levels :145,
diff :308). SURVEY §2.6: in Spark the merge is explode → groupBy(node
identity) → sum — a plain DataFrame aggregation, no UDAF. Only the
final flamegraph formatting (levels/diff rendering) runs driver-side on
the already-small merged result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_trees(profiles: DataFrame, sample_type_unit: str | None = None) -> DataFrame:
    """MergeTrie as a DataFrame agg (ref: prof_tree.go:80-143): explode
    every profile's tree and sum self/total per node identity
    (id, parent, fn_id). Scales as one shuffle on the node key.

    A tree node carries one value slot per sample type;
    `sample_type_unit` ("alloc_space:bytes") picks that slot — the
    arrayFirst(y.1 == 'type:unit') projection of MergeRawPlanner
    (planner_merge_raw.go:32-39); a profile without the slot contributes
    zeros, as ClickHouse's arrayFirst default does. None selects each
    node's FIRST slot (the single-valued v1 contract)."""
    # try_element_at: ANSI mode (the driver default) errors on plain
    # element_at when the filtered slot list is empty
    if sample_type_unit is None:
        v = F.try_element_at(F.col("n.values"), F.lit(1))
    else:
        v = F.try_element_at(
            F.filter(F.col("n.values"), lambda x: x["name"] == sample_type_unit),
            F.lit(1),
        )
    nodes = profiles.select(F.explode("tree").alias("n")).select(
        F.col("n.id").alias("id"),
        F.col("n.parent").alias("parent"),
        F.col("n.fn_id").alias("fn_id"),
        F.coalesce(v["self"], F.lit(0)).alias("self"),
        F.coalesce(v["total"], F.lit(0)).alias("total"),
    )
    return nodes.groupBy("id", "parent", "fn_id").agg(
        F.sum("self").alias("self"),
        F.sum("total").alias("total"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def merge_folded(folded: DataFrame, by_profile: bool = False) -> DataFrame:
    """Raw-profile merge with sample dedup (ref: prof_merge_v1.go /
    prof_merge_v2.go): the reference's ProfileMerge keys each sample by
    its (location stack, labels) hash and SUMS values on collision while
    rewrite-tables dedup strings/functions/locations. Over the folded-
    stack representation the same semantics are one groupBy: identical
    stacks collapse, values add. `by_profile=True` keeps per-profile
    grouping (the v1 "merge within one selection" shape); False merges
    across all profiles (the v2 cross-profile merge).

    Scales as a single partial-aggregated shuffle on the stack key — the
    map-side combine collapses duplicate stacks before the exchange.
    """
    keys = ["profile_id", "stack"] if by_profile else ["stack"]
    return folded.groupBy(*keys).agg(
        F.sum("value").alias("value"),
        F.count(F.lit(1)).alias("n_merged"),
    )


def resolve_functions(merged: DataFrame, profiles: DataFrame) -> DataFrame:
    """Attach function names from the per-profile function dictionaries
    (ref: prof_tree.go:223 cross-profile name sync)."""
    fns = (
        profiles.select(F.explode("functions").alias("f"))
        .select(F.col("f.id").alias("fn_id"), F.col("f.name").alias("fn_name"))
        .dropDuplicates(["fn_id"])
    )
    return merged.join(F.broadcast(fns), "fn_id", "left")


def flamegraph_levels(rows: list) -> list[list[dict]]:
    """BFS level-order flamegraph (ref: prof_tree.go:145) — runs on the
    collected merged tree (small by construction)."""
    children: dict[int, list] = {}
    by_id = {}
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        by_id[d["id"]] = d
        children.setdefault(d["parent"], []).append(d)
    roots = [d for d in by_id.values() if d["parent"] not in by_id or d["parent"] == d["id"]]
    levels = []
    frontier = sorted(roots, key=lambda d: -d["total"])
    while frontier:
        levels.append(frontier)
        nxt = []
        for node in frontier:
            nxt.extend(
                c for c in children.get(node["id"], []) if c["id"] != node["id"]
            )
        frontier = sorted(nxt, key=lambda d: -d["total"])
    return levels


def diff_trees(left: DataFrame, right: DataFrame) -> DataFrame:
    """Flamegraph diff (ref: prof_tree.go:308): full-outer join on node
    identity, left/right self+total side by side."""
    lj = left.select(
        "id", "parent", "fn_id",
        F.col("self").alias("self_left"), F.col("total").alias("total_left"),
    )
    rj = right.select(
        "id", "parent", "fn_id",
        F.col("self").alias("self_right"), F.col("total").alias("total_right"),
    )
    return (
        lj.join(rj, ["id", "parent", "fn_id"], "full_outer")
        .fillna(0, ["self_left", "total_left", "self_right", "total_right"])
        .withColumn("self_delta", F.col("self_right") - F.col("self_left"))
        .withColumn("total_delta", F.col("total_right") - F.col("total_left"))
    )


def render_dot(
    rows: list,
    fn_names: dict[int, str] | None = None,
    max_nodes: int = 0,
) -> str:
    """Graphviz DOT rendering of a merged tree (ref: prof_tree.go ToDot).

    ``max_nodes`` prunes like the reference (service/prof_tree.go
    ToDot threshold block): when set and the tree has more nodes, keep
    only nodes whose total is >= the max_nodes-th largest total
    (top-N by total sample count); edges to pruned nodes drop with
    them."""
    dicts = [r.asDict() if hasattr(r, "asDict") else dict(r) for r in rows]
    threshold = 0
    if max_nodes > 0 and len(dicts) > max_nodes:
        totals = sorted((d["total"] for d in dicts), reverse=True)
        threshold = totals[max_nodes - 1]
    kept = {
        d["id"] for d in dicts if threshold == 0 or d["total"] >= threshold
    }
    lines = ["digraph flamegraph {"]
    for d in dicts:
        if d["id"] not in kept:
            continue
        name = (fn_names or {}).get(d["fn_id"], f"fn_{d['fn_id']}")
        lines.append(f'  n{d["id"]} [label="{name}\\nself={d["self"]} total={d["total"]}"];')
        if d["parent"] != d["id"] and d["parent"] in kept:
            lines.append(f'  n{d["parent"]} -> n{d["id"]};')
    lines.append("}")
    return "\n".join(lines)
