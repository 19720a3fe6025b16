"""Duplicated-expensive-expression audit over every registry entry.

For each queries() entry, counts occurrences of expensive expression
families (JSON parses, regex runs, HOF folds) in the OPTIMIZED plan
text and flags entries above a threshold. Found the round-14 class of
bugs: predicate pushdown substitutes Project aliases into the pushed
filter condition UNCONDITIONALLY (CollapseProject's non-cheap
multi-ref guard does not apply to filters), so a filter over a
parser/transform Project chain re-evaluates the whole chain per input
row — `| json` label filters ran from_json once per label-map ENTRY
per row, and `| unwrap bytes()` ran 29 from_json + 28 regexp_extract
per row through its null filter.

Interpretation guide (counts are a SMELL, not proof):
  - duplicates WITHIN one Project are usually fine: whole-stage
    codegen subexpression elimination merges identical subtrees across
    a project list at runtime;
  - duplicates split across a Filter and the Project below it are
    real: no cross-operator CSE exists, the filter copy runs per
    input row and the project copy per surviving row;
  - duplicates inside HOF lambda bodies (transform/aggregate/filter
    lambdas) are real AND multiplied by the array/map size — the
    worst case (codegen does not enter lambda bodies);
  - large flat counts in one Project (minhash band unrolls, per-field
    decoders) are usually the operator's genuine width.

Usage: python scripts/dupescan.py [threshold] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPENSIVE = [
    "from_json(",
    "get_json_object(",
    "str_to_map(",
    "regexp_extract_all(",
    "regexp_extract(",
    "regexp_replace(",
    "sort_array(",
    "aggregate(",
    "transform(",
]


def main() -> None:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from gigapipe_spark.session import get_spark

    spark = get_spark("dupescan")
    import __spark_entry__ as e

    for name, fn in sorted(e.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as ex:  # pragma: no cover - diagnostic tool
            print(f"{name}: ERR {type(ex).__name__}: {ex}")
            continue
        hot = {
            p.rstrip("("): c
            for p in EXPENSIVE
            if (c := plan.count(p)) >= threshold
        }
        if hot:
            # crude cross-operator signal: an expensive family that
            # appears in a Filter line is the pushdown-clone case
            in_filter = sorted(
                {
                    p.rstrip("(")
                    for p in EXPENSIVE
                    for line in plan.splitlines()
                    if line.lstrip().startswith(("Filter", "+- Filter"))
                    and p in line
                }
            )
            tag = f"  [in-Filter: {','.join(in_filter)}]" if in_filter else ""
            print(f"{name}: {hot}{tag}")

    spark.stop()


if __name__ == "__main__":
    main()
