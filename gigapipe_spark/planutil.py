"""Catalyst plan-shaping helpers shared across compilers/decoders."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nonpushable(col: Column) -> Column:
    """Value-identity wrapper Catalyst must treat as non-deterministic.

    Use on a PROJECTED column that downstream filters read, when those
    filters can never prune at the scan (the column is per-row derived
    output, e.g. a parsed label/field map): predicate pushdown's
    Project case substitutes the column's whole defining expression
    into the pushed Filter condition, which then re-runs per input row
    while the Project above re-runs it for survivors (guide §4.4's
    duplication mechanism, on built-in chains — no cross-operator CSE
    exists). With the wrapper, `fields.forall(_.deterministic)` fails,
    the filter stays ABOVE the projection, and the chain materializes
    exactly once per row.

    Two shapes that do NOT work, measured on Spark 4.1 (receipts in
    OPTIMIZATION_r15.md B1):
      - wrapping the filter CONDITION: PushPredicateThroughNonJoin's
        Project case guards only on the project fields' determinism,
        so a non-deterministic condition is substituted anyway;
      - `rand()`-comparison guards (`when(rand() > -1, x)`): Spark 4.1
        simplifies rand comparisons range-aware and folds the guard.
    `shuffle()` over a one-element array survives both: shuffling one
    element is the identity, and Shuffle is unconditionally
    non-deterministic.
    """
    return F.element_at(F.shuffle(F.array(col)), 1)
