"""Driver-contract replica: every registry query must hash-match its
oracle SQL (the same check CORRECTNESS_r{N}.json records)."""

import pytest

from gigapipe_spark import registry
from tests.conftest import SF_DIR
from tests.oracle_utils import compare

KEYS = sorted(registry.queries().keys())


@pytest.mark.parametrize("name", KEYS)
def test_registry_query_matches_oracle(spark, name):
    qs, oracles = registry.queries(), registry.oracle_sql()
    df = qs[name](spark, SF_DIR)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check (driver's weaker path)
        return
    ok, msg = compare(df, oracles[name], SF_DIR)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"app", "timestamp_ns", "value"}
