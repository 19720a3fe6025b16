"""Canonical table-schema registry (storage/table_schemas.json):
drift pin against the real fan-out writers, and the empty/never-written
store read contract it enables."""

import os
import sys

from gigapipe_spark.storage.maintenance import ALL_TABLES
from gigapipe_spark.storage.writer import Catalog, canonical_schema

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)


def test_registry_matches_fanout_output(spark, tmp_path):
    """Every fan-out table's real output schema equals the generated
    registry — if a writer changes columns, this fails until
    scripts/gen_table_schemas.py is re-run."""
    from gen_table_schemas import collect_schemas, populate_min_store

    cat = Catalog(str(tmp_path / "store"))
    populate_min_store(spark, cat)
    real = collect_schemas(spark, cat.root)
    assert set(real) == set(ALL_TABLES)
    for table, j in real.items():
        declared = canonical_schema(table)
        assert declared is not None, f"{table} missing from registry"
        assert declared.jsonValue() == j, f"schema drift in {table}"


def test_never_written_store_answers_empty(spark, tmp_path):
    """A fresh deployment queried before its first push answers with
    zero rows, not PATH_NOT_FOUND — the reference pre-creates its
    tables at startup, so an empty store is a working store."""
    from gigapipe_spark.storage.query import StoreEngine

    cat = Catalog(str(tmp_path / "store"))
    os.makedirs(cat.root, exist_ok=True)
    for table in ALL_TABLES:
        assert cat.read(spark, table).count() == 0
    eng = StoreEngine(spark, cat.root, catalog=cat)
    assert eng.loki_labels().count() == 0
