"""Short service-composition soak (VERDICT r11 task 7): bulk flusher +
maintenance tick + concurrent push/query threads against one
SparkSession — each piece is tested alone elsewhere; this asserts the
COMPOSITION holds: no deadlock/starvation, queries stay correct across
a rotate, and shutdown drains the bulk buffer. The full 2–5 min version
is scripts/soakprobe.py; this runs the same harness for ~20s."""

import sys
import tempfile

import pytest

# soak/crash integration probes: slow tier (see pytest.ini)
pytestmark = pytest.mark.slow


def test_service_soak_short(spark):
    sys.path.insert(0, "scripts")
    from soakprobe import run_soak

    root = tempfile.mkdtemp(prefix="soaktest_") + "/store"
    verdict = run_soak(spark, root, seconds=20.0)
    assert verdict["thread_errors"] == [], verdict
    assert verdict["threads_stuck"] == [], verdict
    assert verdict["rotate_dropped_old"], verdict
    assert verdict["old_rows_after_rotate"] == 0, verdict
    assert verdict["bulk_flush_errors"] == 0, verdict
    # every acked push is stored after the drain
    assert verdict["stored_loki"] == verdict["acked_loki"], verdict
    assert verdict["stored_influx"] == verdict["acked_influx"], verdict
    # both query families made sustained progress
    assert verdict["stats"]["queries"] > 5, verdict
    assert verdict["stats"]["meta"] > 0, verdict


def test_service_soak_tail_and_ruler(spark):
    """VERDICT r12 task 6: live WS tails + the ruler ticker inside the
    composition, across the mid-soak rotation. Two tail clients must
    each see EXACTLY the acked in-window lines (no 500s, no dupes, no
    gaps — the reference tail re-runs the transpiled query from the
    last-seen ts per tick, query_range.go:670-760); the ruler evaluates
    a recording rule against the live store and writes samples back."""
    sys.path.insert(0, "scripts")
    from soakprobe import run_soak

    root = tempfile.mkdtemp(prefix="soaktail_") + "/store"
    verdict = run_soak(spark, root, seconds=20.0, tail_clients=2, ruler=True)
    assert verdict["thread_errors"] == [], verdict
    assert verdict["threads_stuck"] == [], verdict
    assert verdict["rotate_dropped_old"], verdict
    assert verdict["stored_loki"] == verdict["acked_loki"], verdict
    assert len(verdict["tails"]) == 2, verdict
    for t in verdict["tails"]:
        assert t["error"] is None, verdict
        assert t["dupes"] == 0 and t["missing"] == 0 and t["extra"] == 0, (
            verdict
        )
        assert t["lines"] > 0, verdict
    assert verdict["ruler_health"] == "ok", verdict
    assert verdict["ruler_recorded_rows"] > 0, verdict
    assert verdict["ok"], verdict
