"""End-to-end crash-recovery soak (VERDICT r13 task 6): SIGKILL a live
gateway PROCESS GROUP (python + its JVM) mid-bulk-flush with the
maintenance ticker running, restart on the same store, and assert the
journal/heal invariants the unit tests pin in isolation — this time
through the real service. See scripts/crashprobe.py for the invariant
list."""

import sys

import pytest

# soak/crash integration probes: slow tier (see pytest.ini)
pytestmark = pytest.mark.slow


def test_sigkill_mid_flush_recovers_consistent(spark):
    sys.path.insert(0, "scripts")
    from crashprobe import run_crashprobe

    v = run_crashprobe(spark, acks_before_kill=50)
    assert v["killed_mid_flush"], v
    assert v["stored"] > 0, v  # the kill landed after real commits
    assert v["pending_journal"] == [], v
    assert v["crash_leftovers"] == [], v
    assert v["duplicate_rows"] == 0, v
    assert v["phantom_rows"] == [], v
    assert v["orphan_series_fps"] == 0, v
    assert v["orphan_gin_fps"] == 0, v
    assert v["patterns_skew_fps"] == 0, v
    assert v["ok"], v
