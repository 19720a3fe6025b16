"""Regression-gate self-test (VERDICT r12 task 5): the bench verdict
anchors each query against the BEST of the last three rounds, so a
+10%-per-round walk can't stay inside a prev-only band forever. Pure
driver-side function — no SparkSession."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _regression_verdict  # noqa: E402


def _round_file(tmp_path, n, qn, norm, cal=0.23, mad=0.01):
    p = tmp_path / f"BENCH_r{n:02d}.json"
    p.write_text(json.dumps({
        "queries_normalized": qn,
        "normalized": norm,
        "sf": 0.1,
        "calibration": cal,
        "calibration_mad": mad,
    }))
    return p


def _cur(qn, norm, warm=None):
    return {
        "queries_normalized": qn,
        "normalized": norm,
        "sf": 0.1,
        "calibration": 0.23,
        "calibration_mad": 0.01,
        "warm_queries_p50": warm or {},
    }


def test_multi_round_anchor_catches_slow_walk(tmp_path, monkeypatch):
    """The r10→r12 traceql_bitmask_and_or case: 6.30 → 7.54 → 8.30.
    Each step is inside the single-round band (margin floor 0.30), so a
    prev-only gate passes forever; anchored at the r10 best (6.30), the
    8.30 reading is 1.32× and Δ2.0 — flagged, naming its anchor."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_PREV_BENCH", raising=False)
    _round_file(tmp_path, 10, {"traceql_bitmask_and_or": 6.30}, 90.0)
    _round_file(tmp_path, 11, {"traceql_bitmask_and_or": 7.54}, 92.0)
    _round_file(tmp_path, 12, {"traceql_bitmask_and_or": 8.30}, 94.0)
    # warm p50 confirms the slowdown (8.3 normalized × 0.23 cal ≈ 1.9s)
    cur = _cur({"traceql_bitmask_and_or": 8.30}, 94.0,
               warm={"traceql_bitmask_and_or": 1.9})
    v = _regression_verdict(cur)
    assert v["status"] == "regression", v
    assert any("BENCH_r10" in f for f in v["flagged"]), v
    # prev-only anchor (r12 alone) would NOT have flagged it
    monkeypatch.setenv(
        "SPARK_GRAFT_PREV_BENCH", str(tmp_path / "BENCH_r12.json")
    )
    v_prev_only = _regression_verdict(cur)
    assert v_prev_only["status"] == "ok", v_prev_only


def test_cold_only_move_lands_in_findings_not_flags(tmp_path, monkeypatch):
    """A cold move whose warm p50 still sits inside the anchor band is
    informational (cold_findings), not a failure."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_PREV_BENCH", raising=False)
    _round_file(tmp_path, 11, {"q": 4.0}, 90.0)
    _round_file(tmp_path, 12, {"q": 4.1}, 91.0)
    cur = _cur({"q": 6.0}, 92.0, warm={"q": 0.9})  # 0.9/0.23 ≈ 3.9 ≤ band
    v = _regression_verdict(cur)
    assert v["status"] == "ok", v
    assert v["cold_findings"] and "anchor" in v["cold_findings"][0], v


def test_anchor_names_all_rounds_and_skips_sf_mismatch(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_PREV_BENCH", raising=False)
    _round_file(tmp_path, 11, {"q": 4.0}, 90.0)
    _round_file(tmp_path, 12, {"q": 4.0}, 90.0)
    other = tmp_path / "BENCH_r10.json"
    other.write_text(json.dumps({
        "queries_normalized": {"q": 1.0}, "normalized": 10.0, "sf": 0.01,
        "calibration": 0.23, "calibration_mad": 0.01,
    }))
    v = _regression_verdict(_cur({"q": 4.2}, 90.5))
    assert v["status"] == "ok", v
    assert "BENCH_r11" in v["prev"] and "BENCH_r12" in v["prev"], v
    assert "BENCH_r10" not in v["prev"], v  # sf-mismatched round dropped


def test_total_walk_flagged_against_best_total(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_PREV_BENCH", raising=False)
    _round_file(tmp_path, 10, {"q": 4.0}, 80.0)
    _round_file(tmp_path, 11, {"q": 4.0}, 88.0)
    _round_file(tmp_path, 12, {"q": 4.0}, 96.0)
    v = _regression_verdict(_cur({"q": 4.0}, 104.0))
    assert v["status"] == "regression", v
    assert any(f.startswith("TOTAL") and "BENCH_r10" in f
               for f in v["flagged"]), v
