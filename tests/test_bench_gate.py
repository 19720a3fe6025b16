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


def test_mad_independent_cold_floor(tmp_path, monkeypatch):
    """VERDICT r13 task 5, pinned on the judge's own run: calibration
    MAD 0.026 on a loaded box inflated the joint margin to 0.462, so
    patterns_mine 6.42 → 9.15 cold (1.43×) was silently absorbed — the
    gate's cold arm went blind exactly when the box was noisiest. The
    1.3× floor must emit a cold finding regardless of MAD."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_PREV_BENCH", raising=False)
    # anchors noisy enough to push margin to ~0.46 (2·(h_prev+h_cur))
    _round_file(tmp_path, 12, {"patterns_mine": 6.42}, 90.0,
                cal=0.197, mad=0.026)
    cur = {
        "queries_normalized": {"patterns_mine": 9.15},
        "normalized": 92.0,
        "sf": 0.1,
        "calibration": 0.197,
        "calibration_mad": 0.026,
        "warm_queries_p50": {"patterns_mine": 0.6},
        "warm_queries_min": {"patterns_mine": 0.55},
    }
    v = _regression_verdict(cur)
    assert v["margin"] > 0.40, v  # the blinding inflated margin
    assert v["status"] == "ok", v  # floor informs, never fails the run
    assert any(
        "patterns_mine" in f and "1.3x floor" in f
        for f in v["cold_findings"]
    ), v
    # warm_min did NOT move (0.55/0.197 ≈ 2.8, no warm anchor data →
    # cold-only annotation; with warm anchors present and worse, the
    # finding is marked warm-corroborated)
    assert "cold-only" in v["cold_findings"][0], v


def test_cold_floor_warm_corroboration(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_PREV_BENCH", raising=False)
    p = tmp_path / "BENCH_r12.json"
    p.write_text(json.dumps({
        "queries_normalized": {"q": 6.0},
        "normalized": 90.0,
        "sf": 0.1,
        "calibration": 0.2,
        "calibration_mad": 0.02,
        "warm_queries_min": {"q": 0.4},  # anchor warm_min 2.0 normalized
    }))
    cur = {
        "queries_normalized": {"q": 8.5},  # 1.42×: above floor,
        "normalized": 92.0,                # inside inflated margin
        "sf": 0.1,
        "calibration": 0.2,
        "calibration_mad": 0.025,
        "warm_queries_p50": {"q": 0.9},
        "warm_queries_min": {"q": 0.8},  # warm_min 4.0 > anchor 2.0
    }
    v = _regression_verdict(cur)
    assert v["status"] == "ok", v
    assert any("warm-corroborated" in f for f in v["cold_findings"]), v


def test_malformed_baseline_dropped_not_crashing(tmp_path, monkeypatch):
    """ADVICE r13 low: a baseline with normalized:null or a scalar
    queries_normalized must be dropped by _load_bench's TYPE probes,
    not crash _regression_verdict mid-bench."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_PREV_BENCH", raising=False)
    (tmp_path / "BENCH_r11.json").write_text(json.dumps({
        "queries_normalized": {"q": 4.0}, "normalized": None, "sf": 0.1,
    }))
    (tmp_path / "BENCH_r12.json").write_text(json.dumps({
        "queries_normalized": "oops", "normalized": 90.0, "sf": 0.1,
    }))
    v = _regression_verdict(_cur({"q": 4.0}, 90.0))
    assert v["status"] == "no_baseline", v


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
